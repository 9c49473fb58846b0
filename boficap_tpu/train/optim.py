"""Optimizers + schedules (parity with reference utils/misc.py:114-251 and
tools/train.py:106-196) as optax transforms.

Three optimizer regimes, selected exactly like the reference:
  * ``noamopt``: Adam with the Noam rate  factor * d^-0.5 * min(s^-0.5,
    s * warmup^-1.5)  (misc.py:160-199, get_std_opt :245-251),
  * ``reduce_on_plateau``: base optimizer; the LR multiplier is dropped by
    ``factor`` when val CIDEr hasn't improved for ``patience`` evals —
    tracked host-side by :class:`PlateauTracker` (misc.py:201-243),
  * plain: epoch-staircase LR decay (train.py:151-157) + optional linear
    warmup over the first ``noamopt_warmup`` iters (train.py:194-196).

All variable LR paths go through ``optax.inject_hyperparams`` so the loop
can set the rate without re-jitting.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import optax


class FusedAdamState(NamedTuple):
    count: Any
    mu: Any      # FLAT [P] f32 first moment
    nu: Any      # FLAT [P] f32 second moment


def fused_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, clip_value: float = 0.0,
               weight_decay: float = 0.0) -> optax.GradientTransformation:
    """optax.adam-equivalent with FLAT moment buffers and fused value-clip
    / coupled weight decay.

    Why: the d512 BoFiCap has 298 parameter leaves; leaf-wise
    clip+adam+apply runs ~3 tiny kernels per leaf and is LAUNCH-bound —
    measured 4.5-7 ms/step on v5e (scripts/profile_rl.py), ~2.5x the
    ~1.9 ms HBM-bandwidth floor for the ~1.5 GB the update must move.
    Flattening grads/moments into single [P] arrays turns it into a few
    contiguous fused passes; element math is bit-for-bit optax.adam's
    (same eps-outside-sqrt, same bias correction;
    tests/test_train.py::test_fused_adam_matches_optax).

    ``learning_rate`` may be a float or an optax schedule (called with the
    PRE-increment count, matching optax.scale_by_schedule).  ``clip_value``
    folds the reference's elementwise grad clip (tools/train.py:225 there)
    into the same pass; ``weight_decay`` is the torch-style COUPLED L2
    (gradient += wd*p before the moments see it, misc.py:114-130).

    Sharding note: the flat moments are effectively REPLICATED under a
    tensor-parallel mesh (raveling TP-sharded grads gathers them) — the
    same regime the repo's multichip setup already uses for opt_state
    (__graft_entry__.dryrun_multichip keeps it P()); a sharded-optimizer
    (ZeRO-style) regime would want the per-leaf chain
    (cfg.fused_optimizer=False) or a sharded flat layout."""
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        # mu and nu must be DISTINCT buffers: the train steps donate their
        # state, and aliased leaves trip XLA's double-donation check
        return FusedAdamState(jnp.zeros([], jnp.int32),
                              jnp.zeros(flat.shape, jnp.float32),
                              jnp.zeros(flat.shape, jnp.float32))

    def update(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        gdt = g.dtype
        g = g.astype(jnp.float32)
        # order matches the torch reference: grads are value-clipped FIRST
        # (tools/train.py:225 there), THEN the optimizer's coupled decay
        # joins (torch adam adds wd*p to the already-clipped grad)
        if clip_value:
            g = jnp.clip(g, -clip_value, clip_value)
        if weight_decay:
            if params is None:
                raise ValueError("fused_adam(weight_decay=...) needs params")
            p, _ = ravel_pytree(params)
            g = g + weight_decay * p.astype(jnp.float32)
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        upd = (-lr * mu_hat / (jnp.sqrt(nu_hat) + eps)).astype(gdt)
        return unravel(upd), FusedAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def noam_schedule(d_model: int, factor: float, warmup: int):
    """NoamOpt rate, step counted from 1 (misc.py:183-189)."""
    import jax.numpy as jnp

    def sched(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        return factor * (d_model ** -0.5) * jnp.minimum(
            s ** -0.5, s * (warmup ** -1.5))
    return sched


def make_base_opt(cfg, lr):
    """Reference build_optimizer semantics (misc.py:114-130): 'sgd' is PLAIN
    (no momentum — 'sgdm'/'sgdmom' are the momentum/nesterov variants, each
    with momentum = optim_alpha), and weight_decay is the torch-style
    COUPLED L2 (gradient += wd·p before the update) for every optimizer
    except 'adamw', which is decoupled."""
    kind = cfg.get("optim", "adam")
    b1 = cfg.get("optim_alpha", 0.9)
    b2 = cfg.get("optim_beta", 0.999)
    eps = cfg.get("optim_epsilon", 1e-8)
    wd = cfg.get("weight_decay", 0)

    def l2(base):
        # torch's coupled weight decay: decay joins the gradient BEFORE the
        # adaptive/momentum machinery sees it
        return optax.chain(optax.add_decayed_weights(wd), base) if wd \
            else base

    if kind == "adam":
        return l2(optax.adam(lr, b1=b1, b2=b2, eps=eps))
    if kind == "adamw":
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    if kind == "sgd":
        return l2(optax.sgd(lr))
    if kind == "sgdm":
        return l2(optax.sgd(lr, momentum=b1))
    if kind == "sgdmom":
        return l2(optax.sgd(lr, momentum=b1, nesterov=True))
    if kind == "rmsprop":
        return l2(optax.rmsprop(lr, decay=b1, eps=eps))
    if kind == "adagrad":
        return l2(optax.adagrad(lr))
    raise ValueError(f"unknown optim {kind}")


def build_optimizer(cfg) -> optax.GradientTransformation:
    """Returns the full transform incl. value clipping (reference clips grad
    VALUES to [-grad_clip, grad_clip], train.py:225 + misc clip_gradient).

    Adam uses the per-leaf optax chain by default; setting
    ``cfg.fused_optimizer`` truthy routes it through :func:`fused_adam`
    (flat moments, clip/decay folded into one pass — numerics identical to
    the optax chain, tested, but measured ~10% slower on v5e, BENCH_NOTES
    r4).  The default here matches config/opts.py (False) so a cfg dict
    missing the key gets the same opt_state pytree structure as the CLI —
    the two paths produce structurally different states (flat [P] moments
    vs per-leaf), which would defeat opt-state restore across them."""
    clip_value = cfg.get("grad_clip_value", 0.1)
    value_clip = cfg.get("grad_clip_mode", "value") != "norm"
    fused = (cfg.get("fused_optimizer", False)
             and cfg.get("optim", "adam") == "adam")
    if value_clip:
        clip = optax.clip(clip_value)
    else:
        clip = optax.clip_by_global_norm(clip_value)

    def adam_like(lr, b1, b2, eps, wd=0.0):
        if fused:
            fa = fused_adam(lr, b1, b2, eps,
                            clip_value=clip_value if value_clip else 0.0,
                            weight_decay=wd)
            return fa if value_clip else optax.chain(clip, fa)
        base = optax.adam(lr, b1=b1, b2=b2, eps=eps)
        if wd:
            base = optax.chain(optax.add_decayed_weights(wd), base)
        return optax.chain(clip, base)

    if cfg.get("noamopt", False):
        sched = noam_schedule(cfg.d_model, cfg.get("noamopt_factor", 1.0),
                              cfg.get("noamopt_warmup", 2000))
        return adam_like(sched, 0.9, 0.98, 1e-9)

    def with_lr(lr):
        if fused:
            return adam_like(lr, cfg.get("optim_alpha", 0.9),
                             cfg.get("optim_beta", 0.999),
                             cfg.get("optim_epsilon", 1e-8),
                             cfg.get("weight_decay", 0))
        return optax.chain(clip, make_base_opt(cfg, lr))

    return optax.inject_hyperparams(
        lambda learning_rate: with_lr(learning_rate))(
        learning_rate=cfg.get("learning_rate", 5e-4))


def set_lr(opt_state, lr):
    """Set the injected learning rate in-place-styled (returns new state)."""
    if hasattr(opt_state, "hyperparams"):
        opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def epoch_lr(cfg, epoch: int) -> float:
    """Staircase decay (train.py:151-157)."""
    lr = cfg.get("learning_rate", 5e-4)
    start = cfg.get("learning_rate_decay_start", -1)
    if start >= 0 and epoch > start:
        frac = (epoch - start) // cfg.get("learning_rate_decay_every", 3)
        lr = lr * cfg.get("learning_rate_decay_rate", 0.8) ** frac
    return lr


def scheduled_sampling_prob(cfg, epoch: int) -> float:
    """ss_prob anneal (train.py:159-162)."""
    start = cfg.get("scheduled_sampling_start", -1)
    if start < 0 or epoch < start:
        return 0.0
    frac = (epoch - start) // cfg.get("scheduled_sampling_increase_every", 5) + 1
    return min(cfg.get("scheduled_sampling_increase_prob", 0.05) * frac,
               cfg.get("scheduled_sampling_max_prob", 0.25))


def glat_rate(cfg, epoch: int) -> float:
    """Glancing unmask-rate anneal (train.py:164-171); -1 disables."""
    if not cfg.get("glancing_token", False):
        return -1.0
    start = cfg.get("unmasked_rate_decay_start", -1)
    r0 = cfg.get("unmasked_rate_start", 0.5)
    if start < 0 or epoch < start:
        return r0
    frac = (epoch - start) // cfg.get("unmasked_rate_decay_every", 1) + 1
    return max(r0 - frac * cfg.get("unmasked_rate_decay_rate", 0.1),
               cfg.get("unmasked_rate_end", 0.1))


class PlateauTracker:
    """Host-side ReduceLROnPlateau (misc.py:201-243): multiply LR by
    ``factor`` when the monitored score hasn't improved for ``patience``
    checks."""

    def __init__(self, factor: float = 0.5, patience: int = 3):
        self.factor = factor
        self.patience = patience
        self.best: Optional[float] = None
        self.bad = 0
        self.scale = 1.0

    def update(self, score: float) -> float:
        if self.best is None or score > self.best:
            self.best = score
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale *= self.factor
                self.bad = 0
        return self.scale

    def state_dict(self):
        return {"best": self.best, "bad": self.bad, "scale": self.scale}

    def load_state_dict(self, s):
        self.best, self.bad, self.scale = s["best"], s["bad"], s["scale"]
