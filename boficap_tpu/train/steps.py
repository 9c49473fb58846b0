"""Jit-compiled training steps (parity with the reference LossWrapper,
captioning/modules/loss_wrapper.py, and the step body of tools/train.py:
198-229) — structured TPU-first:

  * XE step: ONE jit program (forward multiplexer + loss + grad + update).
  * RL (structure-loss) step: three phases matching the reference's own
    device-host dance (loss_wrapper.py:194-220 → rewards.py:86-117):
      1. jit ``rl_sample``: non-differentiable while_loop decode of the SA
         and/or NA branches (+ greedy baseline for classic SCST),
      2. host: CIDEr-D/BLEU scores over the device_get'd ids,
      3. jit ``rl_update``: DIFFERENTIABLE re-score of the sampled plans via
         the teacher-forced forward (bit-equal to the sampling pass because
         the blockwise/causal masks make each position's computation depend
         only on already-final inputs), then structure loss + update.

The re-score trick replaces the reference's requires_grad decode loop
(TransformerModel.py:1878-1986 keeps the whole per-phrase Python loop in the
autograd graph): same gradients, but the sampling loop itself can early-exit
and never stores activations.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses as Lm
from ..constants import BOS, EOS, PAD
from ..data import phrase_ops as po
from ..decode import ar as ar_mod
from ..decode import bound_fill as bf
from ..models.boficap import BoFiCap
from ..rewards import get_scores, get_self_critical_reward
from .state import TrainState

PHRASE_MODES = ("NAIC", "SAIC", "UIC", "UIC_ds", "UIC_s", "UIC_u")


def _flat(batch: Dict[str, Any]):
    """[B, S, ...] -> [B*S, ...] views of the label-side tensors."""
    out = {}
    for k in ("labels", "masks", "phrase_num", "phrase_length", "phrase_syn"):
        if k in batch and batch[k] is not None:
            v = jnp.asarray(batch[k])
            out[k] = v.reshape((-1,) + v.shape[2:])
    return out


def ss_sa_forward(model, params, rng, att, am, labels, phrase_length,
                  phrase_syn, ss_prob: float, deterministic: bool = False):
    """Scheduled-sampling SA branch (reference _forward UIC ss path,
    TransformerModel.py:1759-1767 -> ss_SAIC :1988-2121): run the mixed
    gt/model per-phrase loop WITHOUT gradient, then re-score the assembled
    inputs differentiably — one decode_sa pass for the word logprobs and one
    stacked-prefix bound_teacher pass for the per-step (len, syn) logprobs.
    Exact by the blockwise-finality argument (decode/bound_fill docstring)."""
    L = model.max_length
    memory = model.apply(params, att, am, deterministic=deterministic,
                         rngs={"dropout": jax.random.fold_in(rng, 3)},
                         method="encode")
    src_mask = am.astype(bool)
    if labels.shape[0] != memory.shape[0]:
        k = labels.shape[0] // memory.shape[0]
        memory = jnp.repeat(memory, k, axis=0)
        src_mask = jnp.repeat(src_mask, k, axis=0)
    loop = bf.ss_sa_loop(model, jax.lax.stop_gradient(params),
                         jax.random.fold_in(rng, 5), memory, src_mask,
                         labels, phrase_length, phrase_syn, ss_prob)
    pos = jnp.arange(L)
    tgt_mask = pos[None, None, :] < loop["vis_dec"][:, :, None]
    rngs = {"dropout": jax.random.fold_in(rng, 7)}

    def sa_fill(m):
        h = m.decode_sa(loop["extend_word"][:, 1:-1],
                        loop["extend_syn"][:, 1:-1], memory, src_mask,
                        tgt_mask, deterministic)
        return m.generate(h)

    word_lp = model.apply(params, method=sa_fill, rngs=rngs)
    len_lp, syn_lp = model.apply(
        params, loop["extend_len"], loop["plan_len"], memory, src_mask,
        False, deterministic, method="bound_teacher", rngs=rngs)
    return len_lp, syn_lp, word_lp, memory, src_mask


def xe_loss_fn(model: BoFiCap, params, batch, rng, glat_p: float = -1.0,
               drop_worst_rate: float = 0.0, deterministic: bool = False,
               label_smoothing: float = 0.0,
               ss_prob: float = 0.0) -> Tuple[jnp.ndarray, Dict]:
    """Cross-entropy stage loss for every train_mode (LossWrapper XE
    branches)."""
    mode = model.train_mode
    f = _flat(batch)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    reduction = "none" if drop_worst_rate > 0 else "mean"
    rngs = {"dropout": rng, "glat": jax.random.fold_in(rng, 1)}

    if mode in ("UIC", "UIC_ds") and ss_prob > 0:
        # scheduled sampling replaces the teacher-forced SA branch
        sa_len, sa_syn, sa_word, memory, src_mask = ss_sa_forward(
            model, params, rng, att, am, f["labels"], f["phrase_length"],
            f["phrase_syn"], ss_prob, deterministic)
        L = model.max_length
        extend_syn = po.extend_syn_seq(f["phrase_length"], f["phrase_syn"], L)
        na_len, na_syn = model.apply(
            params, extend_syn, f["phrase_length"], memory, src_mask, True,
            deterministic, method="bound_teacher", rngs=rngs)
        total = po.total_words(f["phrase_length"])
        na_mask = jnp.broadcast_to(
            jnp.arange(L)[None, None, :] < total[:, None, None],
            (f["labels"].shape[0], L, L))

        def na_fill(m):
            h = m.decode_na(extend_syn[:, 1:-1], memory, src_mask, na_mask,
                            deterministic)
            return m.generate(h)

        na_word = model.apply(params, method=na_fill, rngs=rngs)
        d = Lm.uic_loss(sa_len, sa_syn, sa_word, na_len, na_syn, na_word,
                        f["phrase_num"], f["phrase_length"], f["phrase_syn"],
                        f["labels"], self_dis=model_cfg_self_dis(model),
                        reduction=reduction)
        loss = d.pop("loss")
        if drop_worst_rate > 0:
            loss = Lm.drop_worst(loss, drop_worst_rate)
        d["loss"] = loss
        return loss, d

    out = model.apply(params, att, am, f["labels"],
                      f.get("phrase_num"), f.get("phrase_length"),
                      f.get("phrase_syn"), glat_p=glat_p,
                      deterministic=deterministic, rngs=rngs)

    metrics: Dict[str, jnp.ndarray] = {}
    if mode in ("AIC", "auto"):
        tgt = f["labels"][:, 1:]
        msk = f["masks"][:, 1:]
        if label_smoothing > 0:
            loss = Lm.label_smoothing_loss(out["logprob"], tgt, msk,
                                           label_smoothing, reduction)
        else:
            loss = Lm.lm_loss(out["logprob"], tgt, msk, reduction)
    elif mode == "NNAIC":
        tgt = f["labels"][:, 1:]
        msk = f["masks"][:, 1:]
        d = Lm.nnaic_loss(
            jax.lax.stop_gradient(out["length_pred"]).astype(jnp.float32),
            out["logprob"], tgt, msk, reduction)
        if reduction == "none":
            loss = d["loss"]
        else:
            loss = d.pop("loss")
            metrics.update(d)
    elif mode in ("NAIC", "SAIC"):
        if mode == "SAIC":
            d = Lm.naic_loss(out["sa_len_logprob"], out["sa_syn_logprob"],
                             out["sa_logprob"], f["phrase_num"],
                             f["phrase_length"], f["phrase_syn"], f["labels"],
                             reduction)
        else:
            d = Lm.naic_loss(out["na_len_logprob"], out["na_syn_logprob"],
                             out["na_logprob"], f["phrase_num"],
                             f["phrase_length"], f["phrase_syn"], f["labels"],
                             reduction)
        loss = d.pop("loss")
        metrics.update(d)
    elif mode in ("UIC", "UIC_ds"):
        d = Lm.uic_loss(out["sa_len_logprob"], out["sa_syn_logprob"],
                        out["sa_logprob"], out["na_len_logprob"],
                        out["na_syn_logprob"], out["na_logprob"],
                        f["phrase_num"], f["phrase_length"], f["phrase_syn"],
                        f["labels"], self_dis=model_cfg_self_dis(model),
                        reduction=reduction)
        loss = d.pop("loss")
        metrics.update(d)
    elif mode in ("UIC_s", "UIC_u"):
        d = Lm.tuic_loss(out["len_logprob"], out["syn_logprob"],
                         out["a_logprob"], out["sa_logprob"],
                         out["na_logprob"], f["phrase_num"],
                         f["phrase_length"], f["phrase_syn"], f["labels"],
                         reduction)
        loss = d.pop("loss")
        metrics.update(d)
    elif mode == "PB_pad":
        # packed layout built on host (batch-dependent width) and threaded
        # through the batch dict; forward = predictor + packed decode
        memory = model.apply(params, att, am, deterministic=deterministic,
                             rngs=rngs, method="encode")
        src_mask = am.astype(bool)
        if f["labels"].shape[0] != memory.shape[0]:
            kk = f["labels"].shape[0] // memory.shape[0]
            memory = jnp.repeat(memory, kk, axis=0)
            src_mask = jnp.repeat(src_mask, kk, axis=0)
        len_lp = model.apply(params, f["labels"], f["phrase_num"],
                             f["phrase_length"], memory, src_mask,
                             deterministic, rngs=rngs,
                             method="pb_length_predict")
        word_lp = model.apply(
            params, jnp.asarray(batch["pb_ids"]),
            jnp.asarray(batch["pb_slot"]), f["labels"], f["phrase_length"],
            memory, src_mask, jnp.asarray(batch["pb_mask"]), deterministic,
            rngs=rngs, method="pb_decode")   # norm_mode: the model's field
        d = Lm.pb_pad_loss(jnp.asarray(batch["pb_labels"])[:, 1:], word_lp,
                           jnp.asarray(batch["pb_word_mask"])[:, 1:],
                           f["phrase_num"],
                           f["phrase_length"][:, 1:], len_lp, reduction)
        loss = d.pop("loss")
        metrics.update(d)
    else:
        raise NotImplementedError(mode)

    if drop_worst_rate > 0:
        loss = Lm.drop_worst(loss, drop_worst_rate)
    if "glat_mismatch" in out:
        metrics["glat_mismatch"] = out["glat_mismatch"]
    metrics["loss"] = loss
    return loss, metrics


# the self_dis flag lives on the config, not the module; thread it through a
# tiny registry keyed by the module instance
_SELF_DIS: Dict[int, bool] = {}


def set_self_dis(model: BoFiCap, value: bool):
    _SELF_DIS[id(model)] = value


def model_cfg_self_dis(model: BoFiCap) -> bool:
    return _SELF_DIS.get(id(model), False)


def make_xe_step(model: BoFiCap, tx, label_smoothing: float = 0.0,
                 debug_checks: bool = False, grad_accum: int = 1):
    """jit'd (state, batch_arrays, rng, glat_p, drop_worst_rate) -> (state,
    metrics).  ``debug_checks``: add non-finite loss/grad counters to the
    metrics (the TPU stand-in for the reference's NaN guards,
    CaptionModel.py:422-424 / TransformerModel.py:1956-1958).

    ``grad_accum`` = G > 1: the batch is split into G equal microbatches
    scanned SEQUENTIALLY, gradients averaged, ONE optimizer update — the
    mean XE loss over the full batch is exactly the mean of equal-size
    microbatch means, so the update is mathematically the full-batch
    update (dropout/GLAT masks draw per-microbatch folded keys, a
    different but equidistributed realization).  This is the efficient
    route to large per-chip batches: the monolithic b256x5 step runs near
    HBM capacity where XLA's auto-rematerialization adds ~17% FLOPs and
    achieved bandwidth drops ~35% (measured, BENCH_NOTES r5) — G=2 keeps
    the working set at the b128 operating point.  Scaling batch via the
    data-parallel mesh remains the first choice; grad_accum covers the
    single-chip case."""

    # the incoming state is donated: params + opt_state update in place on
    # device instead of allocating a second ~3x-params HBM footprint per
    # step (no-op on CPU, where the tests that reread the old state run)
    @partial(jax.jit, static_argnames=("drop_worst", "ss_prob"),
             donate_argnums=(0,))
    def step(state: TrainState, att_feats, att_masks, labels, phrase_num,
             phrase_length, phrase_syn, masks, rng, glat_p,
             drop_worst: float = 0.0, ss_prob: float = 0.0, extra=None):
        batch = {"att_feats": att_feats, "att_masks": att_masks,
                 "labels": labels, "masks": masks,
                 "phrase_num": phrase_num, "phrase_length": phrase_length,
                 "phrase_syn": phrase_syn}
        if extra:
            batch.update(extra)

        def lf_for(mb, r):
            def lf(p):
                return xe_loss_fn(model, p, mb, r, glat_p, drop_worst,
                                  deterministic=False,
                                  label_smoothing=label_smoothing,
                                  ss_prob=ss_prob)
            return lf

        if grad_accum > 1:
            if drop_worst:
                # drop-worst selects the top-k losses over the WHOLE batch;
                # per-microbatch selection would silently change which
                # samples are dropped
                raise ValueError("grad_accum > 1 is incompatible with "
                                 "drop_worst_rate > 0")
            G = grad_accum

            def slice_g(x):
                assert x.shape[0] % G == 0, (
                    f"batch {x.shape[0]} not divisible by grad_accum {G}")
                return x.reshape((G, x.shape[0] // G) + x.shape[1:])

            mbs = jax.tree_util.tree_map(slice_g, batch)

            def body(acc, inp):
                mb, idx = inp
                r = rng if rng is None else jax.random.fold_in(rng, idx)
                (loss, metrics), grads = jax.value_and_grad(
                    lf_for(mb, r), has_aux=True)(state.params)
                acc = jax.tree_util.tree_map(jnp.add, acc, grads)
                return acc, metrics

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            acc, metrics_g = jax.lax.scan(
                body, zero, (mbs, jnp.arange(G)))
            grads = jax.tree_util.tree_map(lambda g: g / G, acc)
            metrics = jax.tree_util.tree_map(lambda m: m.mean(0),
                                             metrics_g)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                lf_for(batch, rng), has_aux=True)(state.params)
        if debug_checks:
            bad = sum(jnp.sum(~jnp.isfinite(g.astype(jnp.float32)))
                      for g in jax.tree_util.tree_leaves(grads))
            metrics["nonfinite_grads"] = bad
            metrics["nonfinite_loss"] = (~jnp.isfinite(loss)).astype(
                jnp.int32) if grad_accum == 1 else jnp.sum(
                ~jnp.isfinite(metrics["loss"])).astype(jnp.int32)
        new_state = state.apply_gradients(tx, grads)
        return new_state, metrics

    return step


def run_xe_step(step_fn, state, batch, rng, glat_p=-1.0, drop_worst=0.0,
                ss_prob=0.0):
    """Convenience host wrapper: pulls arrays out of a CaptionData batch.
    glat is disabled by passing None through (a static no-branch trace)."""
    g = glat_p if (glat_p is not None and glat_p >= 0) else None
    z = lambda k: jnp.asarray(batch[k]) if batch.get(k) is not None else None
    extra = {k: jnp.asarray(v) for k, v in batch.items()
             if k.startswith("pb_")} or None
    return step_fn(state, z("att_feats"), z("att_masks"), z("labels"),
                   z("phrase_num"), z("phrase_length"), z("phrase_syn"),
                   z("masks"), rng, g, drop_worst=drop_worst,
                   ss_prob=ss_prob, extra=extra)


# ---------------------------------------------------------------------------
# RL (structure-loss) stage
# ---------------------------------------------------------------------------

def frame_plan(seq, phrase_length, phrase_syn, L):
    """Sampled (seq [B, L], plan [B, L]) -> framed label/plan rows [B, L+2]
    matching the training collate conventions (leading bos / length-1 slot)."""
    B = seq.shape[0]
    labels = jnp.concatenate(
        [jnp.full((B, 1), BOS, seq.dtype), seq,
         jnp.zeros((B, 1), seq.dtype)], axis=1)
    pl = jnp.concatenate(
        [jnp.ones((B, 1), phrase_length.dtype), phrase_length,
         jnp.zeros((B, 1), phrase_length.dtype)], axis=1)
    ps = jnp.concatenate(
        [jnp.full((B, 1), BOS, phrase_syn.dtype), phrase_syn,
         jnp.zeros((B, 1), phrase_syn.dtype)], axis=1)
    return labels, pl, ps


def make_rl_sample(model: BoFiCap, sample_method: str = "sample",
                   temperature: float = 1.0, sample_n: int = 5):
    """jit'd sampler for the structure-loss stage: returns SA and NA branch
    samples for UIC/UIC_ds (loss_wrapper.py:194-209); for AIC, samples +
    greedy baseline (classic SCST) or plain samples (nscl)."""
    mode = model.train_mode

    @jax.jit
    def sample(params, rng, att_feats, att_masks):
        memory = model.apply(params, att_feats, att_masks,
                             deterministic=True, method="encode")
        src_mask = att_masks.astype(bool)
        mem = jnp.repeat(memory, sample_n, axis=0)
        msk = jnp.repeat(src_mask, sample_n, axis=0)
        out = {}
        if mode in ("AIC", "auto"):
            out["sample"] = ar_mod.ar_sample(
                model, params, rng, mem, msk, sample_method=sample_method,
                temperature=temperature)
            out["greedy"] = ar_mod.ar_sample(
                model, params, rng, memory, src_mask,
                sample_method="greedy")
        else:
            r1, r2, r3 = jax.random.split(rng, 3)
            use_syn_pred = mode in ("UIC_s", "UIC_u")
            if mode in ("SAIC", "UIC", "UIC_ds", "UIC_s", "UIC_u"):
                # UIC_s/u's SA core feeds the predictor the SYN plan
                # (core_UIC_s_SAIC, TransformerModel.py:2232-2234)
                out["sa"] = bf.sa_decode(model, params, r1, mem, msk,
                                         sample_method=sample_method,
                                         temperature=temperature,
                                         predictor_use_syn=use_syn_pred)
            if mode in ("NAIC", "UIC", "UIC_ds", "UIC_s", "UIC_u"):
                out["na"] = bf.na_decode(model, params, r2, mem, msk,
                                         sample_method=sample_method,
                                         temperature=temperature)
            if use_syn_pred:
                # third branch: plan-gated AR sampling (loss_wrapper.py
                # :296-330 samples AIC+SAIC+NAIC for UIC_s/u)
                out["sample"] = bf.uic_s_ar_decode(
                    model, params, r3, mem, msk,
                    sample_method=sample_method, temperature=temperature)
        return out

    return sample


def rl_rescore(model: BoFiCap, params, rng, att_feats, att_masks, samples,
               sample_n: int, deterministic: bool = True,
               use_logsoftmax: bool = True):
    """Differentiable re-score of sampled plans: teacher-forced logprobs of
    each branch under the CURRENT params (identical values to the sampling
    loop's stored logprobs; see module docstring).  ``deterministic``
    defaults True — the sampling loops run without dropout, so the re-score
    must too or the gathered values are not the sampled policy's
    (test_rl_rescore_matches_sampling_logprobs pins this).
    ``use_logsoftmax=False`` returns raw generator LOGITS instead — what the
    margin-family structure losses consume (the reference's
    output_logsoftmax sample flag, loss_wrapper.py:158-160)."""
    L = model.max_length
    memory = model.apply(params, att_feats, att_masks,
                         deterministic=deterministic,
                         rngs={"dropout": rng}, method="encode")
    src_mask = att_masks.astype(bool)
    mem = jnp.repeat(memory, sample_n, axis=0)
    msk = jnp.repeat(src_mask, sample_n, axis=0)
    out = {}
    rngs = {"dropout": jax.random.fold_in(rng, 7)}

    def gen(m, h):
        return m.generate(h) if use_logsoftmax else m.generate_logits(h)

    if "sa" in samples:
        s = samples["sa"]
        labels, pl, ps = frame_plan(s["seq"], s["phrase_length"],
                                    s["phrase_syn"], L)
        word_syn = po.extend_syn_seq(pl, ps, L)[:, 1:-1]
        sa_mask = po.blockwise_mask(pl, L)
        copied = po.copy_init(labels, pl, L)

        def sa_fill(m):
            h = m.decode_sa(copied, word_syn, mem, msk, sa_mask,
                            deterministic)
            return gen(m, h)

        out["sa_logprob"] = model.apply(params, method=sa_fill, rngs=rngs)
    if "na" in samples:
        s = samples["na"]
        total = jnp.sum(s["phrase_length"], axis=-1)
        na_mask = jnp.broadcast_to(
            jnp.arange(L)[None, None, :] < total[:, None, None],
            (s["seq"].shape[0], L, L))
        _, pl_full, ps_full = frame_plan(s["seq"], s["phrase_length"],
                                         s["phrase_syn"], L)
        word_syn = po.extend_syn_seq(pl_full, ps_full, L)[:, 1:-1]

        def na_fill(m):
            h = m.decode_na(word_syn, mem, msk, na_mask, deterministic)
            return gen(m, h)

        out["na_logprob"] = model.apply(params, method=na_fill, rngs=rngs)
    if "sample" in samples:  # AR branch
        s = samples["sample"]
        seq = s["seq"]
        from ..models.layers import causal_mask
        if model.train_mode in ("UIC_s", "UIC_u"):
            # plan-gated AR decode with syn embeddings: re-score via the
            # teacher-forced decode_a on the sampled plan's syn sequence
            labels, pl_f, ps_f = frame_plan(seq, s["phrase_length"],
                                            s["phrase_syn"], L)
            word_syn = po.extend_syn_seq(pl_f, ps_f, L)[:, 1:-1]
            syn_seq = word_syn
        elif isinstance(model, BoFiCap):
            labels = jnp.concatenate(
                [jnp.full((seq.shape[0], 1), BOS, seq.dtype), seq,
                 jnp.zeros((seq.shape[0], 1), seq.dtype)], axis=1)
            syn_seq = None
        else:
            # LSTM captioners (FC/UpDown/AoANet) have no decode_a — run
            # their full teacher-forced forward (always log-softmax)
            labels = jnp.concatenate(
                [jnp.full((seq.shape[0], 1), BOS, seq.dtype), seq,
                 jnp.zeros((seq.shape[0], 1), seq.dtype)], axis=1)
            o = model.apply(params, att_feats, att_masks, labels,
                            deterministic=deterministic, rngs=rngs)
            out["a_logprob"] = o["logprob"][:, :L]
            return out
        # teacher-forced causal decode on the already-computed repeated
        # memory (same mask as BoFiCap.__call__'s AIC branch) — the old
        # full-model call here re-ran the encoder per RL step for nothing
        inp = labels[:, :-2]
        keep = (inp != EOS) & (inp != PAD)
        keep = keep.at[:, 0].set(True)
        mask = keep[:, None, :] & causal_mask(inp.shape[1])[None]

        def a_fill(m):
            h = m.decode_a(inp, mem, msk, mask, deterministic,
                           syn_seq=syn_seq)
            return gen(m, h)

        out["a_logprob"] = model.apply(params, method=a_fill, rngs=rngs)
    return out


def make_rl_step(model: BoFiCap, tx, cfg):
    """jit'd RL update given host-computed scores.

    Per sampled branch: loss += (1-w)·lm_loss + w·structure_loss — the
    reference's structure-stage mix (loss_wrapper.py:169/220-222; lm_loss is
    the teacher-forced XE on the gt batch, computed when w < 1 and entering
    once per branch exactly as there) — plus optional rl_kl KL(NA ← SA)
    over the SA sample's positions (loss_wrapper.py:221-227).

    The margin-family loss types consume raw generator LOGITS (reference
    output_logsoftmax flag); everything else gets log-softmax.
    """
    loss_type = cfg.get("structure_loss_type", "new_self_critical")
    sample_n = cfg.get("train_sample_n", 5)
    rl_kl = cfg.get("rl_kl", False)
    w = cfg.get("structure_loss_weight", 1.0)
    ent_w = cfg.get("entropy_reward_weight", 0) or 0.0
    sc_w = cfg.get("self_cider_reward_weight", 0) or 0.0
    use_ls = bool(cfg.get("struc_use_logsoftmax", False)
                  or loss_type == "softmax_margin"
                  or "margin" not in loss_type)
    glat_p = cfg.get("glat_p", -1.0)
    label_smoothing = cfg.get("label_smoothing", 0.0) or 0.0

    @partial(jax.jit, donate_argnums=(0,))   # in-place state, like xe_step
    def step(state: TrainState, rng, att_feats, att_masks, samples, scores,
             gt=None):
        def lf(params):
            lps = rl_rescore(model, params, rng, att_feats, att_masks,
                             samples, sample_n, deterministic=True,
                             use_logsoftmax=use_ls)
            metrics = {}
            lm = 0.0
            if w < 1.0:
                if gt is None:
                    raise ValueError(
                        "structure_loss_weight < 1 needs the gt batch for "
                        "the (1-w)*lm_loss term — pass gt= to the rl step")
                lm, _ = xe_loss_fn(
                    model, params,
                    dict(gt, att_feats=att_feats, att_masks=att_masks),
                    jax.random.fold_in(rng, 3), glat_p=glat_p,
                    label_smoothing=label_smoothing)
                metrics["lm_loss"] = lm
            total = 0.0
            reward_sum = 0.0
            for key, lp_key in (("sa", "sa_logprob"), ("na", "na_logprob"),
                                ("sample", "a_logprob")):
                if key not in samples:
                    continue
                d = Lm.structure_loss(
                    lps[lp_key], samples[key]["seq"], scores[key], loss_type,
                    entropy_reward_weight=ent_w,
                    self_cider_scores=scores.get(f"{key}_self_cider"),
                    self_cider_reward_weight=sc_w)
                total = total + (1.0 - w) * lm + w * d["loss"]
                metrics[f"{key}_struc_loss"] = d["loss"]
                reward_sum = reward_sum + jnp.mean(d["reward"])
            if rl_kl and "sa" in samples and "na" in samples:
                sa_mask = (samples["sa"]["seq"] > 0).astype(jnp.float32)
                p_sa = jax.lax.stop_gradient(jnp.exp(lps["sa_logprob"]))
                kl = (p_sa * (jax.lax.stop_gradient(lps["sa_logprob"])
                              - lps["na_logprob"])).sum(-1)
                kl = (kl * sa_mask).sum() / (sa_mask.sum() + 1e-6)
                total = total + kl
                metrics["rl_kl"] = kl
            metrics["reward"] = reward_sum
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        metrics["loss"] = loss
        return state.apply_gradients(tx, grads), metrics

    return step


def rl_host_scores(samples, gts, cfg, classic_scst: bool = False
                   ) -> Dict[str, np.ndarray]:
    """Host phase.  Structure-loss mode: CIDEr-D (+BLEU) scores per branch,
    shaped [n_img, sample_n] for the leave-one-out baseline.  Classic SCST
    mode (sc_flag): per-token rewards = score(sample) - score(greedy)
    (rewards.py:41-84)."""
    sample_n = cfg.get("train_sample_n", 5)
    out = {}
    if classic_scst and "greedy" in samples:
        out["scst_reward"] = get_self_critical_reward(
            np.asarray(samples["greedy"]["seq"]), gts,
            np.asarray(samples["sample"]["seq"]), cfg)
        return out
    sc_w = cfg.get("self_cider_reward_weight", 0) or 0.0
    from ..rewards.self_critical import _gts_dict, _native_ids, pack_refs
    # shared across branches (same references): packed int32 bank for the
    # native score_ids path, id-string dict for the string path
    bleu_on = (cfg.get("bleu_reward_weight", 0) or 0) > 0
    if _native_ids() and not bleu_on:
        gts_strs, gts_pack = None, pack_refs(gts)
    else:
        gts_strs, gts_pack = _gts_dict(gts), None
    for key in ("sa", "na", "sample"):
        if key not in samples:
            continue
        seqs = np.asarray(samples[key]["seq"])
        scores = get_scores(gts, seqs, cfg, gts_strs=gts_strs,
                            gts_pack=gts_pack)
        out[key] = scores.reshape(-1, sample_n)
        if sc_w > 0:
            # per-image eigenvalue diversity bonus (reference losses.py
            # :167-171 computes it host-side inside the criterion)
            from ..rewards import get_self_cider_scores
            out[f"{key}_self_cider"] = get_self_cider_scores(gts, seqs, cfg)
    return out


def make_scst_step(model: BoFiCap, tx, cfg):
    """Classic SCST update (sc_flag): -logp(sample) * (r_sample - r_greedy)
    via RewardCriterion (loss_wrapper.py:66-82)."""
    sample_n = cfg.get("train_sample_n", 5)

    @partial(jax.jit, donate_argnums=(0,))   # in-place state, like xe_step
    def step(state: TrainState, rng, att_feats, att_masks, samples, rewards):
        def lf(params):
            lps = rl_rescore(model, params, rng, att_feats, att_masks,
                             {"sample": samples["sample"]}, sample_n,
                             deterministic=True)
            loss = Lm.reward_criterion(lps["a_logprob"],
                                       samples["sample"]["seq"], rewards)
            return loss, {"reward": jnp.mean(rewards[:, 0])}

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        metrics["loss"] = loss
        return state.apply_gradients(tx, grads), metrics

    return step
