"""Decompose the RL (structure-loss) UPDATE pass (r3 verdict #5): of the
~8.5-10.4 ms rl_update at the recipe batch (10 imgs x train_sample_n=5,
UIC, new_self_critical), how much is the differentiable re-score forward,
its backward, and the optimizer?

    python scripts/profile_rl.py

Times four programs with bench.py's pipelined protocol:
  fwd      — the re-score + structure-loss forward only
  grad     — value_and_grad of the same (no optimizer)
  update   — the full rl_step (grad + adam, donated state)
  adam     — optimizer-only (tx.update + apply on fixed grads)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import bench
    import optax
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.train.state import create_state
    from boficap_tpu.train.steps import (make_rl_sample, make_rl_step,
                                         rl_rescore)
    from boficap_tpu import losses as Lm

    cfg = default_config()
    for k, v in dict(train_mode="UIC", N_enc=6, N_dec=6, N_len=1,
                     d_model=512, d_ff=2048, num_att_heads=8, max_boxes=36,
                     id="profrl", dtype="bfloat16").items():
        cfg[k] = v
    finalize(cfg)
    vocab_size = 9487
    model = build_model(cfg, vocab_size)
    RB, SN = 10, 5
    r = np.random.RandomState(0)
    att = jnp.asarray(r.randn(RB, 36, 2048).astype(np.float32))
    am = jnp.ones((RB, 36), jnp.float32)
    labels = jnp.zeros((RB, 22), jnp.int32).at[:, 0].set(1).at[:, -1].set(2)
    pl = jnp.zeros((RB, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(4)
    ps = jnp.zeros((RB, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(5)
    pn = jnp.full((RB,), 2, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(2)}, att, am, labels,
                        pn, pl, ps, glat_p=None, deterministic=True)

    bench.RTT_S = bench._measure_rtt()
    rl_cfg = {"structure_loss_type": "new_self_critical",
              "train_sample_n": SN, "structure_loss_weight": 1.0,
              "cider_reward_weight": 1, "bleu_reward_weight": 0}
    rl_sample = make_rl_sample(model, "sample", 1.0, SN)
    bench._warm(lambda a, m, k: rl_sample(params, k, a, m), att, am,
                bench.KEY)
    samples = rl_sample(params, bench.KEY, att, am)
    bench._fetch(samples["na"]["seq"])
    scores = {k: jnp.asarray(r.rand(RB, SN).astype(np.float32))
              for k in ("sa", "na")}

    def lf(p, rng):
        lps = rl_rescore(model, p, rng, att, am, samples, SN,
                         deterministic=True, use_logsoftmax=True)
        total = 0.0
        for key, lp_key in (("sa", "sa_logprob"), ("na", "na_logprob")):
            d = Lm.structure_loss(lps[lp_key], samples[key]["seq"],
                                  scores[key], "new_self_critical")
            total = total + d["loss"]
        return total

    fwd = jax.jit(lambda p, rng: lf(p, rng))
    grad = jax.jit(lambda p, rng: jax.value_and_grad(
        lambda q: lf(q, rng))(p))
    tx = optax.adam(5e-6)
    opt_state0 = tx.init(params)
    _, grads0 = grad(params, bench.KEY)
    bench._fetch(grads0)

    @jax.jit
    def adam_only(p, os_, g):
        upd, os2 = tx.update(g, os_, p)
        return optax.apply_updates(p, upd), os2

    t_fwd = bench.timed(lambda k: fwd(params, k))
    t_grad = bench.timed(lambda k: grad(params, k))

    # adam-only: chain state through like bench.time_xe (donation-free
    # here — measuring launch+bandwidth, not memory)
    bench._warm(lambda k: adam_only(params, opt_state0, grads0)[0], bench.KEY)
    t_adam = bench.timed(lambda k: adam_only(params, opt_state0, grads0)[0])

    rl_step = make_rl_step(model, tx, rl_cfg)
    st = create_state(jax.tree_util.tree_map(lambda x: jnp.asarray(x) + 0,
                                             params), tx)
    st, mm = rl_step(st, bench.KEY, att, am, samples, scores)
    bench._fetch(mm["loss"])
    best = float("inf")
    for _ in range(bench.N_REPEATS):
        t0 = time.perf_counter()
        for i in range(10):
            st, mm = rl_step(st, jax.random.fold_in(bench.KEY, i), att, am,
                             samples, scores)
        bench._fetch(mm["loss"])
        best = min(best, (time.perf_counter() - t0 - bench.RTT_S) / 10)

    print(f"rescore fwd only      {t_fwd * 1000:7.2f} ms")
    print(f"value_and_grad        {t_grad * 1000:7.2f} ms  "
          f"(bwd ~ {1000 * (t_grad - t_fwd):.2f})")
    print(f"adam only             {t_adam * 1000:7.2f} ms")
    print(f"full rl_step          {best * 1000:7.2f} ms  "
          f"(step - grad ~ {1000 * (best - t_grad):.2f} adam+clip)")


if __name__ == "__main__":
    main()
