"""Measure XE train-step wall time under the round-4 perf levers (dev
tool, runs on the real TPU):

  * LN one-pass moments (now default in models/layers.py) — compare via
    ``git stash`` runs if needed; this script measures the CURRENT code.
  * dropout PRNG impl: threefry (jax default) vs unsafe_rbg — the r3
    profile attributed ~4 ms/step to threefry mask generation; rbg keys
    thread through the existing fold_in-based stream plumbing unchanged
    (jax.random.key(..., impl=...) keys keep their impl across fold_in).

    python scripts/bench_train_levers.py [--batch 64] [--mode UIC_u]

Prints one line per variant: step ms + images/s, same chained-dispatch
RTT-subtracted protocol as bench.py::time_xe.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--mode", default="UIC_u")
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import bench
    import optax
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.train.state import create_state
    from boficap_tpu.train.steps import make_xe_step

    cfg = default_config()
    for k, v in dict(train_mode=args.mode, N_enc=6, N_dec=6, N_len=1,
                     d_model=512, d_ff=2048, num_att_heads=8, max_boxes=36,
                     id="levers", dtype="bfloat16").items():
        cfg[k] = v
    finalize(cfg)
    vocab_size = 9487
    model = build_model(cfg, vocab_size)

    TB, S = args.batch, 5
    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(TB, 36, 2048).astype(np.float32))
    am = jnp.ones((TB, 36), jnp.float32)
    lab = np.zeros((TB, S, 22), np.int32)
    lab[:, :, 0] = 1
    lab[:, :, 1:10] = rng.randint(4, vocab_size + 4, (TB, S, 9))
    lab[:, :, 10] = 2
    pl = np.zeros((TB, S, 22), np.int32)
    pl[:, :, 0] = 1
    pl[:, :, 1] = 4
    pl[:, :, 2] = 5
    ps = np.zeros((TB, S, 22), np.int32)
    ps[:, :, 0] = 1
    ps[:, :, 1] = 5
    ps[:, :, 2] = 4
    pn = np.full((TB, S), 3, np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, att, am,
                        jnp.asarray(lab[:, 0]), jnp.asarray(pn[:, 0]),
                        jnp.asarray(pl[:, 0]), jnp.asarray(ps[:, 0]),
                        glat_p=None, deterministic=True)
    targs = (att, am) + tuple(jnp.asarray(x) for x in (lab, pn, pl, ps))
    tx = optax.adam(5e-4)
    xe_step = make_xe_step(model, tx)
    glat = jnp.float32(0.3)
    bench.RTT_S = bench._measure_rtt()

    def measure(tag, keys):
        state = create_state(jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) + 0, params), tx)
        state, m = xe_step(state, *targs, None, keys[0], glat)
        bench._fetch(m["loss"])
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for i in range(args.chain):
                state, m = xe_step(state, *targs, None,
                                   keys[i % len(keys)], glat)
            bench._fetch(m["loss"])
            best = min(best, (time.perf_counter() - t0 - bench.RTT_S)
                       / args.chain)
        print(f"{tag:<28} {best * 1000:8.2f} ms/step   "
              f"{TB / best:8.1f} img/s")
        return best

    tf_keys = [jax.random.fold_in(jax.random.PRNGKey(7), i)
               for i in range(10)]
    bench._fetch(tf_keys[-1])
    measure("threefry (default)", tf_keys)

    for impl in ("rbg", "unsafe_rbg"):
        keys = [jax.random.fold_in(jax.random.key(7, impl=impl), i)
                for i in range(10)]
        jax.block_until_ready(keys[-1])
        measure(f"{impl} dropout keys", keys)


if __name__ == "__main__":
    main()
