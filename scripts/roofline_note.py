"""Bandwidth/FLOP roofline for the XE train step (r3 verdict #2 'or prove
the ceiling'): pull XLA's cost analysis (flops + bytes accessed) for the
compiled b64x5 step and compare the measured wall time against both the
275 TFLOP/s bf16 compute roofline and the ~800 GB/s HBM roofline.

    python scripts/roofline_note.py [--batch 64]
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
    args = ap.parse_args()
    import bench
    import optax
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.train.state import create_state
    from boficap_tpu.train.steps import make_xe_step

    cfg = default_config()
    for k, v in dict(train_mode="UIC_u", N_enc=6, N_dec=6, N_len=1,
                     d_model=512, d_ff=2048, num_att_heads=8, max_boxes=36,
                     id="roof", dtype="bfloat16").items():
        cfg[k] = v
    finalize(cfg)
    model = build_model(cfg, 9487)
    TB, S = args.batch, 5
    r = np.random.RandomState(0)
    att = jnp.asarray(r.randn(TB, 36, 2048).astype(np.float32))
    am = jnp.ones((TB, 36), jnp.float32)
    lab = np.zeros((TB, S, 22), np.int32)
    lab[:, :, 0] = 1
    lab[:, :, 1:10] = r.randint(4, 9491, (TB, S, 9))
    lab[:, :, 10] = 2
    pl = np.zeros((TB, S, 22), np.int32); pl[:, :, 0] = 1; pl[:, :, 1] = 4
    pl[:, :, 2] = 5
    ps = np.zeros((TB, S, 22), np.int32); ps[:, :, 0] = 1; ps[:, :, 1] = 5
    ps[:, :, 2] = 4
    pn = np.full((TB, S), 3, np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, att, am,
                        jnp.asarray(lab[:, 0]), jnp.asarray(pn[:, 0]),
                        jnp.asarray(pl[:, 0]), jnp.asarray(ps[:, 0]),
                        glat_p=None, deterministic=True)
    targs = (att, am) + tuple(jnp.asarray(x) for x in (lab, pn, pl, ps))
    tx = optax.adam(5e-4)
    step = make_xe_step(model, tx)
    st = create_state(jax.tree_util.tree_map(lambda x: jnp.asarray(x) + 0,
                                             params), tx)
    glat = jnp.float32(0.3)
    keys = [jax.random.fold_in(jax.random.key(7, impl="rbg"), i)
            for i in range(10)]
    jax.block_until_ready(keys[-1])
    bench.RTT_S = bench._measure_rtt()
    cost = step.lower(st, *targs, None, keys[0], glat).compile() \
        .cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    st, m = step(st, *targs, None, keys[0], glat)
    bench._fetch(m["loss"])
    best = float("inf")
    for _ in range(bench.N_REPEATS):
        t0 = time.perf_counter()
        for i in range(10):
            st, m = step(st, *targs, None, keys[i % 10], glat)
        bench._fetch(m["loss"])
        best = min(best, (time.perf_counter() - t0 - bench.RTT_S) / 10)
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    t_flop = flops / 275e12
    t_hbm = byts / 800e9
    print(f"measured step        {best * 1000:8.2f} ms "
          f"({TB / best:.0f} img/s)")
    print(f"XLA flops            {flops / 1e12:8.2f} TFLOP  ->"
          f" compute floor {t_flop * 1000:6.2f} ms (MFU"
          f" {flops / best / 275e12:.3f})")
    print(f"XLA bytes accessed   {byts / 1e9:8.2f} GB     ->"
          f" HBM floor     {t_hbm * 1000:6.2f} ms"
          f" ({byts / best / 1e9:.0f} GB/s achieved)")
    print(f"max(floors)          {max(t_flop, t_hbm) * 1000:8.2f} ms  "
          f"-> step is {best / max(t_flop, t_hbm):.2f}x its roofline")


if __name__ == "__main__":
    main()
