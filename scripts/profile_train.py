"""jax.profiler decomposition of the XE train step (dev tool).

Why: BENCH_r03 records est_train_mfu ~0.15 at the saturating batches —
this script shows where the rest of the step time goes (device-side op
totals for N profiled steps), to target training-path optimizations.

    python scripts/profile_train.py [--batch 64] [--mode UIC_u]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--mode", default="UIC_u")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--glat", type=float, default=0.3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--rng_impl", default="rbg",
                    help="training-stream PRNG impl (rbg|unsafe_rbg|"
                         "threefry2x32) — matches tools/train.py cfg.rng_impl")
    args = ap.parse_args()

    import bench
    import optax
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.train.state import create_state
    from boficap_tpu.train.steps import make_xe_step

    cfg = default_config()
    cfg.train_mode = args.mode
    cfg.N_enc = cfg.N_dec = 6
    cfg.N_len = 1
    cfg.d_model = 512
    cfg.d_ff = 2048
    cfg.num_att_heads = 8
    cfg.max_boxes = 36
    cfg.id = "proftrain"
    cfg.dtype = "bfloat16"
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
    labels0 = jnp.asarray(lab[:, 0])
    params = model.init({"params": jax.random.PRNGKey(0)}, att, am,
                        labels0, jnp.asarray(pn[:, 0]),
                        jnp.asarray(pl[:, 0]), jnp.asarray(ps[:, 0]),
                        glat_p=None, deterministic=True)
    targs = (att, am) + tuple(jnp.asarray(x) for x in (lab, pn, pl, ps))
    tx = optax.adam(5e-4)
    state = create_state(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x) + 0, params), tx)
    xe_step = make_xe_step(model, tx)
    glat = jnp.float32(args.glat)
    key = (jax.random.PRNGKey(7) if args.rng_impl.startswith("threefry")
           else jax.random.key(7, impl=args.rng_impl))

    state, m = xe_step(state, *targs, None, key, glat)      # compile
    bench._fetch(m["loss"])

    trace_dir = "/tmp/train_trace"
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, m = xe_step(state, *targs, None,
                               jax.random.fold_in(key, i), glat)
        bench._fetch(m["loss"])

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n}
    totals, counts = {}, {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e.get("dur", 0.0)
        counts[name] = counts.get(name, 0) + 1
    grand = sum(totals.values())
    print(f"device total {grand:.0f} us over {args.steps} steps "
          f"= {grand / args.steps / 1000:.2f} ms/step (trace view)")
    print(f"{'op':<64} {'count':>6} {'total_us':>10} {'pct':>6}")
    for name, tot in sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{name[:64]:<64} {counts[name]:>6} {tot:>10.0f} "
              f"{100 * tot / grand:>5.1f}%")


if __name__ == "__main__":
    main()
