"""Write a bench-shaped random-init checkpoint + infos WITHOUT touching
the TPU (CPU-side flax init): bench.py's loopback serving section spawns
this first so the serve child gets the WHOLE chip — measured r5: running
tools/serve.py next to a bench process that already holds the chip's HBM
sends the axon client into a retry/buffer spiral (68 GB host RSS, p50
4.4 s vs ~50 ms with the chip to itself).

    python scripts/bench_make_ckpt.py --out DIR [--vocab 9487]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab", type=int, default=9487)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")   # sitecustomize pins axon;
    # the in-process flip is the only reliable way off it (see tools/)
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models.boficap import build_model

    cfg = default_config()
    for k, v in dict(train_mode="UIC_u", N_enc=6, N_dec=6, N_len=1,
                     d_model=512, d_ff=2048, num_att_heads=8, max_boxes=36,
                     id="bench", dtype="bfloat16").items():
        cfg[k] = v
    finalize(cfg)
    model = build_model(cfg, args.vocab)
    r = np.random.RandomState(0)
    B = 2
    att = jnp.asarray(r.randn(B, 36, 2048).astype(np.float32))
    am = jnp.ones((B, 36), jnp.float32)
    labels = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, -1].set(2)
    pl = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(4)
    ps = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(5)
    pn = jnp.full((B,), 2, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, att, am, labels,
                        pn, pl, ps, glat_p=None, deterministic=True)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "model_best.ckpt"), "wb") as f:
        f.write(serialization.to_bytes(params))
    vocab = {str(i): f"w{i}" for i in range(1, args.vocab + 1)}
    with open(os.path.join(args.out, "infos_bench_best.pkl"), "wb") as f:
        pickle.dump({"opt": dict(cfg), "vocab": vocab}, f)
    print(args.out)


if __name__ == "__main__":
    main()
