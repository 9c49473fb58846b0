"""Minimal SA/NA timing (dev tool): just the two decode programs.
Run: python scripts/bench_sa_na.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from boficap_tpu.config import default_config, finalize  # noqa: E402
from boficap_tpu.decode import bound_fill as bf  # noqa: E402
from boficap_tpu.models.boficap import build_model  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "64"))


def main():
    cfg = default_config()
    cfg.train_mode = "UIC_u"
    cfg.N_enc = cfg.N_dec = 6
    cfg.N_len = 1
    cfg.d_model = 512
    cfg.d_ff = 2048
    cfg.num_att_heads = 8
    cfg.max_boxes = 36
    cfg.id = "bench"
    cfg.dtype = "bfloat16"
    finalize(cfg)
    model = build_model(cfg, 9487)

    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(BATCH, 36, 2048).astype(np.float32))
    am = jnp.ones((BATCH, 36), jnp.float32)
    labels = jnp.zeros((BATCH, 22), jnp.int32).at[:, 0].set(1).at[:, -1].set(2)
    pl_ = jnp.zeros((BATCH, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(4)
    ps = jnp.zeros((BATCH, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(5)
    pn = jnp.full((BATCH,), 2, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        att, am, labels, pn, pl_, ps, glat_p=None,
                        deterministic=True)

    @jax.jit
    def encode(att, am):
        return model.apply(params, att, am, deterministic=True,
                           method="encode")

    memory = encode(att, am)
    src = am.astype(bool)

    @jax.jit
    def na_full(memory, src_mask, rng):
        out = bf.na_decode(model, params, rng, memory, src_mask,
                           max_steps=6, fused_fill=True)
        return out["seq"]

    @jax.jit
    def sa_full(memory, src_mask, rng):
        out = bf.sa_decode(model, params, rng, memory, src_mask,
                           max_steps=6, fused_fill=True)
        return out["seq"]

    bench.RTT_S = bench._measure_rtt()
    print(f"RTT {bench.RTT_S * 1000:.2f} ms", flush=True)
    for name, fn in (("na_full", na_full), ("sa_full", sa_full)):
        bench._fetch(fn(memory, src, bench.KEY))
        t = bench.timed(fn, memory, src)
        print(f"{name}: {t * 1000:7.3f} ms/batch ({BATCH / t:9.0f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
