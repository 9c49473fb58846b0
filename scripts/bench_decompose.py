"""NA/SA phase decomposition micro-bench (dev tool, not the driver bench).

Times the bound while_loop, the fused fill, the generator head, and the
windowed SA round pieces separately with bench.py's pipelined protocol, to
steer kernel work.  Run: python scripts/bench_decompose.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (reuses timed()/RTT machinery + compile cache)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from boficap_tpu.config import default_config, finalize  # noqa: E402
from boficap_tpu.decode import bound_fill as bf  # noqa: E402
from boficap_tpu.models.boficap import BoFiCap, build_model  # noqa: E402

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
    pl = jnp.zeros((BATCH, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(4)
    ps = jnp.zeros((BATCH, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(5)
    pn = jnp.full((BATCH,), 2, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        att, am, labels, pn, pl, ps, glat_p=None,
                        deterministic=True)

    @jax.jit
    def encode(att, am):
        return bf.fused_encode(model, params, att, am)

    @jax.jit
    def encode_unfused(att, am):
        return model.apply(params, att, am, deterministic=True,
                           method="encode")

    memory = encode(att, am)
    src = am.astype(bool)

    @jax.jit
    def bound_only(memory, src_mask, rng):
        s = bf.bound_plan(model, params, memory, src_mask, 6,
                          model.max_length)
        return s["last"]

    @jax.jit
    def fill_only(memory, src_mask, rng):
        """One full-width fused fill pass + head + greedy (the NA fill)."""
        from boficap_tpu.ops.pallas_decoder_layer import fused_decoder_forward
        L = model.max_length
        B = memory.shape[0]
        syn_seq = jnp.full((B, L), 5, jnp.int32)
        word_seq = jnp.full((B, L), 1, jnp.int32)

        def embed(m):
            return m._mix_inputs(word_seq, syn_seq, "na", True)

        x = model.apply(params, method=embed)
        mask = jnp.ones((B, L, L), bool)
        packed, fnorm = bf._fused_ctx(model, params, "NA")
        h = fused_decoder_forward(x, memory, mask, src_mask, packed, fnorm,
                                  num_heads=model.num_heads)
        lp = model.apply(params, h, method="generate")
        return jnp.argmax(lp, -1)

    @jax.jit
    def stack_only(memory, src_mask, rng):
        """Fused decoder stack WITHOUT the generator head."""
        from boficap_tpu.ops.pallas_decoder_layer import fused_decoder_forward
        L = model.max_length
        B = memory.shape[0]
        syn_seq = jnp.full((B, L), 5, jnp.int32)
        word_seq = jnp.full((B, L), 1, jnp.int32)

        def embed(m):
            return m._mix_inputs(word_seq, syn_seq, "na", True)

        x = model.apply(params, method=embed)
        mask = jnp.ones((B, L, L), bool)
        packed, fnorm = bf._fused_ctx(model, params, "NA")
        h = fused_decoder_forward(x, memory, mask, src_mask, packed, fnorm,
                                  num_heads=model.num_heads)
        return h.astype(jnp.float32).sum(-1)

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

    @jax.jit
    def sa_unfused(memory, src_mask, rng):
        out = bf.sa_decode(model, params, rng, memory, src_mask,
                           max_steps=6)
        return out["seq"]

    bench.RTT_S = bench._measure_rtt()
    print(f"RTT {bench.RTT_S * 1000:.2f} ms")

    def nokey(fn):
        return lambda a, b, k: fn(a, b)

    names = [("encode_fused", nokey(encode), (att, am)),
             ("encode_unfused", nokey(encode_unfused), (att, am)),
             ("bound6", bound_only, (memory, src)),
             ("stack_noh", stack_only, (memory, src)),
             ("fill+head", fill_only, (memory, src)),
             ("na_full", na_full, (memory, src)),
             ("sa_windowed", sa_full, (memory, src)),
             ("sa_unfused", sa_unfused, (memory, src))]
    for name, fn, args in names:
        bench._fetch(fn(*args, bench.KEY))
        t = bench.timed(fn, *args)
        print(f"{name:>14}: {t * 1000:7.3f} ms/batch "
              f"({BATCH / t:9.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
