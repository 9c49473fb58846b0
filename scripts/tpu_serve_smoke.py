"""Hardware smoke + throughput for the serving layer (boficap_tpu/serve.py)
at the published model scale: warm the buckets, fire N requests through the
batcher, report sustained captions/s and latency percentiles.
Run: python scripts/tpu_serve_smoke.py  [N_REQ=512 MODE=NAIC]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from boficap_tpu.config import default_config, finalize  # noqa: E402
from boficap_tpu.models.boficap import build_model  # noqa: E402
from boficap_tpu.serve import CaptionServer  # noqa: E402

N_REQ = int(os.environ.get("N_REQ", "512"))
MODE = os.environ.get("MODE", "NAIC")

cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    cfg = default_config()
    cfg.train_mode = "UIC_u"
    cfg.N_enc = cfg.N_dec = 6
    cfg.N_len = 1
    cfg.d_model = 512
    cfg.d_ff = 2048
    cfg.num_att_heads = 8
    cfg.max_boxes = 36
    cfg.id = "serve"
    cfg.dtype = "bfloat16"
    finalize(cfg)
    model = build_model(cfg, 9487)
    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(4, 36, 2048).astype(np.float32))
    am = jnp.ones((4, 36), jnp.float32)
    labels = jnp.zeros((4, 22), jnp.int32).at[:, 0].set(1).at[:, -1].set(2)
    pl_ = jnp.zeros((4, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(4)
    ps = jnp.zeros((4, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(5)
    pn = jnp.full((4,), 2, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, att, am, labels,
                        pn, pl_, ps, glat_p=None, deterministic=True)
    ix_to_word = {str(i): f"w{i}" for i in range(4, 9487 + 4)}

    feats = rng.randn(N_REQ, 36, 2048).astype(np.float32)
    # NOTE on this tunnel: throughput here is bounded by the host->device
    # FEATURE UPLOAD (B=64 x 36 x 2048 f32 = 19 MB/batch over a ~80 Mbit/s
    # tunneled link ~= 2 s/batch), not by decode (~1 ms/batch device time).
    # bf16 transport halves the bytes; the dispatch/completion split
    # overlaps each batch's upload with the previous decode+fetch.
    srv = CaptionServer(model, params, ix_to_word, mode=MODE, max_batch=64,
                        max_wait_ms=2.0, max_steps=6, max_regions=36,
                        warm=True,
                        feature_dtype=os.environ.get("FEAT_DTYPE",
                                                     "bfloat16"))
    try:
        t0 = time.perf_counter()
        futs = [srv.submit(feats[i]) for i in range(N_REQ)]
        outs = [f.wait(timeout=600) for f in futs]
        dt = time.perf_counter() - t0
        assert all(isinstance(o["caption"], str) for o in outs)
        st = srv.stats()
        from collections import Counter
        buckets = Counter(o["bucket"] for o in outs)
        print(f"{MODE}: {N_REQ} requests in {dt:.3f}s = "
              f"{N_REQ / dt:.0f} captions/s sustained; "
              f"p50 {st['p50_ms']:.1f} ms, p95 {st['p95_ms']:.1f} ms; "
              f"buckets {dict(buckets)}", flush=True)
    finally:
        srv.close()


if __name__ == "__main__":
    main()
