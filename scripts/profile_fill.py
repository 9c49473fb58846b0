"""jax.profiler trace of the fused NA fill + SA windowed decode (dev tool).

Dumps a trace to /tmp/fill_trace and prints the top device ops by total
time, to separate in-kernel device time from launch overhead.
Run: python scripts/profile_fill.py
"""

import glob
import gzip
import json
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
        return bf.fused_encode(model, params, att, am)

    memory = encode(att, am)
    src = am.astype(bool)

    @jax.jit
    def stack_only(memory, src_mask, rng):
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
    def sa_full(memory, src_mask, rng):
        out = bf.sa_decode(model, params, rng, memory, src_mask,
                           max_steps=6, fused_fill=True)
        return out["seq"]

    # warm (compile) outside the trace
    bench._fetch(stack_only(memory, src, bench.KEY))
    bench._fetch(sa_full(memory, src, bench.KEY))

    trace_dir = "/tmp/fill_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(8):
            o1 = stack_only(memory, src, bench.KEY)
        bench._fetch(o1)
        for _ in range(8):
            o2 = sa_full(memory, src, bench.KEY)
        bench._fetch(o2)

    # Parse the trace: sum device-side op durations by name.
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
    totals = {}
    counts = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e.get("dur", 0.0)
        counts[name] = counts.get(name, 0) + 1
    print(f"{'op':<60} {'count':>6} {'total_us':>10} {'us/call':>9}")
    for name, tot in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:60]:<60} {counts[name]:>6} {tot:>10.0f} "
              f"{tot / counts[name]:>9.1f}")


if __name__ == "__main__":
    main()
