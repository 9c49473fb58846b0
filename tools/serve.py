"""Serving driver: load a trained checkpoint and serve captions over HTTP.

    python tools/serve.py --model log/model_best.ckpt \
        --infos_path log/infos_x_best.pkl --mode NAIC --port 8787

POST /caption with a JSON body {"features": [[...2048 floats...] x R]}
(precomputed region features — the reference's own input contract) returns
{"caption": "...", "seq": [...]}.  GET /stats returns latency percentiles.
POST /shutdown stops the server.

The checkpoint/infos loading mirrors tools/eval.py; the batching, bucket
padding, and fused/unfused routing live in boficap_tpu/serve.py.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--infos_path", type=str, required=True)
    p.add_argument("--mode", type=str, default="NAIC",
                   choices=["NAIC", "SAIC", "AIC"])
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_wait_ms", type=float, default=2.0)
    p.add_argument("--max_regions", type=int, default=0,
                   help="region width of the feature store; 0 = the "
                        "checkpoint's max_boxes")
    p.add_argument("--max_steps", type=int, default=0,
                   help="cap decode loop steps (0 = max_length)")
    p.add_argument("--warm", type=int, default=1,
                   help="compile every batch bucket before accepting")
    p.add_argument("--feature_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="feature transport dtype; bfloat16 halves "
                        "host->device upload bytes")
    p.add_argument("--pipeline", type=int, default=1,
                   help="overlap feature upload with the previous decode's "
                        "fetch (separate completion thread); 0 = "
                        "conservative single-thread mode")
    p.add_argument("--device", type=str, default="")
    return p.parse_args(argv)


def build_server(args):
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models import setup as models_setup
    from boficap_tpu.serve import CaptionServer
    from boficap_tpu.train.state import load_params

    with open(args.infos_path, "rb") as f:
        infos = pickle.load(f)
    from boficap_tpu.config.opts import restore_saved_opt
    opt = default_config()
    opt.merge_from_dict(restore_saved_opt(infos.get("opt", {})))
    finalize(opt)
    vocab = infos["vocab"]
    model = models_setup(opt, len(vocab))

    R = args.max_regions or int(opt.get("max_boxes", 36) or 36)
    feat = int(opt.get("att_feat_size", 2048) or 2048)
    att = jnp.zeros((2, R, feat), jnp.float32)
    am = jnp.ones((2, R), jnp.float32)
    L2 = int(opt.get("max_length", 20) or 20) + 2
    labels = jnp.zeros((2, L2), jnp.int32).at[:, 0].set(1)
    pl = jnp.zeros((2, L2), jnp.int32).at[:, 0].set(1).at[:, 1].set(2)
    ps = jnp.zeros((2, L2), jnp.int32).at[:, 1].set(5)
    pn = jnp.full((2,), 2, jnp.int32)
    template = model.init(
        {"params": jax.random.PRNGKey(0), "glat": jax.random.PRNGKey(1)},
        att, am, labels, pn, pl, ps, glat_p=None, deterministic=True)
    params = load_params(args.model, template)
    return CaptionServer(
        model, params, vocab, mode=args.mode, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, max_regions=R,
        max_steps=args.max_steps or None, warm=bool(args.warm),
        feature_dtype=args.feature_dtype, pipeline=bool(args.pipeline))


def make_http_server(srv, host: str, port: int):
    """Dependency-free HTTP front (http.server + threads: each request
    blocks on its future while the batcher coalesces across connections)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stats":
                return self._json(200, srv.stats())
            return self._json(404, {"error": "GET /stats only"})

        def do_POST(self):
            if self.path == "/shutdown":
                self._json(200, {"ok": True})
                threading.Thread(target=httpd.shutdown, daemon=True).start()
                return
            if self.path not in ("/caption", "/caption_bin"):
                return self._json(404, {"error": "POST /caption[_bin]"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                if self.path == "/caption_bin":
                    # binary fast path: raw little-endian feature matrix,
                    # shape via headers (X-Regions, X-Dtype in
                    # float32|float16|bfloat16).  A [36, 2048] f32 request
                    # is ~1.3 MB of JSON text but 288 KB raw, and parsing
                    # JSON floats costs the 1-core host more CPU than the
                    # whole device decode — this is the production route.
                    R = int(self.headers["X-Regions"])
                    dt_name = self.headers.get("X-Dtype", "float32")
                    if dt_name == "bfloat16":
                        import ml_dtypes
                        dt = np.dtype(ml_dtypes.bfloat16)
                    elif dt_name in ("float32", "float16"):
                        dt = np.dtype(dt_name)
                    else:
                        # whitelist: anything else (int8, float64,
                        # 'object', ...) would be silently reinterpreted
                        # as features or fail later with a confusing
                        # frombuffer message
                        raise ValueError(
                            f"X-Dtype must be one of float32|float16|"
                            f"bfloat16, got {dt_name!r}")
                    feats = np.frombuffer(self.rfile.read(n), dt)
                    feats = feats.reshape(R, -1).astype(np.float32)
                else:
                    req = json.loads(self.rfile.read(n))
                    feats = np.asarray(req["features"], np.float32)
                if feats.ndim != 2:
                    raise ValueError(
                        f"features must be [R, feat], got {feats.shape}")
                out = srv.submit(feats).wait(timeout=600)
                self._json(200, {"caption": out["caption"],
                                 "seq": out["seq"].tolist(),
                                 "batch": out["batch"]})
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):
            pass

    class Srv(ThreadingHTTPServer):
        # default listen backlog (5) resets connections under concurrent
        # load (measured: 51/200 requests reset at 64 JSON clients on the
        # loopback bench); deep backlog + daemon threads are the serving
        # posture
        request_queue_size = 256
        daemon_threads = True

    httpd = Srv((host, port), Handler)
    return httpd


def main(argv=None):
    args = parse_args(argv)
    srv = build_server(args)
    httpd = make_http_server(srv, args.host, args.port)
    print(f"serving {args.mode} captions on http://{args.host}:"
          f"{httpd.server_address[1]} (POST /caption, GET /stats, "
          f"POST /shutdown)", flush=True)
    try:
        httpd.serve_forever()
    finally:
        srv.close()
        print("server stopped;", srv.stats(), flush=True)


if __name__ == "__main__":
    main()
