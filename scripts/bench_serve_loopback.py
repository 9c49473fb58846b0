"""Loopback end-to-end serving benchmark (r3 verdict #6): run
tools/serve.py on 127.0.0.1 and drive it with an in-process HTTP client,
so the HTTP/batching layer is measured WITHOUT the dev tunnel in the
request path (device dispatch still crosses the axon tunnel — that part is
reported separately by bench.py's device-side percentiles).

    python scripts/bench_serve_loopback.py --ckpt /tmp/vsmoke/ckpt \
        [--concurrency 1 8 64] [--requests 200] [--json 1]

Measures, per concurrency level and per transport (binary / JSON):
e2e captions/s and p50/p99 request latency over ``--requests`` requests
after a warmup.  One shared pre-encoded request body: the client's encode
cost is paid once so the numbers isolate server-side work (http.server
parse, feature decode, batcher, device round trip).
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def wait_ready(port: int, timeout_s: float = 600.0, srv=None):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if srv is not None and srv.poll() is not None:
            break                      # server process died: dump output
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            c.request("GET", "/stats")
            if c.getresponse().status == 200:
                return
        except OSError:
            time.sleep(2.0)
    tail = b""
    if srv is not None:
        # diagnosability: a cold bring-up compiles every batch bucket over
        # the dev tunnel (minutes); show where it got to instead of a bare
        # timeout
        srv.kill()
        try:
            tail = srv.communicate(timeout=15)[0][-2000:]
        except subprocess.TimeoutExpired:
            pass
    raise TimeoutError(
        f"server did not come up within {timeout_s:.0f}s; its output "
        f"tail:\n{tail.decode(errors='replace')}")


def drive(port: int, body: bytes, headers, path: str, n_requests: int,
          concurrency: int):
    """``concurrency`` persistent connections issue requests back to back
    until n_requests complete; per-request wall times collected."""
    lat = []
    lock = threading.Lock()
    remaining = [n_requests]

    def worker():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        while True:
            with lock:
                if remaining[0] <= 0:
                    return
                remaining[0] -= 1
            t0 = time.perf_counter()
            conn.request("POST", path, body=body, headers=headers)
            r = conn.getresponse()
            data = r.read()
            dt = time.perf_counter() - t0
            assert r.status == 200, data[:200]
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    a = np.asarray(lat)
    return {
        "captions_per_s": round(len(a) / wall, 1),
        "p50_ms": round(float(np.percentile(a, 50)) * 1000, 2),
        "p99_ms": round(float(np.percentile(a, 99)) * 1000, 2),
        "n": len(a),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="dir with model_best.ckpt + infos_*_best.pkl "
                         "(or pass --model/--infos_path)")
    ap.add_argument("--model", default="")
    ap.add_argument("--infos_path", default="")
    ap.add_argument("--mode", default="NAIC")
    ap.add_argument("--port", type=int, default=8791)
    ap.add_argument("--regions", type=int, default=0)
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--concurrency", type=int, nargs="+",
                    default=[1, 8, 64])
    ap.add_argument("--json", type=int, default=1,
                    help="also measure the JSON transport")
    ap.add_argument("--server_timeout", type=float, default=900.0,
                    help="bring-up wait; a COLD cache compiles every "
                         "batch bucket over the dev tunnel (minutes)")
    args = ap.parse_args()

    model = args.model
    infos = args.infos_path
    if not model:
        model = os.path.join(args.ckpt, "model_best.ckpt")
        cands = [f for f in os.listdir(args.ckpt)
                 if f.startswith("infos_") and f.endswith("_best.pkl")]
        infos = os.path.join(args.ckpt, cands[0])

    srv = subprocess.Popen(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "..", "tools", "serve.py"),
         "--model", model, "--infos_path", infos, "--mode", args.mode,
         "--port", str(args.port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        wait_ready(args.port, timeout_s=args.server_timeout, srv=srv)
        import pickle
        with open(infos, "rb") as f:
            R = int(dict(pickle.load(f)["opt"]).get("max_boxes", 36) or 36)
        if args.regions:
            R = args.regions
        feats = np.random.RandomState(0).randn(R, 2048).astype(np.float32)
        bin_body = feats.tobytes()
        bin_hdrs = {"X-Regions": str(R), "X-Dtype": "float32",
                    "Content-Type": "application/octet-stream"}
        json_body = json.dumps({"features": feats.tolist()}).encode()
        json_hdrs = {"Content-Type": "application/json"}

        results = {}
        drive(args.port, bin_body, bin_hdrs, "/caption_bin", 16, 4)  # warm
        for c in args.concurrency:
            results[f"bin_c{c}"] = drive(args.port, bin_body, bin_hdrs,
                                         "/caption_bin", args.requests, c)
            print(f"bin  c={c:<3} {results[f'bin_c{c}']}", flush=True)
        if args.json:
            for c in args.concurrency:
                results[f"json_c{c}"] = drive(
                    args.port, json_body, json_hdrs, "/caption",
                    args.requests, c)
                print(f"json c={c:<3} {results[f'json_c{c}']}", flush=True)
        print(json.dumps({"loopback_serving": results,
                          "regions": R,
                          "json_body_bytes": len(json_body),
                          "bin_body_bytes": len(bin_body)}))
    finally:
        try:
            c = http.client.HTTPConnection("127.0.0.1", args.port,
                                           timeout=10)
            c.request("POST", "/shutdown")
            c.getresponse().read()
        except OSError:
            pass
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()


if __name__ == "__main__":
    main()
