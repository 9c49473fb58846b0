"""CaptionServer: request batching, bucket padding exactness, routing."""

import os
import sys
import threading

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _setup(mode="UIC"):
    import jax.numpy as jnp
    from boficap_tpu.models.boficap import build_model
    from tests.test_model import make_batch, tiny_cfg
    cfg = tiny_cfg(mode)
    model = build_model(cfg, 50)
    batch = make_batch(B=4, seed=77)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(77)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    ix_to_word = {str(i): f"w{i}" for i in range(4, 54)}
    return model, params, ix_to_word, np.asarray(att), np.asarray(am)


@pytest.mark.parametrize("train_mode,mode", [("UIC", "NAIC"),
                                             ("UIC", "SAIC"),
                                             ("auto", "AIC")])
@pytest.mark.slow
def test_serve_batching_and_padding_exactness(train_mode, mode):
    """N concurrent requests each get THEIR image's caption, and bucket
    padding never changes a request's output: every per-sample path is
    batch-independent, so serving through any bucket equals a direct
    single-request decode."""
    from boficap_tpu.decode import ar as ar_mod
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.eval.eval_utils import decode_sequence
    model, params, ix_to_word, att, am = _setup(train_mode)

    # direct per-sample reference decode (batch of 1 each)
    import jax.numpy as jnp
    want = []
    for i in range(att.shape[0]):
        a1 = jnp.asarray(att[i:i + 1])
        m1 = jnp.asarray(am[i:i + 1])
        memory = model.apply(params, a1, m1, deterministic=True,
                             method="encode")
        src = m1.astype(bool)
        rng = jax.random.PRNGKey(0)
        if mode == "NAIC":
            out = bf.na_decode(model, params, rng, memory, src)
        elif mode == "SAIC":
            out = bf.sa_decode(model, params, rng, memory, src)
        else:
            out = ar_mod.ar_sample(model, params, rng, memory, src)
        want.append(decode_sequence(ix_to_word, np.asarray(out["seq"]))[0])

    from boficap_tpu.serve import CaptionServer
    srv = CaptionServer(model, params, ix_to_word, mode=mode, max_batch=4,
                        max_wait_ms=30.0, max_regions=att.shape[1])
    try:
        futs = [srv.submit(att[i], am[i]) for i in range(att.shape[0])]
        got = [f.wait(timeout=120)["caption"] for f in futs]
        assert got == want
        st = srv.stats()
        assert st["n"] == att.shape[0] and st["p50_ms"] > 0
    finally:
        srv.close()


def test_serve_pipelined_completion():
    """pipeline=True: fetches move to the completion thread; results and
    stats are identical to the inline path."""
    from boficap_tpu.serve import CaptionServer
    model, params, ix_to_word, att, am = _setup()
    srv = CaptionServer(model, params, ix_to_word, mode="NAIC", max_batch=4,
                        max_wait_ms=30.0, max_regions=att.shape[1],
                        pipeline=True)
    try:
        futs = [srv.submit(att[i], am[i]) for i in range(att.shape[0])]
        outs = [f.wait(timeout=120) for f in futs]
        assert all(isinstance(o["caption"], str) for o in outs)
        assert srv.stats()["n"] == att.shape[0]
    finally:
        srv.close()


def test_serve_buckets_and_region_padding():
    """Requests with fewer regions than max_boxes are padded + masked; odd
    batch sizes round up to the next power-of-two bucket."""
    from boficap_tpu.serve import CaptionServer, _buckets
    assert _buckets(64) == [1, 2, 4, 8, 16, 32, 64]
    assert _buckets(6) == [1, 2, 4, 6]
    model, params, ix_to_word, att, am = _setup()
    # requesting a decode branch the train_mode lacks fails loud and early
    with pytest.raises(ValueError):
        CaptionServer(model, params, ix_to_word, mode="AIC")
    srv = CaptionServer(model, params, ix_to_word, mode="NAIC", max_batch=4,
                        max_wait_ms=30.0, max_regions=att.shape[1])
    try:
        # 3 requests, one with a short region list -> bucket 4
        futs = [srv.submit(att[0]), srv.submit(att[1][:5]),
                srv.submit(att[2])]
        outs = [f.wait(timeout=120) for f in futs]
        assert {o["bucket"] for o in outs} <= {4}
        assert all(isinstance(o["caption"], str) for o in outs)
    finally:
        srv.close()


def test_serve_error_surfacing():
    """A failing decode surfaces the exception on the waiting request
    instead of hanging the worker."""
    from boficap_tpu.serve import CaptionServer
    model, params, ix_to_word, att, am = _setup()
    srv = CaptionServer(model, params, ix_to_word, mode="NAIC", max_batch=2,
                        max_regions=att.shape[1])
    try:
        bad = np.full_like(att[0], np.nan)
        # NaN features do not raise in jax; instead break the program table
        # to simulate a decode failure
        srv._programs[(1,)] = None
        srv._programs[(2,)] = None
        with pytest.raises(TypeError):
            srv.submit(att[0]).wait(timeout=60)
    finally:
        srv.close()


def test_serve_close_fails_straggler_inflight():
    """A worker that outlives close()'s join deadline (a cold-cache compile
    can take minutes) must not leave its batch's futures blocked forever:
    close() fails whatever the straggler still holds via the in-flight
    set."""
    import time
    from boficap_tpu.serve import CaptionServer
    model, params, ix_to_word, att, am = _setup()
    srv = CaptionServer(model, params, ix_to_word, mode="NAIC", max_batch=2,
                        max_wait_ms=1.0, max_regions=att.shape[1])
    try:
        release = threading.Event()

        def slow_program(bucket):
            def prog(a, m, r):
                release.wait(timeout=30)       # a "compile" close() outlives
                raise RuntimeError("released")
            return prog

        srv._program = slow_program
        fut = srv.submit(att[0])
        # wait until the worker has actually picked the request up
        for _ in range(200):
            if srv._inflight:
                break
            time.sleep(0.01)
        assert srv._inflight, "worker never picked up the request"
        srv.close(join_timeout=0.2)
        with pytest.raises(RuntimeError, match="closed"):
            fut.wait(timeout=5)
    finally:
        release.set()
        srv.close(join_timeout=1)


def test_serve_http_endpoint():
    """tools/serve.py HTTP front: concurrent POST /caption requests batch
    through one CaptionServer; GET /stats reports latencies."""
    import json
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from boficap_tpu.serve import CaptionServer
    from tools.serve import make_http_server

    model, params, ix_to_word, att, am = _setup()
    srv = CaptionServer(model, params, ix_to_word, mode="NAIC", max_batch=4,
                        max_wait_ms=30.0, max_regions=att.shape[1])
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        with ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(
                lambda i: post("/caption", {"features": att[i].tolist()}),
                range(3)))
        assert all(isinstance(o["caption"], str) for o in outs)
        assert all(isinstance(o["seq"], list) for o in outs)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["n"] == 3

        # malformed request -> structured 400, server stays up
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/caption", {"features": [1, 2, 3]})
        assert ei.value.code == 400
        assert post("/shutdown", {})["ok"] is True
    finally:
        httpd.shutdown()
        srv.close()


def test_serve_mesh_sharded_equals_single_device():
    """Data-parallel serving: a CaptionServer on a 4-device 'data' mesh
    returns the same captions as the single-device server (params
    replicated, request batches sharded — the training loop's pattern)."""
    from boficap_tpu.parallel.mesh import make_mesh
    from boficap_tpu.serve import CaptionServer
    model, params, ix_to_word, att, am = _setup()
    kw = dict(mode="NAIC", max_batch=4, max_wait_ms=30.0,
              max_regions=att.shape[1])
    srv1 = CaptionServer(model, params, ix_to_word, **kw)
    try:
        want = [srv1.submit(att[i], am[i]).wait(timeout=120)["caption"]
                for i in range(att.shape[0])]
    finally:
        srv1.close()
    mesh = make_mesh(4)
    srvN = CaptionServer(model, params, ix_to_word, mesh=mesh, **kw)
    try:
        futs = [srvN.submit(att[i], am[i]) for i in range(att.shape[0])]
        got = [f.wait(timeout=120)["caption"] for f in futs]
        # every bucket is a multiple of the mesh size
        assert all(b % 4 == 0 for b in srvN.buckets)
        assert got == want
    finally:
        srvN.close()
    with pytest.raises(ValueError):
        CaptionServer(model, params, ix_to_word, mesh=mesh, mode="NAIC",
                      max_batch=6, max_regions=att.shape[1])


def test_serve_close_fails_pending_requests():
    """close() must fail still-queued requests with a clear error, not
    leave their futures blocking forever."""
    from boficap_tpu.serve import CaptionServer
    model, params, ix_to_word, att, am = _setup()
    srv = CaptionServer(model, params, ix_to_word, mode="NAIC", max_batch=4,
                        max_regions=att.shape[1])
    # stop the worker FIRST so the request stays queued, then close
    srv._stop.set()
    srv._worker.join(timeout=10)
    from boficap_tpu.serve import _Future, _Request
    req = _Request(att=np.asarray(att[0], srv.feat_dtype), att_mask=None)
    srv._q.put(req)                     # stuck in the queue: worker is gone
    fut = _Future(req, srv)
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        fut.wait(timeout=10)
    # and submit() on a closed server refuses up front
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(att[0])

    # invalid shapes fail on the caller at submit time
    srv2 = CaptionServer(model, params, ix_to_word, mode="NAIC", max_batch=4,
                         max_regions=att.shape[1])
    try:
        with pytest.raises(ValueError, match="features"):
            srv2.submit(np.zeros((3,), np.float32))          # not 2-D
        with pytest.raises(ValueError, match="features"):
            srv2.submit(np.zeros((att.shape[1] + 1, 2048), np.float32))
    finally:
        srv2.close()


def test_serve_att_mask_validation_and_padding():
    """att_mask shape errors raise at submit(); a short mask matching the
    short region list pads with zeros alongside the features."""
    from boficap_tpu.serve import CaptionServer
    model, params, ix_to_word, att, am = _setup()
    srv = CaptionServer(model, params, ix_to_word, mode="NAIC", max_batch=2,
                        max_regions=att.shape[1])
    try:
        with pytest.raises(ValueError, match="att_mask"):
            srv.submit(att[0], np.ones(att.shape[1] + 3, np.float32))
        # short rows + matching short mask: both pad to R
        short = att[1][:5]
        out = srv.submit(short, np.ones(5, np.float32)).wait(timeout=120)
        assert isinstance(out["caption"], str)
    finally:
        srv.close()
