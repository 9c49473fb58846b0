"""Production serving layer: request batching + bucketed decode programs.

The reference has no serving story (its inference surface is the eval CLI,
tools/eval.py); this module is the TPU-native serving shape the framework is
built for: requests (precomputed region features, the reference's own input
contract) are queued, coalesced into batches, padded up to a SIZE BUCKET so
the number of compiled programs stays bounded, and decoded by one jit'd
encode+bound+fill program per bucket.  Batch padding is exact: every
per-sample path (encoder rows, attention with per-sample masks, RefLayerNorm)
is independent across the batch dimension, so a request's caption does not
depend on its batchmates (asserted in tests/test_serve.py).

Design points (BENCH_NOTES.md):
  * buckets are powers of two up to ``max_batch`` — each bucket compiles
    once (persistent compile cache applies) and B <= 128 rides the
    whole-stack pallas kernels, larger the per-layer family;
  * the fused (pallas) and unfused programs swap rank with tunnel/launch
    weather at small batches; ``route='auto'`` measures both at warmup and
    keeps the winner per bucket (exactly what bench.py reports as min);
  * params ride as jit ARGUMENTS so the compiled programs are weight-free
    and the persistent compile cache hits across processes/checkpoints;
  * ``pipeline=True`` (default) overlaps each batch's host->device
    feature upload with the previous decode's result fetch on a separate
    completion thread — measured 303 vs 188 captions/s at B=64 on the dev
    tunnel; ``pipeline=False`` is the conservative single-thread mode.

Decode modes: 'NAIC' (bound + parallel fill — the product's signature path),
'SAIC', 'AIC' (KV-cached autoregressive).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .decode import ar as ar_mod
from .decode import bound_fill as bf
from .eval.eval_utils import decode_sequence


def _buckets(max_batch: int) -> List[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    return out + [max_batch]


@dataclass(eq=False)        # identity hash/eq: requests live in sets
class _Request:
    att: np.ndarray                      # [R, feat]
    att_mask: Optional[np.ndarray]       # [R] or None
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, Any]] = None
    error: Optional[BaseException] = None
    t_submit: float = 0.0


class CaptionServer:
    """In-process caption server over a jit'd encode+decode program family.

    >>> srv = CaptionServer(model, params, ix_to_word)
    >>> fut = srv.submit(att_feats)           # returns a waitable handle
    >>> print(fut.caption())
    """

    def __init__(self, model, params, ix_to_word: Dict[str, str], *,
                 mode: str = "NAIC", max_batch: int = 64,
                 max_wait_ms: float = 2.0, max_steps: Optional[int] = None,
                 route: str = "auto", warm: bool = False,
                 max_regions: Optional[int] = None, mesh=None,
                 feature_dtype: str = "float32", pipeline: bool = True):
        assert mode in ("NAIC", "SAIC", "AIC"), mode
        from .models.boficap import DECODER_ROLES
        role = {"NAIC": "NA", "SAIC": "SA", "AIC": "A"}[mode]
        roles = DECODER_ROLES.get(getattr(model, "train_mode", ""), {})
        if role not in roles:
            raise ValueError(
                f"mode={mode} needs a '{role}' decoder role; train_mode="
                f"{model.train_mode} has {sorted(roles)}")
        self.model = model
        self.params = params
        self.ix_to_word = ix_to_word
        self.mode = mode
        self.max_steps = max_steps
        # fixed region width of the deployment's feature store (36 for the
        # standard bottom-up features); model.max_boxes is only the NNAIC
        # length-head flatten cap, not the per-image region count
        self.R = int(max_regions or model.max_boxes)
        # multi-chip data parallelism: params replicate over the mesh,
        # request batches shard over its 'data' axis (the same single-
        # program pattern the training loop and __graft_entry__ dryrun
        # use); buckets then start at the device count so every shard is
        # non-empty.
        self.mesh = mesh
        self._in_shard = None
        if mesh is None:
            # pin the weights on device ONCE: tools/serve.py's checkpoint
            # load restores a HOST-numpy pytree (flax from_bytes), and
            # params ride as a jit argument — without this put every
            # program call re-uploads the full tree (~220 MB for the
            # 55M-param model: measured 5.2 s p50 per request over the
            # dev tunnel with the re-uploaded buffers accumulating at
            # ~2.5 GB/min host RSS; device-resident params restore ~50 ms
            # e2e).  The r4 loopback runs used a tiny smoke model whose
            # ~1 MB tree masked this entirely.
            self.params = jax.device_put(params)
        else:
            from .parallel.mesh import batch_sharding, replicated
            n_dev = mesh.devices.size
            if max_batch % n_dev:
                raise ValueError(f"max_batch {max_batch} must be a multiple "
                                 f"of the mesh size {n_dev}")
            self.params = jax.device_put(self.params, replicated(mesh))
            self._in_shard = batch_sharding(mesh)
        self.buckets = [b for b in _buckets(max_batch)
                        if mesh is None or b % mesh.devices.size == 0]
        self.max_wait_s = max_wait_ms / 1e3
        self.route = route
        # feature transport dtype: 'bfloat16' halves host->device upload
        # bytes (the serving bottleneck over thin links) at the cost of
        # quantizing the input features; 'float32' is bit-exact transport
        self.feat_dtype = jnp.dtype(feature_dtype)
        self._programs: Dict[tuple, Any] = {}
        self._rng = jax.random.PRNGKey(0)
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._done_q: "queue.Queue[tuple]" = queue.Queue()
        # requests handed to a worker/completer thread and not yet resolved:
        # close() fails these if the threads outlive its join deadline (a
        # cold-cache Mosaic compile mid-dispatch can take minutes)
        self._inflight: set = set()
        self._stop = threading.Event()
        # bounded: a long-lived server must not grow a per-request list
        # (stats() covers the most recent window)
        import collections
        self._lat_ms: "collections.deque[float]" = collections.deque(
            maxlen=8192)
        self._n_done = 0
        self._lock = threading.Lock()
        if warm:
            for b in self.buckets:
                t0 = time.perf_counter()
                self._program(b)
                # visible bring-up progress: a cold cache compiles each
                # bucket over the tunnel (~1 min each); without this a
                # caller waiting on the port sees minutes of silence
                print(f"serve warm: bucket {b} ready "
                      f"({time.perf_counter() - t0:.1f}s)", flush=True)
        # pipeline=True (default) moves the blocking result fetch to a
        # completion thread so the next batch's feature upload overlaps the
        # in-flight decode — measured 303 vs 188 captions/s on the dev
        # tunnel at B=64.  (An earlier "cross-thread fetch stall" was
        # actually the unsynced-warmup backlog — see _program._sync;
        # pipeline=False remains available as the conservative mode.)
        self.pipeline = pipeline
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self._completer = None
        if pipeline:
            self._completer = threading.Thread(target=self._complete,
                                               daemon=True)
            self._completer.start()

    # ---- program construction -------------------------------------------

    def _make(self, bucket: int, fused: bool):
        model = self.model
        mode, max_steps = self.mode, self.max_steps

        # params ride as a jit ARGUMENT (not a closure constant): the traced
        # HLO stays weight-free, so the persistent compile cache hits across
        # processes/checkpoints and warmup costs seconds, not recompiles
        @jax.jit
        def program_p(params, att, am, rng):
            if fused:
                memory = bf.fused_encode(model, params, att, am)
            else:
                memory = model.apply(params, att, am, deterministic=True,
                                     method="encode")
            src = am.astype(bool)
            if mode == "NAIC":
                return bf.na_decode(model, params, rng, memory, src,
                                    max_steps=max_steps, fused_fill=fused)
            if mode == "SAIC":
                return bf.sa_decode(model, params, rng, memory, src,
                                    max_steps=max_steps, fused_fill=fused)
            return ar_mod.ar_sample(model, params, rng, memory, src,
                                    max_steps=max_steps)

        def program(att, am, rng):
            return program_p(self.params, att, am, rng)

        return program

    def _fusable(self) -> bool:
        return (jax.default_backend() == "tpu"
                and self.model.d_model % 128 == 0
                and self.model.d_ff % 128 == 0)

    def _program(self, bucket: int):
        key = (bucket,)
        if key in self._programs:
            return self._programs[key]
        R = self.R
        feat = self.model.att_feat_size
        att = jnp.zeros((bucket, R, feat), self.feat_dtype)
        am = jnp.ones((bucket, R), jnp.float32)
        if self._in_shard is not None:
            att = jax.device_put(att, self._in_shard)
            am = jax.device_put(am, self._in_shard)
        cands = [(False, self._make(bucket, False))]
        if self._fusable():
            cands.append((True, self._make(bucket, True)))
        def _sync(out):
            # force completion with a VALUE fetch: on RPC-tunneled device
            # clients block_until_ready can return before the device
            # finishes (BENCH_NOTES.md), which would leave the warm
            # executions AND the program load queued — the first real
            # request's fetch then absorbs the whole backlog (measured:
            # 12s-10min stalls on the first served batch)
            np.asarray(jax.tree_util.tree_leaves(out)[0])

        best, best_t = None, float("inf")
        for fused, prog in cands:
            if self.route == "unfused" and fused:
                continue
            if self.route == "fused" and not fused and len(cands) > 1:
                continue
            _sync(prog(att, am, self._rng))           # compile + warm + load
            # min over repeats: a single timing sample is noise on tunneled
            # clients (dispatch latency swings 2-3x — BENCH_NOTES.md), and
            # this choice is locked in for the server's lifetime
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(prog(att, am, self._rng))
                dt = min(dt, time.perf_counter() - t0)
            if dt < best_t:
                best, best_t = prog, dt
        self._programs[key] = best
        return best

    # ---- request path ----------------------------------------------------

    def submit(self, att: np.ndarray,
               att_mask: Optional[np.ndarray] = None) -> "_Future":
        """att [R, feat] (or fewer than R regions: padded + masked).
        Shape errors raise HERE, on the submitting caller — never inside
        the batch worker where they would fail innocent co-batched
        requests."""
        att = np.asarray(att, self.feat_dtype)
        R = self.R
        feat = self.model.att_feat_size
        if att.ndim != 2 or att.shape[1] != feat or att.shape[0] > R:
            raise ValueError(
                f"features must be [<= {R} regions, {feat}], got "
                f"{att.shape}")
        n_rows = att.shape[0]
        if att_mask is not None:
            att_mask = np.asarray(att_mask, np.float32).reshape(-1)
            if att_mask.shape[0] == n_rows and n_rows < R:
                att_mask = np.pad(att_mask, (0, R - n_rows))
            elif att_mask.shape[0] != R:
                raise ValueError(
                    f"att_mask must have {R} (or {n_rows}) entries, got "
                    f"{att_mask.shape[0]}")
        if n_rows < R:
            att = np.pad(att, ((0, R - n_rows), (0, 0)))
            if att_mask is None:
                att_mask = np.zeros(R, np.float32)
                att_mask[:n_rows] = 1.0
        req = _Request(att=att, att_mask=att_mask, t_submit=time.perf_counter())
        # the closed-check and enqueue are atomic under the lock: close()
        # drains under the same lock after setting _stop, so a request
        # either raises here or is guaranteed to be drained/served
        with self._lock:
            if self._stop.is_set():
                raise RuntimeError("CaptionServer is closed")
            self._q.put(req)
        return _Future(req, self)

    def _run(self):
        """Dispatch loop: batch -> upload -> async program dispatch.  The
        blocking result fetch happens on the COMPLETION thread so the next
        batch's host->device feature upload overlaps the in-flight decode
        (the upload dominates over thin links — e.g. the dev tunnel; see
        scripts/tpu_serve_smoke.py)."""
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait_s
            while len(batch) < self.buckets[-1]:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                self._dispatch_batch(batch)
            except BaseException as e:                # surfaced per request
                with self._lock:
                    self._inflight.difference_update(batch)
                for r in batch:
                    r.error = e
                    r.event.set()

    def _dispatch_batch(self, batch: List[_Request]):
        n = len(batch)
        with self._lock:
            self._inflight.update(batch)
        bucket = next(b for b in self.buckets if b >= n)
        prog = self._program(bucket)
        R = self.R
        att = np.zeros((bucket, R, batch[0].att.shape[-1]), self.feat_dtype)
        am = np.zeros((bucket, R), np.float32)
        for i, r in enumerate(batch):
            att[i] = r.att
            am[i] = 1.0 if r.att_mask is None else r.att_mask
        am[n:, 0] = 1.0          # pad rows: one live region keeps masks sane
        self._rng, k = jax.random.split(self._rng)
        att_j, am_j = jnp.asarray(att), jnp.asarray(am)
        if self._in_shard is not None:
            att_j = jax.device_put(att_j, self._in_shard)
            am_j = jax.device_put(am_j, self._in_shard)
        out = prog(att_j, am_j, k)               # async dispatch
        if self.pipeline:
            self._done_q.put((batch, bucket, out))   # fetched by completer
        else:
            self._finish(batch, bucket, out)

    def _complete(self):
        while not self._stop.is_set():
            try:
                batch, bucket, out = self._done_q.get(timeout=0.05)
            except queue.Empty:
                continue
            self._finish(batch, bucket, out)

    def _finish(self, batch: List[_Request], bucket: int, out):
        n = len(batch)
        try:
            seq = np.asarray(out["seq"])[:n]              # blocks: fetch
            sents = decode_sequence(self.ix_to_word, seq)
        except BaseException as e:
            with self._lock:
                self._inflight.difference_update(batch)
            for r in batch:
                r.error = e
                r.event.set()
            return
        t_done = time.perf_counter()
        with self._lock:
            self._inflight.difference_update(batch)
            for i, r in enumerate(batch):
                r.result = {"caption": sents[i], "seq": seq[i],
                            "batch": n, "bucket": bucket}
                self._lat_ms.append((t_done - r.t_submit) * 1e3)
                self._n_done += 1
                r.event.set()

    # ---- admin -----------------------------------------------------------

    def stats(self) -> Dict[str, float]:
        with self._lock:
            lat = sorted(self._lat_ms)
            n = self._n_done
        if not lat:
            return {"n": 0}
        return {"n": n,
                "p50_ms": lat[len(lat) // 2],
                "p95_ms": lat[min(len(lat) - 1, int(len(lat) * 0.95))],
                "max_ms": lat[-1]}

    def close(self, join_timeout: float = 60.0):
        """Stop the worker threads and fail every request still queued (or
        dispatched but unfetched) so no future blocks forever.  The drain is
        taken under the submit() lock (atomic with its closed-check), and
        repeats while a slow worker is still alive — a mid-compile
        _dispatch_batch can outlive the first join timeout and put into
        _done_q afterwards; whatever it still holds past ``join_timeout``
        is failed via the in-flight set."""
        self._stop.set()
        err = RuntimeError("CaptionServer closed before request completed")

        def drain():
            for q in (self._q, self._done_q):
                while True:
                    try:
                        item = q.get_nowait()
                    except queue.Empty:
                        break
                    reqs = [item] if isinstance(item, _Request) else item[0]
                    for r in reqs:
                        if not r.event.is_set():
                            r.error = err
                            r.event.set()

        deadline = time.monotonic() + join_timeout
        while time.monotonic() < deadline:
            self._worker.join(timeout=min(0.5, max(join_timeout, 0.05)))
            with self._lock:
                drain()
            if not self._worker.is_alive():
                break
        if self._completer is not None:
            self._completer.join(timeout=5)
        with self._lock:
            drain()
            # a worker/completer that outlived the deadline (e.g. a
            # cold-cache Mosaic compile mid-dispatch takes minutes) still
            # holds its batch locally where drain() can't see it — fail
            # those futures now so no caller blocks forever; a late
            # _finish() just finds the events already set
            for r in self._inflight:
                if not r.event.is_set():
                    r.error = err
                    r.event.set()
            self._inflight.clear()


class _Future:
    def __init__(self, req: _Request, srv: CaptionServer):
        self._req = req
        self._srv = srv

    def wait(self, timeout: Optional[float] = None) -> Dict[str, Any]:
        if not self._req.event.wait(timeout):
            raise TimeoutError("caption request timed out")
        if self._req.error is not None:
            raise self._req.error
        return self._req.result

    def caption(self, timeout: Optional[float] = None) -> str:
        return self.wait(timeout)["caption"]
