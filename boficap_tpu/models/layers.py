"""Transformer primitives (flax.linen), architecture-parity with the
reference's annotated-transformer pieces (captioning/models/TransformerModel.py:
1312-1507) but TPU-idiomatic:

  * attention logits/softmax in float32, everything else in ``dtype``
    (bfloat16 by default) for MXU-friendly matmuls,
  * masks are bool "visible" tensors broadcast over heads; masked logits are
    filled with a large finite negative (the reference uses -inf, which it
    then has to guard with NaN checks at TransformerModel.py:1956-1958 —
    finite fill makes fully-masked rows produce a uniform, NaN-free softmax),
  * Xavier-uniform init for matrices (make_model's init, TransformerModel.py:
    1621-1623).
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

MASK_FILL = -1e9

dense_init = nn.initializers.xavier_uniform()

# global perf toggle (set from cfg.use_pallas at model build; read at trace
# time): route eligible attention calls through the fused pallas core
PALLAS_ATTENTION = {"enabled": False, "interpret": False}

# attention-map capture (the reference's ``glo`` accumulator,
# utils/glo.py + TransformerModel.py:1461-1462, fed when draw=True): when
# enabled, every unfused attention call sows its probs into the
# 'intermediates' collection (apply with mutable=["intermediates"])
CAPTURE_ATTENTION = {"enabled": False}

# grouped cross-attention opt-in (trace-time toggle, set by
# BoFiCap.decode_train): when ON, a cross-attention whose query batch is
# k x the memory batch folds the k caption rows of each image into the
# query-length axis over that image's keys — valid ONLY for image-major
# (jnp.repeat-order) caption rows.  When OFF (the default), a batch
# mismatch raises instead of silently grouping a caller whose rows might
# be interleaved differently (e.g. jnp.tile order), which would compute
# the wrong attention without any shape error.
GROUPED_XATTN = {"enabled": False}


@contextlib.contextmanager
def grouped_cross_attention(enabled: bool = True):
    """Enable the image-major grouped cross-attention fold within a trace
    scope.  The caller asserts its caption rows are image-major."""
    prev = GROUPED_XATTN["enabled"]
    GROUPED_XATTN["enabled"] = enabled
    try:
        yield
    finally:
        GROUPED_XATTN["enabled"] = prev


def set_pallas_attention(enabled: bool, interpret: bool = False):
    PALLAS_ATTENTION["enabled"] = enabled
    PALLAS_ATTENTION["interpret"] = interpret


def set_capture_attention(enabled: bool):
    CAPTURE_ATTENTION["enabled"] = enabled


class MultiHeadAttention(nn.Module):
    """Scaled dot-product MHA (reference TransformerModel.py:1421-1467).

    Exposes ``project_q`` / ``project_kv`` / ``attend`` separately so the
    KV-cached autoregressive decode path can update per-step caches without
    re-projecting the whole prefix."""

    num_heads: int
    d_model: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.wq = nn.Dense(self.d_model, kernel_init=dense_init,
                           dtype=self.dtype, name="wq")
        self.wk = nn.Dense(self.d_model, kernel_init=dense_init,
                           dtype=self.dtype, name="wk")
        self.wv = nn.Dense(self.d_model, kernel_init=dense_init,
                           dtype=self.dtype, name="wv")
        self.wo = nn.Dense(self.d_model, kernel_init=dense_init,
                           dtype=self.dtype, name="wo")
        self.drop = nn.Dropout(self.dropout_rate)

    def _heads(self, x):
        # heads stay in [B, L, H, Dh] layout — attention einsums contract
        # directly from it, avoiding the [B,H,L,Dh] transposes (a measured
        # ~15% of decode-layer device time at BoFiCap's tiny L; the MXU gets
        # the same contractions either way)
        B, L, _ = x.shape
        H = self.num_heads
        return x.reshape(B, L, H, self.d_model // H)

    def project_q(self, x):
        return self._heads(self.wq(x))

    def project_kv(self, x):
        return self._heads(self.wk(x)), self._heads(self.wv(x))

    def attend(self, qh, kh, vh, mask=None, deterministic: bool = True):
        """qh [B,Lq,H,Dh], kh/vh [B,Lk,H,Dh]; mask [B,Lk] | [B,Lq,Lk] | 4-D
        (broadcastable over [B,H,Lq,Lk])."""
        B, Lq, H, Dh = qh.shape
        Lk = kh.shape[1]
        if (PALLAS_ATTENTION["enabled"] and deterministic
                and not CAPTURE_ATTENTION["enabled"]
                and mask is not None and mask.ndim in (2, 3)):
            # fused scores+mask+softmax+context kernel (ops/pallas_attention);
            # inference-only: attention-prob dropout needs the unfused path,
            # and capture needs the probs materialized (the kernel never
            # forms them) — attention dumps force the unfused path
            from ..ops.pallas_attention import attention_core
            m3 = (jnp.broadcast_to(mask[:, None, :], (B, Lq, Lk))
                  if mask.ndim == 2 else mask)
            out = attention_core(qh.transpose(0, 2, 1, 3),
                                 kh.transpose(0, 2, 1, 3),
                                 vh.transpose(0, 2, 1, 3), m3,
                                 interpret=PALLAS_ATTENTION["interpret"])
            out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.d_model)
            return self.wo(out)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / math.sqrt(Dh)
        if mask is not None:
            if mask.ndim == 2:       # [B, Lk] padding mask
                mask = mask[:, None, None, :]
            elif mask.ndim == 3:     # [B, Lq, Lk]
                mask = mask[:, None, :, :]
            scores = jnp.where(mask, scores, MASK_FILL)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        if CAPTURE_ATTENTION["enabled"]:
            self.sow("intermediates", "attn", probs)
        probs = self.drop(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        out = out.reshape(B, Lq, self.d_model)
        return self.wo(out)

    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        qh = self.project_q(q)
        kh = self._heads(self.wk(k))
        vh = self._heads(self.wv(v))
        return self.attend(qh, kh, vh, mask, deterministic)


class PositionwiseFFN(nn.Module):
    """d -> d_ff -> d with relu + dropout (reference :1469-1478)."""

    d_model: int
    d_ff: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_ff, kernel_init=dense_init, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, kernel_init=dense_init, dtype=self.dtype)(h)


class RefLayerNorm(nn.Module):
    """LayerNorm matching the reference exactly (annotated-transformer
    LayerNorm, TransformerModel.py:1338-1349):

        y = scale * (x - mean) / (std + eps) + bias

    with UNBIASED std (torch ``x.std(-1)`` divides by n-1) and eps added to
    the std, not the variance.  flax's nn.LayerNorm (biased variance, eps
    inside the sqrt) differs by ~sqrt(d/(d-1)) — an ~1% systematic error that
    breaks checkpoint-level parity."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        xf = x.astype(jnp.float32)
        # ONE-pass moments: mean and mean-of-squares are independent
        # sibling reductions XLA fuses into a single sweep over x, where
        # the naive centered form forces two dependent sweeps (mean, then
        # (x - mean)^2) — LN reductions were ~8 ms of the 93.5 ms XE step
        # (BENCH_NOTES.md r3 profile).  Semantics unchanged: unbiased
        # variance (n/(n-1) correction) with eps added to the STD, exactly
        # torch x.std(-1).  SHIFTED one-pass form: the raw E[x^2]-E[x]^2
        # rearrangement cancels catastrophically when |mean| >> std
        # (relative error ~ (mean^2/var)*f32-eps); subtracting a cheap
        # per-row offset (the row's first element) before squaring keeps
        # the single fused sweep — the shift is a broadcast sub, and the
        # two reductions stay siblings — while bounding the cancellation:
        # |mean - x0| is O(row spread), so the error stays ~1e-6 relative
        # even for activations with a large common offset.  Variance is
        # shift-invariant; mean(xs) = mean(x) - x0 exactly cancels in the
        # normalized output.
        s = jax.lax.stop_gradient(xf[..., :1])
        xs = xf - s
        m1 = xs.mean(-1, keepdims=True)
        m2 = (xs * xs).mean(-1, keepdims=True)
        var = jnp.maximum(m2 - m1 * m1, 0.0) * (d / max(d - 1, 1))
        y = (xs - m1) / (jnp.sqrt(var) + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        return (y * scale + bias).astype(self.dtype)


def layer_norm(dtype):
    return RefLayerNorm(epsilon=1e-6, dtype=dtype)


class PreNormResidual(nn.Module):
    """x + dropout(f(norm(x))) (reference SublayerConnection :1351-1363)."""

    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm = layer_norm(self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, fn, deterministic: bool = True):
        return x + self.drop(fn(self.norm(x)), deterministic=deterministic)

    def norm_only(self, x):
        return self.norm(x)


class EncoderLayer(nn.Module):
    d_model: int
    d_ff: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.num_heads, self.d_model,
                                            self.dropout_rate, self.dtype)
        self.ffn = PositionwiseFFN(self.d_model, self.d_ff, self.dropout_rate, self.dtype)
        self.sub0 = PreNormResidual(self.dropout_rate, self.dtype)
        self.sub1 = PreNormResidual(self.dropout_rate, self.dtype)

    def __call__(self, x, mask, deterministic: bool = True):
        x = self.sub0(x, lambda y: self.self_attn(y, y, y, mask, deterministic),
                      deterministic)
        return self.sub1(x, lambda y: self.ffn(y, deterministic), deterministic)


class Encoder(nn.Module):
    """N-layer self-attention encoder over region features (reference :1325-1336).

    ``remat``: rematerialize each layer in the backward pass
    (jax.checkpoint via nn.remat) — activations are recomputed instead of
    stored, trading ~1/3 extra forward FLOPs for O(layers) less training
    memory.  Parameter tree and numerics are unchanged (tested); inference
    is unaffected (remat only alters gradient computation)."""

    num_layers: int
    d_model: int
    d_ff: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        Layer = (nn.remat(EncoderLayer, static_argnums=(3,))
                 if self.remat else EncoderLayer)
        for i in range(self.num_layers):
            x = Layer(self.d_model, self.d_ff, self.num_heads,
                      self.dropout_rate, self.dtype, name=f"layer{i}")(
                x, mask, deterministic)
        return layer_norm(self.dtype)(x)


class DecoderLayer(nn.Module):
    """self-attn + cross-attn + ffn; generic over any bool tgt mask
    (this generality is what lets one decoder serve AR/SA/NA — reference
    :1398-1413).  Also reused as the length-predictor layer (:1016-1029)."""

    d_model: int
    d_ff: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.num_heads, self.d_model,
                                            self.dropout_rate, self.dtype)
        self.src_attn = MultiHeadAttention(self.num_heads, self.d_model,
                                           self.dropout_rate, self.dtype)
        self.ffn = PositionwiseFFN(self.d_model, self.d_ff, self.dropout_rate, self.dtype)
        self.sub0 = PreNormResidual(self.dropout_rate, self.dtype)
        self.sub1 = PreNormResidual(self.dropout_rate, self.dtype)
        self.sub2 = PreNormResidual(self.dropout_rate, self.dtype)

    def __call__(self, x, memory, src_mask, tgt_mask, deterministic: bool = True,
                 kv=None):
        """``kv`` (optional) supplies distinct self-attention keys/values —
        used by the fast bounding path where the queries are S copies of the
        [LEN] row but keys are the full sequence (normed with the SAME params,
        so this is numerically identical to the reference's per-step pass)."""
        if kv is None:
            x = self.sub0(x, lambda y: self.self_attn(y, y, y, tgt_mask,
                                                      deterministic), deterministic)
        else:
            nkv = self.sub0.norm_only(kv)
            x = self.sub0(x, lambda y: self.self_attn(y, nkv, nkv, tgt_mask,
                                                      deterministic), deterministic)
        x = self.sub1(x, lambda y: self._cross(y, memory, src_mask,
                                               deterministic), deterministic)
        return self.sub2(x, lambda y: self.ffn(y, deterministic), deterministic)

    def _cross(self, y, memory, src_mask, deterministic: bool):
        """Cross-attention, GROUPED when the query batch is a multiple of
        the memory batch (teacher-forced training passes the encoder memory
        UN-repeated: one image row serves its seq_per_img caption rows).

        The g caption rows of an image are folded into the query-length
        axis ([B*g, L, d] -> [B, g*L, d]) over that image's [R] keys —
        row-for-row identical to repeating the memory (softmax rows are
        independent), but the K/V projections run once per image instead
        of g times and XLA stops materializing g copies of the memory's
        K/V head layout (a measured ~20% of XE-step device time was these
        [B*g, R, H, Dh] relayout copies + repeated projections).  Row
        order matches jnp.repeat (caption rows are image-major).  With
        attention capture on, the sown probs for a grouped pass are
        [B, H, g*L, R] (same numbers, folded layout).

        Grouping is OPT-IN via layers.grouped_cross_attention() (which
        decode_train enters): a caller with a different row interleave
        (jnp.tile order) would silently get wrong grouping under pure
        shape inference, so a batch mismatch without the opt-in raises."""
        B = memory.shape[0]
        if y.shape[0] != B:
            if not (GROUPED_XATTN["enabled"] and y.shape[0] % B == 0):
                raise ValueError(
                    f"cross-attention query batch {y.shape[0]} != memory "
                    f"batch {B}: either repeat the memory to match, or — "
                    "for image-major (jnp.repeat-order) caption rows — "
                    "opt in with layers.grouped_cross_attention()")
            yr = y.reshape(B, -1, y.shape[-1])
            out = self.src_attn(yr, memory, memory, src_mask, deterministic)
            return out.reshape(y.shape)
        return self.src_attn(y, memory, memory, src_mask, deterministic)

    def cross_only(self, x, memory, src_mask, deterministic: bool = True):
        """N_len == 0 predictor variant: one cross-attention sublayer
        (reference LengthPredictor_*.__init__ N_len==0 branch)."""
        return self.sub0(x, lambda y: self.src_attn(y, memory, memory, src_mask,
                                                    deterministic), deterministic)

    def init_cache(self, memory, max_len: int):
        """Per-layer KV cache: zeroed self-attn K/V of width ``max_len`` plus
        the cross-attn K/V of the encoder memory projected ONCE (the
        reference re-runs the full decoder per AR step with no cache,
        TransformerModel.py:1791-1804 — the cache is a free win on TPU)."""
        B = memory.shape[0]
        H = self.num_heads
        Dh = self.d_model // H
        kc, vc = self.src_attn.project_kv(memory)
        z = jnp.zeros((B, max_len, H, Dh), dtype=kc.dtype)
        return {"ks": z, "vs": z, "kc": kc, "vc": vc}

    def step(self, x_t, cache, pos, src_mask, deterministic: bool = True):
        """One causal decode step.  x_t [B, 1, d]; pos is the 0-based position
        of this token.  Returns (out_t [B, 1, d], new cache)."""
        n = self.sub0.norm_only(x_t)
        kh, vh = self.self_attn.project_kv(n)
        ks = jax.lax.dynamic_update_slice_in_dim(cache["ks"], kh, pos, axis=1)
        vs = jax.lax.dynamic_update_slice_in_dim(cache["vs"], vh, pos, axis=1)
        Lmax = ks.shape[1]
        vis = (jnp.arange(Lmax) <= pos)[None, None, None, :]
        qh = self.self_attn.project_q(n)
        att = self.self_attn.attend(qh, ks, vs, vis, deterministic)
        x = x_t + self.sub0.drop(att, deterministic=deterministic)

        n1 = self.sub1.norm_only(x)
        q1 = self.src_attn.project_q(n1)
        att1 = self.src_attn.attend(q1, cache["kc"], cache["vc"], src_mask,
                                    deterministic)
        x = x + self.sub1.drop(att1, deterministic=deterministic)
        x = self.sub2(x, lambda y: self.ffn(y, deterministic), deterministic)
        return x, {"ks": ks, "vs": vs, "kc": cache["kc"], "vc": cache["vc"]}


class Decoder(nn.Module):
    """N DecoderLayers + final norm (reference :1379-1396)."""

    num_layers: int
    d_model: int
    d_ff: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False   # see Encoder.remat — backward-pass recompute

    def setup(self):
        # nn.remat transforms only __call__; init_cache/step (the KV-cached
        # inference paths) are untouched, and remat itself is a no-op
        # outside differentiation, so decode behavior is identical
        Layer = (nn.remat(DecoderLayer, static_argnums=(5,))
                 if self.remat else DecoderLayer)
        self.layers = [
            Layer(self.d_model, self.d_ff, self.num_heads,
                  self.dropout_rate, self.dtype, name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        self.norm = layer_norm(self.dtype)

    def __call__(self, x, memory, src_mask, tgt_mask, deterministic: bool = True):
        for layer in self.layers:
            x = layer(x, memory, src_mask, tgt_mask, deterministic)
        return self.norm(x)

    def init_cache(self, memory, max_len: int):
        return [layer.init_cache(memory, max_len) for layer in self.layers]

    def step(self, x_t, caches, pos, src_mask, deterministic: bool = True):
        new = []
        for layer, cache in zip(self.layers, caches):
            x_t, c = layer.step(x_t, cache, pos, src_mask, deterministic)
            new.append(c)
        return self.norm(x_t), new


class TokenEmbed(nn.Module):
    """Embedding scaled by sqrt(d) (reference Embeddings :1480-1487)."""

    vocab: int
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        emb = nn.Embed(self.vocab, self.d_model,
                       embedding_init=nn.initializers.xavier_uniform(),
                       dtype=self.dtype)(ids)
        return emb * math.sqrt(self.d_model)


@functools.lru_cache(maxsize=16)
def sinusoid_np(max_len: int, d_model: int) -> "np.ndarray":
    """Host-built sinusoid table.  Building it on HOST matters: a traced
    jnp construction is NOT constant-folded by XLA (the [5000, 512] scatter
    build re-executed ~0.7 ms/decode inside the SA while_loop, measured);
    a numpy array embeds as a literal the compiler hoists once."""
    import numpy as np
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def sinusoid_table(max_len: int, d_model: int) -> jnp.ndarray:
    return jnp.asarray(sinusoid_np(max_len, d_model))


# rows embedded for a TRACED offset (KV-cached AR steps): caption positions
# never approach this, and it keeps the program constant at 1 MB instead of
# the full max_len table
_PE_DYN_ROWS = 512


class PositionalEncoding(nn.Module):
    """Sinusoidal PE + dropout (reference :1489-1507).

    ``offset`` lets single-token decode steps pick the right row.
    """

    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, offset=0):
        import numpy as np
        L = x.shape[-2]
        if isinstance(offset, (int, np.integer)):
            pe = jnp.asarray(
                sinusoid_np(self.max_len, self.d_model)[offset:offset + L])
        else:  # traced offset (ar_step position inside a while_loop)
            rows = min(self.max_len, _PE_DYN_ROWS)
            table = jnp.asarray(sinusoid_np(self.max_len, self.d_model)[:rows])
            pe = jax.lax.dynamic_slice_in_dim(table, offset, L, axis=0)
        x = x + pe.astype(x.dtype)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class Generator(nn.Module):
    """Linear d -> vocab, log_softmax in f32 (reference :1312-1319)."""

    vocab: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.proj = nn.Dense(self.vocab, kernel_init=dense_init, dtype=self.dtype)

    def __call__(self, x):
        return jax.nn.log_softmax(self.logits(x), axis=-1)

    def logits(self, x):
        return self.proj(x).astype(jnp.float32)


def causal_mask(L: int) -> jnp.ndarray:
    """[L, L] lower-triangular visibility (reference subsequent_mask :1415-1419)."""
    return jnp.tril(jnp.ones((L, L), dtype=bool))


def prefix_mask(prefix: jnp.ndarray, Lk: int) -> jnp.ndarray:
    """[..., Lk] visibility: key < prefix[...]. prefix int [...]."""
    key = jnp.arange(Lk).reshape((1,) * prefix.ndim + (Lk,))
    return key < prefix[..., None]
