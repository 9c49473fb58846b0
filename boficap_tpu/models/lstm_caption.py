"""LSTM captioner families: FC (Show&Tell), UpDown (Anderson et al. 2018),
AoANet (Huang et al. 2019).

The reference fork cannot construct these (captioning/models/__init__.py:14-24
raises for everything but 'transformer'), but its config corpus and the
upstream self-critical.pytorch lineage include fc/updown/aoa workloads —
re-implemented here from the published architectures, flax-native.

All three speak the SAME decode protocol as BoFiCap:

    encode(att_feats, att_masks)          -> memory
    init_ar_cache(memory, max_len)        -> carry (recurrent state pytree)
    ar_step(it, pos, cache, src_mask)     -> (logprob [B, V], carry)
    __call__(att, att_masks, labels, ...) -> {'logprob': [B, L+1, V]}

so boficap_tpu/decode/ar.py (KV/carry-cached sampling + batched beam search),
the XE train step, SCST, and eval_split all work unchanged.

fc features: computed as the masked mean of the region features (the
reference's own fallback when no fc store exists, dataloader.py:492-495).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..constants import BOS, EOS, PAD
from .layers import MASK_FILL, dense_init


def masked_mean(att_feats, att_masks):
    if att_masks is None:
        return att_feats.mean(1)
    m = att_masks.astype(att_feats.dtype)[..., None]
    return (att_feats * m).sum(1) / jnp.maximum(m.sum(1), 1e-6)


class LSTMCore(nn.Module):
    """One LSTM layer with input/output dropout."""
    rnn_size: int
    drop: float = 0.5
    dtype: Any = jnp.float32

    def setup(self):
        self.cell = nn.OptimizedLSTMCell(self.rnn_size, dtype=self.dtype)
        self.dropout = nn.Dropout(self.drop)

    def init_state(self, B):
        z = jnp.zeros((B, self.rnn_size), self.dtype)
        return (z, z)

    def __call__(self, state, x, deterministic=True):
        state, h = self.cell(state, x)
        return state, self.dropout(h, deterministic=deterministic)


class _ARMixin:
    """Shared AR training forward + sampling protocol driven by the concrete
    model's ``_carry_init`` / ``_step_core``."""

    def __call__(self, att_feats, att_masks, labels, phrase_num=None,
                 phrase_length=None, phrase_syn=None, glat_p=None,
                 deterministic=True, ss_prob: float = 0.0):
        memory = self.encode(att_feats, att_masks, deterministic)
        src_mask = None if att_masks is None else att_masks.astype(bool)
        if labels.shape[0] != memory.shape[0]:
            k = labels.shape[0] // memory.shape[0]
            memory = jnp.repeat(memory, k, axis=0)
            if src_mask is not None:
                src_mask = jnp.repeat(src_mask, k, axis=0)
        seq = labels[:, :-1]                     # [B, L+1] inputs
        B, T = seq.shape
        carry = self._carry_init(memory, deterministic)
        pre = self._precompute(memory)
        use_ss = ss_prob > 0.0
        ss_rng = self.make_rng("ss") if use_ss else None

        # static unroll (T = max_length + 1): submodule calls inside a raw
        # lax.scan leak linen tracers, and T is small enough that unrolling
        # costs little compile time while letting XLA pipeline the cells
        lps = []
        prev_lp = None
        for t in range(T):
            it = seq[:, t]
            if use_ss and t > 0:
                # scheduled sampling (reference AttModel.py:141-160): with
                # prob ss_prob feed the model's previous sample instead of gt
                k1 = jax.random.fold_in(ss_rng, t)
                flip = jax.random.uniform(k1, (B,)) < ss_prob
                sampled = jax.random.categorical(
                    jax.random.fold_in(k1, 1), prev_lp, axis=-1
                ).astype(it.dtype)
                it = jnp.where(flip, sampled, it)
            lp, carry = self._step_core(it, carry, memory, src_mask,
                                        deterministic, pre)
            prev_lp = lp
            lps.append(lp)
        return {"logprob": jnp.stack(lps, axis=1)}

    def _precompute(self, memory):
        """Loop-invariant projections of memory (p_att / ctx2att / decode
        attention K,V), computed ONCE per forward or decode instead of per
        AR step; arrays are [B, R, ...] so beam tiling's axis-0 gather
        (decode/ar.py:221) composes.  Models override."""
        return None

    def init_ar_cache(self, memory, max_len: int):
        del max_len
        # memory rides inside the cache so ar_step needs no extra plumbing
        return {"state": self._carry_init(memory, deterministic=True),
                "memory": memory, "pre": self._precompute(memory)}

    def ar_step(self, it, pos, cache, src_mask, deterministic=True,
                syn_t=None):
        del pos, syn_t
        lp, state = self._step_core(it, cache["state"], cache["memory"],
                                    src_mask, deterministic, cache["pre"])
        return lp, {"state": state, "memory": cache["memory"],
                    "pre": cache["pre"]}


class FCModel(_ARMixin, nn.Module):
    """Show&Tell-style FC-LSTM: image embedding feeds the LSTM once, then
    pure language modeling."""
    tgt_vocab: int
    d_model: int = 512
    rnn_size: int = 512
    drop_prob_lm: float = 0.5
    max_length: int = 20
    train_mode: str = "AIC"
    dtype: Any = jnp.float32

    def setup(self):
        self.img_embed = nn.Dense(self.d_model, kernel_init=dense_init,
                                  dtype=self.dtype)
        self.embed = nn.Embed(self.tgt_vocab, self.d_model, dtype=self.dtype)
        self.core = LSTMCore(self.rnn_size, self.drop_prob_lm, self.dtype)
        self.logit = nn.Dense(self.tgt_vocab, kernel_init=dense_init,
                              dtype=self.dtype)

    def encode(self, att_feats, att_masks=None, deterministic=True):
        """memory = [B, 1, d] image embedding (FC uses no attention)."""
        fc = masked_mean(att_feats.astype(self.dtype), att_masks)
        return self.img_embed(fc)[:, None, :]

    def _carry_init(self, memory, deterministic=True):
        """Feed the image embedding as the pre-bos LSTM input (Show&Tell's
        x_{-1} = CNN(I))."""
        B = memory.shape[0]
        state = self.core.init_state(B)
        state, _ = self.core(state, memory[:, 0], deterministic)
        return state

    def _step_core(self, it, state, memory, src_mask, deterministic=True,
                   pre=None):
        del memory, src_mask, pre
        x = self.embed(it)
        state, h = self.core(state, x, deterministic)
        lp = jax.nn.log_softmax(self.logit(h).astype(jnp.float32), -1)
        return lp, state


class Attention(nn.Module):
    """Additive (tanh) attention over region features
    (UpDown eq. 3-5)."""
    att_hid: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, att_feats, p_att_feats, att_masks=None):
        # p_att_feats: precomputed W_a * att_feats  [B, R, att_hid]
        ah = nn.Dense(self.att_hid, kernel_init=dense_init,
                      dtype=self.dtype, name="h2att")(h)
        dot = nn.Dense(1, kernel_init=dense_init, dtype=self.dtype,
                       name="alpha")(jnp.tanh(p_att_feats + ah[:, None, :]))
        dot = dot[..., 0].astype(jnp.float32)
        if att_masks is not None:
            dot = jnp.where(att_masks, dot, MASK_FILL)
        w = jax.nn.softmax(dot, -1).astype(att_feats.dtype)
        return (w[:, :, None] * att_feats).sum(1)


class UpDownModel(_ARMixin, nn.Module):
    """Bottom-up/top-down captioner: attention LSTM + language LSTM."""
    tgt_vocab: int
    d_model: int = 512           # word embedding size
    rnn_size: int = 512
    att_hid_size: int = 512
    att_feat_size: int = 2048
    drop_prob_lm: float = 0.5
    max_length: int = 20
    train_mode: str = "AIC"
    dtype: Any = jnp.float32

    def setup(self):
        self.att_embed = nn.Dense(self.rnn_size, kernel_init=dense_init,
                                  dtype=self.dtype)
        self.embed = nn.Embed(self.tgt_vocab, self.d_model, dtype=self.dtype)
        self.att_lstm = LSTMCore(self.rnn_size, self.drop_prob_lm, self.dtype)
        self.lang_lstm = LSTMCore(self.rnn_size, self.drop_prob_lm, self.dtype)
        self.p_att = nn.Dense(self.att_hid_size, kernel_init=dense_init,
                              dtype=self.dtype)
        self.attention = Attention(self.att_hid_size, self.dtype)
        self.logit = nn.Dense(self.tgt_vocab, kernel_init=dense_init,
                              dtype=self.dtype)

    def encode(self, att_feats, att_masks=None, deterministic=True):
        return nn.relu(self.att_embed(att_feats.astype(self.dtype)))

    def _carry_init(self, memory, deterministic=True):
        B = memory.shape[0]
        return {"att": self.att_lstm.init_state(B),
                "lang": self.lang_lstm.init_state(B)}

    def _precompute(self, memory):
        return {"p_att": self.p_att(memory)}

    def _step_core(self, it, state, memory, src_mask, deterministic=True,
                   pre=None):
        p_att = pre["p_att"] if pre is not None else self.p_att(memory)
        fc = masked_mean(memory, src_mask)
        h_lang_prev = state["lang"][1]
        x = jnp.concatenate([h_lang_prev, fc, self.embed(it)], -1)
        att_state, h_att = self.att_lstm(state["att"], x, deterministic)
        ctx = self.attention(h_att, memory, p_att, src_mask)
        lang_state, h_lang = self.lang_lstm(
            state["lang"], jnp.concatenate([ctx, h_att], -1), deterministic)
        lp = jax.nn.log_softmax(self.logit(h_lang).astype(jnp.float32), -1)
        return lp, {"att": att_state, "lang": lang_state}


class Att2in2Model(_ARMixin, nn.Module):
    """Att2in2 captioner (SCST, Rennie et al. 2017): a single LSTM whose
    cell candidate receives the attended context through its own projection
    (attention fed "into" the cell) with a 2-way maxout in_transform,
    attention reading the RAW region features.  Re-implemented from the
    published architecture; the reference fork ships a2i2*.yml configs
    (configs/a2i2.yml) and its AttModel.py:1-9 docstring still names
    Att2in2, but the class was stripped so the fork cannot construct them
    — this build can."""
    tgt_vocab: int
    d_model: int = 512           # word embedding size
    rnn_size: int = 512
    att_hid_size: int = 512
    drop_prob_lm: float = 0.5
    max_length: int = 20
    train_mode: str = "AIC"
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.tgt_vocab, self.d_model, dtype=self.dtype)
        self.i2h = nn.Dense(5 * self.rnn_size, kernel_init=dense_init,
                            dtype=self.dtype)
        self.h2h = nn.Dense(5 * self.rnn_size, kernel_init=dense_init,
                            dtype=self.dtype)
        self.a2c = nn.Dense(2 * self.rnn_size, kernel_init=dense_init,
                            dtype=self.dtype)
        self.ctx2att = nn.Dense(self.att_hid_size, kernel_init=dense_init,
                                dtype=self.dtype)
        self.attention = Attention(self.att_hid_size, self.dtype)
        self.logit = nn.Dense(self.tgt_vocab, kernel_init=dense_init,
                              dtype=self.dtype)
        self.dropout = nn.Dropout(self.drop_prob_lm)

    def encode(self, att_feats, att_masks=None, deterministic=True):
        # att2in attends over the raw (unprojected) region features
        return att_feats.astype(self.dtype)

    def _carry_init(self, memory, deterministic=True):
        B = memory.shape[0]
        z = jnp.zeros((B, self.rnn_size), self.dtype)
        return (z, z)

    def _precompute(self, memory):
        return {"p_att": self.ctx2att(memory)}

    def _step_core(self, it, state, memory, src_mask, deterministic=True,
                   pre=None):
        h_prev, c_prev = state
        p_att = pre["p_att"] if pre is not None else self.ctx2att(memory)
        att_res = self.attention(h_prev, memory, p_att, src_mask)
        s = self.i2h(self.embed(it)) + self.h2h(h_prev)
        R = self.rnn_size
        in_gate = nn.sigmoid(s[:, :R])
        forget_gate = nn.sigmoid(s[:, R:2 * R])
        out_gate = nn.sigmoid(s[:, 2 * R:3 * R])
        cand = s[:, 3 * R:] + self.a2c(att_res)
        in_transform = jnp.maximum(cand[:, :R], cand[:, R:])
        c = forget_gate * c_prev + in_gate * in_transform
        h = out_gate * jnp.tanh(c)
        h = self.dropout(h, deterministic=deterministic)
        lp = jax.nn.log_softmax(self.logit(h).astype(jnp.float32), -1)
        return lp, (h, c)


class AoA(nn.Module):
    """Attention-on-attention gate: GLU over [attended; query]."""
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, v):
        x = jnp.concatenate([v, q], -1)
        i = nn.Dense(self.d_model, kernel_init=dense_init, dtype=self.dtype,
                     name="info")(x)
        g = nn.sigmoid(nn.Dense(self.d_model, kernel_init=dense_init,
                                dtype=self.dtype, name="gate")(x))
        return i * g


class AoARefinerLayer(nn.Module):
    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        from .layers import MultiHeadAttention
        att = MultiHeadAttention(self.num_heads, self.d_model,
                                 0.1, self.dtype)(x, x, x, mask,
                                                  deterministic)
        x = nn.LayerNorm(dtype=self.dtype)(x + AoA(self.d_model,
                                                   self.dtype)(x, att))
        return x


class AoANet(_ARMixin, nn.Module):
    """Attention-on-attention captioner: AoA self-attn refiner over region
    features + LSTM decoder with AoA-gated multi-head attention."""
    tgt_vocab: int
    d_model: int = 512
    rnn_size: int = 512
    num_heads: int = 8
    N_enc: int = 6
    drop_prob_lm: float = 0.5
    max_length: int = 20
    train_mode: str = "AIC"
    dtype: Any = jnp.float32

    def setup(self):
        self.att_embed = nn.Dense(self.d_model, kernel_init=dense_init,
                                  dtype=self.dtype)
        self.refiner = [AoARefinerLayer(self.d_model, self.num_heads,
                                        self.dtype, name=f"ref{i}")
                        for i in range(self.N_enc)]
        self.embed = nn.Embed(self.tgt_vocab, self.d_model, dtype=self.dtype)
        self.core = LSTMCore(self.rnn_size, self.drop_prob_lm, self.dtype)
        from .layers import MultiHeadAttention
        self.dec_att = MultiHeadAttention(self.num_heads, self.d_model,
                                          0.0, self.dtype)
        self.dec_aoa = AoA(self.d_model, self.dtype)
        self.logit = nn.Dense(self.tgt_vocab, kernel_init=dense_init,
                              dtype=self.dtype)

    def encode(self, att_feats, att_masks=None, deterministic=True):
        x = nn.relu(self.att_embed(att_feats.astype(self.dtype)))
        mask = None if att_masks is None else att_masks.astype(bool)
        for layer in self.refiner:
            x = layer(x, mask, deterministic)
        return x

    def _carry_init(self, memory, deterministic=True):
        B = memory.shape[0]
        return {"state": self.core.init_state(B),
                "ctx": jnp.zeros((B, self.d_model), self.dtype)}

    def _precompute(self, memory):
        # decode attention K/V projections of the refined memory, once
        kh, vh = self.dec_att.project_kv(memory)
        return {"kh": kh, "vh": vh}

    def _step_core(self, it, carry, memory, src_mask, deterministic=True,
                   pre=None):
        if pre is None:
            kh, vh = self.dec_att.project_kv(memory)
        else:
            kh, vh = pre["kh"], pre["vh"]
        fc = masked_mean(memory, src_mask)
        x = jnp.concatenate([self.embed(it), fc + carry["ctx"]], -1)
        state, h = self.core(carry["state"], x, deterministic)
        qh = self.dec_att.project_q(h[:, None, :])
        att = self.dec_att.attend(qh, kh, vh, src_mask, deterministic)[:, 0]
        ctx = self.dec_aoa(h, att)
        lp = jax.nn.log_softmax(self.logit(ctx).astype(jnp.float32), -1)
        return lp, {"state": state, "ctx": ctx}
