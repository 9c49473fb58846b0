"""BoFiCap: bound-and-fill captioner as a single flax module.

Covers the reference's transformer model families (all built by
``TransformerModel.make_model``, captioning/models/TransformerModel.py:1511-1624)
through one module parameterized by ``train_mode``:

  AIC/auto  — autoregressive captioner                     (:1287-1310)
  NAIC      — non-autoregressive bound+fill                (:97-175)
  SAIC      — semi-autoregressive (per-phrase fill)        (:242-322)
  UIC       — unified SA+NA, one shared decoder            (:386-587)
  UIC_ds    — separate SA / NA decoders                    (:590-741)
  UIC_s     — AR + SA + NA, three decoders                 (:744-859)
  UIC_u     — AR + SA + NA, one decoder                    (:862-975)

TPU-first re-expressions (none of these change the math, only its shape):

  * The teacher-forced bounding loop — O(max_phrase_num) full attention
    passes with per-sample Python mask mutation in the reference
    (:476-513, :532-565) — is ONE attention pass here: with N_len == 1 only
    the [LEN] row's output ever reaches the classifier heads, and each step's
    [LEN] query differs only by its visible key prefix, so all steps are
    stacked as extra query rows (``bound_teacher``).  For N_len != 1 a
    stacked-mask batch path reproduces the general semantics.
  * All masks are computed from ``phrase_length`` prefix sums on device
    (boficap_tpu/data/phrase_ops.py) instead of being carried as B×L×L
    host-built booleans.
  * Glancing training (GLAT, reference :437-464) uses a stop-gradient first
    decode and an on-device bernoulli re-reveal.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..constants import BOS, EOS, LEN, LENGTH_DIM, PAD, SYN_DIM
from ..data import phrase_ops as po
from .layers import (
    Decoder,
    DecoderLayer,
    Encoder,
    Generator,
    PositionalEncoding,
    TokenEmbed,
    causal_mask,
    dense_init,
    layer_norm,
    prefix_mask,
    sinusoid_table,
)

# decoder-stack role table: train_mode -> {role: stack_index}
DECODER_ROLES = {
    "AIC": {"A": 0},
    "auto": {"A": 0},
    "NNAIC": {"A": 0, "NA": 0},   # one stack serving train + fill decode
    "NAIC": {"NA": 0},
    "SAIC": {"SA": 0},
    "UIC": {"SA": 0, "NA": 0},
    "UIC_ds": {"SA": 0, "NA": 1},
    "UIC_s": {"A": 0, "SA": 1, "NA": 2},
    "UIC_u": {"A": 0, "SA": 0, "NA": 0},
    "PB_pad": {"PB": 0},
}


def decoder_roles(train_mode: str, role: str = None):
    """DECODER_ROLES lookup with the mismatch named instead of a bare
    KeyError — shared by setup, _decoder, and the fused-decode packers."""
    roles = DECODER_ROLES.get(train_mode)
    if roles is None:
        raise ValueError(f"unknown train_mode {train_mode!r} "
                         f"(known: {sorted(DECODER_ROLES)})")
    if role is None:
        return roles
    if role not in roles:
        raise ValueError(
            f"train_mode {train_mode!r} has no {role!r} decoder role "
            f"(has: {sorted(roles)}); pick an inference_mode this model "
            f"serves (A->AIC, SA->SAIC, NA->NAIC)")
    return roles[role]


class BoFiCap(nn.Module):
    tgt_vocab: int
    d_model: int = 512
    d_ff: int = 2048
    N_enc: int = 6
    N_dec: int = 6
    N_len: int = 1
    num_heads: int = 8
    dropout: float = 0.1
    drop_prob_lm: float = 0.5
    att_feat_size: int = 2048
    max_boxes: int = 100              # NNAIC length-head flatten width
    max_length: int = 20              # L; sequences are L+2 with bos/eos frame
    train_mode: str = "UIC"
    decoder_input_mode: str = "add"   # add | single | gate
    norm_mode: str = "copy"           # PB_pad input mode: copy|compress|complex
    remat: bool = False               # rematerialize enc/dec layers in bwd
    dtype: Any = jnp.float32

    # ------------------------------------------------------------------ setup
    def setup(self):
        L2 = self.max_length + 2
        self.att_embed = nn.Dense(self.d_model, kernel_init=dense_init,
                                  dtype=self.dtype, name="att_embed")
        self.att_drop = nn.Dropout(self.drop_prob_lm)
        self.encoder = Encoder(self.N_enc, self.d_model, self.d_ff,
                               self.num_heads, self.dropout, self.dtype,
                               remat=self.remat)
        roles = decoder_roles(self.train_mode)
        n_stacks = max(roles.values()) + 1
        self.decoders = [
            Decoder(self.N_dec, self.d_model, self.d_ff, self.num_heads,
                    self.dropout, self.dtype, remat=self.remat,
                    name=f"decoder{i}")
            for i in range(n_stacks)
        ]
        self.word_embed = TokenEmbed(self.tgt_vocab, self.d_model, self.dtype)
        self.syn_embed = TokenEmbed(SYN_DIM, self.d_model, self.dtype)
        self.posenc = PositionalEncoding(self.d_model, self.dropout,
                                         max(5000, L2), self.dtype)
        self.generator = Generator(self.tgt_vocab, self.dtype)

        # length/syntax predictor (reference LengthPredictor_UIC :333-383)
        self.lp_layers = [
            DecoderLayer(self.d_model, self.d_ff, self.num_heads,
                         self.dropout, self.dtype, name=f"lp{i}")
            for i in range(max(self.N_len, 1))
        ]
        self.lp_norm = layer_norm(self.dtype)
        self.len_head1 = nn.Dense(100, kernel_init=dense_init, dtype=self.dtype)
        self.len_head2 = nn.Dense(LENGTH_DIM, kernel_init=dense_init, dtype=self.dtype)
        self.syn_head1 = nn.Dense(100, kernel_init=dense_init, dtype=self.dtype)
        self.syn_head2 = nn.Dense(SYN_DIM, kernel_init=dense_init, dtype=self.dtype)
        self.lp_drop = nn.Dropout(self.dropout)

        if self.train_mode == "PB_pad":
            # the reference PB predictor owns a PRIVATE embedding table
            # (LengthPredictorPB_pad's word_embed, TransformerModel.py:
            # 1036-1040, constructed at :1617), separate from the decoder's
            # tgt_embed — kept separate here so trained reference PB
            # checkpoints convert exactly (utils/convert.py)
            self.lp_word_embed = TokenEmbed(self.tgt_vocab, self.d_model,
                                            self.dtype)

        if self.train_mode == "NNAIC":
            # whole-caption length head (reference LengthPredictor_NNAIC,
            # TransformerModel.py:1221-1250): per-box MLP -> flatten -> MLP
            self.nn_len_l1 = nn.Dense(self.max_length, kernel_init=dense_init,
                                      dtype=self.dtype)
            self.nn_len_l2 = nn.Dense(self.max_length, kernel_init=dense_init,
                                      dtype=self.dtype)

        if self.decoder_input_mode == "gate":
            self.sa_gate = nn.Dense(self.d_model, kernel_init=dense_init, dtype=self.dtype)
            self.na_gate = nn.Dense(self.d_model, kernel_init=dense_init, dtype=self.dtype)

    # ------------------------------------------------------------- primitives
    def embed_att(self, att_feats, deterministic=True):
        """2048-d region features -> d_model (reference att_embed,
        TransformerModel.py:1642-1647: Linear + ReLU + Dropout(drop_prob_lm))."""
        x = nn.relu(self.att_embed(att_feats.astype(self.dtype)))
        return self.att_drop(x, deterministic=deterministic)

    def encode(self, att_feats, att_masks=None, deterministic=True):
        """Region features + padding mask -> encoder memory [B, R, d]."""
        x = self.embed_att(att_feats, deterministic)
        src_mask = None if att_masks is None else att_masks.astype(bool)
        return self.encoder(x, src_mask, deterministic)

    def _decoder(self, role):
        return self.decoders[decoder_roles(self.train_mode, role)]

    def _lp_heads(self, h, deterministic=True):
        """[..., d] -> (length logprob [..., 20], syn logprob [..., 10])."""
        lh = self.lp_drop(nn.relu(self.len_head1(h)), deterministic=deterministic)
        len_lp = jax.nn.log_softmax(self.len_head2(lh).astype(jnp.float32), axis=-1)
        sh = self.lp_drop(nn.relu(self.syn_head1(h)), deterministic=deterministic)
        syn_lp = jax.nn.log_softmax(self.syn_head2(sh).astype(jnp.float32), axis=-1)
        return len_lp, syn_lp

    def _lp_embed(self, ids, use_syn: bool, deterministic=True):
        emb = self.syn_embed(ids) if use_syn else self.word_embed(ids)
        return self.posenc(emb, deterministic=deterministic)

    # --------------------------------------------------------------- bounding
    def bound_teacher(self, ids, phrase_length, memory, src_mask,
                      use_syn: bool, deterministic=True):
        """Teacher-forced bounding: all steps in one pass.

        ids: [B, L2] predictor input tokens (word seq with [LEN] at 0 for the
        SA branch, extend_phrase_syn_seq for the NA branch).  Returns
        (len_logprob, syn_logprob) of shape [B, S, .] where S = L+1 — slot k
        is the prediction made after seeing phrases 1..k (the reference's
        sliced ``predict_*_logprob[:, 1:, :]``).
        """
        L2 = ids.shape[-1]
        S = self.max_length + 1
        y = self._lp_embed(ids, use_syn, deterministic)           # [B, L2, d]
        prefixes = po.bound_prefixes(phrase_length, S)            # [B, S]

        if self.N_len == 1:
            # only the [LEN] row reaches the heads; its query embedding is the
            # same at every step, so steps become stacked query rows.
            q = jnp.broadcast_to(y[:, 0:1, :], (y.shape[0], S, y.shape[2]))
            mask = prefix_mask(prefixes, L2)                      # [B, S, L2]
            h = self.lp_layers[0](q, memory, src_mask, mask,
                                  deterministic, kv=y)
            h = self.lp_norm(h)
        elif self.N_len == 0:
            # single cross-attention sublayer: independent of the bound mask,
            # so every step produces the identical [LEN] representation.
            h1 = self.lp_layers[0].cross_only(y, memory, src_mask, deterministic)
            h0 = self.lp_norm(h1)[:, 0:1, :]
            h = jnp.broadcast_to(h0, (y.shape[0], S, y.shape[2]))
        else:
            # general path: stack the S step masks as a batch dimension
            masks = po.bound_step_masks(phrase_length, S, L2)     # [B, S, L2, L2]
            B = y.shape[0]
            ys = jnp.broadcast_to(y[:, None], (B, S, L2, y.shape[2]))
            ys = ys.reshape(B * S, L2, y.shape[2])
            ms = masks.reshape(B * S, L2, L2)
            R = memory.shape[1]
            mem = jnp.broadcast_to(memory[:, None], (B, S, R, memory.shape[2]))
            mem = mem.reshape(B * S, R, memory.shape[2])
            sm = None
            if src_mask is not None:
                sm = jnp.broadcast_to(src_mask[:, None], (B, S, R)).reshape(B * S, R)
            x = ys
            for layer in self.lp_layers:
                x = layer(x, mem, sm, ms, deterministic)
            h = self.lp_norm(x)[:, 0, :].reshape(B, S, -1)
        return self._lp_heads(h, deterministic)

    def bound_cache(self, memory, use_syn: bool = True):
        """Loop-invariant tensors for the fast inference bounding step
        (N_len == 1, every shipped config).

        Everything the per-step predictor recomputes in the reference's loop
        (TransformerModel.py:1828-1870) except the [LEN]-row state itself is
        invariant across bounding iterations:
          * cross-attention K/V are projections of the encoder memory,
          * with the SYN-vocab predictor input, self-attention key/value rows
            depend only on (token id, position) — a SYN_DIM x L2 lookup table
            (220 rows) replaces the per-step embed+norm+project of the whole
            [B, L2] sequence,
          * the [LEN] query row (id LEN at position 0) is one constant vector.
        The cached step is the same math, just hoisted out of the while_loop.
        """
        layer = self.lp_layers[0]
        kc, vc = layer.src_attn.project_kv(memory)
        L2 = self.max_length + 2
        pe = sinusoid_table(L2, self.d_model).astype(self.dtype)

        cache = {"kc": kc, "vc": vc}
        emb_mod = self.syn_embed if use_syn else self.word_embed
        if use_syn:
            y = emb_mod(jnp.arange(SYN_DIM))                  # [Vs, d] (x√d)
            y_vp = y[:, None, :] + pe[None, :, :]             # [Vs, L2, d]
            n = layer.sub0.norm_only(y_vp)
            cache["kt"] = layer.self_attn.wk(n)               # [Vs, L2, d]
            cache["vt"] = layer.self_attn.wv(n)
        # constant [LEN]-row query + its residual input
        x0 = emb_mod(jnp.full((1, 1), LEN))[0, 0] + pe[0]     # [d]
        n0 = layer.sub0.norm_only(x0[None, None, :])
        cache["qh"] = layer.self_attn.project_q(n0)           # [1, 1, H, Dh]
        cache["x0"] = x0
        return cache

    def bound_step_cached(self, cache, ids, prefix, src_mask,
                          deterministic=True, use_syn: bool = True):
        """``bound_step`` with the loop-invariant work hoisted into ``cache``
        (see ``bound_cache``).  Numerically identical at deterministic=True.
        """
        layer = self.lp_layers[0]
        B, L2 = ids.shape
        if "kt" in cache:
            pos = jnp.arange(L2)[None, :]
            kh = layer.self_attn._heads(cache["kt"][ids, pos])
            vh = layer.self_attn._heads(cache["vt"][ids, pos])
        else:
            # word-vocab predictor input (SAIC): table infeasible, project
            # the current sequence but still reuse qh/x0/cross K/V
            y = self._lp_embed(ids, use_syn, deterministic)
            n = layer.sub0.norm_only(y)
            kh, vh = layer.self_attn.project_kv(n)
        qh = jnp.broadcast_to(cache["qh"],
                              (B,) + cache["qh"].shape[1:])
        mask = prefix_mask(prefix, L2)[:, None, :]            # [B, 1, L2]
        att = layer.self_attn.attend(qh, kh, vh, mask, deterministic)
        x = cache["x0"][None, None, :] + layer.sub0.drop(
            att, deterministic=deterministic)
        n1 = layer.sub1.norm_only(x)
        q1 = layer.src_attn.project_q(n1)
        att1 = layer.src_attn.attend(q1, cache["kc"], cache["vc"], src_mask,
                                     deterministic)
        x = x + layer.sub1.drop(att1, deterministic=deterministic)
        x = layer.sub2(x, lambda y_: layer.ffn(y_, deterministic),
                       deterministic)
        h = self.lp_norm(x)[:, 0, :]
        return self._lp_heads(h, deterministic)

    def bound_step(self, ids, prefix, memory, src_mask, use_syn: bool,
                   deterministic=True):
        """One inference bounding step: predict the next phrase's (length, syn).

        ids: [B, L2] current predictor input; prefix: [B] visible prefix of
        the [LEN] query (the reference's ``last``).  Returns ([B,20], [B,10])
        log-probs.
        """
        L2 = ids.shape[-1]
        y = self._lp_embed(ids, use_syn, deterministic)
        if self.N_len == 1:
            q = y[:, 0:1, :]
            mask = prefix_mask(prefix, L2)[:, None, :]            # [B, 1, L2]
            h = self.lp_layers[0](q, memory, src_mask, mask, deterministic, kv=y)
            h = self.lp_norm(h)[:, 0, :]
        elif self.N_len == 0:
            h1 = self.lp_layers[0].cross_only(y, memory, src_mask, deterministic)
            h = self.lp_norm(h1)[:, 0, :]
        else:
            # full mask: rows were grown incrementally during decode; for
            # inference the reference's mask at this point gives row q >= 1
            # visibility of the phrase structure so far; we reproduce it from
            # the per-sample prefix (rows < prefix see keys < prefix, rows
            # beyond it see key 0 only — they are PAD inputs anyway, and with
            # N_len == 1 in every shipped config this path is exercised only
            # in tests).
            L2a = jnp.arange(L2)
            rowvis = jnp.where(L2a[None, :] < prefix[:, None], prefix[:, None], 1)
            rowvis = rowvis.at[:, 0].set(prefix)
            mask = L2a[None, None, :] < rowvis[:, :, None]
            x = y
            for layer in self.lp_layers:
                x = layer(x, memory, src_mask, mask, deterministic)
            h = self.lp_norm(x)[:, 0, :]
        return self._lp_heads(h, deterministic)

    # ---------------------------------------------------------------- filling
    def _mix_embed(self, word_seq, syn_seq, gate):
        """The decoder_input_mode add|single|gate word/syn embedding mix,
        WITHOUT positions (reference :520-530, :570-587) — shared by the
        full-frame and the windowed-SA input builders."""
        w = self.word_embed(word_seq)
        s = self.syn_embed(syn_seq)
        if self.decoder_input_mode == "add":
            return w + s
        if self.decoder_input_mode == "single":
            return w if gate == "sa" else s
        g = nn.sigmoid((self.sa_gate if gate == "sa" else self.na_gate)(
            jnp.concatenate([w, s], axis=-1)))
        return g * w + (1 - g) * s

    def _mix_inputs(self, word_seq, syn_seq, gate, deterministic=True):
        """decoder_input_mode add|single|gate (reference :520-530, :570-587)."""
        return self.posenc(self._mix_embed(word_seq, syn_seq, gate),
                           deterministic=deterministic)

    def mix_inputs_window(self, word_seq, syn_seq, pos_onehot, gate):
        """``_mix_inputs`` for a GATHERED window of decoder slots: embeds
        only the [B, W] window tokens instead of the full [B, L] frame and
        adds the positional rows selected by ``pos_onehot`` [B, W, L]
        (one-hot of each slot's absolute position — a [W, L] @ [L, d]
        matmul instead of a TPU-hostile row gather).  Inference only (no
        dropout); used by the windowed SA fill (decode/bound_fill.py)."""
        from .layers import sinusoid_np
        x = self._mix_embed(word_seq, syn_seq, gate)
        L = pos_onehot.shape[-1]
        pe = jnp.asarray(sinusoid_np(self.posenc.max_len, self.d_model)[:L])
        rows = jnp.einsum("bwl,ld->bwd", pos_onehot.astype(jnp.float32), pe)
        return x + rows.astype(x.dtype)

    def decode_sa(self, word_seq, syn_seq, memory, src_mask, tgt_mask,
                  deterministic=True):
        """SA fill: copied-word + syn input, blockwise mask. [B, L] -> [B, L, d]."""
        x = self._mix_inputs(word_seq, syn_seq, "sa", deterministic)
        return self._decoder("SA")(x, memory, src_mask, tgt_mask, deterministic)

    def decode_na(self, syn_seq, memory, src_mask, tgt_mask,
                  deterministic=True, glat_input=None):
        """NA fill: bos (or glanced) word + syn input. [B, L] -> [B, L, d]."""
        word_seq = (jnp.full(syn_seq.shape, BOS, dtype=jnp.int32)
                    if glat_input is None else glat_input)
        x = self._mix_inputs(word_seq, syn_seq, "na", deterministic)
        return self._decoder("NA")(x, memory, src_mask, tgt_mask, deterministic)

    def decode_a(self, word_seq, memory, src_mask, tgt_mask,
                 deterministic=True, syn_seq=None):
        """AR decode; UIC_s/u variants add syn embeddings (reference :832-834)."""
        if syn_seq is not None:
            x = self.posenc(self.word_embed(word_seq) + self.syn_embed(syn_seq),
                            deterministic=deterministic)
        else:
            x = self.posenc(self.word_embed(word_seq), deterministic=deterministic)
        return self._decoder("A")(x, memory, src_mask, tgt_mask, deterministic)

    def nnaic_length(self, memory, deterministic=True):
        """Whole-caption length prediction from padded memory -> argmax class
        (reference LengthPredictor_NNAIC.forward :1234-1250 — NOTE the
        reference argmaxes with .data, so this head receives NO gradient;
        replicated as-is)."""
        B, R, d = memory.shape
        if R > self.max_boxes:
            # reference asserts N <= max_boxes (:1240); more regions than
            # the head was built for would silently change nn_len_l2's
            # flattened input width
            raise ValueError(
                f"nnaic_length: {R} regions > max_boxes={self.max_boxes} "
                f"(the length head is built at max_boxes*max_length); raise "
                f"max_boxes in the config to cover the feature store")
        if R < self.max_boxes:
            memory = jnp.concatenate(
                [memory, jnp.zeros((B, self.max_boxes - R, d), memory.dtype)],
                axis=1)
        x = self.lp_drop(nn.relu(self.nn_len_l1(memory)),
                         deterministic=deterministic)
        x = x.reshape(B, -1)
        probs = jax.nn.softmax(self.nn_len_l2(x).astype(jnp.float32), -1)
        return jnp.argmax(probs, -1).astype(jnp.int32)

    # ---------------------------------------------------------------- PB_pad
    def pb_compress(self, labels, phrase_length, deterministic=True,
                    predictor: bool = False):
        """Per-slot compressed phrase embeddings: sum of the word embeddings
        inside each phrase (reference CompressEmbedding,
        TransformerModel.py:994-1013) — a one-hot segment-sum here instead of
        the reference's per-sample Python loops.  Slot 0 is the bos phrase.
        ``predictor=True`` uses the length predictor's private embedding
        table (the reference passes its LengthPredictorPB_pad.word_embed,
        :1085, vs the decode path's tgt_embed, :1168).
        Returns [B, L2, d] (slots past phrase_num are zero)."""
        L2 = labels.shape[1]
        table = self.lp_word_embed if predictor else self.word_embed
        emb = table(labels)                                 # [B, L2, d]
        ends = po.phrase_word_ends(phrase_length)           # [B, L2-1]
        pos = jnp.arange(L2)[None, :]
        # label position 0 -> slot 0; position p>=1 -> 1 + real slot of p-1
        k = jnp.sum((pos[:, 1:, None] - 1) >= ends[:, None, :], axis=-1)
        slot = jnp.concatenate(
            [jnp.zeros((k.shape[0], 1), k.dtype), 1 + k], axis=1)  # [B, L2]
        total = po.total_words(phrase_length)
        valid = (pos == 0) | (pos <= total[:, None])
        onehot = jax.nn.one_hot(jnp.where(valid, slot, L2 - 1), L2,
                                dtype=emb.dtype) * valid[..., None]
        return jnp.einsum("bld,blk->bkd", emb, onehot)

    def pb_length_predict(self, labels, phrase_num, phrase_length, memory,
                          src_mask, deterministic=True):
        """Per-slot next-phrase length log-probs (reference
        LengthPredictorPB_pad, TransformerModel.py:1032-1090): compressed
        phrase embeddings + pos enc through the predictor layers with a
        causal slot mask; slot j (having seen phrases 0..j) predicts phrase
        j+1's length.  Returns [B, L2, 20]."""
        L2 = labels.shape[1]
        x = self.posenc(self.pb_compress(labels, phrase_length,
                                         deterministic, predictor=True),
                        deterministic=deterministic)
        slot = jnp.arange(L2)
        pad_ok = slot[None, :] < phrase_num[:, None]
        mask = (pad_ok[:, None, :]
                & (slot[None, None, :] <= slot[None, :, None]))
        for layer in self.lp_layers:
            x = layer(x, memory, src_mask, mask, deterministic)
        h = self.lp_norm(x)
        lh = self.lp_drop(nn.relu(self.len_head1(h)),
                          deterministic=deterministic)
        return jax.nn.log_softmax(
            self.len_head2(lh).astype(jnp.float32), axis=-1)

    def pb_decode(self, packed_ids, packed_slot, labels, phrase_length,
                  memory, src_mask, packed_mask, deterministic=True,
                  norm_mode: Optional[str] = None,
                  return_hidden: bool = False):
        """Packed phrase-parallel decode (reference EncoderDecoderPB_pad
        .decode, TransformerModel.py:1138-1213).  packed_ids: copy-init word
        ids per packed position; packed_slot: phrase slot of each packed
        position (for compress/complex modes); packed_mask: [B, Lp, Lp]
        (padding & phrase-blockwise-causal).  Returns log-probs [B, Lp, V]
        (or the decoder hidden states [B, Lp, D] with ``return_hidden`` —
        the jit decode applies the vocab head only on the new column's
        window, decode/pb.py)."""
        norm_mode = norm_mode or self.norm_mode
        if norm_mode == "copy":
            x = self.word_embed(packed_ids)
        else:
            comp = self.pb_compress(labels, phrase_length, deterministic)
            gathered = jnp.take_along_axis(
                comp, packed_slot[..., None].astype(jnp.int32), axis=1)
            x = gathered if norm_mode == "compress" else                 gathered + self.word_embed(packed_ids)
        x = self.posenc(x, deterministic=deterministic)
        h = self._decoder("PB")(x, memory, src_mask, packed_mask,
                                deterministic)
        return h if return_hidden else self.generate(h)

    def init_ar_cache(self, memory, max_len: int):
        """KV cache for the AR decoder (cross-attn K/V projected once)."""
        return self._decoder("A").init_cache(memory, max_len)

    def ar_step(self, it, pos, cache, src_mask, deterministic=True,
                syn_t=None):
        """One KV-cached AR step: token ids ``it`` [B] at position ``pos`` ->
        (logprob [B, V], new cache).  The reference instead re-runs the full
        decoder on the growing prefix per step (TransformerModel.py:1791-1804,
        no KV cache)."""
        x = self.word_embed(it[:, None])
        if syn_t is not None:
            x = x + self.syn_embed(syn_t[:, None])
        x = self.posenc(x, deterministic=deterministic, offset=pos)
        h, cache = self._decoder("A").step(x, cache, pos, src_mask,
                                           deterministic)
        return self.generate(h)[:, 0], cache

    def generate(self, h):
        return self.generator(h)

    def generate_logits(self, h):
        return self.generator.logits(h)

    # ------------------------------------------------------------ train paths
    def __call__(self, att_feats, att_masks, labels, phrase_num=None,
                 phrase_length=None, phrase_syn=None, glat_p=-1.0,
                 deterministic=True) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward for the configured train_mode.

        All phrase tensors follow the collate conventions of phrase_ops;
        ``labels`` is the bos-framed [B, L2] row.  Returns a dict of
        log-probability tensors matching the reference's ``_forward`` outputs
        (TransformerModel.py:1713-1789).
        """
        memory = self.encode(att_feats, att_masks, deterministic)
        src_mask = None if att_masks is None else att_masks.astype(bool)
        return self.decode_train(memory, src_mask, labels, phrase_num,
                                 phrase_length, phrase_syn, glat_p,
                                 deterministic)

    def decode_train(self, memory, src_mask, labels, phrase_num=None,
                     phrase_length=None, phrase_syn=None, glat_p=-1.0,
                     deterministic=True) -> Dict[str, jnp.ndarray]:
        """Teacher-forced decode given precomputed encoder memory.

        When ``labels`` has seq_per_img× the memory's batch (the collate
        gives one image row per seq_per_img caption rows), memory and
        src_mask are repeated here — the reference instead repeats the RAW
        region features and runs the encoder seq_per_img times on identical
        inputs (TransformerModel.py:1694-1703); encoding once is a pure win.

        Caption rows from the collate are image-major (jnp.repeat order),
        which is exactly what the grouped cross-attention fold assumes —
        entered explicitly here (layers.grouped_cross_attention) so no
        other caller gets grouping by accidental shape coincidence.
        """
        from .layers import grouped_cross_attention
        with grouped_cross_attention():
            return self._decode_train(memory, src_mask, labels, phrase_num,
                                      phrase_length, phrase_syn, glat_p,
                                      deterministic)

    def _decode_train(self, memory, src_mask, labels, phrase_num=None,
                      phrase_length=None, phrase_syn=None, glat_p=-1.0,
                      deterministic=True) -> Dict[str, jnp.ndarray]:
        L = self.max_length
        # word-decoder passes keep the UN-repeated memory: DecoderLayer
        # groups the seq_per_img caption rows over one image's keys
        # (layers.DecoderLayer._cross — identical math, one cross K/V
        # projection per image).  The predictor paths (bound_teacher /
        # nnaic_length / pb_length_predict) stack their own query layouts
        # and keep the repeated view.
        mem_dec, srcm_dec = memory, src_mask
        if labels.shape[0] != memory.shape[0]:
            k = labels.shape[0] // memory.shape[0]
            memory = jnp.repeat(memory, k, axis=0)
            if src_mask is not None:
                src_mask = jnp.repeat(src_mask, k, axis=0)
        mode = self.train_mode
        out: Dict[str, jnp.ndarray] = {}

        if mode in ("AIC", "auto"):
            seq = labels[:, :-1]
            tgt = (seq != EOS) & (seq != PAD)
            tgt = tgt.at[:, 0].set(True)
            tgt_mask = tgt[:, None, :] & causal_mask(seq.shape[1])[None]
            h = self.decode_a(seq, mem_dec, srcm_dec, tgt_mask, deterministic)
            out["logprob"] = self.generate(h)
            return out

        if mode == "NNAIC":
            # naive NA: every input token is bos, key mask = non-eos/pad
            # (reference _forward NNAIC branch, TransformerModel.py:1737-1748)
            seq = labels[:, :-1]
            keep = (seq != EOS) & (seq != PAD)
            keep = keep.at[:, 0].set(True)
            new_seq = jnp.where(keep, BOS, PAD).astype(seq.dtype)
            h = self.decode_a(new_seq, mem_dec, srcm_dec, keep[:, None, :],
                              deterministic)
            out["logprob"] = self.generate(h)
            out["length_pred"] = self.nnaic_length(memory, deterministic)
            return out

        extend_syn = po.extend_syn_seq(phrase_length, phrase_syn, L)      # [B, L2]
        word_syn = extend_syn[:, 1:-1]                                    # [B, L]
        sa_mask = po.blockwise_mask(phrase_length, L)                     # [B, L, L]
        total = po.total_words(phrase_length)                             # [B]
        na_mask = (jnp.arange(L)[None, None, :] < total[:, None, None])   # rows all see < total
        na_mask = jnp.broadcast_to(na_mask, (labels.shape[0], L, L))

        if mode in ("SAIC", "UIC", "UIC_ds"):
            lp_words = labels.at[:, 0].set(LEN)
            sa_len_lp, sa_syn_lp = self.bound_teacher(
                lp_words, phrase_length, memory, src_mask, use_syn=False,
                deterministic=deterministic)
            copied = po.copy_init(labels, phrase_length, L)
            h_sa = self.decode_sa(copied, word_syn, mem_dec, srcm_dec, sa_mask,
                                  deterministic)
            out["sa_len_logprob"], out["sa_syn_logprob"] = sa_len_lp, sa_syn_lp
            out["sa_logprob"] = self.generate(h_sa)
            if mode == "SAIC":
                return out

        if mode in ("NAIC", "UIC", "UIC_ds"):
            na_len_lp, na_syn_lp = self.bound_teacher(
                extend_syn, phrase_length, memory, src_mask, use_syn=True,
                deterministic=deterministic)
            out["na_len_logprob"], out["na_syn_logprob"] = na_len_lp, na_syn_lp

            glanced = None
            # glat on/off is a TRACE-TIME decision: None or a concrete
            # negative float disables it; a traced value enables it (the
            # anneal rate changes per epoch without re-tracing the branch
            # structure)
            use_glat = glat_p is not None and not (
                isinstance(glat_p, (int, float)) and glat_p < 0)
            if use_glat:
                # glancing training (reference :437-464): no-grad NA decode,
                # mismatch-rate-scaled random re-reveal of gt tokens
                h0 = self.decode_na(word_syn, mem_dec, srcm_dec, na_mask,
                                    deterministic)
                pred = jnp.argmax(
                    jax.lax.stop_gradient(self.generate(h0)), axis=-1)
                real = labels[:, 1:-1]
                wmask = po.word_loss_mask(phrase_length, L)
                tokens_len = jnp.maximum(total.astype(jnp.float32), 1.0)
                same = jnp.sum((pred == real) & wmask, axis=-1)
                mismatch = (total - same) / tokens_len
                keep_prob = (mismatch * glat_p)[:, None] * wmask
                rng = self.make_rng("glat")
                keep = jax.random.uniform(rng, real.shape) < keep_prob
                glanced = jnp.where(keep, real, BOS)
                out["glat_mismatch"] = jnp.mean(mismatch)
            h_na = self.decode_na(word_syn, mem_dec, srcm_dec, na_mask,
                                  deterministic, glat_input=glanced)
            out["na_logprob"] = self.generate(h_na)
            return out

        if mode == "PB_pad":
            # packed layouts are batch-dependent and built on host (see
            # train/steps.py PB branch + data/pb_pack.py); this path exists
            # to initialize/trace every PB submodule with a dummy layout
            B = labels.shape[0]
            len_lp = self.pb_length_predict(labels, phrase_num,
                                            phrase_length, memory, src_mask,
                                            deterministic)
            dummy_ids = labels[:, 1:-1]
            dummy_slot = jnp.zeros_like(dummy_ids)
            dummy_mask = jnp.ones((B, L, L), bool)
            out["pb_len_logprob"] = len_lp
            out["pb_logprob"] = self.pb_decode(
                dummy_ids, dummy_slot, labels, phrase_length, mem_dec,
                srcm_dec, dummy_mask, deterministic)
            return out

        if mode in ("UIC_s", "UIC_u"):
            # one NA-style predictor + AR/SA/NA decodes (reference :772-788)
            len_lp, syn_lp = self.bound_teacher(
                extend_syn, phrase_length, memory, src_mask, use_syn=True,
                deterministic=deterministic)
            out["len_logprob"], out["syn_logprob"] = len_lp, syn_lp

            seq = labels[:, :-1]
            pad_keep = (seq != EOS) & (seq != PAD)
            pad_keep = pad_keep.at[:, 0].set(True)
            a_mask = (pad_keep[:, None, :] & causal_mask(seq.shape[1])[None])[:, 1:, 1:]
            h_a = self.decode_a(labels[:, :-2], mem_dec, srcm_dec, a_mask,
                                deterministic, syn_seq=word_syn)
            copied = po.copy_init(labels, phrase_length, L)
            h_sa = self.decode_sa(copied, word_syn, mem_dec, srcm_dec, sa_mask,
                                  deterministic)
            h_na = self.decode_na(word_syn, mem_dec, srcm_dec, na_mask,
                                  deterministic)
            out["a_logprob"] = self.generate(h_a)
            out["a_logits"] = self.generate_logits(h_a)
            out["sa_logprob"] = self.generate(h_sa)
            out["sa_logits"] = self.generate_logits(h_sa)
            out["na_logprob"] = self.generate(h_na)
            return out

        raise NotImplementedError(mode)


def build_model(cfg, vocab_size: int) -> BoFiCap:
    """Construct a BoFiCap module from a Config (reference models.setup)."""
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg.get("dtype", "float32")]
    return BoFiCap(
        tgt_vocab=vocab_size + 4,
        d_model=cfg.d_model,
        d_ff=cfg.d_ff,
        N_enc=cfg.N_enc,
        N_dec=cfg.N_dec,
        N_len=cfg.get("N_len", 0),
        num_heads=cfg.get("num_att_heads", 8),
        dropout=cfg.get("dropout", 0.1),
        drop_prob_lm=cfg.get("drop_prob_lm", 0.5),
        att_feat_size=cfg.att_feat_size,
        max_boxes=cfg.get("max_boxes", 100) or 100,
        max_length=cfg.get("max_length", 20) or 20,
        train_mode=cfg.get("train_mode", "AIC"),
        decoder_input_mode=cfg.get("decoder_input_mode", "add"),
        norm_mode=cfg.get("norm_mode", "copy") or "copy",
        remat=bool(cfg.get("remat", 0)),
        dtype=dtype,
    )
