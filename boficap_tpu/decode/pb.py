"""PB_pad inference (reference corePB_pad, TransformerModel.py:2123-2146 +
the AttModel PB sample loop, AttModel.py:469-517).

Two implementations:

* ``pb_decode`` — ONE ``lax.while_loop`` program.  The reference's packed
  layout has a batch-dependent width (sum of per-column batch maxima), which
  is why its own assembly is host-side numpy (TransformerModel.py:1138-1213).
  The key observation that makes a static-shape re-expression possible: the
  batch advances in LOCKSTEP (every alive sample appends exactly one phrase
  per round), so the packed layout is append-only — column j's width is
  fixed the round it is created and its start offset never moves.  The
  layout therefore lives in a static ``[B, W]`` buffer (W = a packed-width
  cap, default ``2 * (max_length + 2)``) whose column starts/ids are
  computed per round from prefix sums; the copy-init word map is the same
  closed form as phrase_ops.copy_init_src_indices.  The clamp is PER
  SAMPLE: a sample whose planned phrase would spill past W ends generation
  there; batchmates that fit keep decoding (documented deviation from the
  unbounded host layout).  The packed width grows with batch size (it sums
  per-round BATCH maxima), so mis-aligned batches can exceed the default
  cap; ``packed_width=max_length*(max_length+1)//2 + 1`` is a provable
  upper bound that makes the clamp unreachable (exposed as the
  ``pb_packed_width`` eval option).

* ``pb_decode_host`` — the original host-driven loop (jit'd model pieces per
  step, one compile per distinct packed width).  Kept as the test oracle for
  the while_loop version (greedy decode is bit-equivalent; sampled decodes
  see different rng consumption because the host path draws over a [B, Lp]
  tensor whose width varies per round).

Reference defect NOT replicated: corePB_pad packs the decoder with the
CURRENT phrase lengths, so the column for the not-yet-generated phrase has
zero width and the sample loop breaks on the first step with an empty logits
tensor (AttModel.py:507-508 `if phrase_logprobs.shape[1] == 0: break`).
Here the predicted next length is appended to a working copy of the plan
BEFORE packing, which is the evidently intended semantics (it is exactly the
training-time layout for the next phrase).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BOS
from ..data.pb_pack import pack_decoder_inputs
from .sampling import sample_next_word


def pb_decode_host(model, params, rng, att_feats, att_masks, *,
                   sample_method: str = "greedy", temperature: float = 1.0,
                   pad_to: int | None = None) -> Dict[str, Any]:
    """Returns {'seq': [B, L], 'phrase_num': [B], 'phrase_length': [B, L]}
    (frames match the reference's returns, AttModel.py:516-517).

    ``pad_to``: pad every round's packed tensors to this fixed width (ids and
    slot with zeros, mask with False).  The padded keys carry zero attention
    weight, so results are mathematically identical — but running the SAME
    physical width as ``pb_decode``'s static buffer makes XLA's reduction
    order identical too, which is what lets the equivalence test assert
    bit-equal greedy decodes (different widths round float ties differently).
    """
    L = model.max_length
    L2 = L + 2
    B = att_feats.shape[0]

    @jax.jit
    def encode(a, m):
        return model.apply(params, a, m, deterministic=True,
                           method="encode")

    @jax.jit
    def predict_len(labels, pn, pl, memory, src_mask):
        return model.apply(params, labels, pn, pl, memory, src_mask, True,
                           method="pb_length_predict")

    @jax.jit
    def decode_packed(ids, slot, labels, pl, memory, src_mask, mask):
        return model.apply(params, ids, slot, labels, pl, memory, src_mask,
                           mask, True, method="pb_decode")

    memory = encode(jnp.asarray(att_feats), jnp.asarray(att_masks))
    src_mask = jnp.asarray(att_masks).astype(bool)

    seq = np.zeros((B, L2), np.int64)
    seq[:, 0] = BOS
    pl = np.zeros((B, L2), np.int64)
    pl[:, 0] = 1
    pn = np.ones(B, np.int64)            # includes the bos phrase
    cur_start = np.ones(B, np.int64)
    unfinished = np.ones(B, bool)

    for _ in range(L):
        len_lp = np.asarray(predict_len(
            jnp.asarray(seq), jnp.asarray(pn), jnp.asarray(pl), memory,
            src_mask))
        nxt = len_lp.argmax(-1)[np.arange(B), pn - 1]

        # append the predicted next phrase to a working plan, then pack
        pl_work = pl.copy()
        pn_work = pn.copy()
        n_eff = np.zeros(B, np.int64)
        for b in range(B):
            if not unfinished[b]:
                continue
            n = int(min(nxt[b], L + 1 - cur_start[b]))
            if int(nxt[b]) + int(cur_start[b]) >= L + 1:
                unfinished[b] = False        # clamped: final phrase
            if n == 0:
                unfinished[b] = False
                continue
            n_eff[b] = n
            pl_work[b, pn_work[b]] = n
            pn_work[b] += 1
        if n_eff.sum() == 0:
            break

        ids, slot, mask = pack_decoder_inputs(seq, pn_work, pl_work)
        if pad_to is not None and ids.shape[1] < pad_to:
            w = pad_to - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, w)))
            slot = np.pad(slot, ((0, 0), (0, w)))
            mask = np.pad(mask, ((0, 0), (0, w), (0, w)))
        logprob = decode_packed(
            jnp.asarray(ids), jnp.asarray(slot), jnp.asarray(seq),
            jnp.asarray(pl_work), memory, src_mask, jnp.asarray(mask))
        rng, k = jax.random.split(rng)
        words, _ = sample_next_word(k, logprob, sample_method, temperature)
        words = np.asarray(words)

        # new phrase's packed column: next-space index = old pn - 1 (alive
        # samples advance in lockstep so they share it)
        max_pn = int(pn_work.max())
        col_max = pl_work[:, 1:][:, :max_pn].max(axis=0)
        col_new = int(pn[unfinished | (n_eff > 0)].max()) - 1 \
            if (unfinished | (n_eff > 0)).any() else 0
        last_start = int(col_max[:col_new].sum())

        for b in range(B):
            n = int(n_eff[b])
            if n == 0:
                continue
            seq[b, cur_start[b]:cur_start[b] + n] = \
                words[b, last_start:last_start + n]
            pl[b] = pl_work[b]
            pn[b] = pn_work[b]
            cur_start[b] = pl[b].sum()
        if not unfinished.any():
            break

    return {"seq": seq[:, 1:-1].astype(np.int32),
            "phrase_num": (pn - 1).astype(np.int32),
            "phrase_length": pl[:, 1:-1].astype(np.int32)}


def packed_layout(seq, pl_work, P: int, W: int):
    """The reference's packed decoder layout (pb_pack.pack_decoder_inputs)
    as traced prefix-sum/gather math over a STATIC width-``W`` buffer.

    ``seq`` [B, L2] bos-framed words, ``pl_work`` [B, L2] phrase lengths
    (slot 0 = bos) with the next phrase already appended; ``P`` = max
    next-phrase columns.  Returns (ids [B, W], slot [B, W], mask [B, W, W],
    starts [P]) — bit-equal to pack_decoder_inputs on the genuine-width
    prefix (tested); positions past the genuine packed width have
    ids = 0 and no key visibility.
    """
    B, L2 = seq.shape
    next_len = pl_work[:, 1:1 + P]                      # [B, P]
    col_max = jnp.max(next_len, axis=0)                 # [P]
    cum = jnp.cumsum(col_max)                           # [P]
    starts = cum - col_max                              # [P]
    p = jnp.arange(W)
    col = jnp.minimum(jnp.sum(p[:, None] >= cum[None, :], 1), P - 1)
    o = p - starts[col]                                 # [W]

    colb = jnp.broadcast_to(col[None, :], (B, W))
    cur = jnp.take_along_axis(next_len, colb, axis=1)   # [B, W]
    prev = jnp.take_along_axis(pl_work, colb, axis=1)   # pl[col] (bos j=0)
    cexcl = jnp.cumsum(pl_work, -1) - pl_work           # phrase starts
    src_start = jnp.take_along_axis(cexcl, colb, axis=1)
    # copy-init closed form (phrase_ops.copy_init_src_indices /
    # reference TransformerModel.py:1180-1199)
    ob = o[None, :]
    prev_safe = jnp.maximum(prev, 1)
    ct = jnp.maximum(cur // prev_safe, 1)
    pre_less = prev - cur % prev_safe
    src_short = src_start + (prev - cur) + ob
    k_src = jnp.where(ob < pre_less * ct, ob // ct,
                      pre_less + (ob - pre_less * ct) // (ct + 1))
    src = jnp.where(cur <= prev, src_short, src_start + k_src)
    valid = ob < cur                                    # [B, W]
    ids = jnp.where(
        valid, jnp.take_along_axis(seq, jnp.clip(src, 0, L2 - 1), -1), 0)
    slot = colb
    # key-padding & phrase-blockwise-causal
    # (phrase_subsequent_mask, TransformerModel.py:982-991)
    mask = valid[:, None, :] & (col[None, None, :] <= col[None, :, None])
    return ids, slot, mask, starts


def pb_decode(model, params, rng, memory, src_mask, *,
              sample_method: str = "greedy", temperature: float = 1.0,
              packed_width: int | None = None) -> Dict[str, Any]:
    """Jit-compiled PB_pad decode: the whole bound+pack+fill loop as one
    ``lax.while_loop`` program (see module docstring for why lockstep
    rounds make the packed layout static-shape expressible).

    Takes encoder ``memory`` + ``src_mask`` like the sibling decoders (the
    host oracle takes raw features and encodes internally).  Returns
    {'seq', 'tok_logprobs', 'entropy', 'phrase_num', 'phrase_length'} in the
    shared decode contract — unlike the host loop, per-word logprobs and
    distribution entropies are real here (gathered at each new phrase's
    packed positions), so eval's entropy/perplexity are no longer absent
    for PB_pad.
    """
    L = model.max_length
    L2 = L + 2
    B = memory.shape[0]
    W = int(packed_width) if packed_width else 2 * L2
    P = L + 1                         # max next-phrase columns (slots 1..L+1)

    def length_predict(seq, pn, pl):
        return model.apply(params, seq, pn, pl, memory, src_mask, True,
                           method="pb_length_predict")

    def decode_hidden(ids, slot, labels, pl, mask):
        return model.apply(params, ids, slot, labels, pl, memory, src_mask,
                           mask, True, return_hidden=True,
                           method="pb_decode")

    def generate(h):
        return model.apply(params, h, method="generate")

    pos2 = jnp.arange(L2)

    def body(c):
        t, key, seq, pl, pn, cur_start, unfinished, tok, ent = c
        len_lp = length_predict(seq, pn, pl)               # [B, L2, 20]
        nxt = jnp.argmax(len_lp, -1)[jnp.arange(B), pn - 1]  # [B]

        # --- plan append (vectorized host bookkeeping, pb_decode_host) ---
        cap = L + 1 - cur_start
        n = jnp.minimum(nxt, cap)
        n_eff = jnp.where(unfinished & (n > 0), n, 0)       # [B]
        new_unf = unfinished & (n > 0) & (nxt + cur_start < L + 1)

        # packed-width overflow clamp, PER SAMPLE: column t starts where the
        # existing columns end; a sample whose planned phrase would spill
        # past W ends generation there, batchmates that fit keep decoding
        # (deviation from the unbounded host layout, documented above; the
        # post-clamp column width max(n_eff) then never overflows W either).
        prev_width = jnp.sum(jnp.max(pl[:, 1:1 + P], axis=0))
        fits = prev_width + n_eff <= W
        n_eff = jnp.where(fits, n_eff, 0)
        new_unf = new_unf & fits

        upd = (pos2[None, :] == t + 1) & (n_eff[:, None] > 0)
        pl_work = jnp.where(upd, n_eff[:, None], pl)        # [B, L2]
        pn_work = pn + (n_eff > 0)

        def fill(key):
            ids, slot, mask, starts = packed_layout(seq, pl_work, P, W)
            h = decode_hidden(ids.astype(jnp.int32),
                              slot.astype(jnp.int32), seq, pl_work,
                              mask)                          # [B, W, D]
            # vocab head only over the new column's window: a phrase is at
            # most P words, so a static WG-wide slice at the column start
            # covers it — [B, WG, V] logits instead of [B, W, V]
            q0 = jnp.take(starts, t)                         # new column
            WG = min(P, W)
            q0c = jnp.clip(q0, 0, W - WG)
            hw = jax.lax.dynamic_slice_in_dim(h, q0c, WG, axis=1)
            logprob = generate(hw)                           # [B, WG, V]
            key, k = jax.random.split(key)
            words, wlp = sample_next_word(k, logprob, sample_method,
                                          temperature)
            went = -(jnp.exp(logprob) * logprob).sum(-1)     # [B, WG]
            # scatter the new phrase: seq[b, cur_start+o] = words[b, q0-q0c+o]
            off = pos2[None, :] - cur_start[:, None]
            take = (off >= 0) & (off < n_eff[:, None])
            gidx = jnp.clip(q0 - q0c + off, 0, WG - 1)
            seq2 = jnp.where(take,
                             jnp.take_along_axis(words.astype(seq.dtype),
                                                 gidx, -1), seq)
            tok2 = jnp.where(take, jnp.take_along_axis(wlp, gidx, -1), tok)
            ent2 = jnp.where(take, jnp.take_along_axis(went, gidx, -1), ent)
            return key, seq2, tok2, ent2

        key, seq, tok, ent = jax.lax.cond(
            jnp.any(n_eff > 0), fill,
            lambda key: (key, seq, tok, ent), key)
        cur_start = cur_start + n_eff
        return (t + 1, key, seq, pl_work, pn_work, cur_start, new_unf,
                tok, ent)

    seq0 = jnp.zeros((B, L2), jnp.int32).at[:, 0].set(BOS)
    pl0 = jnp.zeros((B, L2), jnp.int32).at[:, 0].set(1)
    init = (jnp.int32(0), rng, seq0, pl0, jnp.ones(B, jnp.int32),
            jnp.ones(B, jnp.int32), jnp.ones(B, bool),
            jnp.zeros((B, L2), jnp.float32), jnp.zeros((B, L2), jnp.float32))
    out = jax.lax.while_loop(
        lambda c: (c[0] < L) & jnp.any(c[6]), body, init)
    _, _, seq, pl, pn, _, _, tok, ent = out
    return {"seq": seq[:, 1:-1], "tok_logprobs": tok[:, 1:-1],
            "entropy": ent[:, 1:-1], "phrase_num": pn - 1,
            "phrase_length": pl[:, 1:-1]}
