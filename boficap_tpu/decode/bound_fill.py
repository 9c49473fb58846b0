"""Bound-and-fill inference: the product's signature NA / SA decode paths.

Parity targets:
  * NA ("bound then fill"): reference ``core_NAIC``
    (captioning/models/TransformerModel.py:1823-1876) — a Python loop doing
    per-sample mask surgery per step, then one parallel fill decode.
  * SA (per-phrase fill): reference ``core_SAIC`` (:1878-1986) — interleaves
    predict (len, syn) → copy previous phrase's words into the new slot →
    one full decoder pass → sample the slot's words.

TPU-native re-expression: each loop is ONE ``lax.while_loop`` over fixed-shape
carries with per-sample ``finished`` flags (early exit when the whole batch
is done); all masks are computed from integer prefix state via broadcasted
iota comparisons — the B×L×L boolean tensors the reference mutates on host
never materialize outside the attention call.  The copy-from-previous-phrase
decoder init is the same closed-form index map used by the training collate
(boficap_tpu/data/phrase_ops.copy_init_src_indices).

Known reference defect NOT replicated: core_NAIC builds the fill mask from
``last[j]`` of the final loop iteration variable for every row
(TransformerModel.py:1872-1874 uses ``last[j]`` inside ``for i in range(B)``),
i.e. every sample gets the LAST sample's plan length.  We use each sample's
own ``last[i]`` (the obvious intent, and what the training mask does).

Gradients: sampling loops are non-differentiable by design; RL re-scores the
sampled plan with the teacher-forced forward, which is exactly reproducible
because the blockwise phrase-causal mask means every position only ever
attends positions finalized no later than its own phrase.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..constants import BOS, LEN, PAD, SYN_LOWER, SYN_UPPER
from .sampling import sample_next_word

Array = jnp.ndarray


def _fused_ctx(model, params, role: str):
    """Packed weights + final norm of the decoder stack serving ``role``,
    for the pallas fused decoder forward (ops/pallas_decoder_layer).  Called
    OUTSIDE any while_loop so packing doesn't rerun per iteration."""
    from ..models.boficap import decoder_roles
    from ..ops.pallas_decoder_layer import pack_decoder_weights
    stack = decoder_roles(model.train_mode, role)
    return pack_decoder_weights(params["params"][f"decoder{stack}"],
                                model.dtype)


def _use_stacked(model, interpret: bool, batch: int = 0) -> bool:
    """Whole-stack megakernels (ops/pallas_stack) need the weight blob AND
    the persistent cross-layer activation scratch to fit VMEM together —
    bf16 only on real hardware (an f32 blob is ~16 MB) and a 128-aligned
    lane dim for Mosaic.  Above 128 rows the dec/enc stacks support
    batch-CHUNKED grids (pallas_stack._chunk_rows: scratch holds one
    chunk, weights re-fetch per chunk; token-identical, tested), but the
    per-layer family measured FASTER there (B=256 NA: per-layer 69.0k vs
    stacked-chunked 66.9k img/s on v5e — the per-chunk weight re-fetches
    outweigh the saved launches), so large batches default to per-layer;
    pass stacked=True to force the chunked stacks.  The WINDOWED (SA)
    family has no chunked variant — its in-kernel K/V-cache scatter
    carries [B, L, D] cache blocks that don't chunk without splitting the
    cache update.  Interpret mode has no such limits."""
    return interpret or (model.dtype == jnp.bfloat16
                         and model.d_model % 128 == 0
                         and batch <= 128)


def fused_encode(model, params, att_feats, att_masks,
                 interpret: bool = False, stacked: Optional[bool] = None):
    """``BoFiCap.encode`` with the encoder stack routed through the pallas
    fused encoder path — inference only, numerically equivalent (tested).
    att_embed stays on the flax path.  ``stacked`` routes through the
    single-kernel whole-stack variant (ops/pallas_stack) instead of one
    kernel per layer; default on where it fits (bf16 / interpret)."""
    from ..ops.pallas_decoder_layer import (fused_encoder_forward,
                                            pack_encoder_weights)
    x = model.apply(params, att_feats, True, method="embed_att")
    src_mask = None if att_masks is None else att_masks.astype(bool)
    packed, fnorm = pack_encoder_weights(params["params"]["encoder"],
                                         model.dtype)
    if stacked is None:
        stacked = _use_stacked(model, interpret, att_feats.shape[0])
    if stacked:
        from ..ops.pallas_stack import (fused_encoder_stack_forward,
                                        pack_stack)
        return fused_encoder_stack_forward(
            x, src_mask, pack_stack(packed, "enc"), fnorm,
            num_heads=model.num_heads, interpret=interpret)
    return fused_encoder_forward(x, src_mask, packed, fnorm,
                                 num_heads=model.num_heads,
                                 interpret=interpret)


def _fused_parallel_fill(model, params, x, memory, src_mask, mask3, keep, *,
                         role: str, sample_method: str,
                         fused_interpret: bool, stacked: Optional[bool]):
    """Shared single-pass fused fill (na_decode / nnaic_decode): route the
    embedded inputs ``x`` through the whole-stack or per-layer decoder
    kernels of ``role``, then either the streaming greedy head or the plain
    generator.

    Returns ``((seq, tok, ent), None)`` when the fused greedy head ran —
    the streaming head never materializes [B, L, V] (tail rows where
    ``keep`` is False take seq=PAD and lp[:, PAD]); gated by row count
    because at tiny batches the sequential vocab tiles are latency-bound
    and XLA's one-shot head wins (measured 0.84 vs 0.32 ms at B=1).
    Returns ``(None, logprob)`` otherwise — the caller samples from the
    dense tensor."""
    from ..ops.pallas_decoder_layer import (fused_decoder_forward,
                                            fused_greedy_head)
    B, L = mask3.shape[0], mask3.shape[1]
    packed, fnorm = _fused_ctx(model, params, role)
    if stacked is None:
        stacked = _use_stacked(model, fused_interpret, B)
    if stacked:
        from ..ops.pallas_stack import (fused_decoder_stack_forward,
                                        pack_stack)
        h = fused_decoder_stack_forward(
            x, memory, mask3, src_mask, pack_stack(packed, "dec"),
            fnorm, num_heads=model.num_heads, interpret=fused_interpret)
    else:
        h = fused_decoder_forward(x, memory, mask3, src_mask, packed,
                                  fnorm, num_heads=model.num_heads,
                                  interpret=fused_interpret)
    if sample_method == "greedy" and (B * L >= 256 or fused_interpret):
        gen = params["params"]["generator"]["proj"]
        ids, tok_a, ent, lp_pad = fused_greedy_head(
            h, gen["kernel"], gen["bias"], pad_id=PAD,
            interpret=fused_interpret)
        seq = jnp.where(keep, ids, PAD)
        tok = jnp.where(keep, tok_a, lp_pad)
        return (seq, tok, ent), None
    return None, model.apply(params, h, method="generate")


def _bound_update(s, len_N, syn_N, L, slot, last_key):
    """Shared bounding bookkeeping (reference core_NAIC :1843-1867 /
    core_SAIC :1915-1930): stop / clamp / record the new phrase slot.

    Returns (len_eff [B], emit_slot [B], new partial state dict).
    """
    last = s[last_key]
    stop = (len_N == 0) | (syn_N < SYN_LOWER) | (syn_N > SYN_UPPER)
    emit_slot = (~s["finished"]) & (~stop)
    clamp = (len_N + last) >= (L + 1)
    len_eff = jnp.where(clamp, L + 1 - last, len_N)
    len_eff = jnp.where(emit_slot, len_eff, 0).astype(jnp.int32)

    phrase_length = s["phrase_length"].at[:, slot].set(
        jnp.where(emit_slot, len_eff, 0))
    phrase_syn = s["phrase_syn"].at[:, slot].set(
        jnp.where(emit_slot, syn_N, PAD))
    phrase_num = s["phrase_num"] + emit_slot.astype(jnp.int32)
    finished = s["finished"] | stop | (emit_slot & clamp)
    return len_eff, emit_slot, {
        "phrase_length": phrase_length, "phrase_syn": phrase_syn,
        "phrase_num": phrase_num, "finished": finished,
    }


def bound_plan(model, params, memory, src_mask, n_steps: int, L: int
               ) -> Dict[str, Any]:
    """The BOUNDING while_loop alone (reference core_NAIC's first phase,
    TransformerModel.py:1828-1870; also the first phase of core_UIC_s_AIC
    :2313-2358): grow the syn plan from [LEN] with the syn-input predictor.

    Returns the final loop state: extend_syn [B, L+2], last [B],
    phrase_length/phrase_syn [B, L+2], phrase_num [B]."""
    L2 = L + 2
    B = memory.shape[0]

    if model.N_len == 1:
        # fast path: cross K/V, the SYN_DIM x L2 self-attn K/V table, and the
        # constant [LEN] query are loop-invariant — hoist them out of the
        # while_loop (BoFiCap.bound_cache); the body becomes a gather plus
        # one-row attention instead of re-embedding/projecting all of L2
        cache = model.apply(params, memory, True, method="bound_cache")

        def bound_step(ids, prefix):
            return model.apply(params, cache, ids, prefix, src_mask,
                               method="bound_step_cached")
    else:
        def bound_step(ids, prefix):
            return model.apply(params, ids, prefix, memory, src_mask, True,
                               method="bound_step")

    def cond(s):
        return (s["i"] < n_steps) & jnp.any(~s["finished"])

    def body(s):
        len_lp, syn_lp = bound_step(s["extend_syn"], s["last"])
        len_N = jnp.argmax(len_lp, -1).astype(jnp.int32)
        syn_N = jnp.argmax(syn_lp, -1).astype(jnp.int32)
        len_eff, _, upd = _bound_update(s, len_N, syn_N, L, s["i"], "last")

        pos = jnp.arange(L2)[None, :]
        w = (pos >= s["last"][:, None]) & (pos < (s["last"] + len_eff)[:, None])
        extend_syn = jnp.where(w, syn_N[:, None], s["extend_syn"])
        return {**s, **upd, "extend_syn": extend_syn,
                "last": s["last"] + len_eff, "i": s["i"] + 1}

    init = {
        "i": jnp.array(0, jnp.int32),
        "extend_syn": jnp.full((B, L2), PAD, jnp.int32).at[:, 0].set(LEN),
        "last": jnp.ones((B,), jnp.int32),
        "finished": jnp.zeros((B,), bool),
        "phrase_length": jnp.zeros((B, L2), jnp.int32),
        "phrase_syn": jnp.full((B, L2), PAD, jnp.int32),
        "phrase_num": jnp.zeros((B,), jnp.int32),
    }
    return jax.lax.while_loop(cond, body, init)


def na_decode(model, params, rng, memory, src_mask, *,
              sample_method: str = "greedy", temperature: float = 1.0,
              max_steps: Optional[int] = None, fused_fill: bool = False,
              fused_interpret: bool = False,
              stacked: Optional[bool] = None) -> Dict[str, Any]:
    """Bound (length/syn while_loop) then fill (one parallel decode).

    ``fused_fill`` routes the fill's decoder stack through the pallas
    per-layer megakernel (ops/pallas_decoder_layer) — inference only,
    numerically equivalent (tested); embeddings and the generator head stay
    on the flax path.

    Returns {'seq': [B, L], 'tok_logprobs': [B, L], 'entropy': [B, L],
    'phrase_num': [B], 'phrase_length': [B, L], 'phrase_syn': [B, L]} —
    the reference's NAIC sample contract (AttModel.py:419-429) with the
    dense [B, L, V] logprobs reduced to the per-position quantities eval
    actually uses (eval_utils.py:183-184), so eval never fetches a ~50 MB
    buffer per batch.
    """
    L = model.max_length
    B = memory.shape[0]
    n_steps = L if max_steps is None else min(max_steps, L)
    s = bound_plan(model, params, memory, src_mask, n_steps, L)

    # FILL: one parallel decode over the planned words
    total = s["last"] - 1                                         # [B]
    na_mask = jnp.broadcast_to(
        jnp.arange(L)[None, None, :] < total[:, None, None], (B, L, L))

    if fused_fill:
        syn_seq = s["extend_syn"][:, 1:-1]
        word_seq = jnp.full(syn_seq.shape, BOS, jnp.int32)

        def embed(m):
            if m.decoder_input_mode == "single":
                return m.posenc(m.syn_embed(syn_seq), deterministic=True)
            return m._mix_inputs(word_seq, syn_seq, "na", True)

        x = model.apply(params, method=embed)
        keep = jnp.arange(L)[None, :] < total[:, None]
        head, logprob = _fused_parallel_fill(
            model, params, x, memory, src_mask, na_mask, keep, role="NA",
            sample_method=sample_method, fused_interpret=fused_interpret,
            stacked=stacked)
        if head is not None:
            seq, tok, ent = head
            return {"seq": seq, "tok_logprobs": tok, "entropy": ent,
                    "phrase_num": s["phrase_num"],
                    "phrase_length": s["phrase_length"][:, :L],
                    "phrase_syn": s["phrase_syn"][:, :L]}
    else:
        def fill(m):
            h = m.decode_na(s["extend_syn"][:, 1:-1], memory, src_mask,
                            na_mask)
            return m.generate(h)

        logprob = model.apply(params, method=fill)
    ids, _ = sample_next_word(rng, logprob, sample_method, temperature)
    keep = jnp.arange(L)[None, :] < total[:, None]
    seq = jnp.where(keep, ids.astype(jnp.int32), PAD)
    # NO position mask here: the reference's NAIC seqLogprobs is the raw
    # parallel-fill logprob tensor, so eval's entropy/perplexity include the
    # beyond-plan tail rows (AttModel.py:419-429); reproduced exactly.
    tok, ent = _tok_entropy(logprob, seq)
    return {"seq": seq, "tok_logprobs": tok, "entropy": ent,
            "phrase_num": s["phrase_num"],
            "phrase_length": s["phrase_length"][:, :L],
            "phrase_syn": s["phrase_syn"][:, :L]}


def _tok_entropy(logprob, seq, mask=None):
    """Reduce a dense [B, L, V] logprob tensor to the per-position chosen
    token log-prob and distribution entropy [B, L] (exactly what eval's
    entropy/perplexity reduction consumes, eval_utils.py:183-184).
    ``mask`` (bool [B, L]) zeroes positions, reproducing loops that stored
    zero logprob rows there; ``mask=None`` keeps every row, reproducing the
    single-pass fills whose dense tensor had live tail rows."""
    tok = jnp.take_along_axis(logprob, seq[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    ent = -(jnp.exp(logprob) * logprob).sum(-1)
    if mask is not None:
        tok = jnp.where(mask, tok, 0.0)
        ent = jnp.where(mask, ent, 0.0)
    return tok, ent


def _copy_phrase(seq, seq_last, prev, cur, phrase_last, L2):
    """Closed-form copy-from-previous-phrase for ONE new slot
    (reference core_SAIC :1934-1947; same math as
    phrase_ops.copy_init_src_indices but for a single phrase).

    Returns (values [B, L2], in_phrase [B, L2]) where values holds the copied
    words at positions [phrase_last, phrase_last + cur).
    """
    pos = jnp.arange(L2)[None, :]
    o = pos - phrase_last[:, None]
    in_ph = (o >= 0) & (o < cur[:, None])
    prev_ = prev[:, None]
    cur_ = cur[:, None]
    prev_safe = jnp.maximum(prev_, 1)
    ct = cur_ // prev_safe
    pre_less = prev_ - cur_ % prev_safe
    src_short = seq_last[:, None] + (prev_ - cur_) + o
    ct_safe = jnp.maximum(ct, 1)
    k_src = jnp.where(o < pre_less * ct, o // ct_safe,
                      pre_less + (o - pre_less * ct) // (ct_safe + 1))
    src = jnp.where(cur_ <= prev_, src_short, seq_last[:, None] + k_src)
    src = jnp.clip(jnp.where(in_ph, src, 0), 0, L2 - 1)
    return jnp.take_along_axis(seq, src, axis=-1), in_ph


def sa_decode(model, params, rng, memory, src_mask, *,
              sample_method: str = "greedy", temperature: float = 1.0,
              max_steps: Optional[int] = None,
              predictor_use_syn: bool = False, fused_fill: bool = False,
              fused_interpret: bool = False,
              stacked: Optional[bool] = None,
              window: int = 8) -> Dict[str, Any]:
    """Semi-autoregressive decode: one predictor + one decoder pass per
    PHRASE (reference core_SAIC, TransformerModel.py:1878-1986).

    ``predictor_use_syn``: the UIC_s/UIC_u variant (core_UIC_s_SAIC
    :2203-2311) feeds the length predictor the SYN plan instead of the
    sampled words.

    ``fused_fill`` routes each per-phrase decoder pass through the pallas
    fused decoder layer (weights packed once, outside the while_loop).

    ``window``: width of the narrow (K/V-cached) fill window; a round whose
    new slot exceeds it falls back to the wide (W = L) no-cache round.
    ``window >= max_length`` removes the narrow branch (and its ``lax.cond``)
    entirely — every round re-decodes all positions, like the reference.

    Returns {'seq': [B, L], 'tok_logprobs': [B, L], 'entropy': [B, L],
    'phrase_num': [B], 'phrase_length': [B, L], 'phrase_syn': [B, L]}.
    The per-round dense logprob is reduced to [B, L] token/entropy carries
    (the only quantities eval consumes) instead of streaming a [B, L, V]
    f32 buffer (~50 MB at B=64, V=9487) through HBM every round.
    """
    L = model.max_length
    L2 = L + 2
    B = memory.shape[0]
    n_steps = L if max_steps is None else min(max_steps, L)
    pos_dec = jnp.arange(L)[None, :]
    # loop-invariant predictor tensors (see bound_plan): full K/V table for
    # the syn-input variant, cached cross K/V + constant query otherwise
    bcache = (model.apply(params, memory, predictor_use_syn,
                          method="bound_cache")
              if model.N_len == 1 else None)
    fctx = _fused_ctx(model, params, "SA") if fused_fill else None
    if fused_fill:
        # K/V-cached windowed fill: cross-attn K/V are loop-invariant —
        # project them once per decode; self-attn K/V of finalized
        # positions never change (blockwise finality) — cache them per
        # layer and decode only a W-wide window of new positions per round
        # (reference core_SAIC re-runs the FULL decoder per phrase).
        import math as _math

        from ..ops.pallas_decoder_layer import (_block_diag_one,
                                                fused_window_decoder_forward,
                                                project_cross_kv)
        if stacked is None:
            stacked = _use_stacked(model, fused_interpret, B)
        elif stacked and B > 128 and not fused_interpret:
            # the WINDOWED stack kernels have no batch-chunked variant
            # (their in-kernel K/V-cache scatter carries [B, L, D] blocks);
            # forcing them past the VMEM cap would die in Mosaic with an
            # opaque allocation error — fail clearly instead
            raise ValueError(
                f"sa_decode(stacked=True): B={B} exceeds the windowed "
                "stack kernels' 128-row VMEM cap and the SA family has no "
                "chunked grid — use stacked=False (per-layer kernels, the "
                "measured-faster route at large B) or B <= 128")
        k2_l, v2_l = project_cross_kv(fctx[0], memory)
        k2s, v2s = jnp.stack(k2_l), jnp.stack(v2_l)       # [NL, B, R, D]
        n_layers = len(fctx[0])
        if stacked:
            from ..ops.pallas_stack import pack_stack
            fctx_st = pack_stack(fctx[0], "win")
        W_SMALL = min(window, L)
        src_b = (src_mask if src_mask is not None
                 else jnp.ones(memory.shape[:2], bool))
        # the cross-attention mask never changes across rounds — build the
        # block-diagonal expansion ONCE per decode for both window widths.
        # The batch-block size G must match the fill kernel's exactly (the
        # kernel indexes mask blocks of G rows per grid step), and it is
        # chosen PER WIDTH: the narrow window fits VMEM at the larger
        # swept-best block, the wide (W=L) fallback only compiles at 8
        # (v5e sweep, BENCH_NOTES.md).
        from ..ops.pallas_stack import WIN_BLOCK_B, WIN_WIDE_BLOCK_B
        # WIN_BLOCK_B was swept for the whole-STACK kernels; the per-layer
        # family (non-stacked: f32 models, unaligned d_model, or B > 128 —
        # see _use_stacked) holds all layer weights in VMEM per grid step
        # and only compiles/was validated at the smaller block of 8
        G_small = _math.gcd(B, WIN_BLOCK_B if stacked else 8)
        G_wide = _math.gcd(B, WIN_WIDE_BLOCK_B if stacked else 8)
        R = memory.shape[1]

        def _G_of(W):
            return G_wide if W == L else G_small

        def _sm_big(W):
            sm3 = jnp.broadcast_to(src_b[:, None, :], (B, W, R))
            return _block_diag_one(sm3, _G_of(W))

        sm_bigs = {W: _sm_big(W) for W in {W_SMALL, L}}

    def cond(s):
        return (s["i"] <= n_steps) & jnp.any(~s["finished"])

    def body(s):
        rng, skey = jax.random.split(s["rng"])
        pred_ids = s["extend_syn"] if predictor_use_syn else s["extend_len"]
        if bcache is not None:
            len_lp, syn_lp = model.apply(
                params, bcache, pred_ids, s["phrase_last"], src_mask,
                use_syn=predictor_use_syn, method="bound_step_cached")
        else:
            len_lp, syn_lp = model.apply(
                params, pred_ids, s["phrase_last"], memory, src_mask,
                predictor_use_syn, method="bound_step")
        len_N = jnp.argmax(len_lp, -1).astype(jnp.int32)
        syn_N = jnp.argmax(syn_lp, -1).astype(jnp.int32)
        len_eff, _, upd = _bound_update(s, len_N, syn_N, L, s["i"],
                                        "phrase_last")
        emit = len_eff > 0

        # copy-init the new slot's decoder input from the previous phrase
        vals, in_ph = _copy_phrase(s["seq"], s["seq_last"], s["prev_len"],
                                   len_eff, s["phrase_last"], L2)
        extend_word = jnp.where(in_ph, vals, s["extend_word"])
        extend_syn = jnp.where(in_ph, syn_N[:, None], s["extend_syn"])

        # blockwise mask rows >= current start see keys < current end
        start_dec = s["phrase_last"] - 1
        end_dec = start_dec + len_eff
        vis_dec = jnp.where(emit[:, None] & (pos_dec >= start_dec[:, None]),
                            end_dec[:, None], s["vis_dec"])
        tgt_mask = pos_dec[:, None, :] < vis_dec[:, :, None]      # [B, L, L]

        cache_upd = {}
        if fused_fill:
            def windowed_fill(W: int):
                wide = W == L
                if wide:
                    # the window covers every position, so w_start == 0 and
                    # the gather/scatter one-hots are the identity — use the
                    # frame tensors directly (no einsums, no mix_inputs
                    # gather; the [B, W(=L)] window IS the [B, L] frame)
                    w_start = jnp.zeros((B,), jnp.int32)
                    w_ids = extend_word[:, 1:-1]
                    s_ids = extend_syn[:, 1:-1]
                    x_win = model.apply(params, w_ids, s_ids, "sa", True,
                                        method="_mix_inputs")
                    vis_rows = vis_dec
                    ohw_f = None
                    m_cache = jnp.zeros((B, W, L), bool)  # all cache masked
                    m_win = tgt_mask
                else:
                    w_start = jnp.clip(start_dec, 0, L - W)
                    idx = w_start[:, None] + jnp.arange(W)[None, :]  # [B, W]
                    # one-hot matmul gathers (exact: single 1 per row) — TPU
                    # generic gathers over the 512-wide dim are pathologically
                    # slow inside the loop (see fused_window_decoder_forward)
                    ohw = (jnp.arange(L)[None, None, :]
                           == idx[:, :, None])                    # [B, W, L]
                    ohw_f = ohw.astype(jnp.float32)
                    # embed ONLY the window slots (ids < 2^24 exact in f32)
                    w_ids = jnp.einsum(
                        "bwl,bl->bw", ohw_f,
                        extend_word[:, 1:-1].astype(jnp.float32)
                    ).astype(jnp.int32)
                    s_ids = jnp.einsum(
                        "bwl,bl->bw", ohw_f,
                        extend_syn[:, 1:-1].astype(jnp.float32)
                    ).astype(jnp.int32)
                    x_win = model.apply(params, w_ids, s_ids, ohw_f, "sa",
                                        method="mix_inputs_window")
                    vis_rows = jnp.einsum(
                        "bwl,bl->bw", ohw_f,
                        vis_dec.astype(jnp.float32)).astype(jnp.int32)
                    # keys = cache columns (0..L-1) ++ fresh window columns:
                    # cache copies of in-window positions are stale -> masked,
                    # the window columns carry those positions instead
                    key_pos = jnp.arange(L)[None, None, :]
                    vis = vis_rows[:, :, None]
                    in_win_col = ((key_pos >= w_start[:, None, None])
                                  & (key_pos < (w_start + W)[:, None, None]))
                    m_cache = (key_pos < vis) & ~in_win_col       # [B, W, L]
                    m_win = idx[:, None, :] < vis                 # [B, W, W]
                G_blk = _G_of(W)
                sm_big = sm_bigs[W]
                if stacked and W == L:
                    # wide round: the window covers every position, the
                    # cache keys are all masked and the scatter one-hot is
                    # the identity — the no-cache wide kernel drops both
                    # (self-attn key width W, not L+W; BENCH_NOTES.md)
                    from ..ops.pallas_stack import fused_window_wide_stack
                    tm_big = _block_diag_one(m_win, G_blk)
                    h_win, kc_new, vc_new = fused_window_wide_stack(
                        x_win, k2s, v2s, tm_big, sm_big,
                        fctx_st, fctx[1], num_heads=model.num_heads,
                        block_b=G_blk, interpret=fused_interpret)
                elif stacked:
                    from ..ops.pallas_stack import fused_window_decoder_stack
                    tm_big = _block_diag_one(
                        jnp.concatenate([m_cache, m_win], axis=-1), G_blk)
                    # the scatter one-hot is ohw's transpose: row p of
                    # [B, L, W] has a single 1.0 at window column p-start
                    h_win, kc_new, vc_new = fused_window_decoder_stack(
                        x_win, jnp.transpose(ohw_f, (0, 2, 1)),
                        s["kc"], s["vc"], k2s, v2s, tm_big, sm_big,
                        fctx_st, fctx[1], num_heads=model.num_heads,
                        block_b=G_blk, interpret=fused_interpret)
                else:
                    tm_big = _block_diag_one(
                        jnp.concatenate([m_cache, m_win], axis=-1), G_blk)
                    h_win, kc_l, vc_l = fused_window_decoder_forward(
                        x_win, w_start,
                        [s["kc"][j] for j in range(n_layers)],
                        [s["vc"][j] for j in range(n_layers)],
                        list(k2s), list(v2s), tm_big, sm_big,
                        fctx[0], fctx[1], num_heads=model.num_heads,
                        block_b=G_blk, interpret=fused_interpret)
                    kc_new = jnp.stack(kc_l)
                    vc_new = jnp.stack(vc_l)
                if sample_method == "greedy" and (B * W >= 256
                                                  or fused_interpret):
                    from ..ops.pallas_decoder_layer import fused_greedy_head
                    gen = params["params"]["generator"]["proj"]
                    ids_win, tok_win, ent_win, _ = fused_greedy_head(
                        h_win, gen["kernel"], gen["bias"], pad_id=PAD,
                        interpret=fused_interpret)
                else:
                    lp_win = model.apply(params, h_win, method="generate")
                    ids_win, _ = sample_next_word(skey, lp_win,
                                                  sample_method, temperature)
                    tok_win, ent_win = _tok_entropy(lp_win, ids_win)
                if wide:
                    # window rows ARE the frame rows — no realignment
                    return ids_win, tok_win, ent_win, kc_new, vc_new
                # re-align window rows to the full decoder frame via the
                # transposed one-hot (rows outside the window become 0,
                # masked by in_dec below); word ids < 2^24 are exact in f32
                ohl = ohw_f                                       # [B, W, L]
                ids_f = jnp.einsum("bwl,bw->bl", ohl,
                                   ids_win.astype(jnp.float32)
                                   ).astype(jnp.int32)
                tok_f = jnp.einsum("bwl,bw->bl", ohl, tok_win)
                ent_f = jnp.einsum("bwl,bw->bl", ohl, ent_win)
                return ids_f, tok_f, ent_f, kc_new, vc_new

            if W_SMALL < L:
                ids, tok_r, ent_r, kc, vc = jax.lax.cond(
                    jnp.max(len_eff) <= W_SMALL,
                    lambda: windowed_fill(W_SMALL),
                    lambda: windowed_fill(L))
            else:
                ids, tok_r, ent_r, kc, vc = windowed_fill(L)
            cache_upd = {"kc": kc, "vc": vc}
        else:
            def sa_fill(m):
                h = m.decode_sa(extend_word[:, 1:-1], extend_syn[:, 1:-1],
                                memory, src_mask, tgt_mask)
                return m.generate(h)

            logprob = model.apply(params, method=sa_fill)          # [B, L, V]
            ids, _ = sample_next_word(skey, logprob, sample_method,
                                      temperature)
            tok_r, ent_r = _tok_entropy(logprob, ids)
        ids_lab = jnp.pad(ids.astype(jnp.int32), ((0, 0), (1, 1)))  # shift +1

        in_dec = emit[:, None] & (pos_dec >= start_dec[:, None]) \
            & (pos_dec < end_dec[:, None])
        seq = jnp.where(in_ph, ids_lab, s["seq"])
        extend_len = jnp.where(in_ph, ids_lab, s["extend_len"])
        tok_lp = jnp.where(in_dec, tok_r, s["tok_lp"])
        ent_c = jnp.where(in_dec, ent_r, s["ent"])

        return {**s, **upd, **cache_upd,
                "seq": seq, "extend_len": extend_len,
                "extend_word": extend_word, "extend_syn": extend_syn,
                "vis_dec": vis_dec, "tok_lp": tok_lp, "ent": ent_c,
                "seq_last": s["seq_last"] + jnp.where(emit, s["prev_len"], 0),
                "phrase_last": s["phrase_last"] + len_eff,
                "prev_len": jnp.where(emit, len_eff, s["prev_len"]),
                "rng": rng, "i": s["i"] + 1}

    init = {
        "i": jnp.array(1, jnp.int32),
        "seq": jnp.full((B, L2), PAD, jnp.int32).at[:, 0].set(BOS),
        "extend_len": jnp.full((B, L2), PAD, jnp.int32).at[:, 0].set(LEN),
        "extend_word": jnp.full((B, L2), PAD, jnp.int32),
        "extend_syn": jnp.full((B, L2), PAD, jnp.int32).at[:, 0].set(LEN),
        "vis_dec": jnp.zeros((B, L), jnp.int32),
        "phrase_last": jnp.ones((B,), jnp.int32),
        "seq_last": jnp.zeros((B,), jnp.int32),
        "prev_len": jnp.ones((B,), jnp.int32),
        "phrase_length": jnp.zeros((B, L2), jnp.int32).at[:, 0].set(1),
        "phrase_syn": jnp.full((B, L2), PAD, jnp.int32),
        "phrase_num": jnp.zeros((B,), jnp.int32),
        "finished": jnp.zeros((B,), bool),
        "tok_lp": jnp.zeros((B, L), jnp.float32),
        "ent": jnp.zeros((B, L), jnp.float32),
        "rng": rng,
    }
    if fused_fill:
        # stacked [NL, B, L, D] per-layer self-attn K/V caches: one array
        # keeps the while_loop carry flat and lets the stacked megakernel
        # alias input->output buffers
        D = memory.shape[-1]
        init["kc"] = jnp.zeros((n_layers, B, L, D), model.dtype)
        init["vc"] = jnp.zeros((n_layers, B, L, D), model.dtype)
    s = jax.lax.while_loop(cond, body, init)
    return {"seq": s["seq"][:, 1:-1], "tok_logprobs": s["tok_lp"],
            "entropy": s["ent"], "phrase_num": s["phrase_num"],
            "phrase_length": s["phrase_length"][:, 1:-1],
            "phrase_syn": s["phrase_syn"][:, 1:-1]}


def uic_s_ar_decode(model, params, rng, memory, src_mask, *,
                    sample_method: str = "greedy", temperature: float = 1.0,
                    max_steps: Optional[int] = None,
                    ar_max_steps: Optional[int] = None) -> Dict[str, Any]:
    """UIC_s / UIC_u autoregressive branch (reference core_UIC_s_AIC,
    TransformerModel.py:2313-2391): first bound the syn plan with the shared
    predictor, then decode autoregressively with word+syn embeddings, writing
    words only inside the planned length.

    The reference re-runs the full decoder on the growing prefix per AR step;
    here the AR phase is the KV-cached ``ar_step`` with the per-position syn
    id from the plan.
    """
    L = model.max_length
    B = memory.shape[0]
    n_bound = L if max_steps is None else min(max_steps, L)
    plan = bound_plan(model, params, memory, src_mask, n_bound, L)
    extend_syn = plan["extend_syn"]
    last = plan["last"]                                  # 1 + total words

    n_ar = L if ar_max_steps is None else min(ar_max_steps, L)
    cache = model.apply(params, memory, L + 1, method="init_ar_cache")

    def cond(s):
        # word for label position pos+1 only exists while pos+1 < last
        return (s["pos"] < n_ar) & jnp.any(s["pos"] + 1 < last)

    def body(s):
        rng, skey = jax.random.split(s["rng"])
        # syn embedding of the CURRENT input token (label position pos),
        # reference decode_A input extend_phrase_syn[:, 1:i+2] pairs token t
        # with syn slot t+1 (:2374)
        syn_t = jax.lax.dynamic_slice_in_dim(
            extend_syn, s["pos"] + 1, 1, axis=1)[:, 0]
        logprob, cache = model.apply(
            params, s["it"], s["pos"], s["cache"], src_mask,
            syn_t=syn_t, method="ar_step")
        ids, _ = sample_next_word(skey, logprob, sample_method, temperature)
        write = (s["pos"] + 1) < last                       # reference :2385
        ids = jnp.where(write, ids, PAD).astype(jnp.int32)
        seq = s["seq"].at[:, s["pos"]].set(ids)
        tok, ent = _tok_entropy(logprob, ids, write)
        tok_lp = s["tok_lp"].at[:, s["pos"]].set(tok)
        ent_c = s["ent"].at[:, s["pos"]].set(ent)
        return {"pos": s["pos"] + 1, "it": ids, "cache": cache, "seq": seq,
                "tok_lp": tok_lp, "ent": ent_c, "rng": rng}

    init = {
        "pos": jnp.array(0, jnp.int32),
        "it": jnp.full((B,), BOS, jnp.int32),
        "cache": cache,
        "seq": jnp.full((B, L), PAD, jnp.int32),
        "tok_lp": jnp.zeros((B, L), jnp.float32),
        "ent": jnp.zeros((B, L), jnp.float32),
        "rng": rng,
    }
    s = jax.lax.while_loop(cond, body, init)
    return {"seq": s["seq"], "tok_logprobs": s["tok_lp"],
            "entropy": s["ent"],
            "phrase_num": plan["phrase_num"],
            "phrase_length": plan["phrase_length"][:, :L],
            "phrase_syn": plan["phrase_syn"][:, :L]}


def nnaic_decode(model, params, rng, memory, src_mask, *,
                 sample_method: str = "greedy", temperature: float = 1.0,
                 fused_fill: bool = False, fused_interpret: bool = False,
                 stacked: Optional[bool] = None) -> Dict[str, Any]:
    """Naive NA decode (reference core_NNAIC, TransformerModel.py:1806-1822):
    predict one whole-caption length, then one parallel decode over bos
    inputs with the length as a key-padding mask."""
    L = model.max_length
    B = memory.shape[0]
    length_N = model.apply(params, memory, method="nnaic_length")
    tgt = jnp.full((B, L), BOS, jnp.int32)
    keep = jnp.arange(L)[None, :] < length_N[:, None]

    if fused_fill:
        def embed(m):
            return m.posenc(m.word_embed(tgt), deterministic=True)

        x = model.apply(params, method=embed)
        mask3 = jnp.broadcast_to(keep[:, None, :], (B, L, L))
        head, logprob = _fused_parallel_fill(
            model, params, x, memory, src_mask, mask3, keep, role="A",
            sample_method=sample_method, fused_interpret=fused_interpret,
            stacked=stacked)
        if head is not None:
            seq, tok, ent = head
            return {"seq": seq, "tok_logprobs": tok, "entropy": ent,
                    "length": length_N}
    else:
        def fill(m):
            h = m.decode_a(tgt, memory, src_mask, keep[:, None, :])
            return m.generate(h)

        logprob = model.apply(params, method=fill)
    ids, _ = sample_next_word(rng, logprob, sample_method, temperature)
    seq = jnp.where(keep, ids.astype(jnp.int32), PAD)
    tok, ent = _tok_entropy(logprob, seq)      # unmasked: dense-tensor parity
    return {"seq": seq, "tok_logprobs": tok, "entropy": ent,
            "length": length_N}


def ss_sa_loop(model, params, rng, memory, src_mask, labels, phrase_length,
               phrase_syn, ss_prob: float,
               sample_method: str = "greedy", temperature: float = 1.0
               ) -> Dict[str, Any]:
    """Scheduled-sampling SA loop (reference ss_SAIC,
    TransformerModel.py:1988-2121), non-differentiable sampling phase.

    Per phrase step, per sample, a coin with prob ``ss_prob`` picks model
    behavior over teacher forcing; a second fair coin picks between
    copy-from-sampled-words and bos-only decoder input; the teacher-forced
    branch copies from the GT labels with the GT plan.  Words are always
    SAMPLED from the decoder.  Returns the assembled decoder inputs and the
    predicted plan so the (differentiable) re-score pass can reproduce every
    step's logprobs exactly (positions are finalized no later than their
    phrase — same argument as sa_decode).

    labels/phrase_length/phrase_syn: [B, L2] framed gt rows.
    """
    L2 = labels.shape[1]
    L = L2 - 2
    B = memory.shape[0]
    pos_dec = jnp.arange(L)[None, :]
    bcache = (model.apply(params, memory, False, method="bound_cache")
              if model.N_len == 1 else None)

    def cond(s):
        return (s["i"] < L2 - 1) & jnp.any(~s["finished"])

    def body(s):
        rng, k_len, k_coin, k_sub, k_word = jax.random.split(s["rng"], 5)
        i = s["i"]
        if bcache is not None:
            len_lp, syn_lp = model.apply(
                params, bcache, s["extend_len"], s["phrase_last"], src_mask,
                use_syn=False, method="bound_step_cached")
        else:
            len_lp, syn_lp = model.apply(
                params, s["extend_len"], s["phrase_last"], memory, src_mask,
                False, method="bound_step")
        len_N = jnp.argmax(len_lp, -1).astype(jnp.int32)
        syn_N = jnp.argmax(syn_lp, -1).astype(jnp.int32)

        gt_len_i = jnp.take_along_axis(phrase_length, i[None, None].repeat(
            B, 0), axis=1)[:, 0]
        gt_syn_i = jnp.take_along_axis(phrase_syn, i[None, None].repeat(
            B, 0), axis=1)[:, 0]
        stop = ((len_N == 0) | (syn_N < SYN_LOWER) | (syn_N > SYN_UPPER)
                | (gt_len_i == 0))                       # reference :2029
        emit = (~s["finished"]) & (~stop)
        cap = (L2 - 1) - s["phrase_last"]
        pred_len = jnp.minimum(len_N, cap)
        clamp = (len_N + s["phrase_last"]) >= (L2 - 1)

        use_model = jax.random.uniform(k_coin, (B,)) < ss_prob
        bos_input = jax.random.uniform(k_sub, (B,)) < 0.5
        # gt branch clamps the gt length too (reference :2076)
        len_eff = jnp.where(use_model, pred_len, jnp.minimum(gt_len_i, cap))
        len_eff = jnp.where(emit, len_eff, 0).astype(jnp.int32)
        syn_eff = jnp.where(use_model, syn_N, gt_syn_i)

        plan_len = s["plan_len"].at[:, i].set(jnp.where(emit, len_eff, 0))
        plan_syn = s["plan_syn"].at[:, i].set(jnp.where(emit, syn_eff, PAD))
        # the reference finishes a clamped sample based on the MODEL's
        # predicted length BEFORE the ss coin picks the input branch
        # (TransformerModel.py:2033-2038: finished[j] is already True when
        # the gt branch later overwrites the plan length), so the clamp term
        # must not be gated on use_model — a teacher-forced clamped sample
        # ends too, instead of looping on zero-capacity rounds
        finished = s["finished"] | stop | (emit & clamp)

        # decoder inputs for the new slot
        prev_model = s["prev_len"]
        prev_gt = jnp.take_along_axis(
            phrase_length, jnp.maximum(i - 1, 0)[None, None].repeat(B, 0),
            axis=1)[:, 0]
        vals_model, in_ph = _copy_phrase(s["seq"], s["seq_last"], prev_model,
                                         len_eff, s["phrase_last"], L2)
        vals_gt, _ = _copy_phrase(labels, s["label_last"], prev_gt, len_eff,
                                  s["phrase_last"], L2)
        vals = jnp.where(use_model[:, None],
                         jnp.where(bos_input[:, None], BOS, vals_model),
                         vals_gt)
        extend_word = jnp.where(in_ph, vals, s["extend_word"])
        extend_syn = jnp.where(in_ph, syn_eff[:, None], s["extend_syn"])

        start_dec = s["phrase_last"] - 1
        end_dec = start_dec + len_eff
        vis_dec = jnp.where((len_eff > 0)[:, None]
                            & (pos_dec >= start_dec[:, None]),
                            end_dec[:, None], s["vis_dec"])
        tgt_mask = pos_dec[:, None, :] < vis_dec[:, :, None]

        def sa_fill(m):
            h = m.decode_sa(extend_word[:, 1:-1], extend_syn[:, 1:-1],
                            memory, src_mask, tgt_mask)
            return m.generate(h)

        logprob = model.apply(params, method=sa_fill)
        ids, _ = sample_next_word(k_word, logprob, sample_method, temperature)
        ids_lab = jnp.pad(ids.astype(jnp.int32), ((0, 0), (1, 1)))
        seq = jnp.where(in_ph, ids_lab, s["seq"])
        extend_len = jnp.where(in_ph, ids_lab, s["extend_len"])

        return {**s, "seq": seq, "extend_len": extend_len,
                "extend_word": extend_word, "extend_syn": extend_syn,
                "vis_dec": vis_dec, "plan_len": plan_len,
                "plan_syn": plan_syn, "finished": finished,
                "seq_last": s["seq_last"] + jnp.where(len_eff > 0,
                                                      s["prev_len"], 0),
                "label_last": s["label_last"] + jnp.where(len_eff > 0,
                                                          prev_gt, 0),
                "phrase_last": s["phrase_last"] + len_eff,
                "prev_len": jnp.where(len_eff > 0, len_eff, s["prev_len"]),
                "rng": rng, "i": i + 1}

    init = {
        "i": jnp.array(1, jnp.int32),
        "seq": jnp.full((B, L2), PAD, jnp.int32).at[:, 0].set(BOS),
        "extend_len": jnp.full((B, L2), PAD, jnp.int32).at[:, 0].set(LEN),
        "extend_word": jnp.full((B, L2), PAD, jnp.int32),
        "extend_syn": jnp.full((B, L2), PAD, jnp.int32).at[:, 0].set(LEN),
        "vis_dec": jnp.zeros((B, L), jnp.int32),
        "plan_len": jnp.zeros((B, L2), jnp.int32).at[:, 0].set(1),
        "plan_syn": jnp.full((B, L2), PAD, jnp.int32),
        "phrase_last": jnp.ones((B,), jnp.int32),
        "seq_last": jnp.zeros((B,), jnp.int32),
        "label_last": jnp.zeros((B,), jnp.int32),
        "prev_len": jnp.ones((B,), jnp.int32),
        "finished": jnp.zeros((B,), bool),
        "rng": rng,
    }
    s = jax.lax.while_loop(cond, body, init)
    return {"extend_word": s["extend_word"], "extend_syn": s["extend_syn"],
            "extend_len": s["extend_len"], "plan_len": s["plan_len"],
            "plan_syn": s["plan_syn"], "vis_dec": s["vis_dec"],
            "seq": s["seq"]}
