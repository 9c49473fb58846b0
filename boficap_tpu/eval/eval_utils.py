"""Evaluation loop (parity with captioning/utils/eval_utils.py:129-651).

One unified ``eval_split`` covers what the reference spreads over seven
per-mode copies (AIC :160-226, NAIC :283-355, SAIC :356-428, UIC :429-505,
UIC_s/u :506-582): the decode path is selected by (train_mode,
inference_mode), everything else — loss meter, entropy/perplexity,
decode-time accounting, KD dump, prediction cache — is shared.

Decode-time accounting reproduces the reference's speed-measurement protocol
(the paper's speedup numbers sum a per-batch timer around the sample call,
AttModel.py:303-305/:408-410, printed at eval_utils.py:653): we time the
jit'd decode with ``block_until_ready`` so host/device async doesn't hide
work.  The first batch compiles, so it is EXCLUDED from decode_time and
reported separately as compile_time.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
import time
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..decode import ar as ar_mod
from ..decode import bound_fill as bf
from ..models.boficap import BoFiCap
from .metrics import BAD_ENDINGS, language_eval

VOCAB_LOWER = 3


def decode_sequence(ix_to_word: Dict[str, str], seq: np.ndarray,
                    limit: int = VOCAB_LOWER,
                    remove_bad_endings: bool = False) -> List[str]:
    """ids -> sentence, stopping at the first id <= limit
    (reference utils/misc.py:62-84)."""
    seq = np.asarray(seq)
    out = []
    for row in seq:
        words = []
        for ix in row:
            if int(ix) > limit:
                words.append(ix_to_word[str(int(ix))])
            else:
                break
        if remove_bad_endings:
            while words and words[-1] in BAD_ENDINGS:
                words.pop()
        out.append(" ".join(words).replace("@@ ", ""))
    return out


def _resolve_pallas_fill(flag, model) -> bool:
    """use_pallas_fill: auto = TPU AND lane-aligned model dims.  The pallas
    fused decoder layer has no CPU compile path, was only measured to win on
    TPU, and Mosaic rejects the kernel's [S, L, D] -> [S*L, D] collapse when
    D is not a multiple of the 128-lane tile (tiny smoke-test models)."""
    if not isinstance(model, BoFiCap):
        return False
    if isinstance(flag, str) and flag.lower() == "auto":
        return (jax.default_backend() == "tpu"
                and model.d_model % 128 == 0 and model.d_ff % 128 == 0)
    forced = (flag.lower() in ("1", "true", "yes", "on")
              if isinstance(flag, str) else bool(flag))
    if forced:
        # Fail with a clear message now rather than an opaque Mosaic
        # lowering error later.
        if jax.default_backend() != "tpu":
            raise ValueError(
                "use_pallas_fill=1 requires a TPU backend "
                f"(current: {jax.default_backend()}); use "
                "use_pallas_fill=auto to fall back automatically")
        if model.d_model % 128 != 0 or model.d_ff % 128 != 0:
            raise ValueError(
                "use_pallas_fill=1 requires d_model and d_ff to be "
                f"multiples of the 128-lane tile (got d_model="
                f"{model.d_model}, d_ff={model.d_ff})")
    return forced


def _trace_globals() -> tuple:
    """Snapshot of the module-level flags that steer tracing inside
    MultiHeadAttention (layers.py:92-118).  Two equal models traced under
    different flag states produce different programs, so any memoized
    program must key on this too — models.setup() flips PALLAS_ATTENTION
    per config, and attention capture is toggled around eval."""
    from ..models.layers import CAPTURE_ATTENTION, PALLAS_ATTENTION
    return (PALLAS_ATTENTION["enabled"], PALLAS_ATTENTION["interpret"],
            CAPTURE_ATTENTION["enabled"])


def _decode_cfg(model: BoFiCap, eval_kwargs) -> tuple:
    """The static decode knobs as one hashable tuple — the memoization key
    for _build_decoders."""
    return (
        model,
        _trace_globals(),
        int(eval_kwargs.get("beam_size", 1) or 1),
        eval_kwargs.get("sample_method", "greedy"),
        float(eval_kwargs.get("temperature", 1.0) or 1.0),
        int(eval_kwargs.get("group_size", 1) or 1),
        float(eval_kwargs.get("diversity_lambda", 0.5) or 0.5),
        bool(eval_kwargs.get("decoding_constraint", 0)),
        bool(eval_kwargs.get("block_trigrams", 0)),
        # reference beam_search suppresses UNK only when the top vocab id
        # IS UNK (CaptionModel.py:171-173); eval_split stashes the index
        eval_kwargs.get("_suppress_unk_idx"),
        eval_kwargs.get("_bad_endings_ix"),
        eval_kwargs.get("length_penalty", "") or "",
        _resolve_pallas_fill(eval_kwargs.get("use_pallas_fill", "auto"),
                             model),
        int(eval_kwargs.get("pb_packed_width", 0) or 0),
    )


def _jit_checked(globals_key: tuple):
    """jax.jit whose traced body first verifies the module-level attention
    flags still match the snapshot this program family was keyed on.  The
    check runs at TRACE time — the Python body executes during tracing,
    i.e. exactly when layers.py consumes PALLAS_ATTENTION /
    CAPTURE_ATTENTION — and costs nothing at execution.  This enforces the
    build-then-trace contract of _decode_cfg: a flag toggled between
    make_decoders()/_build_eval_loss_fn() and the first call would
    otherwise trace a program under the NEW flags but cache it under the
    OLD snapshot key (and serve stale programs on later lookups)."""
    def deco(fn):
        @functools.wraps(fn)
        def body(*a, **k):
            now = _trace_globals()
            if now != globals_key:
                raise RuntimeError(
                    "attention trace flags changed between decoder build "
                    f"(snapshot {globals_key}) and first trace (now {now})"
                    "; rebuild the decode/loss programs after toggling "
                    "PALLAS_ATTENTION/CAPTURE_ATTENTION")
            return fn(*a, **k)
        return jax.jit(body)
    return deco


@functools.lru_cache(maxsize=64)
def _build_decoders(cfg: tuple):
    """Weight-free jit decode programs for one static-knob tuple.  params
    is an ARGUMENT, not a closure constant: the HLO carries no weights, so
    the in-memory jit cache survives params updates (train-time periodic
    eval was recompiling every decode program per eval with the fresh
    weights baked in) and the persistent compile cache hits across
    processes — the same design serve.py uses for its bucket programs."""
    (model, _globals_key, beam_size, sample_method, temperature, group_size,
     diversity_lambda, decoding_constraint, block_trigrams,
     suppress_unk_idx, bad_endings_ix, length_penalty, fused,
     pb_width_i) = cfg
    jit_ = _jit_checked(_globals_key)

    @jit_
    def encode(params, att, am):
        if fused:
            return bf.fused_encode(model, params, att, am)
        return model.apply(params, att, am, deterministic=True,
                           method="encode")

    @jit_
    def dec_na(params, memory, src_mask, rng):
        return bf.na_decode(model, params, rng, memory, src_mask,
                            sample_method=sample_method,
                            temperature=temperature, fused_fill=fused)

    @jit_
    def dec_sa(params, memory, src_mask, rng):
        return bf.sa_decode(model, params, rng, memory, src_mask,
                            sample_method=sample_method,
                            temperature=temperature, fused_fill=fused)

    @jit_
    def dec_ar(params, memory, src_mask, rng):
        return ar_mod.ar_sample(model, params, rng, memory, src_mask,
                                sample_method=sample_method,
                                temperature=temperature,
                                decoding_constraint=decoding_constraint,
                                block_trigrams=block_trigrams,
                                bad_endings_ix=bad_endings_ix)

    @jit_
    def dec_beam(params, memory, src_mask):
        if group_size > 1:
            # diverse beam search (reference beam_search with group_size>1)
            return ar_mod.ar_diverse_beam_search(
                model, params, memory, src_mask, beam_size=beam_size,
                group_size=group_size, diversity_lambda=diversity_lambda,
                length_penalty=length_penalty,
                suppress_unk_idx=suppress_unk_idx,
                temperature=temperature,
                decoding_constraint=decoding_constraint,
                bad_endings_ix=bad_endings_ix)
        return ar_mod.ar_beam_search(
            model, params, memory, src_mask, beam_size=beam_size,
            length_penalty=length_penalty,
            suppress_unk_idx=suppress_unk_idx,
            temperature=temperature,
            decoding_constraint=decoding_constraint,
            bad_endings_ix=bad_endings_ix)

    @jit_
    def dec_nnaic(params, memory, src_mask, rng):
        return bf.nnaic_decode(model, params, rng, memory, src_mask,
                               sample_method=sample_method,
                               temperature=temperature, fused_fill=fused)

    @jit_
    def dec_sa_syn(params, memory, src_mask, rng):
        return bf.sa_decode(model, params, rng, memory, src_mask,
                            sample_method=sample_method,
                            temperature=temperature, predictor_use_syn=True,
                            fused_fill=fused)

    @jit_
    def dec_uic_s_ar(params, memory, src_mask, rng):
        return bf.uic_s_ar_decode(model, params, rng, memory, src_mask,
                                  sample_method=sample_method,
                                  temperature=temperature)

    from ..decode.pb import pb_decode as _pb
    pb_width = pb_width_i or None

    @jit_
    def dec_pb(params, memory, src_mask, rng):
        # one while_loop program (decode/pb.py::pb_decode); returns real
        # per-word logprobs/entropies like the sibling decoders (the old
        # host loop reported them absent).  pb_packed_width raises the
        # static packed-width cap (max_length*(max_length+1)//2 + 1 makes
        # the per-sample overflow clamp unreachable).
        return _pb(model, params, rng, memory, src_mask,
                   sample_method=sample_method, temperature=temperature,
                   packed_width=pb_width)

    return {"encode": encode, "NAIC": dec_na, "SAIC": dec_sa,
            "AIC": dec_ar, "beam": dec_beam, "NNAIC": dec_nnaic,
            "UIC_s_SAIC": dec_sa_syn, "UIC_s_AIC": dec_uic_s_ar,
            "PB_pad": dec_pb}


def make_decoders(model: BoFiCap, params, eval_kwargs):
    """jit'd decode callables keyed by branch — weight-free programs
    memoized on the static knobs, bound to THESE params by partial (see
    _build_decoders)."""
    fns = _build_decoders(_decode_cfg(model, eval_kwargs))
    return {k: functools.partial(f, params) for k, f in fns.items()}


def sample_n_captions(model, params, memory, src_mask, rng,
                      eval_kwargs) -> np.ndarray:
    """sample_n captions per image (reference eval_split_n,
    eval_utils.py:671-722): 'bs' = all beams of an n-wide beam search,
    'dbs' = diverse beam search with n groups, otherwise repeated sampling
    ('sample'/'gumbel'/'topK').  Returns ids [B, n, L]."""
    from ..decode.ar import (ar_beam_search, ar_diverse_beam_search,
                             ar_diverse_sample)
    n = int(eval_kwargs.get("sample_n", 1))
    method = eval_kwargs.get("sample_n_method", "sample")
    temperature = eval_kwargs.get("temperature", 1.0)
    # the same constraint surface the headline decoders get (the reference's
    # eval_split_n forwards the full eval_kwargs into _sample)
    length_penalty = eval_kwargs.get("length_penalty", "")
    suppress_unk_idx = eval_kwargs.get("_suppress_unk_idx")
    bad_endings_ix = eval_kwargs.get("_bad_endings_ix")
    if method == "bs":
        out = ar_beam_search(model, params, memory, src_mask, beam_size=n,
                             length_penalty=length_penalty,
                             suppress_unk_idx=suppress_unk_idx,
                             temperature=temperature,
                             decoding_constraint=bool(
                                 eval_kwargs.get("decoding_constraint", 0)),
                             bad_endings_ix=bad_endings_ix)
        return np.asarray(out["seq"])
    if method == "dbs":
        out = ar_diverse_beam_search(
            model, params, memory, src_mask, beam_size=n, group_size=n,
            diversity_lambda=eval_kwargs.get("diversity_lambda", 0.5),
            length_penalty=length_penalty,
            suppress_unk_idx=suppress_unk_idx,
            temperature=temperature,
            decoding_constraint=bool(
                eval_kwargs.get("decoding_constraint", 0)),
            bad_endings_ix=bad_endings_ix)
        return np.asarray(out["seq"])
    if method.startswith("d"):
        # dgreedy / dsample / dtopk / dtopp (reference eval_split_n's else
        # branch, eval_utils.py:713-719): group-diverse sampling with
        # group_size = n and the method name's 'd' stripped; the sampling
        # constraints apply exactly as in the plain sample path
        # (reference AttModel.py:563-576)
        out = ar_diverse_sample(
            model, params, rng, memory, src_mask, group_size=n,
            sample_method=method[1:], temperature=temperature,
            diversity_lambda=eval_kwargs.get("diversity_lambda", 0.5),
            decoding_constraint=bool(
                eval_kwargs.get("decoding_constraint", 0)),
            block_trigrams=bool(eval_kwargs.get("block_trigrams", 0)),
            bad_endings_ix=bad_endings_ix)
        return np.asarray(out["seq"])
    mem = jnp.repeat(memory, n, axis=0)
    msk = None if src_mask is None else jnp.repeat(src_mask, n, axis=0)
    sm = "sample" if method == "sample" else method
    out = ar_mod.ar_sample(
        model, params, rng, mem, msk, sample_method=sm,
        temperature=temperature,
        decoding_constraint=bool(eval_kwargs.get("decoding_constraint", 0)),
        block_trigrams=bool(eval_kwargs.get("block_trigrams", 0)),
        bad_endings_ix=bad_endings_ix)
    B = memory.shape[0]
    return np.asarray(out["seq"]).reshape(B, n, -1)


def _build_eval_loss_fn(model: BoFiCap):
    return _build_eval_loss_fn_cached(model, _trace_globals())


@functools.lru_cache(maxsize=16)
def _build_eval_loss_fn_cached(model: BoFiCap, _globals_key: tuple):
    """Weight-free teacher-forced XE loss program (params as an argument,
    like _build_decoders — train-time periodic eval reuses it across
    params updates instead of recompiling).  Keyed on the trace-time
    attention flags too (see _trace_globals)."""
    from ..train.steps import xe_loss_fn

    @_jit_checked(_globals_key)
    def loss_fn(params, att, am, labels, pn, pl, ps, masks):
        batch = {"att_feats": att, "att_masks": am, "labels": labels,
                 "masks": masks, "phrase_num": pn, "phrase_length": pl,
                 "phrase_syn": ps}
        loss, _ = xe_loss_fn(model, params, batch,
                             jax.random.PRNGKey(0), glat_p=None,
                             deterministic=True)
        return loss

    return loss_fn


def _stash_decode_constraints(model, ix_to_word, eval_kwargs
                              ) -> Dict[str, Any]:
    """Resolve suppress_UNK / remove_bad_endings into the vocab-index keys
    the decode programs are keyed on.  Shared by eval_split and
    report_flops so both build (and the jit cache reuses) the SAME
    programs."""
    ix_to_word = ix_to_word or {}
    # reference CaptionModel.py:171-173: beam search knocks the top vocab id
    # down by 1000 iff suppress_UNK is on AND that id decodes to 'UNK'
    if eval_kwargs.get("suppress_UNK", 0) and hasattr(model, "tgt_vocab"):
        top = str(int(model.tgt_vocab) - 1)
        if ix_to_word.get(top) == "UNK":
            eval_kwargs = dict(eval_kwargs,
                               _suppress_unk_idx=int(model.tgt_vocab) - 1)
    # reference AttModel.py:104 + :355-360 / CaptionModel.py:169-170:
    # remove_bad_endings forbids STOPPING right after a bad-ending word
    # during AR sampling and beam search (plus the string-level strip in
    # decode_sequence)
    if eval_kwargs.get("remove_bad_endings", 0):
        bad_ix = tuple(sorted(
            int(k) for k, v in ix_to_word.items() if v in BAD_ENDINGS))
        if bad_ix:
            eval_kwargs = dict(eval_kwargs, _bad_endings_ix=bad_ix)
    return eval_kwargs


def report_flops(model: BoFiCap, params, example_batch,
                 eval_kwargs: Dict[str, Any], inference_mode: str = "",
                 ix_to_word=None) -> Dict[str, Dict[str, float]]:
    """XLA cost analysis of the programs this eval would run — the
    TPU-native counterpart of the reference's FLOPs hooks (thop.profile
    calls, shipped commented out at TransformerModel.py:472-473,516-517,
    585-586, with configs/test_flops.yaml as their driver config).  Where
    thop counted module FLOPs module-by-module, XLA's compiler reports the
    cost of the ACTUAL compiled program (post-fusion, whole decode loop
    included).  Lowers the weight-free encode + branch-decode programs at
    the example batch's shapes — no device execution — and returns
    {program: {'flops', 'bytes_accessed', 'per_image_gflops'}}."""
    train_mode = eval_kwargs.get("train_mode", model.train_mode)
    branch = _branch_for(train_mode, inference_mode)
    beam_size = int(eval_kwargs.get("beam_size", 1) or 1)
    # same constraint stash as eval_split: without it the programs costed
    # (and AOT-compiled) here would differ from the ones the eval runs —
    # and the stash needs the vocab, so an omitted ix_to_word would
    # silently cost constraint-free programs instead
    if not ix_to_word and (eval_kwargs.get("suppress_UNK", 0)
                           or eval_kwargs.get("remove_bad_endings", 0)):
        raise ValueError(
            "report_flops: suppress_UNK/remove_bad_endings require "
            "ix_to_word (the vocab) to build the same constrained "
            "programs eval_split runs; pass ix_to_word=infos['vocab']")
    eval_kwargs = _stash_decode_constraints(model, ix_to_word, eval_kwargs)
    fns = _build_decoders(_decode_cfg(model, eval_kwargs))
    att = jnp.asarray(example_batch["att_feats"])
    am = jnp.asarray(example_batch["att_masks"])
    B = int(att.shape[0])
    # abstract memory: shape flows from encode without running anything
    mem_s = jax.eval_shape(fns["encode"], params, att, am)
    src_mask = am.astype(bool)
    rng = jax.random.PRNGKey(0)
    programs = {"encode": (fns["encode"], (params, att, am))}
    if branch == "AIC" and beam_size > 1:
        programs["beam"] = (fns["beam"], (params, mem_s, src_mask))
    else:
        programs[branch] = (fns[branch], (params, mem_s, src_mask, rng))
    out: Dict[str, Dict[str, float]] = {}
    for name, (fn, args) in programs.items():
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):      # some backends wrap it
            cost = cost[0] if cost else {}
        cost = cost or {}
        flops = float(cost.get("flops", 0.0))
        out[name] = {
            "flops": flops,
            "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
            "per_image_gflops": flops / B / 1e9,
        }
    return out


def _branch_for(train_mode: str, inference_mode: str) -> str:
    if train_mode in ("AIC", "auto"):
        return "AIC"
    if train_mode in ("NAIC", "SAIC", "NNAIC", "PB_pad"):
        return train_mode
    if train_mode in ("UIC_s", "UIC_u"):
        # predictor input is the syn plan for all three branches
        # (reference eval_utils.py:506-582, cores :2148-2391)
        m = inference_mode or "NAIC"
        return {"NAIC": "NAIC", "SAIC": "UIC_s_SAIC",
                "AIC": "UIC_s_AIC"}.get(m, "NAIC")
    # UIC / UIC_ds: inference_mode picks the branch (eval_utils.py:459)
    return inference_mode or "NAIC"


def eval_split(model: BoFiCap, params, loader, eval_kwargs: Dict[str, Any],
               inference_mode: str = "") -> Dict[str, Any]:
    """Returns {'loss', 'predictions', 'lang_stats', 'decode_time',
    'compile_time', 'n_images', 'images_per_s'}."""
    verbose = eval_kwargs.get("verbose", False)
    # -1 = the whole split (training-time eval passes val_images_use AS
    # num_images, tools/train.py; the eval CLI's explicit -1 must not be
    # silently capped by the val_images_use saved in the train infos)
    num_images = eval_kwargs.get("num_images", -1)
    if num_images is None:
        num_images = -1
    split = eval_kwargs.get("split", "val")
    lang_eval_flag = eval_kwargs.get("language_eval", 0)
    train_mode = eval_kwargs.get("train_mode", model.train_mode)
    beam_size = eval_kwargs.get("beam_size", 1)
    remove_bad = bool(eval_kwargs.get("remove_bad_endings", 0))
    KD_file = eval_kwargs.get("KD_file", "")
    branch = _branch_for(train_mode, inference_mode)

    eval_kwargs = _stash_decode_constraints(
        model, getattr(loader, "ix_to_word", {}), eval_kwargs)

    dec = make_decoders(model, params, eval_kwargs)
    verbose_loss = eval_kwargs.get("verbose_loss", 1)
    loss_fn = None
    if verbose_loss:
        loss_fn = functools.partial(_build_eval_loss_fn(model), params)

    loader.reset_iterator(split)
    ix_to_word = loader.ix_to_word

    sample_n = int(eval_kwargs.get("sample_n", 1))
    if sample_n > 1 and branch != "AIC":
        # parity note: the reference's eval_split_n has _sample branches
        # only for the AR train modes (AttModel.py:339-467) — for every
        # other mode it falls through to None and crashes on unpack.  We
        # skip instead, but say so rather than silently dropping the flag.
        print(f"sample_n={sample_n} is AR(AIC)-only; ignoring for branch "
              f"{branch} (the reference crashes here, AttModel.py:339-467)")
    n = 0
    loss_sum, loss_evals = 0.0, 1e-8
    predictions: List[dict] = []
    n_predictions: List[dict] = []
    gts_words: Dict[Any, List[str]] = {}
    decode_time = 0.0
    compile_time = 0.0
    first = True
    seq_kd: Dict[Any, List[str]] = {}
    rng = jax.random.PRNGKey(eval_kwargs.get("seed", 0))

    decoded_imgs = 0          # images through timed (post-compile) decodes
    first_imgs = 0
    while True:
        data = loader.get_batch(split)
        n += len(data["infos"])
        decoded_imgs += len(data["infos"])
        att = jnp.asarray(data["att_feats"])
        am = jnp.asarray(data["att_masks"])

        if loss_fn is not None and data.get("labels") is not None                 and model.train_mode != "PB_pad":
            # raw [B, S, ...] tensors: xe_loss_fn's _flat does the
            # caption-dimension flatten itself (steps.py:43-50)
            z = lambda k: (jnp.asarray(data[k])
                           if data.get(k) is not None else None)
            try:
                loss_sum += float(loss_fn(att, am, z("labels"),
                                          z("phrase_num"),
                                          z("phrase_length"),
                                          z("phrase_syn"), z("masks")))
                loss_evals += 1
            except Exception as e:
                # a mode without a plain jit loss path reports loss 0 —
                # loudly, so a shape bug can't silently zero the eval loss
                print(f"eval loss unavailable for {model.train_mode}: {e!r}")
                loss_fn = None

        t0 = time.perf_counter()
        memory = dec["encode"](att, am)
        src_mask = am.astype(bool)
        rng, k = jax.random.split(rng)
        ent_arr = None
        if branch == "AIC" and beam_size > 1:
            out = dec["beam"](memory, src_mask)
            seq_all = np.asarray(out["seq"])           # [B, K, L]
            seq = seq_all[:, 0]
            tok_lp = np.asarray(out["tok_logprobs"])[:, 0]
            if eval_kwargs.get("verbose_beam"):
                # reference eval_utils.py:186-190: print every done beam
                for i in range(seq_all.shape[0]):
                    print("\n".join(decode_sequence(ix_to_word, seq_all[i])))
                    print("--" * 10)
        else:
            out = dec[branch](memory, src_mask, k)
            seq = np.asarray(out["seq"])
            tok_lp = np.asarray(out["tok_logprobs"])
            ent_arr = np.asarray(out["entropy"])
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if first:
            compile_time = dt
            first = False
            first_imgs = len(data["infos"])
            redo = (att, am)           # re-timed post-loop if no other batch
        else:
            decode_time += dt
            redo = None

        n_tok = (seq > VOCAB_LOWER).sum(1) + 1
        ppl = -tok_lp.sum(1) / n_tok
        # the beam decoder keeps per-token logprobs but not distribution
        # entropies — entropy stays None there (absent, never faked)
        entropy = ent_arr.sum(1) / n_tok if ent_arr is not None else None

        sents = decode_sequence(ix_to_word, seq, remove_bad_endings=remove_bad)
        for kk, sent in enumerate(sents):
            img_id = data["infos"][kk]["id"]
            entry = {"image_id": img_id, "caption": sent,
                     "perplexity": float(ppl[kk]),
                     "entropy": (None if entropy is None
                                 else float(entropy[kk]))}
            if eval_kwargs.get("dump_path", 0) == 1:
                # include the source path in the dump
                # (reference eval_utils.py:198-199)
                entry["file_name"] = data["infos"][kk].get("file_path", "")
            predictions.append(entry)
            if eval_kwargs.get("dump_images", 0) == 1:
                # copy the image next to the predictions
                # (reference eval_utils.py:201-204); no-op when the loader
                # carries no file paths or the file is absent
                src = os.path.join(
                    str(eval_kwargs.get("image_root", "") or ""),
                    str(data["infos"][kk].get("file_path", "") or ""))
                if data["infos"][kk].get("file_path") and os.path.isfile(src):
                    import shutil
                    os.makedirs(os.path.join("vis", "imgs"), exist_ok=True)
                    shutil.copy(src, os.path.join(
                        "vis", "imgs", f"img{len(predictions)}.jpg"))
            gts_words[img_id] = decode_sequence(ix_to_word,
                                                data["gts"][kk])
            if verbose:
                print(f"image {img_id}: {sent}")

        if sample_n > 1 and branch == "AIC":
            ids = sample_n_captions(model, params, memory, src_mask, k,
                                    eval_kwargs)
            for i, info in enumerate(data["infos"]):
                for cap in decode_sequence(ix_to_word, ids[i]):
                    n_predictions.append({"image_id": info["id"],
                                          "caption": cap})

        if branch == "AIC" and beam_size > 1 and KD_file:
            for i, info in enumerate(data["infos"]):
                seq_kd[info["id"]] = decode_sequence(
                    ix_to_word, seq_all[i][:3])   # top-3 beams (KD recipe)

        ix1 = data["bounds"]["it_max"]
        if num_images != -1:
            ix1 = min(ix1, num_images)
        else:
            num_images = ix1
        for _ in range(n - ix1):
            predictions.pop()
            # keep the multi-sample set aligned with the scored image set:
            # drop the popped image's sample_n captions too
            if sample_n > 1 and branch == "AIC":
                for _ in range(sample_n):
                    if n_predictions:
                        n_predictions.pop()
        n = min(n, ix1)
        if num_images >= 0 and n >= num_images:
            break
        if data["bounds"]["wrapped"]:
            # split exhausted before num_images (reference eval_utils.py
            # breaks on wrapped too): stop instead of re-decoding the split
            # and over-popping predictions
            break

    lang_stats = None
    if lang_eval_flag:
        lang_stats = language_eval(predictions, gts_words)
        if n_predictions:
            # multi-sample block of the reference's language_eval
            # (eval_utils.py:105-121; its eval_multi module is not shipped
            # there — see eval/multi_metrics.py)
            from .multi_metrics import multi_sample_eval
            lang_stats.update(multi_sample_eval(
                n_predictions, gts_words,
                eval_oracle=bool(eval_kwargs.get("eval_oracle", 1))))

    if KD_file and seq_kd:
        os.makedirs("KD_dataset", exist_ok=True)
        with open(os.path.join("KD_dataset", KD_file), "w") as f:
            json.dump({str(k): v for k, v in seq_kd.items()}, f)

    n_imgs = len(predictions)
    # throughput counts every image the timed decodes processed (including
    # ones trimmed from the scored set), excluding only the compile batch
    timed_imgs = decoded_imgs - first_imgs
    if decode_time == 0 and redo is not None:
        # single-batch eval: the only decode was the compile call, so re-run
        # it (now compiled) for a meaningful rate
        att, am = redo
        t0 = time.perf_counter()
        memory = dec["encode"](att, am)
        if branch == "AIC" and beam_size > 1:
            out = dec["beam"](memory, am.astype(bool))
        else:
            out = dec[branch](memory, am.astype(bool), rng)
        jax.block_until_ready(out)
        decode_time = time.perf_counter() - t0
        timed_imgs = att.shape[0]
    return {
        "loss": loss_sum / loss_evals,
        "predictions": predictions,
        "n_predictions": n_predictions,
        "lang_stats": lang_stats,
        "decode_time": decode_time,
        "compile_time": compile_time,
        "n_images": n_imgs,
        "gts_words": gts_words,
        "images_per_s": timed_imgs / decode_time
        if decode_time > 0 else float("nan"),
    }


def cache_path(eval_kwargs) -> str:
    eid = eval_kwargs.get("id", "model")
    split = eval_kwargs.get("split", "val")
    os.makedirs("eval_results", exist_ok=True)
    return os.path.join("eval_results", f".saved_pred_{eid}_{split}.pkl")


def save_cached(eval_kwargs, result):
    with open(cache_path(eval_kwargs), "wb") as f:
        pickle.dump(result, f)


def load_cached(eval_kwargs):
    p = cache_path(eval_kwargs)
    if os.path.exists(p):
        with open(p, "rb") as f:
            return pickle.load(f)
    return None
