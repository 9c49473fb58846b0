"""Trained-checkpoint parity: the ACTUAL reference PyTorch model is TRAINED
(not random-init) on the synthetic learnable corpus, its checkpoint is
converted with tools/convert.py, and tools/eval.py must reproduce the torch
eval's captions and CIDEr-D.

This closes the acceptance criterion "CIDEr within 0.5 of the PyTorch
checkpoint" (BASELINE.md) inside this image: the reference's shipped COCO
checkpoints are 131-byte LFS stubs, so real trained weights have to be
produced here.  Where tests/test_torch_parity.py proves tensor/token parity
at random init, this file proves the whole chain — reference training
dynamics -> reference-format checkpoint -> converter -> our eval CLI ->
language metrics — agrees on weights shaped by hundreds of real gradient
steps.

Exactness calibration (measured, see PARITY.md "trained-weight parity"):
cross-backend f32 matmuls (oneDNN XLA:CPU / torch MKL) differ by ~1e-3
relative on trained weights, so a greedy token whose top-2 logit margin is
below that noise can legitimately flip (observed 2/40 captions at 400
iters, margins 0.003-0.03 in logprob space with |logprob| ~ 1-10).  The
assertions are therefore:
  * phrase PLANS (length/syn argmax chains) identical,
  * captions identical except where the torch-side margin at the (first)
    diverging position is below MARGIN_TOL — any above-noise divergence
    fails,
  * mismatch rate bounded, CIDEr-D within CIDER_TOL (~17x tighter than
    the 0.5 acceptance bound) and materially non-zero.

Torch-side eval runs the reference's own ``_sample`` dispatcher
(AttModel.py:419-437) at batch size 1, where the reference core_NAIC's
``last[j]`` fill-mask defect (TransformerModel.py:1872-1874, documented in
PARITY.md — we fix it, they don't) cannot distort the comparison.  Our
side runs the full tools/eval.py CLI at batch size 8 over the same split —
batch-shape invariance of our decode is part of what's being asserted.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains the torch reference (~2-3 min CPU)

torch = pytest.importorskip("torch")

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)

ITERS = int(os.environ.get("TRAINED_PARITY_ITERS", "250"))
MARGIN_TOL = 0.05      # logprob top-2 margin below which an argmax flip is
                       # attributable to cross-backend f32 noise (measured
                       # flips: 0.003-0.03; typical margins: 0.3-1.5)
MAX_FLIPS = 0.2        # fraction of captions allowed to carry such ties
CIDER_TOL = 0.15


def _ref_train_dump(root, train_mode, tag, iters, modes, beam=0,
                    norm_modes=0):
    """Synth corpus + reference torch training + torch eval in ONE
    subprocess (tools/train_reference_torch.py --parity_dump), returning
    the pickled eval bundle.

    Process isolation is load-bearing: three one-process full-suite runs
    (r4/r5) died with segfaults whose faulting frame was inside XLA:CPU
    compile paths (read-cache, write-cache, then raw backend_compile with
    the cache off), always after these fixtures had run heavy torch
    training IN-PROCESS — torch's and XLA's native state (LLVM/oneDNN/
    MKL) does not coexist reliably at that volume.  With the torch side
    in a child process, the pytest process never mixes the two."""
    corpus = str(root / "corpus")
    out = str(root / "ref_out")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/make_synth_corpus.py"),
         "--out", corpus, "--n_images", "200"],
        check=True, cwd=REPO)
    os.makedirs(out, exist_ok=True)
    dump_path = os.path.join(out, "parity_dump.pkl")
    cmd = [sys.executable,
           os.path.join(REPO, "tools", "train_reference_torch.py"),
           "--data", corpus, "--out", out, "--iters", str(iters),
           "--train_mode", train_mode, "--log_every", "100",
           "--eval_after", "0", "--id", tag,
           "--parity_dump", dump_path, "--parity_modes", ",".join(modes)]
    if beam:
        cmd += ["--parity_beam", str(beam)]
    if norm_modes:
        cmd += ["--parity_norm_modes", "1"]
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=2400)
    assert proc.returncode == 0, (
        f"reference training subprocess failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-1500:]}\n{proc.stderr[-2500:]}")
    import pickle
    with open(dump_path, "rb") as f:
        d = pickle.load(f)
    d["corpus"], d["out"], d["root"] = corpus, out, root
    return d


@pytest.fixture(scope="module")
def trained_reference(tmp_path_factory):
    """Build a small learnable corpus, train the actual reference UIC model
    on it, and torch-eval the val split (captions + dense logprobs) — all
    in a SUBPROCESS (see _ref_train_dump)."""
    root = tmp_path_factory.mktemp("trained_parity")
    return _ref_train_dump(root, "UIC", "ref", ITERS, ("NAIC", "SAIC"))


@pytest.fixture(scope="module")
def converted(trained_reference, tmp_path_factory):
    from tools.convert import main as convert_main
    out_dir = str(tmp_path_factory.mktemp("converted"))
    model_ckpt, infos_pkl = convert_main(
        ["--torch", trained_reference["model_path"],
         "--infos", trained_reference["infos_path"],
         "--out_dir", out_dir, "--id", "conv"])
    return model_ckpt, infos_pkl


@pytest.fixture(scope="module")
def our_results(trained_reference, converted):
    from tools.eval import main as eval_main
    model_ckpt, infos_pkl = converted
    out = {}
    for mode in ("NAIC", "SAIC"):
        out[mode] = eval_main([
            "--model", model_ckpt, "--infos_path", infos_pkl,
            "--split", "val", "--num_images", "-1",
            "--batch_size", "8", "--language_eval", "1",
            "--inference_mode", mode,
            "--id", f"trained_parity_{mode}", "--force", "1"])
    return out


def _tok_ids(caption, word_to_ix):
    return [word_to_ix[w] for w in caption.split() if w]



def assert_caption_parity(ours, theirs, lps, w2i, margin_tol,
                          label="", eos_id=0):
    """Shared margin-rule comparison: captions must match token-exactly
    except where the torch-side top-2 logprob margin at the FIRST
    diverging position is within cross-backend noise; bounded flip rate.
    ``eos_id`` pads the shorter caption's ids (AR compares against EOS=2,
    phrase modes against PAD=0).

    Phrase families add a PLAN-margin fallback: when ``lps`` carries
    ``"_plan_margin"`` (per-image minimum top-2 margin of the torch
    length/syn bounding heads, captured by torch_eval_split), a word-level
    hard divergence on an image whose plan chain contained a decision
    inside that noise is reclassified as a sub-noise flip — a flipped
    bound shifts every later word, so word margins say nothing about
    which side erred (measured instance: len-head margin 0.0099 flipped a
    trained UIC_s SA plan between backends)."""
    assert set(k for k in ours if not isinstance(k, str)) == \
        set(k for k in theirs if not isinstance(k, str))
    plan_margin = lps.get("_plan_margin", {}) if hasattr(lps, "get") else {}
    flips, hard = [], []
    for img_id, t_cap in theirs.items():
        o_cap = ours[img_id]
        if o_cap == t_cap:
            continue
        t_ids = _tok_ids(t_cap, w2i)
        o_ids = _tok_ids(o_cap, w2i)
        lp = lps[img_id]
        for pos in range(max(len(t_ids), len(o_ids))):
            t_tok = t_ids[pos] if pos < len(t_ids) else eos_id
            o_tok = o_ids[pos] if pos < len(o_ids) else eos_id
            if t_tok == o_tok:
                continue
            # No logprob evidence past the torch caption: the reference
            # zero-fills post-finish rows (AttModel.py:403 `logprobs *
            # unfinished`), so a margin read there would be 0 and silently
            # classify a REAL length divergence as a sub-noise flip.  An
            # out-of-range or all-zero torch row is a hard divergence.
            # (The eos-decision row itself — pos == len(t_ids) for AR —
            # has real values and keeps the margin rule: a sub-noise eos
            # tie is the legitimate length-flip case.)
            pm = plan_margin.get(img_id, float("inf"))
            if pos >= lp.shape[0] or not np.any(lp[pos]):
                ((flips if pm <= margin_tol else hard)
                 .append((img_id, pos, float("nan"), o_cap, t_cap)))
                break
            margin = float(lp[pos, t_tok] - lp[pos, o_tok])
            (flips if margin <= margin_tol or pm <= margin_tol
             else hard).append((img_id, pos, min(margin, pm), o_cap, t_cap))
            # judge only the FIRST divergence: SA/AR condition later tokens
            # on earlier ones, and for NA later positions are independent
            break
    assert not hard, (
        f"{label}: {len(hard)} caption(s) diverge ABOVE the noise margin "
        f"{margin_tol}: {hard[:5]}")
    assert len(flips) <= MAX_FLIPS * len(theirs), (
        f"{label}: too many sub-noise flips ({len(flips)}/{len(theirs)}): "
        f"{flips[:10]}")


@pytest.mark.parametrize("mode", ["NAIC", "SAIC"])
def test_trained_checkpoint_caption_parity(trained_reference, our_results,
                                           mode):
    """Val captions from tools/eval.py on the converted TRAINED checkpoint
    vs the reference's own greedy decode: identical, except where the
    torch logprobs show a sub-noise argmax tie at the (first) diverging
    token."""
    result = our_results[mode]
    ours = {p["image_id"]: p["caption"] for p in result["predictions"]}
    theirs = trained_reference["torch_caps"][mode]
    lps = trained_reference["torch_lps"][mode]
    w2i = trained_reference["word_to_ix"]
    assert_caption_parity(ours, theirs, lps, w2i, MARGIN_TOL, label=mode)


def test_trained_checkpoint_cider_parity(trained_reference, our_results):
    """CIDEr-D of the converted-eval captions vs the torch-eval captions
    (same scorer, same gts): within CIDER_TOL — far tighter than the 0.5
    acceptance bound — and materially non-zero so the claim has teeth."""
    from boficap_tpu.eval.metrics import language_eval
    gts = trained_reference["gts_words"]
    for mode in ("NAIC", "SAIC"):
        ours_stats = our_results[mode]["lang_stats"]
        theirs = trained_reference["torch_caps"][mode]
        preds = [{"image_id": k, "caption": v} for k, v in theirs.items()]
        torch_stats = language_eval(preds, gts)
        assert ours_stats["CIDEr"] == pytest.approx(
            torch_stats["CIDEr"], abs=CIDER_TOL), mode
        assert torch_stats["CIDEr"] > 0.05, (
            f"{mode}: trained checkpoint scored {torch_stats['CIDEr']}; "
            "training produced nothing to compare")
        assert ours_stats["CIDEr"] > 0.05, mode


# --------------------------------------------------------------------- AIC
# Same pipeline for the AUTOREGRESSIVE family: trained AIC checkpoint ->
# converter -> tools/eval.py greedy AND beam search vs the reference's own
# _sample / _sample_beam.


@pytest.fixture(scope="module")
def trained_aic(tmp_path_factory):
    root = tmp_path_factory.mktemp("trained_parity_aic")
    d = _ref_train_dump(root, "AIC", "refaic", max(ITERS, 250), ("AIC",),
                        beam=3)
    d["torch_caps"] = d["torch_caps"]["AIC"]
    d["torch_lps"] = d["torch_lps"]["AIC"]
    return d


@pytest.fixture(scope="module")
def converted_aic(trained_aic, tmp_path_factory):
    from tools.convert import main as convert_main
    out_dir = str(tmp_path_factory.mktemp("converted_aic"))
    return convert_main(
        ["--torch", trained_aic["model_path"],
         "--infos", trained_aic["infos_path"],
         "--out_dir", out_dir, "--id", "convaic"])


def test_trained_aic_greedy_parity(trained_aic, converted_aic):
    """AR greedy on the converted trained checkpoint vs the reference's
    _sample: token-exact except where the torch logprobs show a sub-noise
    tie at the FIRST diverging step (everything after a flip legitimately
    differs — AR conditions on the prefix)."""
    from tools.eval import main as eval_main
    model_ckpt, infos_pkl = converted_aic
    result = eval_main([
        "--model", model_ckpt, "--infos_path", infos_pkl,
        "--split", "val", "--num_images", "-1", "--batch_size", "8",
        "--language_eval", "1", "--id", "trained_parity_aic",
        "--force", "1"])
    ours = {p["image_id"]: p["caption"] for p in result["predictions"]}
    theirs = trained_aic["torch_caps"]
    lps = trained_aic["torch_lps"]
    w2i = trained_aic["word_to_ix"]
    # the cross-backend deviation scales with trained weight magnitude:
    # sharper checkpoints (AIC/SAIC/UIC_ds train to lower loss in the same
    # iters) show measured flips to ~0.06, so they get 2.5x the UIC bound —
    # still 3-10x below the decisive margins (0.3-1.5)
    assert_caption_parity(ours, theirs, lps, w2i, 2.5 * MARGIN_TOL,
                          label="AIC", eos_id=2)
    # CIDEr parity (same scorer, same gts)
    from boficap_tpu.eval.metrics import language_eval
    preds = [{"image_id": k, "caption": v} for k, v in theirs.items()]
    torch_stats = language_eval(preds, trained_aic["gts_words"])
    assert result["lang_stats"]["CIDEr"] == pytest.approx(
        torch_stats["CIDEr"], abs=CIDER_TOL)
    assert torch_stats["CIDEr"] > 0.05


def test_trained_aic_beam_parity(trained_aic, converted_aic):
    """Beam search (K=3) on the converted trained checkpoint vs the
    reference's _sample_beam.  Beam ties compound (a sub-noise flip at one
    expansion reroutes whole beams), so the assertion is agreement-rate +
    CIDEr closeness rather than per-token margins."""
    from tools.eval import main as eval_main
    model_ckpt, infos_pkl = converted_aic
    result = eval_main([
        "--model", model_ckpt, "--infos_path", infos_pkl,
        "--split", "val", "--num_images", "-1", "--batch_size", "8",
        "--beam_size", "3", "--language_eval", "1",
        "--id", "trained_parity_aic_beam", "--force", "1"])
    ours = {p["image_id"]: p["caption"] for p in result["predictions"]}
    theirs = trained_aic["beam_caps"]
    assert set(ours) == set(theirs)
    agree = sum(1 for k in ours if ours[k] == theirs[k]) / len(ours)
    assert agree >= 0.6, (
        f"beam caption agreement {agree:.2f}; diffs: "
        f"{[(k, ours[k], theirs[k]) for k in ours if ours[k] != theirs[k]][:5]}")
    from boficap_tpu.eval.metrics import language_eval
    preds = [{"image_id": k, "caption": v} for k, v in theirs.items()]
    torch_stats = language_eval(preds, trained_aic["gts_words"])
    assert result["lang_stats"]["CIDEr"] == pytest.approx(
        torch_stats["CIDEr"], abs=0.2)


# -------------------------------------------------------------------- SAIC
# Third trained family: the SA-only model (separate criterion wiring and a
# single SA decoder role) through the same pipeline.


@pytest.fixture(scope="module")
def trained_saic(tmp_path_factory):
    root = tmp_path_factory.mktemp("trained_parity_saic")
    d = _ref_train_dump(root, "SAIC", "refsaic", max(ITERS, 250),
                        ("SAIC",))
    d["torch_caps"] = d["torch_caps"]["SAIC"]
    d["torch_lps"] = d["torch_lps"]["SAIC"]
    return d


def test_trained_saic_parity(trained_saic, tmp_path_factory):
    """SAIC-trained checkpoint through convert + tools/eval.py: captions
    token-exact up to the first-divergence margin rule; CIDEr-D within
    tolerance of the torch eval."""
    from tools.convert import main as convert_main
    from tools.eval import main as eval_main
    out_dir = str(tmp_path_factory.mktemp("converted_saic"))
    model_ckpt, infos_pkl = convert_main(
        ["--torch", trained_saic["model_path"],
         "--infos", trained_saic["infos_path"],
         "--out_dir", out_dir, "--id", "convsaic"])
    result = eval_main([
        "--model", model_ckpt, "--infos_path", infos_pkl,
        "--split", "val", "--num_images", "-1", "--batch_size", "8",
        "--language_eval", "1", "--inference_mode", "SAIC",
        "--id", "trained_parity_saiconly", "--force", "1"])
    ours = {p["image_id"]: p["caption"] for p in result["predictions"]}
    theirs = trained_saic["torch_caps"]
    lps = trained_saic["torch_lps"]
    w2i = trained_saic["word_to_ix"]
    assert_caption_parity(ours, theirs, lps, w2i, 2.5 * MARGIN_TOL,
                          label="SAIC-only")
    from boficap_tpu.eval.metrics import language_eval
    preds = [{"image_id": k, "caption": v} for k, v in theirs.items()]
    torch_stats = language_eval(preds, trained_saic["gts_words"])
    assert result["lang_stats"]["CIDEr"] == pytest.approx(
        torch_stats["CIDEr"], abs=CIDER_TOL)


# ------------------------------------------------------------------ UIC_ds
# Fourth trained family: separate SA/NA decoder stacks — trained validation
# of the converter's decoder_SA/decoder_NA -> decoder0/decoder1 mapping.
# (The reference's own _forward cannot train UIC_ds — it passes glat_p into
# a forward that doesn't take it, PARITY.md; the trainer drives the inner
# module exactly like test_uic_ds_forward_parity.)


@pytest.fixture(scope="module")
def trained_uic_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("trained_parity_uicds")
    return _ref_train_dump(root, "UIC_ds", "refds", max(ITERS, 250),
                           ("NAIC", "SAIC"))


# ------------------------------------------------------- shared family rig
# Families 5-9 (UIC_s, UIC_u, PB_pad, NNAIC) use one parameterized builder:
# synth corpus -> train the ACTUAL reference in that train_mode -> torch-eval
# with dense logprobs.  (The four families above predate it and keep their
# bespoke fixtures — they are the proven round-3 shape.)


def _build_trained(tmp_path_factory, train_mode, eval_modes, tag,
                   norm_modes=0):
    root = tmp_path_factory.mktemp(f"trained_parity_{tag}")
    return _ref_train_dump(root, train_mode, tag, max(ITERS, 250),
                           eval_modes, norm_modes=norm_modes)


def _convert(src, tmp_path_factory, tag):
    from tools.convert import main as convert_main
    out_dir = str(tmp_path_factory.mktemp(f"converted_{tag}"))
    return convert_main(
        ["--torch", src["model_path"], "--infos", src["infos_path"],
         "--out_dir", out_dir, "--id", f"conv{tag}"])


def _assert_family_parity(src, converted, torch_mode, eval_argv_extra,
                          label, eos_id=0, margin_scale=2.5,
                          run_id=None, batch_size=8):
    """Our eval CLI on the converted checkpoint vs the stored torch eval:
    margin-rule captions + CIDEr-D tolerance (the round-3 shape)."""
    from tools.eval import main as eval_main
    model_ckpt, infos_pkl = converted
    result = eval_main([
        "--model", model_ckpt, "--infos_path", infos_pkl,
        "--split", "val", "--num_images", "-1",
        "--batch_size", str(batch_size),
        "--language_eval", "1", "--id", run_id or f"tp_{label}",
        "--force", "1"] + eval_argv_extra)
    ours = {p["image_id"]: p["caption"] for p in result["predictions"]}
    theirs = src["torch_caps"][torch_mode]
    lps = src["torch_lps"][torch_mode]
    assert_caption_parity(ours, theirs, lps, src["word_to_ix"],
                          margin_scale * MARGIN_TOL, label=label,
                          eos_id=eos_id)
    from boficap_tpu.eval.metrics import language_eval
    preds = [{"image_id": k, "caption": v} for k, v in theirs.items()]
    torch_stats = language_eval(preds, src["gts_words"])
    assert result["lang_stats"]["CIDEr"] == pytest.approx(
        torch_stats["CIDEr"], abs=CIDER_TOL), label
    assert torch_stats["CIDEr"] > 0.05, (
        f"{label}: trained checkpoint scored {torch_stats['CIDEr']}; "
        "training produced nothing to compare")
    return result, torch_stats


# ------------------------------------------------------------- UIC_s/UIC_u
# Families 5+6: the three-decoder (AR + SA + NA) and fully-unified
# one-decoder models, trained through the reference's own _forward + TUIC
# criterion; all three inference branches checked on trained weights —
# including core_UIC_s_AIC, the AR branch that only these families expose
# (reference TransformerModel.py:744-975, AttModel.py:438-466).


@pytest.fixture(scope="module")
def trained_uic_s(tmp_path_factory):
    return _build_trained(tmp_path_factory, "UIC_s",
                          ("UIC_s_NAIC", "UIC_s_SAIC", "UIC_s_AIC"), "uics")


@pytest.fixture(scope="module")
def converted_uic_s(trained_uic_s, tmp_path_factory):
    return _convert(trained_uic_s, tmp_path_factory, "uics")


@pytest.mark.parametrize("mode", ["NAIC", "SAIC", "AIC"])
def test_trained_uic_s_parity(trained_uic_s, converted_uic_s, mode):
    _assert_family_parity(
        trained_uic_s, converted_uic_s, f"UIC_s_{mode}",
        ["--inference_mode", mode], f"UIC_s/{mode}",
        eos_id=2 if mode == "AIC" else 0,
        run_id=f"tp_uics_{mode}")


@pytest.fixture(scope="module")
def trained_uic_u(tmp_path_factory):
    return _build_trained(tmp_path_factory, "UIC_u",
                          ("UIC_s_NAIC", "UIC_s_SAIC", "UIC_s_AIC"), "uicu")


@pytest.fixture(scope="module")
def converted_uic_u(trained_uic_u, tmp_path_factory):
    return _convert(trained_uic_u, tmp_path_factory, "uicu")


@pytest.mark.parametrize("mode", ["NAIC", "SAIC", "AIC"])
def test_trained_uic_u_parity(trained_uic_u, converted_uic_u, mode):
    _assert_family_parity(
        trained_uic_u, converted_uic_u, f"UIC_s_{mode}",
        ["--inference_mode", mode], f"UIC_u/{mode}",
        eos_id=2 if mode == "AIC" else 0,
        run_id=f"tp_uicu_{mode}")


# ----------------------------------------------------------------- PB_pad
# Family 7: the legacy phrase-based variant — private predictor word embed
# (lp_word_embed), packed while_loop decode, and all THREE norm_modes on
# ONE trained checkpoint (norm_mode only selects the decoder-input
# assembly; the parameter set is identical, so flipping it exercises each
# assembly path on the same trained weights — reference
# TransformerModel.py:1167-1203).


@pytest.fixture(scope="module")
def trained_pb_pad(tmp_path_factory):
    # norm_modes=1: the subprocess also evals compress/complex on the same
    # trained copy-mode checkpoint (the parameter set is identical; only
    # the decoder-input assembly changes — see --parity_norm_modes)
    return _build_trained(tmp_path_factory, "PB_pad", ("PB_pad",), "pb",
                          norm_modes=1)


@pytest.fixture(scope="module")
def converted_pb(trained_pb_pad, tmp_path_factory):
    return _convert(trained_pb_pad, tmp_path_factory, "pb")


@pytest.mark.parametrize("norm_mode", ["copy", "compress", "complex"])
def test_trained_pb_pad_parity(trained_pb_pad, converted_pb, tmp_path,
                               norm_mode):
    src = dict(trained_pb_pad)
    if norm_mode != "copy":   # checkpoint was trained with norm_mode=copy
        src["torch_caps"] = {"PB_pad": trained_pb_pad["nm_caps"][norm_mode]}
        src["torch_lps"] = {"PB_pad": trained_pb_pad["nm_lps"][norm_mode]}
    cfg_yaml = str(tmp_path / f"nm_{norm_mode}.yml")
    with open(cfg_yaml, "w") as f:
        f.write(f"norm_mode: {norm_mode}\n")
    # batch_size=1: PB_pad inference is inherently BATCH-COMPOSITION-
    # dependent in the reference — each round's packed column width is the
    # max of the BATCH's predicted next-phrase lengths and pos_embed runs
    # over the packed axis (TransformerModel.py:1158-1164, 1204), so one
    # image's logits legitimately shift with its batchmates' plans.  Our
    # decode reproduces that layout semantics (decode/pb.py), making B=1
    # the only apples-to-apples comparison against the per-image torch
    # eval.  (The other 8 families are batch-shape invariant and keep B=8.)
    _assert_family_parity(src, converted_pb, "PB_pad",
                          ["--cfg", cfg_yaml], f"PB_pad/{norm_mode}",
                          run_id=f"tp_pb_{norm_mode}", batch_size=1)


# ------------------------------------------------------------------ NNAIC
# Family 8: the naive fully-parallel baseline — whole-caption MLP length
# head (LengthPredictor_NNAIC, reference TransformerModel.py:1221-1281),
# the one head shape no other family shares.


@pytest.fixture(scope="module")
def trained_nnaic(tmp_path_factory):
    return _build_trained(tmp_path_factory, "NNAIC", ("NNAIC",), "nnaic")


def test_trained_nnaic_parity(trained_nnaic, tmp_path_factory):
    converted = _convert(trained_nnaic, tmp_path_factory, "nnaic")
    _assert_family_parity(trained_nnaic, converted, "NNAIC", [],
                          "NNAIC", run_id="tp_nnaic")


@pytest.mark.parametrize("mode", ["NAIC", "SAIC"])
def test_trained_uic_ds_parity(trained_uic_ds, tmp_path_factory, mode):
    """UIC_ds-trained checkpoint through convert + tools/eval.py: the
    two-decoder converter mapping with REAL trained (divergent) stacks,
    margin-rule caption parity + CIDEr tolerance per branch."""
    from tools.convert import main as convert_main
    from tools.eval import main as eval_main
    out_dir = str(tmp_path_factory.mktemp(f"converted_ds_{mode}"))
    model_ckpt, infos_pkl = convert_main(
        ["--torch", trained_uic_ds["model_path"],
         "--infos", trained_uic_ds["infos_path"],
         "--out_dir", out_dir, "--id", "convds"])
    result = eval_main([
        "--model", model_ckpt, "--infos_path", infos_pkl,
        "--split", "val", "--num_images", "-1", "--batch_size", "8",
        "--language_eval", "1", "--inference_mode", mode,
        "--id", f"trained_parity_ds_{mode}", "--force", "1"])
    ours = {p["image_id"]: p["caption"] for p in result["predictions"]}
    theirs = trained_uic_ds["torch_caps"][mode]
    lps = trained_uic_ds["torch_lps"][mode]
    w2i = trained_uic_ds["word_to_ix"]
    assert_caption_parity(ours, theirs, lps, w2i, 2.5 * MARGIN_TOL,
                          label=f"UIC_ds/{mode}")
    from boficap_tpu.eval.metrics import language_eval
    preds = [{"image_id": k, "caption": v} for k, v in theirs.items()]
    torch_stats = language_eval(preds, trained_uic_ds["gts_words"])
    assert result["lang_stats"]["CIDEr"] == pytest.approx(
        torch_stats["CIDEr"], abs=CIDER_TOL), mode
