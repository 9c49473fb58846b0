"""Train the ACTUAL reference PyTorch ``TransformerModel`` on the synthetic
learnable corpus (CPU), saving a reference-format checkpoint pair
(``model.pth`` + ``infos_<id>.pkl``).

Purpose (round-3 validation): the reference's shipped COCO checkpoints are
LFS stubs, so the acceptance criterion "CIDEr within 0.5 of the PyTorch
checkpoint" could previously only be proxied by random-init tensor parity
(tests/test_torch_parity.py).  This tool produces a REAL TRAINED torch
checkpoint inside this image; ``tools/convert.py`` then converts it and
``tests/test_trained_parity.py`` asserts that ``tools/eval.py`` reproduces
the torch eval's captions token-exactly (greedy NA at B=1, where the
reference's ``last[j]`` fill-mask defect is invisible, and SA at any batch)
and its CIDEr-D to machine precision.

The training math is the reference's own: ``TransformerModel._forward``
(UIC branch, TransformerModel.py:1759-1775) +
``LanguageModelCriterion_UIC`` (modules/losses.py:315-369) + Adam — the
same computation ``modules/loss_wrapper.py:231-244`` runs per XE step.
Batches come from this framework's CaptionData, whose phrase-tensor
semantics are oracle-tested against the reference collate
(dataloader.py:343-428; tests/test_phrase_ops.py), with the extend tensors
built by the same closed forms the forward-parity tests feed the reference
model.

Usage:
    python scripts/make_synth_corpus.py --out data_synth --n_images 400
    python tools/train_reference_torch.py --data data_synth \
        --out ref_trained --iters 400
    python tools/convert.py --torch ref_trained/model.pth \
        --infos ref_trained/infos_ref.pkl --out_dir ref_trained/converted
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _import_reference():
    """Import the reference package with the same neutering the parity
    tests use (cuda syncs stubbed for CPU torch, optional deps stubbed)."""
    import torch
    for name in ("thop", "lmdbdict", "skimage", "skimage.io"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["thop"].profile = lambda *a, **k: (0, 0)
    torch.cuda.synchronize = lambda *a, **k: None
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # Reference defect (trainability under modern torch): the SA/NA
    # bounding loops preallocate their logprob buffers as
    # ``new_zeros(..., requires_grad=True)`` LEAVES and then write each
    # step's slice in-place (TransformerModel.py:481-495, :547-549) —
    # autograd forbids in-place writes into a grad-requiring leaf, so the
    # UIC XE forward raises under grad (the parity tests never hit this:
    # they run under no_grad).  Stripping the flag is gradient-equivalent:
    # the buffers become ordinary tensors whose slice writes autograd
    # records (CopySlices), and parameter grads flow through the per-step
    # logprob tensors exactly as intended.
    _orig_new_zeros = torch.Tensor.new_zeros

    def _new_zeros_no_leaf_grad(self, *a, **k):
        k.pop("requires_grad", None)
        return _orig_new_zeros(self, *a, **k)

    torch.Tensor.new_zeros = _new_zeros_no_leaf_grad
    from captioning.models.TransformerModel import TransformerModel
    from captioning.modules import losses as ref_losses
    return torch, TransformerModel, ref_losses


def reference_opt(args, vocab_size: int) -> argparse.Namespace:
    """The argparse.Namespace the reference pickles into infos['opt']
    (reference tools/train.py:62-69) — carries both the model hyperparams
    (consumed by TransformerModel.__init__, :1631-1640) and the data paths
    our eval CLI reads back after conversion."""
    return argparse.Namespace(
        train_mode=getattr(args, "train_mode", "UIC"),
        caption_model="transformer",
        N_enc=args.n_layers, N_dec=args.n_layers, N_len=1,
        d_model=args.d_model, d_ff=args.d_ff,
        num_att_heads=args.heads, dropout=0.1, drop_prob_lm=0.5,
        max_length=20, max_boxes=args.max_boxes,
        att_feat_size=2048, fc_feat_size=2048,
        input_encoding_size=args.d_model, rnn_size=128, num_layers=2,
        vocab_size=vocab_size, seq_length=20,
        decoder_input_mode="add", norm_mode="copy",
        att_hid_size=args.d_model, logit_layers=1, use_bn=0,
        seq_per_img=5, batch_size=args.batch_size,
        input_json=os.path.join(args.data, "data.json"),
        input_label_h5=os.path.join(args.data, "label.h5"),
        input_att_dir=os.path.join(args.data, "att"),
        input_fc_dir="", input_box_dir="", use_box=0,
        id=args.id, REFORWARD=False,
    )


def loader_cfg(args):
    from boficap_tpu.config import default_config, finalize
    cfg = default_config()
    cfg.train_mode = getattr(args, "train_mode", "UIC")
    cfg.input_json = os.path.join(args.data, "data.json")
    cfg.input_label_h5 = os.path.join(args.data, "label.h5")
    cfg.input_att_dir = os.path.join(args.data, "att")
    cfg.batch_size = args.batch_size
    cfg.seq_per_img = 5
    cfg.max_boxes = args.max_boxes
    cfg.id = args.id
    finalize(cfg)
    return cfg


def _flat_batch(data):
    """[B, S, ...] label tensors -> [B*S, ...] + att repeated per caption
    (what the reference's 3-D reshape + repeat_tensors path computes,
    TransformerModel.py:1714-1724/1703-1706, done host-side)."""
    labels = np.asarray(data["labels"])
    B, S, L2 = labels.shape
    fl = lambda x: np.asarray(x).reshape((-1,) + np.asarray(x).shape[2:])
    out = {
        "att": np.repeat(np.asarray(data["att_feats"]), S, axis=0),
        "am": np.repeat(np.asarray(data["att_masks"]), S, axis=0),
        "labels": fl(labels).astype(np.int64),
        "masks": fl(data["masks"]).astype(np.float32),
    }
    if data.get("phrase_num") is not None:
        out["pn"] = np.asarray(
            data["phrase_num"]).reshape(-1).astype(np.int64)
        out["pl"] = fl(data["phrase_length"]).astype(np.int64)
        out["ps"] = fl(data["phrase_syn"]).astype(np.int64)
    for k in ("pb_labels", "pb_word_mask"):   # PB_pad packed targets
        if data.get(k) is not None:           # (already [B*S, PL] flat)
            out[k] = np.asarray(data[k])
    return out


def train_reference(args):
    torch, TransformerModel, Crit = _import_reference()
    from boficap_tpu.data import phrase_ops as po
    from boficap_tpu.data.dataset import CaptionData

    cfg = loader_cfg(args)
    loader = CaptionData(cfg)
    vocab = loader.ix_to_word
    L = 20

    opt = reference_opt(args, loader.vocab_size)
    opt.vocab = vocab            # AttModel.py:103 reads it off the opt
    mode = opt.train_mode
    torch.manual_seed(args.seed)
    ref = TransformerModel(opt)
    ref.train()
    crit = (Crit.LanguageModelCriterion() if mode in ("AIC", "auto")
            else Crit.LanguageModelCriterion_NNAIC()
            if mode == "NNAIC"               # loss_wrapper.py:20
            else Crit.LanguageModelCriterion_NAIC()
            if mode in ("NAIC", "SAIC")      # loss_wrapper.py:21-22
            else Crit.LanguageModelCriterion_TUIC()
            if mode in ("UIC_s", "UIC_u")    # loss_wrapper.py:26-27
            else Crit.PB_pad_LanguageModelCriterion()
            if mode == "PB_pad"              # loss_wrapper.py:28-29
            else Crit.LanguageModelCriterion_UIC())
    optim = torch.optim.Adam(ref.parameters(), lr=args.lr,
                             betas=(0.9, 0.98), eps=1e-9)

    t0 = time.time()
    for it in range(args.iters):
        data = loader.get_batch("train")
        f = _flat_batch(data)
        optim.zero_grad()
        if mode in ("AIC", "auto"):
            # reference XE path (loss_wrapper.py:63): teacher-forced causal
            # forward on labels[:, :-1], NLL over labels[:, 1:]
            lp = ref._forward(
                torch.zeros(f["labels"].shape[0], 2048),
                torch.from_numpy(f["att"]),
                torch.from_numpy(f["labels"][:, :-1]),
                torch.from_numpy(f["am"]))
            loss = crit(lp, torch.from_numpy(f["labels"][:, 1:]),
                        torch.from_numpy(f["masks"][:, 1:]),
                        reduction="mean")
        elif mode == "NNAIC":
            # reference NNAIC XE (loss_wrapper.py:110-112): all-bos parallel
            # forward on labels[:, :-1]; word NLL + MSE length loss
            length_N, word_logprob = ref._forward(
                torch.zeros(f["labels"].shape[0], 2048),
                torch.from_numpy(f["att"]),
                torch.from_numpy(f["labels"][:, :-1]),
                torch.from_numpy(f["am"]))
            loss = crit(length_N, word_logprob,
                        torch.from_numpy(f["labels"][:, 1:]),
                        torch.from_numpy(f["masks"][:, 1:]),
                        reduction="mean")
        elif mode == "PB_pad":
            # reference PB_pad XE (loss_wrapper.py:353-355): _forward's
            # PB branch wants phrase_length at the PB collate width
            # max(pn)+2 (dataloader.py:363-365 — NOT the L+2 width the
            # other phrase modes use), and the loss runs over the PACKED
            # phrase targets + masks with the bos column dropped
            max_pn = int(f["pn"].max())
            pl_pb = f["pl"][:, :max_pn + 1]
            out = ref._forward(
                torch.zeros(f["labels"].shape[0], 2048),
                torch.from_numpy(f["att"]),
                torch.from_numpy(f["labels"]),
                torch.from_numpy(f["am"]),
                torch.from_numpy(f["pn"]), torch.from_numpy(pl_pb))
            loss = crit(
                torch.from_numpy(f["pb_labels"][:, 1:]), out[2],
                torch.from_numpy(
                    f["pb_word_mask"][:, 1:].astype(np.float32)),
                torch.from_numpy(f["pn"]),
                torch.from_numpy(pl_pb[:, 1:]),
                out[0], out[1], reduction="mean")[0]
        else:
            ext_syn = np.asarray(po.extend_syn_seq(f["pl"], f["ps"], L))
            ext_word = np.asarray(po.copy_init(f["labels"], f["pl"], L))
            ext_mask = np.asarray(po.blockwise_mask(f["pl"], L))
            if mode == "UIC_ds":
                # inner-module route (see --train_mode help): the 6-tuple
                # pre-generator, then log_softmax(ref.logit(.)) like
                # _forward's UIC branch does
                att_e = ref.att_embed(torch.from_numpy(f["att"]))
                t_mask = torch.from_numpy(f["am"]).unsqueeze(-2)
                sa_len, sa_syn, sa_h, na_len, na_syn, na_h = ref.model(
                    att_e, t_mask, torch.from_numpy(f["labels"]),
                    torch.from_numpy(f["pn"]), torch.from_numpy(f["pl"]),
                    torch.from_numpy(ext_syn.astype(np.int64)),
                    torch.from_numpy(ext_word.astype(np.int64)),
                    torch.from_numpy(ext_mask))
                out = (sa_len, sa_syn,
                       torch.log_softmax(ref.logit(sa_h), -1),
                       na_len, na_syn,
                       torch.log_softmax(ref.logit(na_h), -1))
            else:
                out = ref._forward(
                    torch.zeros(f["labels"].shape[0], 2048),
                    torch.from_numpy(f["att"]),
                    torch.from_numpy(f["labels"]),
                    torch.from_numpy(f["am"]), torch.from_numpy(f["pn"]),
                    torch.from_numpy(f["pl"]), torch.from_numpy(f["ps"]),
                    torch.from_numpy(ext_syn.astype(np.int64)),
                    torch.from_numpy(ext_word.astype(np.int64)),
                    torch.from_numpy(ext_mask), glat_p=-1.0)
            # SAIC _forward returns the 3-tuple the NAIC criterion eats
            # (loss_wrapper.py:139-142); UIC returns the 6-tuple; UIC_s/u
            # return the 7-tuple the TUIC criterion eats (loss_wrapper.py:
            # 312-318) — all share the trailing (pn, pl, ps, labels) args
            loss = crit(*out, torch.from_numpy(f["pn"]),
                        torch.from_numpy(f["pl"]),
                        torch.from_numpy(f["ps"]),
                        torch.from_numpy(f["labels"]),
                        reduction="mean")[0]
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 5.0)
        optim.step()
        if it % args.log_every == 0 or it == args.iters - 1:
            print(f"iter {it}: loss {loss.item():.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    os.makedirs(args.out, exist_ok=True)
    model_path = os.path.join(args.out, "model.pth")
    torch.save(ref.state_dict(), model_path)
    infos_path = os.path.join(args.out, f"infos_{args.id}.pkl")
    with open(infos_path, "wb") as fobj:
        pickle.dump({"opt": opt, "vocab": vocab, "iter": args.iters,
                     "epoch": 0, "vocab_size": loader.vocab_size,
                     "best_val_score": None}, fobj)
    print(f"wrote {model_path} and {infos_path}")
    return ref, loader, model_path, infos_path


def torch_eval_split(ref, loader, split="val", modes=("NAIC", "SAIC"),
                     max_images=None, with_logprobs=False):
    """Greedy eval through the reference's OWN ``_sample`` dispatcher
    (AttModel.py:419-437 -> core_NAIC/core_SAIC), one image per batch: at
    B=1 the core_NAIC fill mask is the sample's own plan, so the
    reference's ``last[j]`` defect (TransformerModel.py:1872-1874) cannot
    distort the comparison.  Returns {mode: {image_id: caption}} plus the
    gt references {image_id: [words...]}; with ``with_logprobs`` also the
    dense per-position word logprobs {mode: {image_id: [L, V] array}}, so
    a caller can tell a genuine divergence from a sub-noise argmax tie
    (cross-backend f32 matmuls legitimately differ by ~1e-3 relative on
    trained weights — oneDNN XLA:CPU vs torch MKL)."""
    import torch
    from boficap_tpu.eval.eval_utils import decode_sequence

    ref.eval()
    caps = {m: {} for m in modes}
    lps = {m: {} for m in modes}
    gts_words = {}

    # Plan-head margin capture (phrase families): hook every
    # ``get_predict_phrase_length_syn_part*`` bounding call and record the
    # per-round top-2 margins of the LENGTH and SYN heads.  The per-image
    # minimum is stored under lps[mode]["_plan_margin"] — a caption-level
    # divergence whose torch plan chain contained a decision inside
    # cross-backend noise (observed: len top-2 margin 0.0099 on a trained
    # UIC_s checkpoint) is attributable to that tie, which the WORD-logprob
    # margin rule cannot see (the flipped plan shifts every later word).
    plan_margins_round = []

    def _margin(lp_row):
        import numpy as _np
        top2 = _np.sort(_np.asarray(lp_row, dtype=_np.float64).ravel())[-2:]
        return float(top2[1] - top2[0])

    hooked_names = [n for n in dir(ref.model)
                    if n.startswith("get_predict_phrase_length_syn_part")]
    originals = {n: getattr(ref.model, n) for n in hooked_names}

    def _wrap(fn):
        def h(*a, **k):
            out = fn(*a, **k)
            # (len_N, len_logprob, syn_N, syn_logprob)
            plan_margins_round.append(min(_margin(out[1][0]),
                                          _margin(out[3][0])))
            return out
        return h

    for n in hooked_names:
        setattr(ref.model, n, _wrap(originals[n]))

    loader.reset_iterator(split)
    seen = set()
    while True:
        data = loader.get_batch(split)
        done = False
        for i, info in enumerate(data["infos"]):
            img_id = info["id"]
            if img_id in seen:
                done = True
                continue
            seen.add(img_id)
            att = torch.from_numpy(
                np.asarray(data["att_feats"][i:i + 1]))
            am = torch.from_numpy(np.asarray(data["att_masks"][i:i + 1]))
            with torch.no_grad():
                for m in modes:
                    plan_margins_round.clear()
                    out = ref(torch.zeros(1, 2048), att, am,
                              opt={"train_mode": m,
                                   "sample_method": "greedy",
                                   "temperature": 1.0},
                              mode="sample")
                    seq = out[0].numpy()
                    caps[m][img_id] = decode_sequence(
                        loader.ix_to_word, seq)[0]
                    if with_logprobs:
                        lps[m][img_id] = out[1][0].numpy().copy()
                        if plan_margins_round:
                            lps[m].setdefault("_plan_margin", {})[
                                img_id] = min(plan_margins_round)
            # same ids->words rule eval_split applies to its gts
            # (decode_sequence stops at the first id <= 3)
            gts_words[img_id] = decode_sequence(
                loader.ix_to_word, np.asarray(data["gts"][i]))
        if done or data["bounds"]["wrapped"]:
            break
        if max_images and len(seen) >= max_images:
            break
    for n, fn in originals.items():
        setattr(ref.model, n, fn)
    if with_logprobs:
        return caps, gts_words, lps
    return caps, gts_words


def torch_eval_beam(ref, loader, split="val", beam_size=3,
                    max_images=None):
    """Beam-search eval through the reference's own ``_sample_beam``
    (AttModel.py:263-305 -> CaptionModel.beam_search), one image per batch.
    Returns ({image_id: caption}, gts)."""
    import torch
    from boficap_tpu.eval.eval_utils import decode_sequence

    ref.eval()
    caps = {}
    gts_words = {}
    loader.reset_iterator(split)
    seen = set()
    while True:
        data = loader.get_batch(split)
        done = False
        for i, info in enumerate(data["infos"]):
            img_id = info["id"]
            if img_id in seen:
                done = True
                continue
            seen.add(img_id)
            att = torch.from_numpy(np.asarray(data["att_feats"][i:i + 1]))
            am = torch.from_numpy(np.asarray(data["att_masks"][i:i + 1]))
            with torch.no_grad():
                seq, _, _ = ref._sample_beam(
                    torch.zeros(1, 2048), att, am,
                    opt={"beam_size": beam_size, "group_size": 1,
                         "sample_method": "greedy", "sample_n": 1})
            caps[img_id] = decode_sequence(loader.ix_to_word,
                                           seq.numpy())[0]
            gts_words[img_id] = decode_sequence(
                loader.ix_to_word, np.asarray(data["gts"][i]))
        if done or data["bounds"]["wrapped"]:
            break
        if max_images and len(seen) >= max_images:
            break
    return caps, gts_words


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data_synth")
    # UIC_ds: the reference's own _forward passes glat_p into
    # EncoderDecoder_UIC_ds.forward, which takes no such argument
    # (TransformerModel.py:1770 vs :618) — its XE stage raises TypeError as
    # shipped (defect documented in PARITY.md).  The trainer drives the
    # inner module directly (att_embed + encode/decode + generator), the
    # same route test_uic_ds_forward_parity uses — _forward minus the
    # buggy glat argument.
    ap.add_argument("--train_mode", default="UIC",
                    choices=["UIC", "UIC_ds", "UIC_s", "UIC_u", "AIC",
                             "SAIC", "NNAIC", "PB_pad"])
    ap.add_argument("--out", default="ref_trained")
    ap.add_argument("--id", default="ref")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=10)
    ap.add_argument("--d_model", type=int, default=64)
    ap.add_argument("--d_ff", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--n_layers", type=int, default=2)
    ap.add_argument("--max_boxes", type=int, default=9)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=25)
    ap.add_argument("--eval_after", type=int, default=1,
                    help="run the torch-side val eval and print CIDEr-D")
    # --parity_dump: train + torch-eval in THIS process and pickle
    # everything the trained-parity fixtures need.  The test suite runs
    # this CLI as a SUBPROCESS: three one-process full-suite crashes (r4/
    # r5) all faulted inside XLA:CPU compile paths late in a pytest
    # process that had also run heavy in-process torch training — the two
    # runtimes' native state (LLVM/oneDNN/MKL) does not coexist reliably
    # at that volume, so the torch side is process-isolated here.
    ap.add_argument("--parity_dump", default="",
                    help="pickle path for the trained-parity eval bundle")
    ap.add_argument("--parity_modes", default="",
                    help="comma-separated torch_eval_split modes for the "
                         "dump (default: the train_mode's natural modes)")
    ap.add_argument("--parity_beam", type=int, default=0,
                    help="also dump beam_size=K beam captions (AIC)")
    ap.add_argument("--parity_norm_modes", type=int, default=0,
                    help="also dump compress/complex norm_mode evals "
                         "(PB_pad)")
    args = ap.parse_args(argv)

    ref, loader, model_path, infos_path = train_reference(args)
    if args.parity_dump:
        import pickle
        modes = (tuple(args.parity_modes.split(","))
                 if args.parity_modes else ("NAIC", "SAIC"))
        caps, gts, lps = torch_eval_split(ref, loader, "val", modes=modes,
                                          with_logprobs=True)
        dump = {"model_path": model_path, "infos_path": infos_path,
                "torch_caps": caps, "torch_lps": lps, "gts_words": gts,
                "word_to_ix": {w: int(i)
                               for i, w in loader.ix_to_word.items()}}
        if args.parity_beam:
            bc, _ = torch_eval_beam(ref, loader, "val",
                                    beam_size=args.parity_beam)
            dump["beam_caps"] = bc
        if args.parity_norm_modes:
            nm_caps, nm_lps = {}, {}
            for nm in ("compress", "complex"):
                ref.model.norm_mode = nm
                c, _, l = torch_eval_split(ref, loader, "val",
                                           modes=("PB_pad",),
                                           with_logprobs=True)
                nm_caps[nm], nm_lps[nm] = c["PB_pad"], l["PB_pad"]
            ref.model.norm_mode = "copy"
            dump["nm_caps"], dump["nm_lps"] = nm_caps, nm_lps
        with open(args.parity_dump, "wb") as f:
            pickle.dump(dump, f)
    if args.eval_after:
        from boficap_tpu.eval.metrics import language_eval
        modes = (("AIC",) if args.train_mode == "AIC"
                 else ("SAIC",) if args.train_mode == "SAIC"
                 else ("NNAIC",) if args.train_mode == "NNAIC"
                 else ("PB_pad",) if args.train_mode == "PB_pad"
                 # _sample's UIC_s-family dispatch keys (AttModel.py:438-466)
                 else ("UIC_s_NAIC", "UIC_s_SAIC", "UIC_s_AIC")
                 if args.train_mode in ("UIC_s", "UIC_u")
                 else ("NAIC", "SAIC"))
        caps, gts = torch_eval_split(ref, loader, "val", modes=modes)
        for m, d in caps.items():
            preds = [{"image_id": k, "caption": v} for k, v in d.items()]
            stats = language_eval(preds, gts)
            print(f"torch val[{m}]: CIDEr {stats.get('CIDEr'):.4f} "
                  f"Bleu_4 {stats.get('Bleu_4'):.4f} "
                  f"({len(preds)} images)")
    return model_path, infos_path


if __name__ == "__main__":
    main()
