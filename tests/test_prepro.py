"""Preprocessing tests: vocab/encode round trip, cutters, phrase-pair
merging, KD splice, and the full prepro pipeline feeding CaptionData."""

import json

import numpy as np
import pytest

from boficap_tpu.constants import SYN_CP, SYN_NP, SYN_VP
from boficap_tpu.prepro.labels import (assemble_phrases, build_vocab,
                                       cut_captions, encode_captions,
                                       heuristic_chunks, run_prepro)
from boficap_tpu.prepro.phrase_pairs import (learn_phrase_pairs,
                                             splice_kd_captions)


def tiny_dataset(n=6):
    sents = [
        "a brown dog is running in the park",
        "a man riding a wave on a surfboard",
        "two cats sitting on a red couch",
        "a brown dog is running in the park",
        "a man riding a wave on a surfboard",
    ]
    imgs = []
    for i in range(n):
        ss = [{"raw": s, "tokens": s.split()} for s in sents]
        if i == 0:  # one rare word so UNK folding has something to fold
            ss[2] = {"raw": "two cats near a xylophone",
                     "tokens": "two cats near a xylophone".split()}
        imgs.append({
            "cocoid": i,
            "split": "train" if i < n - 2 else ("val" if i == n - 2 else "test"),
            "filepath": "val2014", "filename": f"img{i}.jpg",
            "sentences": ss,
        })
    return {"images": imgs}


def test_build_vocab_threshold():
    data = tiny_dataset()
    vocab = build_vocab(data["images"], count_thr=5)
    assert "a" in vocab                    # frequent
    assert "UNK" in vocab                  # rare words got folded
    caps = data["images"][0]["final_captions"]
    assert all(isinstance(w, str) for c in caps for w in c)


def test_encode_captions_pointers():
    data = tiny_dataset()
    build_vocab(data["images"], count_thr=0)
    wtoi_words = sorted({w for img in data["images"]
                         for c in img["final_captions"] for w in c})
    wtoi = {w: i + 4 for i, w in enumerate(wtoi_words)}
    labels, start, end, length = encode_captions(data["images"], 20, wtoi)
    assert labels.shape[0] == 6 * 5
    assert start[0] == 1 and end[0] == 5 and start[1] == 6
    assert (length > 0).all()
    assert labels.max() >= 4               # 4-indexed ids


def test_heuristic_chunks_cover_all_tokens():
    toks = "a brown dog is running in the park".split()
    spans = heuristic_chunks(toks)
    pl, lab, cnt = assemble_phrases(len(toks), spans, 20)
    assert pl[:cnt].sum() == len(toks)
    assert set(lab[:cnt]) <= {SYN_VP, SYN_NP, SYN_CP}


def test_full_prepro_feeds_caption_data(tmp_path):
    data = tiny_dataset()
    dj = tmp_path / "dataset.json"
    json.dump(data, open(dj, "w"))
    oj = str(tmp_path / "cocotalk.json")
    oh = str(tmp_path / "cocotalk_label.h5")
    run_prepro(str(dj), oj, oh, max_length=20, word_count_threshold=0,
               cutter="heuristic")

    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.data.dataset import CaptionData
    cfg = default_config()
    cfg.train_mode = "UIC"
    cfg.input_json = oj
    cfg.input_label_h5 = oh
    cfg.input_att_dir = "synthetic"
    cfg.batch_size = 2
    cfg.max_boxes = 9
    cfg.id = "t"
    finalize(cfg)
    d = CaptionData(cfg)
    b = d.get_batch("train")
    assert (b["phrase_length"].sum(-1) <= 21).all()
    assert (b["labels"][:, :, 1] >= 4).all()   # first word is a real word
    # every caption's phrase plan covers exactly its words
    pl = b["phrase_length"].reshape(-1, 22)
    lab = b["labels"].reshape(-1, 22)
    nwords = (lab[:, 1:-1] != 0).sum(-1)
    np.testing.assert_array_equal(pl.sum(-1) - 1, nwords)


def test_phrase_pair_merging():
    data = tiny_dataset()
    rec = learn_phrase_pairs(data["images"], threshold=5)
    assert len(rec) > 0                    # repeated sentences force merges
    assert all(isinstance(v, int) for v in rec.values())


def test_kd_splice():
    data = tiny_dataset()
    kd = {str(i): [f"kd caption {i} v{j}" for j in range(5)]
          for i in range(6)}
    out = splice_kd_captions(data, kd)
    img0 = out["images"][0]
    assert img0["sentences"][1]["tokens"] == ["kd", "caption", "0", "v0"]
    # val/test untouched
    img_val = out["images"][4]
    assert img_val["sentences"][1]["tokens"][0] == "a"


def test_kd_chain_eval_dump_to_retrain(tmp_path, monkeypatch):
    """The full KD loop as a user runs it (README 'Data pipeline'):
    AIC teacher beam-eval with --KD_file dumps KD_dataset/<file> (top-3
    beams per image, eval_utils.py:654-656) -> KD_coco splice -> prepro
    re-cut -> CaptionData -> one XE step on the distilled corpus."""
    import jax
    import jax.numpy as jnp
    from tests.test_train import setup
    from boficap_tpu.eval.eval_utils import eval_split
    from boficap_tpu.train import steps as steps_mod

    monkeypatch.chdir(tmp_path)
    cfg, data, model, tx, state = setup("AIC")
    kwargs = {"split": "train", "num_images": 3, "language_eval": 0,
              "beam_size": 3, "KD_file": "kd_test.json",
              "train_mode": "AIC", "verbose": False}
    eval_split(model, state.params, data, kwargs, inference_mode="")
    kd_path = tmp_path / "KD_dataset" / "kd_test.json"
    assert kd_path.exists()
    kd = json.load(open(kd_path))
    # batch-granular like the reference dump: the last batch's tail images
    # land in the dict too (it's keyed by image id, KD runs use the whole
    # split anyway)
    assert len(kd) >= 3
    # top-3 beams per image (the KD recipe slice; decode_sequence may
    # drop all-stop beams of this untrained model)
    assert all(1 <= len(v) <= 3 for v in kd.values())

    # splice the teacher captions into a dataset whose cocoids match the
    # dumped image ids (scripts/KD_coco.py drives splice_kd_captions)
    kd = {k: [c if c else "a a a" for c in v] for k, v in kd.items()}
    ds = tiny_dataset()
    for img, cid in zip(ds["images"], sorted(int(k) for k in kd)):
        if img["split"] == "train":
            img["cocoid"] = cid
    spliced = splice_kd_captions(ds, kd)
    for img in spliced["images"]:
        if str(img["cocoid"]) in kd and img["split"] == "train":
            assert img["sentences"][1]["tokens"] == kd[
                str(img["cocoid"])][0].split()

    # re-cut + retrain one step on the distilled corpus
    dj = tmp_path / "dataset_kd.json"
    json.dump(spliced, open(dj, "w"))
    oj = str(tmp_path / "kdtalk.json")
    oh = str(tmp_path / "kdtalk_label.h5")
    run_prepro(str(dj), oj, oh, max_length=20, word_count_threshold=0,
               cutter="heuristic")
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.data.dataset import CaptionData
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.train import optim as optim_mod
    from boficap_tpu.train.state import create_state
    cfg2 = default_config()
    cfg2.train_mode = "UIC"
    cfg2.input_json = oj
    cfg2.input_label_h5 = oh
    cfg2.input_att_dir = "synthetic"
    cfg2.batch_size = 2
    cfg2.max_boxes = 9
    cfg2.N_enc = cfg2.N_dec = 1
    cfg2.d_model, cfg2.d_ff, cfg2.num_att_heads = 32, 64, 2
    cfg2.noamopt = True
    cfg2.id = "kd"
    finalize(cfg2)
    d2 = CaptionData(cfg2)
    student = build_model(cfg2, d2.vocab_size)
    batch = d2.get_batch("train")
    f = steps_mod._flat(batch)
    params = student.init(
        {"params": jax.random.PRNGKey(0), "glat": jax.random.PRNGKey(1)},
        jnp.asarray(batch["att_feats"]), jnp.asarray(batch["att_masks"]),
        f["labels"], f.get("phrase_num"), f.get("phrase_length"),
        f.get("phrase_syn"), glat_p=-1.0, deterministic=True)
    tx2 = optim_mod.build_optimizer(cfg2)
    st = create_state(params, tx2)
    step_fn = steps_mod.make_xe_step(student, tx2)
    st, m = steps_mod.run_xe_step(step_fn, st, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_heuristic_cutter_splits_long_chunks():
    """Function-word-free runs split into <=5-word phrases with the
    reference's near-equal rule (prepro_labels.py:219-249)."""
    from boficap_tpu.prepro.labels import heuristic_chunks, split_run
    spans = heuristic_chunks(["w"] * 20)
    assert [n for _, n, _ in spans] == [5, 5, 5, 5]
    assert split_run(7) == [4, 3]
    assert split_run(11) == [4, 4, 3]
    assert split_run(5) == [5]
    # spans tile the run contiguously
    pos = 0
    for s, n, _ in spans:
        assert s == pos
        pos += n


def test_assemble_phrases_caps_untrainable_lengths():
    """A 20+-word phrase/gap overflows the 20-class length head (the
    reference criterion crashes there); assemble_phrases splits it."""
    from boficap_tpu.prepro.labels import assemble_phrases
    # one parser span covering all 20 tokens
    pl, lab, cnt = assemble_phrases(20, [(0, 20, SYN_VP)], 20)
    assert pl[:cnt].max() < 20 and pl[:cnt].sum() == 20
    assert all(lab[:cnt] == SYN_VP)
    # a 20-token gap (no spans at all)
    pl2, lab2, cnt2 = assemble_phrases(20, [], 20)
    assert pl2[:cnt2].max() < 20 and pl2[:cnt2].sum() == 20
    # 6..19-word phrases pass through untouched (reference stanford
    # behavior)
    pl3, lab3, cnt3 = assemble_phrases(12, [(0, 12, SYN_NP)], 20)
    assert cnt3 == 1 and pl3[0] == 12
