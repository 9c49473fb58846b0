"""Data-layer tests: synthetic store, file round-trip, batch shapes,
sampler resume, pp_mode transforms."""

import numpy as np
import pytest

from boficap_tpu.config import default_config, finalize
from boficap_tpu.constants import BOS, EOS
from boficap_tpu.data.dataset import (CaptionData, LabelStore, pp_mode_word,
                                      pp_mode_phrase2)
from boficap_tpu.data.readers import SyntheticFeatures


def data_cfg(train_mode="UIC", **kw):
    cfg = default_config()
    cfg.train_mode = train_mode
    cfg.input_json = "synthetic"
    cfg.input_att_dir = "synthetic"
    cfg.batch_size = 4
    cfg.max_boxes = 36
    cfg.id = "t"
    for k, v in kw.items():
        cfg[k] = v
    finalize(cfg)
    return cfg


def test_batch_shapes_static():
    d = CaptionData(data_cfg())
    for _ in range(3):
        b = d.get_batch("train")
        assert b["att_feats"].shape == (4, 36, 2048)
        assert b["labels"].shape == (4, 5, 22)
        assert b["phrase_length"].shape == (4, 5, 22)
        assert b["phrase_num"].shape == (4, 5)
        assert (b["labels"][:, :, 0] == BOS).all()
        assert (b["labels"][:, :, -1] == EOS).all()
        # phrase_length framing: leading 1, sums <= L+1
        assert (b["phrase_length"][:, :, 0] == 1).all()
        assert (b["phrase_length"].sum(-1) <= 21).all()
        # phrase_syn framing: BOS head, EOS after the last real phrase
        ps, pn = b["phrase_syn"], b["phrase_num"]
        assert (ps[:, :, 0] == BOS).all()
        for i in range(4):
            for s in range(5):
                assert ps[i, s, pn[i, s]] == EOS
        assert len(b["gts"]) == 4


def test_extend_and_copy_match_reference_collate():
    """The on-device tensor builders reproduce the host collate the reference
    ships to the GPU (dataloader.py:372-396)."""
    from boficap_tpu.data import phrase_ops as po
    from tests.oracles import oracle_extend_syn, oracle_copy_init

    d = CaptionData(data_cfg())
    b = d.get_batch("train")
    L = 20
    pl = b["phrase_length"].reshape(-1, 22)
    ps = b["phrase_syn"].reshape(-1, 22)
    lab = b["labels"].reshape(-1, 22)
    ext = np.asarray(po.extend_syn_seq(pl, ps, L))
    cp = np.asarray(po.copy_init(lab, pl, L))
    for i in range(pl.shape[0]):
        np.testing.assert_array_equal(ext[i], oracle_extend_syn(pl[i], ps[i], L))
        np.testing.assert_array_equal(cp[i], oracle_copy_init(lab[i], pl[i], L))


def test_sampler_resume():
    cfg = data_cfg()
    d1 = CaptionData(cfg)
    for _ in range(3):
        d1.get_batch("train")
    state = d1.state_dict()
    want = [d1.get_batch("train")["infos"] for _ in range(3)]

    d2 = CaptionData(cfg)
    d2.load_state_dict(state)
    d2._cap_rngs = d1._cap_rngs  # caption sampling rng is part of resume noise
    got = [d2.get_batch("train")["infos"] for _ in range(3)]
    assert [[i["id"] for i in batch] for batch in want] == \
        [[i["id"] for i in batch] for batch in got]


def test_eval_split_ordered_and_wraps():
    d = CaptionData(data_cfg())
    n_val = len(d.split_ix["val"])
    seen = []
    wrapped = False
    steps = 0
    while not wrapped:
        b = d.get_batch("val")
        seen += [i["id"] for i in b["infos"]]
        wrapped = b["bounds"]["wrapped"]
        steps += 1
        assert steps < 100
    assert set(seen[:n_val]) == set(d.labels.images[ix]["id"]
                                    for ix in d.split_ix["val"])


def test_file_roundtrip(tmp_path):
    st = LabelStore.synthetic(n_images=10)
    st.save(str(tmp_path))
    st2 = LabelStore.from_files(str(tmp_path / "data.json"),
                                str(tmp_path / "label.h5"), True)
    np.testing.assert_array_equal(st.labels, st2.labels)
    np.testing.assert_array_equal(st.phrase_length, st2.phrase_length)
    assert st2.vocab_size == st.vocab_size


def test_pp_mode_word():
    pn = np.array([2])
    pl = np.zeros((1, 10), int)
    pl[0, :2] = [3, 2]
    pn2, pl2 = pp_mode_word(pn, pl)
    assert pn2[0] == 5
    np.testing.assert_array_equal(pl2[0, :5], [1, 1, 1, 1, 1])


def test_pp_mode_phrase2():
    pn = np.array([4])
    pl = np.zeros((1, 10), int)
    pl[0, :4] = [1, 3, 1, 1]
    pn2, pl2 = pp_mode_phrase2(pn, pl)
    # [1,3] merge -> 4; [1,1] merge -> 2
    assert pn2[0] == 2
    np.testing.assert_array_equal(pl2[0, :2], [4, 2])


def test_dataloader_raw(tmp_path):
    """Raw-image folder eval path with the dependency-free extractor."""
    from PIL import Image
    import numpy as np
    from boficap_tpu.data.raw import DataLoaderRaw, patch_extractor
    for i in range(3):
        arr = (np.random.RandomState(i).rand(64, 64, 3) * 255).astype("uint8")
        Image.fromarray(arr).save(tmp_path / f"img{i}.jpg")
    d = DataLoaderRaw(str(tmp_path), batch_size=2,
                      extractor=patch_extractor(grid=7, dim=64))
    b = d.get_batch()
    assert b["att_feats"].shape == (2, 49, 64)
    assert b["fc_feats"].shape == (2, 64)
    assert len(b["infos"]) == 2
    b2 = d.get_batch()
    assert b2["bounds"]["wrapped"]


def test_use_box_geometry(tmp_path):
    """use_box appends 5 normalized geometry channels and sorts regions by
    box area (reference dataloader.py:471-487; att_feat_size +5 via opts)."""
    store = LabelStore.synthetic(n_images=6)
    for img in store.images:
        img["width"], img["height"] = 100, 50
    att_dir, box_dir = tmp_path / "att", tmp_path / "box"
    att_dir.mkdir(); box_dir.mkdir()
    rng = np.random.RandomState(0)
    for img in store.images:
        np.savez(att_dir / f"{img['id']}.npz",
                 feat=rng.randn(8, 16).astype(np.float32))
        x1 = rng.uniform(0, 50, (8, 1)); y1 = rng.uniform(0, 25, (8, 1))
        box = np.hstack([x1, y1, x1 + rng.uniform(1, 50, (8, 1)),
                         y1 + rng.uniform(1, 25, (8, 1))]).astype(np.float32)
        np.save(box_dir / f"{img['id']}.npy", box)
    cfg = data_cfg(use_box=1, att_feat_size=16,
                   input_att_dir=str(att_dir), input_box_dir=str(box_dir),
                   max_boxes=8)
    assert cfg.att_feat_size == 21            # widened +5 by finalize
    d = CaptionData(cfg, labels=store)
    b = d.get_batch("train")
    assert b["att_feats"].shape == (4, 8, 21)
    areas = b["att_feats"][..., -1]
    assert (areas <= 1.0 + 1e-6).all()        # area fraction of the image
    for row in areas:                          # sorted descending
        assert (np.diff(row[row > 0]) <= 1e-6).all()


def test_prefetcher_propagates_worker_error():
    """A worker exception inside _assemble must surface in get() instead of
    hanging the training loop (the reference's torch DataLoader re-raises
    worker exceptions the same way)."""
    from boficap_tpu.data.dataset import _BatchPrefetcher

    calls = {"n": 0}

    def assemble():
        calls["n"] += 1
        if calls["n"] >= 2:
            raise OSError("corrupt feature file")
        return {"ok": calls["n"]}

    p = _BatchPrefetcher(assemble, lambda: {"snap": calls["n"]}, depth=2)
    assert p.get()["ok"] == 1
    with pytest.raises(OSError, match="corrupt feature file"):
        p.get()
    p.close()


def test_prefetcher_close_joins_worker():
    import time
    from boficap_tpu.data.dataset import _BatchPrefetcher

    def assemble():
        time.sleep(0.05)
        return {}

    p = _BatchPrefetcher(assemble, dict, depth=2)
    p.get()
    p.close()
    assert not p._thread.is_alive()


def test_reader_cache_returns_readonly(tmp_path):
    """in_memory cached arrays are frozen: in-place mutation raises instead
    of silently corrupting features for the rest of the run."""
    from boficap_tpu.data.readers import FeatureReader
    np.savez(tmp_path / "7.npz", feat=np.ones((4, 8), np.float32))
    r = FeatureReader(str(tmp_path), in_memory=True)
    a = r.get("7")
    b = r.get("7")
    assert a is b
    with pytest.raises(ValueError):
        b += 1.0
