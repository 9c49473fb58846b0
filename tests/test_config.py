"""Config system: _BASE_ inheritance, CLI merge order, derived defaults."""

import os
import textwrap

from boficap_tpu.config import parse_opt


def _write(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_base_inheritance_and_cli_precedence(tmp_path):
    _write(
        tmp_path,
        "base.yml",
        """
        train_mode: UIC
        d_model: 512
        batch_size: 10
        learning_rate: 0.0005
        N_len: 1
        """,
    )
    child = _write(
        tmp_path,
        "child.yml",
        """
        _BASE_: base.yml
        learning_rate: 0.000005
        structure_after: 14
        """,
    )
    cfg = parse_opt(["--cfg", child, "--batch_size", "4", "--id", "t1"])
    assert cfg.train_mode == "UIC"          # from base
    assert cfg.learning_rate == 5e-6        # child overrides base
    assert cfg.structure_after == 14        # child only
    assert cfg.batch_size == 4              # CLI overrides yaml
    assert cfg.d_model == 512
    assert cfg.N_enc == 6 or cfg.N_enc == cfg.num_layers  # derived fallback
    assert cfg.checkpoint_path == "log_t1" or cfg.checkpoint_path


def test_set_cfgs_override(tmp_path):
    base = _write(tmp_path, "b.yml", "batch_size: 10\ntrain_mode: AIC\n")
    cfg = parse_opt(["--cfg", base, "--set_cfgs", "train_mode", "SAIC", "batch_size", "7"])
    assert cfg.train_mode == "SAIC"
    assert cfg.batch_size == 7


def test_reference_config_parity():
    """Our loader must digest the reference's own yaml configs unchanged."""
    ref = "/root/reference/configs/uic_sd_kd100_sd_nscl.yml"
    if not os.path.exists(ref):
        return
    cfg = parse_opt(["--cfg", ref, "--id", "x"])
    assert cfg.train_mode == "UIC"          # inherited from uic_sd.yml
    assert cfg.structure_after == 14
    assert cfg.structure_loss_type == "new_self_critical"
    assert cfg.noamopt is False             # child overrides base's true
    assert cfg.N_len == 1
    assert cfg.d_model == 512


def test_transformer_dim_fallbacks():
    cfg = parse_opt(["--num_layers", "3", "--input_encoding_size", "256",
                     "--rnn_size", "1024", "--id", "y"])
    assert cfg.N_enc == 3 and cfg.N_dec == 3
    assert cfg.d_model == 256
    assert cfg.d_ff == 1024


def _all_corpus_configs():
    import glob
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    return sorted(
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "**", "*.y*ml"), recursive=True)
        if "synth" not in os.path.basename(p))


def test_corpus_matches_reference_count():
    """The experiment matrix ships complete: at least the reference's ~72
    yamls (65 top-level + transformer/ + updown/ subdirs)."""
    assert len(_all_corpus_configs()) >= 72


import pytest


@pytest.mark.parametrize("rel", _all_corpus_configs())
def test_corpus_config_loads_and_constructs(rel):
    """Every shipped config resolves its _BASE_ chain, finalizes, and
    constructs its model through the registry (reference runs these by
    name: python tools/train.py --cfg configs/<name> --id x)."""
    from boficap_tpu.models import setup as models_setup
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = parse_opt(["--cfg", os.path.join(root, rel), "--id", "cfgtest"])
    assert cfg.batch_size > 0 and cfg.max_length > 0
    model = models_setup(cfg, vocab_size=100)
    assert model is not None


def test_eval_cli_accepts_reference_flag_surface():
    """The eval CLI must accept every flag the reference's eval parser
    exposes (tools/eval.py:26-43 + opts.py add_eval_options /
    add_diversity_opts / add_eval_sample_opts) — callers drive it with
    reference command lines verbatim."""
    from tools.eval import parse_eval_opt
    args = parse_eval_opt([
        "--model", "m.ckpt", "--infos_path", "i.pkl",
        "--beam_size", "4", "--group_size", "2",
        "--diversity_lambda", "0.3", "--length_penalty", "wu_0.9",
        "--decoding_constraint", "1", "--block_trigrams", "1",
        "--suppress_UNK", "1", "--max_length", "20",
        "--sample_n", "4", "--sample_n_method", "dbs", "--eval_oracle", "1",
        "--verbose_loss", "1", "--cnn_model", "resnet101",
        "--input_json", "x.json", "--input_label_h5", "x.h5",
        "--input_fc_dir", "fc", "--input_att_dir", "att",
        "--input_box_dir", "box", "--coco_json", "c.json",
        "--image_folder", "", "--image_root", "", "--dump_images", "0",
        "--dump_json", "0", "--dump_path", "0", "--split", "test",
        "--KD_file", "", "--inference_mode", "SAIC",
        "--only_lang_eval", "0", "--force", "1", "--device", "cpu",
    ])
    assert args.group_size == 2 and args.diversity_lambda == 0.3
    assert args.sample_n_method == "dbs" and args.suppress_UNK == 1


def test_none_default_flags_parse_typed():
    """DEFAULTS entries with value None still need typed CLI parsing:
    --d_model 768 must reach model construction as an int, not '768'."""
    cfg = parse_opt(["--d_model", "768", "--N_enc", "3", "--N_dec", "4",
                     "--d_ff", "1024", "--id", "typed"])
    assert cfg.d_model == 768 and isinstance(cfg.d_model, int)
    assert cfg.N_enc == 3 and isinstance(cfg.N_enc, int)
    assert cfg.N_dec == 4 and isinstance(cfg.N_dec, int)
    assert cfg.d_ff == 1024 and isinstance(cfg.d_ff, int)


def test_mesh_shape_flag_parses_literals():
    cfg = parse_opt(["--mesh_shape", "{'data': 4}", "--id", "ms"])
    assert cfg.mesh_shape == {"data": 4}
    cfg = parse_opt(["--mesh_shape", "4", "--id", "ms2"])
    assert cfg.mesh_shape == 4


def test_finalize_use_box_widens_once():
    """finalize must be idempotent: eval/serve re-finalize a saved train
    opt whose att_feat_size was already widened (+5 box geometry)."""
    from boficap_tpu.config import finalize
    cfg = parse_opt(["--use_box", "1", "--id", "box"])
    assert cfg.att_feat_size == 2048 + 5
    finalize(cfg)                       # second finalize: no re-widen
    assert cfg.att_feat_size == 2048 + 5


def test_restore_saved_opt_marks_pre_marker_checkpoints():
    """Old checkpoints saved opts post-finalize (already widened) without
    the marker; restore_saved_opt adds it so re-finalize keeps the size."""
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.config.opts import restore_saved_opt
    saved = {"use_box": 1, "att_feat_size": 2053}   # pre-marker infos[opt]
    opt = default_config()
    opt.merge_from_dict(restore_saved_opt(saved))
    finalize(opt)
    assert opt.att_feat_size == 2053


def test_eval_cfg_yaml_merges_below_cli(tmp_path):
    """tools/eval.py --cfg: yaml keys merge at saved-opts precedence
    (model/data keys work; explicit eval-CLI flags still win)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.eval import build_eval_opt, parse_eval_opt
    y = _write(tmp_path, "override.yml", """
        drop_prob_lm: 0.25
        batch_size: 7
        """)
    infos = {"opt": {"train_mode": "UIC", "id": "ckpt",
                     "drop_prob_lm": 0.5, "batch_size": 10}}
    args = parse_eval_opt(["--model", "m", "--infos_path", "i",
                           "--cfg", y])
    opt = build_eval_opt(args, infos)
    assert opt.drop_prob_lm == 0.25         # yaml overrides saved opt
    assert opt.batch_size == 7              # yaml fills non-given replace key
    args2 = parse_eval_opt(["--model", "m", "--infos_path", "i",
                            "--cfg", y, "--batch_size", "3"])
    opt2 = build_eval_opt(args2, infos)
    assert opt2.batch_size == 3             # explicit CLI beats yaml


def test_eval_cfg_yaml_overrides_untyped_parser_defaults(tmp_path):
    """An eval yaml must be able to retune eval-surface knobs (beam_size,
    split, ...) whose argparse defaults are concrete values: only a flag
    the user actually typed may beat the yaml."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.eval import build_eval_opt, parse_eval_opt
    y = _write(tmp_path, "evalknobs.yml", """
        beam_size: 5
        split: val
        inference_mode: NAIC
        """)
    infos = {"opt": {"train_mode": "UIC", "id": "ckpt", "beam_size": 9}}
    args = parse_eval_opt(["--model", "m", "--infos_path", "i", "--cfg", y])
    opt = build_eval_opt(args, infos)
    assert opt.beam_size == 5               # yaml > untyped parser default
    assert opt.split == "val"
    assert opt.inference_mode == "NAIC"
    args2 = parse_eval_opt(["--model", "m", "--infos_path", "i",
                            "--cfg", y, "--beam_size=2",
                            "--inference_mode", "SAIC"])
    opt2 = build_eval_opt(args2, infos)
    assert opt2.beam_size == 2              # typed flag (=form) beats yaml
    assert opt2.inference_mode == "SAIC"    # typed flag beats yaml
    assert opt2.split == "val"              # untyped stays yaml
    # without a yaml, the reference rule holds: the eval parser's default
    # beats the checkpoint's saved opt for eval-namespace flags
    args3 = parse_eval_opt(["--model", "m", "--infos_path", "i"])
    opt3 = build_eval_opt(args3, infos)
    assert opt3.beam_size == 1


def test_eval_opt_hand_built_namespace_falsy_defers_to_saved():
    """Programmatic callers build argparse.Namespace objects without the
    parser's _explicit marker: their falsy values must route through the
    legacy precedence chain (defer to the checkpoint's saved opts), not be
    treated as typed flags — beam_size=0 must not clobber a saved 5."""
    import argparse
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.eval import build_eval_opt
    infos = {"opt": {"train_mode": "UIC", "id": "ckpt", "beam_size": 5,
                     "drop_prob_lm": 0.5}}
    args = argparse.Namespace(model="m", infos_path="i", cfg="",
                              beam_size=0, split="test")
    opt = build_eval_opt(args, infos)
    assert opt.beam_size == 5      # falsy hand-built value defers to saved
    assert opt.split == "test"     # truthy hand-built value still applies
