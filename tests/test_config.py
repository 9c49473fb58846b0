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
