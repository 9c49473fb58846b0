"""Model registry (parity with reference models.setup,
captioning/models/__init__.py:14-24 — which can only construct
'transformer'; the fc/updown/aoa workloads its config corpus names are
implemented here natively)."""

from .boficap import BoFiCap, build_model
from .lstm_caption import AoANet, Att2in2Model, FCModel, UpDownModel


def setup(cfg, vocab_size: int):
    cm = cfg.get("caption_model", "transformer")
    import jax.numpy as jnp
    from .layers import set_pallas_attention
    set_pallas_attention(bool(cfg.get("use_pallas", False)))
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg.get("dtype", "float32")]
    common = dict(tgt_vocab=vocab_size + 4,
                  max_length=cfg.get("max_length", 20) or 20,
                  drop_prob_lm=cfg.get("drop_prob_lm", 0.5), dtype=dtype)
    if cm in ("transformer", "bert", "m2transformer"):
        return build_model(cfg, vocab_size)
    if cm in ("fc", "show_tell"):
        return FCModel(d_model=cfg.get("input_encoding_size", 512),
                       rnn_size=cfg.get("rnn_size", 512), **common)
    if cm in ("updown", "topdown"):
        return UpDownModel(d_model=cfg.get("input_encoding_size", 512),
                           rnn_size=cfg.get("rnn_size", 512),
                           att_hid_size=cfg.get("att_hid_size", 512),
                           att_feat_size=cfg.get("att_feat_size", 2048),
                           **common)
    if cm in ("att2in2", "att2in"):
        return Att2in2Model(d_model=cfg.get("input_encoding_size", 512),
                            rnn_size=cfg.get("rnn_size", 512),
                            att_hid_size=cfg.get("att_hid_size", 512),
                            **common)
    if cm == "aoa":
        return AoANet(d_model=cfg.get("input_encoding_size", 512),
                      rnn_size=cfg.get("rnn_size", 512),
                      num_heads=cfg.get("num_att_heads", 8),
                      N_enc=cfg.get("N_enc", 6) or 6, **common)
    raise ValueError(f"caption_model '{cm}' is not supported")
