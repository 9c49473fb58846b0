"""CLI flag surface, default values, and merge order.

Parity with the reference's argparse surface (captioning/utils/opts.py:21-300):
defaults below match the reference's defaults flag-for-flag; merge precedence is
CLI > ``--set_cfgs`` > ``--cfg`` yaml > defaults (opts.py:256-276).  Derived
defaults (checkpoint path from id, box features widening att_feat_size) follow
opts.py:293-298.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional

from .config import Config, load_yaml_with_base

# ---------------------------------------------------------------------------
# Defaults (name -> default). One source of truth for both the CLI parser and
# programmatic Config construction.
# ---------------------------------------------------------------------------
DEFAULTS: Dict[str, Any] = dict(
    # data input settings
    input_json="data/coco.json",
    input_fc_dir="data/cocotalk_fc",
    input_att_dir="data/cocotalk_att",
    input_box_dir="data/cocotalk_box",
    input_label_h5="data/coco_label.h5",
    input_multilabel_dir=None,
    data_in_memory=False,
    start_from=None,
    cached_tokens="coco-train-idxs",
    init_from=None,
    # model settings
    train_mode="AIC",
    preprocess_mode="phrase",
    norm_mode="copy",
    decoder_input_mode="add",
    N_len=0,
    self_dis=False,
    rl_kl=False,
    caption_model="transformer",
    rnn_size=512,
    num_layers=1,
    rnn_type="lstm",
    input_encoding_size=512,
    att_hid_size=512,
    fc_feat_size=2048,
    att_feat_size=2048,
    logit_layers=1,
    use_bn=0,
    max_boxes=100,
    norm_att_feat=0,
    use_box=0,
    norm_box_feat=0,
    # transformer dims (yaml usually sets these; getattr-style fallback to the
    # rnn names as the reference does at TransformerModel.py:1631-1640)
    N_enc=None,
    N_dec=None,
    d_model=None,
    d_ff=None,
    num_att_heads=8,
    dropout=0.1,
    max_length=20,
    # optimization: general
    max_epochs=-1,
    batch_size=16,
    grad_clip_mode="value",
    grad_clip_value=0.1,
    drop_prob_lm=0.5,
    self_critical_after=-1,
    seq_per_img=5,
    # optimization: for the language model
    optim="adam",
    learning_rate=4e-4,
    learning_rate_decay_start=-1,
    learning_rate_decay_every=3,
    learning_rate_decay_rate=0.8,
    optim_alpha=0.9,
    optim_beta=0.999,
    optim_epsilon=1e-8,
    weight_decay=0.0,
    label_smoothing=0.0,
    remat=0,                    # rematerialize enc/dec layers in the
                                # backward pass (jax.checkpoint):
                                # ~1/3 extra fwd FLOPs for O(layers)
                                # less training memory; numerics and
                                # the param tree are unchanged
    noamopt=False,
    noamopt_warmup=2000,
    noamopt_factor=1.0,
    reduce_on_plateau=False,
    reduce_on_plateau_factor=0.5,
    reduce_on_plateau_patience=3,
    cached_transformer=False,
    use_warmup=False,
    scheduled_sampling_start=-1,
    scheduled_sampling_increase_every=5,
    scheduled_sampling_increase_prob=0.05,
    scheduled_sampling_max_prob=0.25,
    # glancing training (GLAT) anneal
    glancing_token=False,
    unmasked_rate_decay_start=2,
    unmasked_rate_decay_every=2,
    unmasked_rate_decay_rate=0.1,
    unmasked_rate_start=0.5,
    unmasked_rate_end=0.1,
    # evaluation/checkpointing
    val_images_use=3200,
    save_checkpoint_every=2500,
    save_every_epoch=False,
    save_history_ckpt=0,
    checkpoint_path=None,
    language_eval=0,
    losses_log_every=25,
    load_best_score=1,
    # misc
    id="",
    train_only=0,
    # reward
    cider_reward_weight=1.0,
    bleu_reward_weight=0.0,
    # structure loss
    structure_loss_weight=1.0,
    structure_after=-1,
    structure_loss_type="seqnll",
    struc_use_logsoftmax=False,
    entropy_reward_weight=0.0,
    self_cider_reward_weight=0.0,
    train_sample_n=16,
    train_sample_method="sample",
    train_beam_size=1,
    sc_sample_method="greedy",
    sc_beam_size=1,
    # drop worst
    drop_worst_after=-1,
    drop_worst_rate=0.0,
    # sampling defaults used by eval / SCST
    beam_size=1,
    sample_method="greedy",
    temperature=1.0,
    sample_n=1,
    group_size=1,
    diversity_lambda=0.5,
    decoding_constraint=0,
    block_trigrams=0,
    remove_bad_endings=0,
    suppress_UNK=1,
    length_penalty="",
    inference_mode="",
    # misc knobs specific to this rebuild
    seed=42,
    device="",                 # '' = default backend; 'cpu' forces host
    dtype="bfloat16",          # compute dtype on TPU
    param_dtype="float32",
    mesh_shape=None,            # e.g. {"data": 8}; None = all devices on 'data'
    multihost=False,            # call jax.distributed.initialize() at CLI
                                # start (multi-host DCN; launcher provides
                                # coordinator env)
    dist_coordinator="",        # explicit multihost bring-up for launchers
    dist_num_processes=0,       # that set no cluster env (SLURM/OMPI/TPU
    dist_process_id=-1,         # pods are auto-detected when these are unset)
    data_prefetch=2,            # train-batch prefetch queue depth (0 = off)
    use_pallas=False,           # pallas attention kernels for the hot paths
    use_pallas_fill="auto",     # pallas fused decoder layer for NA/SA fill
                                # decodes: auto = on for TPU (measured 1.23x
                                # NA at B=64 on v5e), off elsewhere
    profile_steps=0,            # jax.profiler trace of the first N steps
    debug_checks=False,         # checkify nan/oob checks in the XE step
    grad_accum=1,               # XE microbatch count: G>1 scans G equal
                                # microbatches per step (grads averaged,
                                # ONE adam update — same math as the full
                                # batch).  The single-chip b256x5 step
                                # runs near HBM capacity, where XLA auto-
                                # remat adds ~17% FLOPs and achieved
                                # bandwidth drops ~35%; G=2 keeps the
                                # b128 operating point: 365 -> ~255 ms
                                # measured (BENCH_NOTES r5).  Prefer mesh
                                # data-parallelism when chips exist;
                                # incompatible with drop_worst_rate>0.
    fused_optimizer=False,      # adam via train/optim.py::fused_adam (flat
                                # [P] moments, clip/decay folded in) —
                                # numerics identical to the optax chain
                                # (tested) but MEASURED SLOWER on v5e (the
                                # ravel/unravel traffic outweighs any launch
                                # savings; XLA already schedules the
                                # per-leaf update efficiently — BENCH_NOTES
                                # r4); kept as an option for sharded-moment
                                # experiments
    rng_impl="rbg",             # training-stream PRNG: 'rbg' keeps threefry
                                # key derivation (split/fold_in) but makes
                                # dropout/glat mask BITS with the TPU's fast
                                # RBG generator — measured 93.6 -> 59.9
                                # ms/step XE at b64x5 on v5e (threefry mask
                                # generation dominated the step, BENCH_NOTES
                                # r4).  CAVEAT: RBG bits are produced by
                                # XLA's RngBitGenerator, whose output is NOT
                                # guaranteed stable across jaxlib/compiler
                                # versions or backends — dropout/glat masks
                                # (and thus training trajectories) are only
                                # reproducible within one software stack.
                                # Set rng_impl=threefry2x32 to restore the
                                # jax default streams, which ARE stable
                                # bit-for-bit across versions and backends.
                                # Param INIT always stays threefry, so
                                # checkpoints are impl-independent.
    REFORWARD=False,
)


def default_config() -> Config:
    return Config({k: v for k, v in DEFAULTS.items()})


def add_eval_options(parser: argparse.ArgumentParser) -> None:
    """Eval-only flags (reference opts.py:303-382)."""
    parser.add_argument("--batch_size", type=int, default=0)
    parser.add_argument("--num_images", type=int, default=-1)
    parser.add_argument("--language_eval", type=int, default=0)
    parser.add_argument("--dump_images", type=int, default=1)
    parser.add_argument("--dump_json", type=int, default=1)
    parser.add_argument("--dump_path", type=int, default=0)
    parser.add_argument("--image_folder", type=str, default="")
    parser.add_argument("--image_root", type=str, default="")
    parser.add_argument("--split", type=str, default="test")
    # sampling options (reference add_eval_sample_opts, opts.py:359-382).
    # max_length defaults to None (= the checkpoint's value), NOT the
    # reference's 20: max_length sizes model parameters here (the length
    # heads are Dense(max_length)), so silently overriding a checkpoint
    # trained at a different length would break loading — an explicit CLI
    # value still wins.
    parser.add_argument("--max_length", type=int, default=None)
    parser.add_argument("--group_size", type=int, default=1)
    parser.add_argument("--diversity_lambda", type=float, default=0.5)
    parser.add_argument("--decoding_constraint", type=int, default=0)
    parser.add_argument("--block_trigrams", type=int, default=0)
    parser.add_argument("--suppress_UNK", type=int, default=1)
    # diversity options (reference add_diversity_opts, opts.py:349-356)
    parser.add_argument("--sample_n_method", type=str, default="sample")
    parser.add_argument("--eval_oracle", type=int, default=1)
    parser.add_argument("--verbose_loss", type=int, default=0)
    # eval-time dataset overrides (reference add_eval_options, opts.py:327-340)
    parser.add_argument("--input_json", type=str, default="")
    parser.add_argument("--input_label_h5", type=str, default="")
    parser.add_argument("--input_fc_dir", type=str, default="")
    parser.add_argument("--input_att_dir", type=str, default="")
    parser.add_argument("--input_box_dir", type=str, default="")
    parser.add_argument("--cnn_model", type=str, default="resnet101")
    parser.add_argument("--coco_json", type=str, default="")
    parser.add_argument("--KD_file", type=str, default="")
    # reference tools/eval.py:40-41 defaults the eval CLI to SAIC
    parser.add_argument("--inference_mode", type=str, default="SAIC")
    # PB_pad jit decode: static packed-width cap (0 = default 2*(L+2);
    # L*(L+1)//2 + 1 makes the per-sample overflow clamp unreachable —
    # decode/pb.py)
    parser.add_argument("--pb_packed_width", type=int, default=0)
    parser.add_argument("--only_lang_eval", type=int, default=0)
    parser.add_argument("--force", type=int, default=0)
    parser.add_argument("--device", type=str, default="tpu")
    # attention-heatmap dump (reference glo accumulator, utils/glo.py +
    # tools/eval.py:126): writes vis/attn.npz and prints a 10x10 summary
    parser.add_argument("--dump_attention", type=int, default=0)
    # XLA cost analysis of the decode programs (the TPU-native counterpart
    # of the reference's commented-out thop FLOPs hooks,
    # TransformerModel.py:472-473,516-517,585-586 + configs/test_flops.yaml)
    parser.add_argument("--report_flops", type=int, default=0)


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="BoFiCap-TPU trainer", allow_abbrev=False
    )
    parser.add_argument("--cfg", type=str, default=None, help="config yaml (supports _BASE_)")
    parser.add_argument(
        "--set_cfgs",
        nargs=argparse.REMAINDER,
        default=None,
        help="override config keys: --set_cfgs key1 val1 key2 val2 ...",
    )
    for name, default in DEFAULTS.items():
        flag = "--" + name
        if isinstance(default, bool):
            parser.add_argument(flag, type=_str2bool, nargs="?", const=True, default=None)
        elif default is None:
            # the DEFAULTS value carries no type; without an explicit one
            # argparse would hand raw strings to model construction
            # (--d_model 768 -> '768')
            parser.add_argument(flag, type=_NONE_FLAG_TYPES.get(name, str),
                                default=None)
        else:
            parser.add_argument(flag, type=type(default), default=None)
    return parser


def _mesh_shape(v: str):
    """--mesh_shape accepts an int ("8") or a dict literal ("{'data': 8}")."""
    import ast
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        raise argparse.ArgumentTypeError(
            f"--mesh_shape wants an int or a dict literal, got {v!r}")


# types for flags whose DEFAULTS entry is None (reference opts.py declares
# these as typed argparse flags; int-valued ones feed layer/shape math)
_NONE_FLAG_TYPES = {
    "N_enc": int, "N_dec": int, "d_model": int, "d_ff": int,
    "mesh_shape": _mesh_shape,
}


def _str2bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "on")


def merge_cli(cfg: Config, args: argparse.Namespace) -> Config:
    for k, v in vars(args).items():
        if k in ("cfg", "set_cfgs") or v is None:
            continue
        cfg[k] = v
    return cfg


def parse_opt(argv: Optional[List[str]] = None) -> Config:
    parser = _build_parser()
    args = parser.parse_args(argv)

    cfg = default_config()
    if args.cfg is not None:
        cfg.merge_from_dict(load_yaml_with_base(args.cfg))
    if args.set_cfgs:
        cfg.merge_from_list(args.set_cfgs)
    merge_cli(cfg, args)
    finalize(cfg)
    return cfg


def restore_saved_opt(saved) -> dict:
    """Prepare a train-saved opt dict (infos['opt']) for re-finalization.

    Train saves opts post-finalize, so ``att_feat_size`` is already widened
    for use_box checkpoints; mark that so ``finalize`` stays idempotent even
    for checkpoints written before the marker existed."""
    saved = dict(saved or {})
    if saved.get("use_box") and "att_feat_size_box_widened" not in saved:
        saved["att_feat_size_box_widened"] = True
    return saved


def finalize(cfg: Config) -> Config:
    """Validity checks + derived defaults (reference opts.py:279-298)."""
    assert cfg.batch_size >= 0, "batch_size should be >= 0"
    assert cfg.seq_per_img > 0, "seq_per_img should be >0"
    assert cfg.beam_size > 0, "beam_size should be >0"
    assert cfg.save_checkpoint_every > 0, "save_checkpoint_every should be >0"
    assert cfg.losses_log_every > 0, "losses_log_every should be >0"
    assert cfg.language_eval in (0, 1), "language_eval should be 0 or 1"
    assert cfg.load_best_score in (0, 1), "load_best_score should be 0 or 1"

    if not cfg.get("checkpoint_path"):
        cfg.checkpoint_path = "log_%s" % cfg.id
    # idempotent: eval/serve re-finalize a saved train opt whose
    # att_feat_size was already widened — widening twice would build a
    # model the checkpoint can't load into
    if cfg.use_box and not cfg.get("att_feat_size_box_widened"):
        cfg.att_feat_size = cfg.att_feat_size + 5
        cfg.att_feat_size_box_widened = True
    # transformer hyperparameter fallbacks (TransformerModel.py:1631-1640)
    if cfg.get("N_enc") is None:
        cfg.N_enc = cfg.num_layers
    if cfg.get("N_dec") is None:
        cfg.N_dec = cfg.num_layers
    if cfg.get("d_model") is None:
        cfg.d_model = cfg.input_encoding_size
    if cfg.get("d_ff") is None:
        cfg.d_ff = cfg.rnn_size
    return cfg
