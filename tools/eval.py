"""Evaluation driver — CLI-compatible with the reference:

    python tools/eval.py --model log_uic_sd/model_best.ckpt \
        --infos_path log_uic_sd/infos_uic_sd_best.pkl \
        --inference_mode NAIC --language_eval 1

Parity with reference tools/eval.py:44-134: infos pickle merge (saved train
opts fill any flag not given on the command line, :53-61), result caching /
--only_lang_eval short-circuit (:65-97), per-mode eval_split, prediction
json dump (:132-134), decode-time print (the speed-measurement protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from boficap_tpu.config import Config, default_config, finalize
from boficap_tpu.config.opts import add_eval_options
from boficap_tpu.data.dataset import CaptionData
from boficap_tpu.eval import eval_utils
from boficap_tpu.models import setup as models_setup
from boficap_tpu.train.state import load_params


def parse_eval_opt(argv=None):
    # allow_abbrev=False so the explicit-flag scan below sees the exact
    # option strings the user typed (and matches the train parser)
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--model", type=str, required=True,
                        help="path to model .ckpt")
    parser.add_argument("--infos_path", type=str, required=True,
                        help="path to infos .pkl")
    parser.add_argument("--cfg", type=str, default=None)
    parser.add_argument("--id", type=str, default="")
    parser.add_argument("--beam_size", type=int, default=1)
    parser.add_argument("--sample_method", type=str, default="greedy")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--sample_n", type=int, default=1)
    parser.add_argument("--verbose", type=int, default=0)
    parser.add_argument("--verbose_beam", type=int, default=0)
    parser.add_argument("--remove_bad_endings", type=int, default=0)
    parser.add_argument("--length_penalty", type=str, default="")
    add_eval_options(parser)
    tokens = list(sys.argv[1:] if argv is None else argv)
    args = parser.parse_args(tokens)
    # which flags were EXPLICITLY given (argparse can't tell an untouched
    # default from a typed one; build_eval_opt needs the difference so a
    # --cfg yaml can override parser defaults without losing to them)
    explicit = set()
    for action in parser._actions:
        for opt_str in action.option_strings:
            if any(t == opt_str or t.startswith(opt_str + "=")
                   for t in tokens):
                explicit.add(action.dest)
    args._explicit = explicit
    return args


# reference's "replace" list (tools/eval.py:53): a truthy CLI value wins,
# otherwise the checkpoint's saved value stays
REPLACE_KEYS = ("input_fc_dir", "input_att_dir", "input_box_dir",
                "input_label_h5", "input_json", "batch_size", "id")


def build_eval_opt(args, infos):
    """Merge: explicit CLI > --cfg yaml > eval-parser defaults > saved
    train opts > train defaults.  The reference (tools/eval.py:53-61)
    lets flags in the eval parser's namespace keep their CLI/default
    values over the checkpoint's saved opts — kept here; --cfg is an
    extension the reference eval lacks, slotted between parser defaults
    and explicit flags so a yaml can retune eval knobs (beam_size,
    split, ...) without a typed flag losing to it.  ``replace`` keys
    follow the reference's rule (tools/eval.py:53): a truthy CLI value
    wins, otherwise the checkpoint's saved (or yaml) value stays."""
    from boficap_tpu.config.opts import restore_saved_opt
    merged = restore_saved_opt(infos.get("opt", {}))
    yaml_keys = frozenset()
    if args.cfg:
        from boficap_tpu.config.config import load_yaml_with_base
        y = load_yaml_with_base(args.cfg)
        yaml_keys = frozenset(y)
        merged.update(y)
    opt = default_config()
    opt.merge_from_dict(merged)
    # namespaces built by hand (tests) predate _explicit: route every flag
    # through the legacy precedence chain below.  Deferral to the
    # checkpoint's saved opts is narrower than "falsy": only None and 0
    # defer (outside language_eval/verbose, which keep their parser
    # defaults); an empty STRING (e.g. length_penalty='') intentionally
    # clobbers a saved non-empty value, matching the reference rule that
    # eval-namespace flags keep their parser defaults over saved opts
    # (reference tools/eval.py:53-61).  Treating them all as typed would
    # let e.g. beam_size=0 clobber a saved beam_size=5
    explicit = getattr(args, "_explicit", frozenset())
    for k, v in vars(args).items():
        if k in ("model", "infos_path", "cfg", "_explicit"):
            continue
        if k in REPLACE_KEYS:
            if v:                # parser defaults here are all falsy
                opt[k] = v
        elif k in explicit:
            if v is not None:
                opt[k] = v
        elif k in yaml_keys:
            pass                 # yaml beats an untyped parser default
        elif v is not None and (k not in opt or v != 0 or k in
                                ("language_eval", "verbose")):
            # reference rule: eval-namespace flags keep their parser
            # defaults over the checkpoint's saved opts
            opt[k] = v
    if not opt.get("id"):
        opt.id = infos.get("opt", {}).get("id", "model")
    finalize(opt)
    return opt


def main(argv=None):
    args = parse_eval_opt(argv)
    import jax
    if getattr(args, "device", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    with open(args.infos_path, "rb") as f:
        infos = pickle.load(f)

    opt = build_eval_opt(args, infos)

    # opt holds the final merged value of every eval flag; args is only
    # consulted for the two checkpoint paths (and --cfg, consumed above)
    eval_kwargs = dict(opt)
    eval_kwargs["model"] = args.model
    eval_kwargs["infos_path"] = args.infos_path

    # cached-result short circuit (tools/eval.py:65-97)
    if opt.get("only_lang_eval") and not opt.get("force"):
        cached = eval_utils.load_cached(eval_kwargs)
        if cached is not None:
            from boficap_tpu.eval.metrics import language_eval
            # re-run only language metrics on the cached predictions (the
            # cache carries n_predictions too, like the reference's
            # .saved_pred pth, eval_utils.py:662)
            stats = language_eval(cached["predictions"], cached["gts_words"])
            if cached.get("n_predictions"):
                from boficap_tpu.eval.multi_metrics import multi_sample_eval
                stats.update(multi_sample_eval(
                    cached["n_predictions"], cached["gts_words"],
                    eval_oracle=bool(opt.get("eval_oracle", 1))))
            print(stats)
            return stats
        print("no cached predictions; running full eval")

    if opt.get("image_folder"):
        # eval over a raw image folder (reference tools/eval.py:109-118):
        # features are extracted on the fly; the vocab MUST come from the
        # train infos (the folder has no cocotalk json), and there are no
        # gt captions, so language metrics are off.
        from boficap_tpu.data.raw import DataLoaderRaw
        loader = DataLoaderRaw(
            opt.image_folder,
            batch_size=int(opt.get("batch_size", 10) or 10),
            coco_json=opt.get("coco_json") or "",
            cnn_model=opt.get("cnn_model", "resnet101"))
        loader.ix_to_word = infos["vocab"]
        loader.vocab_size = len(infos["vocab"])
        loader.seq_length = int(opt.get("max_length", 20) or 20)
        if eval_kwargs.get("language_eval"):
            print("--image_folder has no gt captions; language_eval -> 0")
        eval_kwargs["language_eval"] = 0
        if not eval_kwargs.get("image_root"):
            eval_kwargs["image_root"] = opt.image_folder
    else:
        loader = CaptionData(opt)
    model = models_setup(opt, loader.vocab_size)

    # init a parameter template, then load the checkpoint bytes into it
    ex = loader.get_batch(opt.split)
    import jax
    from boficap_tpu.train import steps as steps_mod
    f = steps_mod._flat(ex)
    if f.get("labels") is None:
        # raw-folder batches carry no labels; template init uses dummies
        B = ex["att_feats"].shape[0]
        L2 = int(opt.get("max_length", 20) or 20) + 2
        f = dict(f)
        f["labels"] = jnp.zeros((B, L2), jnp.int32).at[:, 0].set(1)
        f["phrase_num"] = jnp.full((B,), 2, jnp.int32)
        f["phrase_length"] = (jnp.zeros((B, L2), jnp.int32)
                              .at[:, 0].set(1).at[:, 1].set(2))
        f["phrase_syn"] = jnp.zeros((B, L2), jnp.int32).at[:, 1].set(5)
    template = model.init(
        {"params": jax.random.PRNGKey(0), "glat": jax.random.PRNGKey(1)},
        jnp.asarray(ex["att_feats"]), jnp.asarray(ex["att_masks"]),
        f["labels"], f.get("phrase_num"), f.get("phrase_length"),
        f.get("phrase_syn"), glat_p=None, deterministic=True)
    params = load_params(args.model, template)
    loader.reset_iterator(opt.split)

    # attention-heatmap dump (reference's glo accumulator: fed from
    # MultiHeadedAttention draw=True, TransformerModel.py:1461-1462, printed
    # at tools/eval.py:126).  One teacher-forced batch with capture on; all
    # sown maps are saved whole, plus the reference-style 10x10 mean print.
    if opt.get("dump_attention"):
        from boficap_tpu.models.layers import set_capture_attention
        set_capture_attention(True)
        try:
            _, inter = model.apply(
                template if params is None else params,
                jnp.asarray(ex["att_feats"]), jnp.asarray(ex["att_masks"]),
                f["labels"], f.get("phrase_num"), f.get("phrase_length"),
                f.get("phrase_syn"), glat_p=None, deterministic=True,
                mutable=["intermediates"])
        finally:
            set_capture_attention(False)
        flat = {"/".join(str(p) for p in path): np.asarray(v)
                for path, v in jax.tree_util.tree_flatten_with_path(
                    inter["intermediates"])[0]}
        os.makedirs("vis", exist_ok=True)
        np.savez("vis/attn.npz", **flat)
        acc = np.zeros((10, 10))
        for v in flat.values():                     # [B, H, Q, K] maps
            m = v.mean(axis=(0, 1))
            q, k = min(10, m.shape[0]), min(10, m.shape[1])
            acc[:q, :k] += m[:q, :k]
        print("attention 10x10 accumulator (saved full maps to vis/attn.npz)")
        print(np.array_str(acc, precision=3, suppress_small=True))

    flops = None
    if opt.get("report_flops"):
        # XLA cost analysis of this eval's compiled programs (the
        # reference's commented-out thop hooks + configs/test_flops.yaml)
        flops = eval_utils.report_flops(
            model, params, ex, eval_kwargs,
            inference_mode=opt.inference_mode,
            ix_to_word=getattr(loader, "ix_to_word", {}))
        for name, c in flops.items():
            print(f"flops[{name}]: {c['flops'] / 1e9:.3f} GFLOP/batch "
                  f"({c['per_image_gflops']:.3f} GFLOP/image), "
                  f"bytes {c['bytes_accessed'] / 1e6:.1f} MB")

    result = eval_utils.eval_split(model, params, loader, eval_kwargs,
                                   inference_mode=opt.inference_mode)
    print(f"decode_time {result['decode_time']:.3f}s "
          f"(compile {result['compile_time']:.3f}s), "
          f"images/s {result['images_per_s']:.2f}")
    if result["lang_stats"]:
        print(result["lang_stats"])

    eval_utils.save_cached(eval_kwargs, {
        "predictions": result["predictions"],
        "n_predictions": result.get("n_predictions") or [],
        "gts_words": result["gts_words"]})
    if opt.get("dump_json"):
        os.makedirs("vis", exist_ok=True)
        with open("vis/vis.json", "w") as f:
            json.dump(result["predictions"], f)
        if result.get("n_predictions"):
            with open("vis/vis_n.json", "w") as f:
                json.dump(result["n_predictions"], f)
    # eval artifacts dir like the reference (eval_utils.py:660-664)
    os.makedirs("eval_results", exist_ok=True)
    with open(os.path.join("eval_results",
                           f"{opt.id}_{opt.split}.json"), "w") as f:
        json.dump({"predictions": result["predictions"],
                   "lang_stats": result["lang_stats"],
                   "decode_time": result["decode_time"],
                   "images_per_s": result["images_per_s"],
                   **({"flops": flops} if flops else {})}, f)
    return result


if __name__ == "__main__":
    main()
