"""Hardware smoke sweep of the EVAL surface: every decode method the
reference's `_sample`/`_sample_beam`/`eval_split_n` dispatchers expose, run
through the real ``tools/eval.py`` CLI on the TPU against a trained smoke
checkpoint.

Covers (reference AttModel.py:263-614 + utils/eval_utils.py:671-722):
greedy, beam search, diverse beam search, temperature / top-k / top-p /
gumbel sampling, sample_n>1 eval, all three UIC_u inference modes
(SAIC/NAIC/AIC), only_lang_eval re-scoring, and the attention dump.

Run AFTER scripts/tpu_mode_smoke.py (uses its UIC_u checkpoint), or point
CKPT_DIR at any checkpoint directory:
    python scripts/tpu_eval_smoke.py
"""

import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.environ.get("CKPT_DIR", "/tmp/msmoke/UIC_u")
ID = os.environ.get("CKPT_ID", "msmoke_UIC_u")

CASES = [
    ("greedy_saic", ["--inference_mode", "SAIC"]),
    ("greedy_naic", ["--inference_mode", "NAIC"]),
    ("greedy_aic", ["--inference_mode", "AIC"]),
    ("beam3", ["--inference_mode", "AIC", "--beam_size", "3"]),
    ("dbs_g2", ["--inference_mode", "AIC", "--beam_size", "2",
                "--group_size", "2", "--diversity_lambda", "0.3"]),
    ("temp", ["--inference_mode", "AIC", "--sample_method", "temperature",
              "--temperature", "0.7"]),
    ("topk", ["--inference_mode", "AIC", "--sample_method", "top3"]),
    ("topp", ["--inference_mode", "AIC", "--sample_method", "top0.8"]),
    ("gumbel", ["--inference_mode", "AIC", "--sample_method", "gumbel"]),
    ("sample_n4", ["--inference_mode", "AIC", "--sample_n", "4",
                   "--sample_method", "sample"]),
    ("dump_attn", ["--inference_mode", "SAIC", "--dump_attention", "1"]),
    ("only_lang", ["--inference_mode", "SAIC", "--only_lang_eval", "1"]),
    ("sample_n_dg", ["--inference_mode", "AIC", "--sample_n", "3",
                     "--sample_n_method", "dgreedy"]),
    ("bad_endings", ["--inference_mode", "AIC", "--beam_size", "2",
                     "--remove_bad_endings", "1", "--verbose_beam", "1"]),
    ("constraints", ["--inference_mode", "AIC", "--decoding_constraint", "1",
                     "--block_trigrams", "1"]),
]


def run_one(name, extra):
    # only_lang must NOT force: tools/eval.py's cached re-score branch is
    # `only_lang_eval and not force` — forcing would silently cover the
    # full-decode path instead of the one this case exists for
    only_lang = "--only_lang_eval" in extra
    cmd = [sys.executable, os.path.join(ROOT, "tools", "eval.py"),
           "--model", os.path.join(CKPT, "model_best.ckpt"),
           "--infos_path", os.path.join(CKPT, f"infos_{ID}_best.pkl"),
           "--split", "val", "--num_images", "4", "--language_eval", "1",
           "--dump_json", "0"] + ([] if only_lang else ["--force", "1"]) \
        + extra
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=900, cwd="/tmp")
    except subprocess.TimeoutExpired:
        print(f"{name:<12} FAIL  (timeout)", flush=True)
        return False
    dt = time.time() - t0
    full = p.stdout + p.stderr
    rate = re.findall(r"images/s ([0-9.]+)", full)
    if only_lang:
        # proof the cached short-circuit ran: language stats with no decode
        # (a prior case's save_cached populated /tmp/eval_results)
        ok = p.returncode == 0 and "Bleu" in full and "decode_time" not in full
    else:
        ok = p.returncode == 0 and ("loss" in full or "Bleu" in full
                                    or "decode_time" in full)
    print(f"{name:<12} {'OK' if ok else 'FAIL':<5} {dt:6.1f}s "
          f"images/s={rate[-1] if rate else '?'}", flush=True)
    if not ok:
        print(full[-1200:], flush=True)
    return ok


def main():
    if not os.path.exists(os.path.join(CKPT, "model_best.ckpt")):
        print(f"no checkpoint at {CKPT} — run scripts/tpu_mode_smoke.py "
              "first or set CKPT_DIR")
        sys.exit(2)
    results = {n: run_one(n, e) for n, e in CASES}
    bad = [k for k, v in results.items() if not v]
    print(f"\n{len(results) - len(bad)}/{len(results)} eval cases passed"
          + (f"; FAILED: {bad}" if bad else ""), flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
