"""Hardware smoke sweep: train + val-decode EVERY model family on the TPU.

The pytest suite exercises all train_modes and LSTM captioners on the
8-virtual-CPU mesh; this script is the on-device counterpart — for each
family it drives the REAL ``tools/train.py`` CLI (synthetic corpus, a few
dozen iterations, periodic val decode with language eval) on whatever
backend JAX resolves (the TPU under axon) and reports pass/fail + final
loss.  Reference coverage: every ``train_mode`` of
captioning/models/TransformerModel.py:1511-1624 plus the fc/updown/
att2in2/aoa captioners the reference's config corpus names.

Run: python scripts/tpu_mode_smoke.py          (~15-25 min cold)
     MODES=UIC,PB_pad python scripts/tpu_mode_smoke.py
"""

import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRANSFORMER_MODES = ["auto", "NNAIC", "NAIC", "SAIC", "UIC", "UIC_ds",
                     "UIC_s", "UIC_u", "PB_pad"]
LSTM_MODELS = ["fc", "updown", "att2in2", "aoa"]


def run_one(name, set_cfgs):
    out_dir = f"/tmp/msmoke/{name}"
    cmd = [sys.executable, os.path.join(ROOT, "tools", "train.py"),
           "--cfg", os.path.join(ROOT, "configs", "synthetic_smoke.yml"),
           "--id", f"msmoke_{name}", "--checkpoint_path", out_dir,
           "--set_cfgs"] + set_cfgs
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=1200)
    except subprocess.TimeoutExpired as e:
        print(f"{name:<10} FAIL  {time.time() - t0:6.1f}s (timeout)",
              flush=True)
        tail = ((e.stdout or b"").decode(errors="replace")
                if isinstance(e.stdout, bytes) else (e.stdout or ""))
        print(tail[-800:], flush=True)
        return False
    dt = time.time() - t0
    full = p.stdout + p.stderr
    tail = full[-4000:]
    losses = re.findall(r"loss ([0-9.]+) step", full)
    vals = re.findall(r"val\[(\w+)\]", full)
    ok = (p.returncode == 0
          and os.path.exists(os.path.join(out_dir, "model.ckpt")))
    print(f"{name:<10} {'OK' if ok else 'FAIL':<5} {dt:6.1f}s "
          f"last_loss={losses[-1] if losses else '?'} "
          f"val_modes={sorted(set(vals)) or '-'}", flush=True)
    if not ok:
        print(tail[-1500:], flush=True)
    return ok


def main():
    only = [m for m in os.environ.get("MODES", "").split(",") if m]
    results = {}
    for m in TRANSFORMER_MODES:
        if only and m not in only:
            continue
        results[m] = run_one(m, ["train_mode", m])
    for cm in LSTM_MODELS:
        if only and cm not in only:
            continue
        results[cm] = run_one(
            cm, ["caption_model", cm, "train_mode", "AIC",
                 "use_fc", "true", "use_att", "true"])
    bad = [k for k, v in results.items() if not v]
    print(f"\n{len(results) - len(bad)}/{len(results)} families passed"
          + (f"; FAILED: {bad}" if bad else ""), flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
