"""Convert a reference PyTorch checkpoint into this framework's eval-ready
pair (model .ckpt + infos .pkl) — the CLI face of
boficap_tpu.utils.convert.torch_to_flax (tensor-level parity-tested in
tests/test_torch_parity.py).

    python tools/convert.py --torch model_best.pth \
        --infos infos_uic_sd-best.pkl --out_dir converted/

then evaluate exactly like a native checkpoint:

    python tools/eval.py --model converted/model.ckpt \
        --infos_path converted/infos_converted.pkl --inference_mode NAIC

The reference pickles its argparse Namespace into infos['opt']
(tools/train.py:62-69 there); this tool re-writes it as a plain dict so the
eval CLI's config merge digests it.  Without --infos, pass --train_mode and
--input_json (the cocotalk vocab json) instead.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch", type=str, required=True,
                   help="reference model .pth (a torch state dict)")
    p.add_argument("--infos", type=str, default="",
                   help="reference infos_*.pkl (vocab + saved train opts)")
    p.add_argument("--train_mode", type=str, default="",
                   help="override / supply when --infos is absent")
    p.add_argument("--input_json", type=str, default="",
                   help="cocotalk json for the vocab when --infos is absent")
    p.add_argument("--out_dir", type=str, default="converted")
    p.add_argument("--id", type=str, default="converted")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from flax import serialization

    from boficap_tpu.utils.convert import load_reference_checkpoint

    opt = {}
    vocab = None
    if args.infos:
        with open(args.infos, "rb") as f:
            infos = pickle.load(f)
        raw = infos.get("opt", {})
        opt = dict(vars(raw)) if hasattr(raw, "__dict__") else dict(raw)
        vocab = infos.get("vocab")
    train_mode = args.train_mode or opt.get("train_mode") or "AIC"
    if vocab is None:
        if not args.input_json:
            raise SystemExit("need --infos or --input_json for the vocab")
        with open(args.input_json) as f:
            vocab = json.load(f)["ix_to_word"]
    opt["train_mode"] = train_mode
    opt["id"] = args.id

    params = load_reference_checkpoint(args.torch, train_mode)

    os.makedirs(args.out_dir, exist_ok=True)
    model_path = os.path.join(args.out_dir, "model.ckpt")
    with open(model_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    infos_path = os.path.join(args.out_dir, f"infos_{args.id}.pkl")
    with open(infos_path, "wb") as f:
        pickle.dump({"opt": opt, "vocab": vocab, "iter": 0, "epoch": 0,
                     "vocab_size": len(vocab)}, f)
    print(f"wrote {model_path} and {infos_path} (train_mode={train_mode}, "
          f"vocab {len(vocab)})")
    return model_path, infos_path


if __name__ == "__main__":
    main()
