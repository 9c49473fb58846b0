"""Apply learned phrase-pair merges back onto a label h5 (CLI parity with
reference scripts/prep_h5.py): rewrites phrase_num/phrase_length."""
import argparse
import json
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from boficap_tpu.prepro.phrase_pairs import apply_merges_to_h5

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--input_h5", required=True)
    p.add_argument("--pair_json", required=True)
    p.add_argument("--output_h5", required=True)
    a = p.parse_args()
    imgs = json.load(open(a.input_json))["images"]
    merges = json.load(open(a.pair_json))
    with h5py.File(a.input_h5, "r") as h5:
        data = {k: h5[k][:] for k in h5.keys()}
    pn, pl = apply_merges_to_h5(imgs, data["label_start_ix"],
                                data["phrase_num"], data["phrase_length"],
                                merges)
    data["phrase_num"], data["phrase_length"] = pn, pl
    with h5py.File(a.output_h5, "w") as f:
        for k, v in data.items():
            f.create_dataset(k, data=v)
    print(f"wrote {a.output_h5}")
