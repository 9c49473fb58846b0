"""Splice teacher beam captions into dataset_coco.json (CLI parity with
reference scripts/KD_coco.py)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from boficap_tpu.prepro.phrase_pairs import splice_kd_captions

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", default="data/dataset_coco.json")
    p.add_argument("--kd_json", default="KD_dataset/0305.json")
    p.add_argument("--output_json", default="data/dataset_coco_kd90.json")
    a = p.parse_args()
    ori = json.load(open(a.input_json))
    kd = json.load(open(a.kd_json))
    out = splice_kd_captions(ori, kd)
    json.dump(out, open(a.output_json, "w"))
    print(f"wrote {a.output_json}")
