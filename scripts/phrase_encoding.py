"""BPE-style greedy phrase-pair merging (CLI parity with reference
scripts/phrase_encoding.py): writes phrase_pair.json."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from boficap_tpu.prepro.phrase_pairs import learn_phrase_pairs

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--input_h5", default="")
    p.add_argument("--output_json", default="data/phrase_pair.json")
    p.add_argument("--phrase_count_threshold", type=int, default=5)
    a = p.parse_args()
    imgs = json.load(open(a.input_json))["images"]
    phrase_data = None
    if a.input_h5:
        import h5py
        h5 = h5py.File(a.input_h5, "r")
        phrase_data = (h5["label_start_ix"][:], h5["phrase_num"][:],
                       h5["phrase_length"][:])
    rec = learn_phrase_pairs(imgs, phrase_data, a.phrase_count_threshold)
    json.dump(rec, open(a.output_json, "w"))
    print(f"{len(rec)} merges -> {a.output_json}")
