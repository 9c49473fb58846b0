"""Stanza constituency phrase cutting with VP/NP/CP labels
(CLI parity with reference scripts/prepro_labels_stanford.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from boficap_tpu.prepro.labels import run_prepro

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--output_json", default="data/cocotalk_stanza.json")
    p.add_argument("--output_h5", default="data/cocotalk_stanza")
    p.add_argument("--max_length", type=int, default=20)
    p.add_argument("--word_count_threshold", type=int, default=5)
    p.add_argument("--depth", type=int, default=0,
                   help="constituency depth at which VP/NP are gathered")
    a = p.parse_args()
    try:
        run_prepro(a.input_json, a.output_json, a.output_h5 + "_label.h5",
                   a.max_length, a.word_count_threshold, "stanza", a.depth)
    except ImportError as e:
        print(f"{e}; retrying with the heuristic cutter")
        run_prepro(a.input_json, a.output_json, a.output_h5 + "_label.h5",
                   a.max_length, a.word_count_threshold, "heuristic")
