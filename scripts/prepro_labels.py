"""Vocab + caption encoding + spaCy noun-chunk phrase cutting
(CLI parity with reference scripts/prepro_labels.py).

    python scripts/prepro_labels.py --input_json data/dataset_coco.json \
        --output_json data/cocotalk.json --output_h5 data/cocotalk

Falls back to the dependency-free heuristic cutter when spaCy is absent
(--cutter heuristic)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from boficap_tpu.prepro.labels import run_prepro

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--output_json", default="data/cocotalk.json")
    p.add_argument("--output_h5", default="data/cocotalk")
    p.add_argument("--max_length", type=int, default=20)
    p.add_argument("--word_count_threshold", type=int, default=5)
    p.add_argument("--cutter", default="spacy",
                   choices=["spacy", "stanza", "heuristic"])
    p.add_argument("--no_phrases", action="store_true")
    a = p.parse_args()
    try:
        run_prepro(a.input_json, a.output_json, a.output_h5 + "_label.h5",
                   a.max_length, a.word_count_threshold, a.cutter,
                   need_phrases=not a.no_phrases)
    except ImportError as e:
        print(f"{e}; retrying with the heuristic cutter")
        run_prepro(a.input_json, a.output_json, a.output_h5 + "_label.h5",
                   a.max_length, a.word_count_threshold, "heuristic",
                   need_phrases=not a.no_phrases)
