"""Cached CIDEr document frequencies (CLI parity with reference
scripts/prepro_ngrams.py): writes <output_pkl>-words.p and -idxs.p."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from boficap_tpu.rewards.ngrams import build_doc_freq, save_doc_freq

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", default="data/dataset_coco.json")
    p.add_argument("--dict_json", default="data/cocotalk.json")
    p.add_argument("--output_pkl", default="data/coco-all")
    p.add_argument("--split", default="all")
    a = p.parse_args()

    itow = json.load(open(a.dict_json))["ix_to_word"]
    wtoi = {w: i for i, w in itow.items()}
    imgs = json.load(open(a.input_json))["images"]

    refs_words, refs_idxs = [], []
    for img in imgs:
        if not (a.split == "all" or img["split"] == a.split or
                (a.split == "train" and img["split"] == "restval")):
            continue
        rw, ri = [], []
        for sent in img["sentences"]:
            toks = [w if w in wtoi else "UNK" for w in sent["tokens"]]
            # '<eos>' terminator id 0, matching array_to_str's trailing 0
            rw.append(" ".join(toks + ["<eos>"]))
            ri.append(" ".join([str(wtoi.get(w, 0)) for w in toks] + ["0"]))
        refs_words.append(rw)
        refs_idxs.append(ri)

    dfw, n = build_doc_freq(refs_words)
    dfi, _ = build_doc_freq(refs_idxs)
    save_doc_freq(a.output_pkl + "-words.p", dfw, n)
    save_doc_freq(a.output_pkl + "-idxs.p", dfi, n)
    print(f"wrote df over {n} images to {a.output_pkl}-words.p / -idxs.p")
