"""Standalone demo of the constituency phrase cutter (parity with reference
scripts/stanford_cut.py): cut a few sentences and print the phrase plans."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from boficap_tpu.prepro.labels import (assemble_phrases, heuristic_chunks,
                                       stanza_chunks)

DEMO = [
    "a man riding a wave on top of a surfboard",
    "two dogs are playing with a frisbee in the park",
    "a close up of a plate of food with broccoli",
]

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sentences", nargs="*", default=DEMO)
    p.add_argument("--cutter", default="stanza",
                   choices=["stanza", "heuristic"])
    p.add_argument("--depth", type=int, default=0)
    a = p.parse_args()
    nlp = None
    cutter = a.cutter
    if cutter == "stanza":
        try:
            import stanza
            nlp = stanza.Pipeline(lang="en",
                                  processors="tokenize,pos,constituency")
        except ImportError:
            print("stanza not installed; using the heuristic cutter")
            cutter = "heuristic"
    names = {4: "VP", 5: "NP", 6: "CP"}
    for sent in a.sentences:
        toks = sent.split()
        spans = (stanza_chunks(toks, nlp, a.depth) if cutter == "stanza"
                 else heuristic_chunks(toks))
        pl, lab, cnt = assemble_phrases(len(toks), spans, max(len(toks), 20))
        print(f"\n{sent}")
        start = 0
        for j in range(cnt):
            n = int(pl[j])
            print(f"  [{names[int(lab[j])]}] {' '.join(toks[start:start+n])}")
            start += n
