"""Quantify the heuristic phrase cutter's bias against real constituency
cuts (r2 verdict #5).

``prepro/labels.py::heuristic_cutter`` is the documented stand-in for the
reference's stanza constituency cutter (scripts/prepro_labels_stanford.py)
when no parser is installed; this fixture pins HOW different its cuts are.
Goldens (tests/goldens/constituency_cuts.json) are hand-derived
applications of the reference's own gather_phrase_level(dest_dep=3)
algorithm + span alignment + CP gap filling to Penn-style parses of 13
COCO-style captions, the first being the reference's own demo sentence
(stanford_cut.py:68).

Metrics:
  * goldens self-check: each entry's phrase_length sums to len(tokens)
    and the gathered phrase strings align left-to-right inside the
    caption (the same invariant the reference's matcher enforces,
    stanford_cut.py:88-105);
  * boundary F1: cut positions of the heuristic cutter vs golden cuts —
    asserted above a floor and the measured value documented in PARITY.md;
  * exact-segmentation rate (strictest view) reported for the record.

If stanza is ever installed in the image, test_goldens_match_stanza
re-derives every golden from the live parser (skipped otherwise) — the
hand derivation is then machine-checked.
"""

import json
import os

import numpy as np
import pytest

from boficap_tpu.prepro.labels import assemble_phrases, heuristic_chunks

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "constituency_cuts.json")
BOUNDARY_F1_FLOOR = 0.85   # measured 0.892 on the 43-entry set (r5 rules)
CATEGORY_F1_FLOOR = 0.70   # worst category measured 0.750 (conj-vp)
MAX_LENGTH = 20


def load_goldens():
    with open(GOLDENS) as f:
        return json.load(f)["captions"]


def boundaries(lengths):
    """Interior cut positions of a segmentation."""
    ends = np.cumsum([n for n in lengths if n > 0])
    return set(int(e) for e in ends[:-1])


def heuristic_cut(tokens):
    pl, lab, cnt = assemble_phrases(len(tokens),
                                    heuristic_chunks(tokens), MAX_LENGTH)
    return [int(x) for x in pl[:cnt]], [int(x) for x in lab[:cnt]]


def test_goldens_self_consistent():
    for g in load_goldens():
        total = sum(g["phrase_length"])
        assert total == len(g["tokens"]), g
        assert len(g["phrase_length"]) == len(g["phrase_syn"]), g
        # gathered phrases align left-to-right, like the reference matcher
        pos = 0
        toks = g["tokens"]
        for phrase in g["phrases"]:
            words = phrase.split()
            while pos <= len(toks) - len(words):
                if toks[pos:pos + len(words)] == words:
                    pos += len(words)
                    break
                pos += 1
            else:
                raise AssertionError(f"phrase {phrase!r} not alignable "
                                     f"in {toks}")
        # the phrase/gap lengths must partition the caption with gathered
        # spans carrying NP/VP and gaps carrying CP
        n_np_vp = sum(1 for s in g["phrase_syn"] if s in (4, 5))
        assert n_np_vp == len(g["phrases"]), g


def test_heuristic_boundary_agreement():
    """Boundary-level P/R/F1 of the heuristic cutter vs the constituency
    goldens, overall and PER SYNTACTIC CATEGORY (r3 verdict #7: a 13-
    sentence set gave F1 0.605 with a wide interval; the 43-entry set pins
    the floor and exposes systematic failure modes).  Measured values are
    documented in PARITY.md (heuristic cutter bias)."""
    stats = {}

    def acc(cat, key, n=1):
        stats.setdefault(cat, dict(tp=0, fp=0, fn=0, exact=0, n=0))
        stats[cat][key] += n

    rows = []
    for g in load_goldens():
        pl, _ = heuristic_cut(g["tokens"])
        assert sum(pl) == len(g["tokens"])
        got = boundaries(pl)
        want = boundaries(g["phrase_length"])
        for cat in ("ALL", g.get("cat", "misc")):
            acc(cat, "tp", len(got & want))
            acc(cat, "fp", len(got - want))
            acc(cat, "fn", len(want - got))
            acc(cat, "exact", int(pl == g["phrase_length"]))
            acc(cat, "n")
        rows.append((g["tokens"], pl, g["phrase_length"]))

    def prf(s):
        p = s["tp"] / max(s["tp"] + s["fp"], 1)
        r = s["tp"] / max(s["tp"] + s["fn"], 1)
        f = 2 * p * r / max(p + r, 1e-9)
        return p, r, f

    print("\nheuristic-vs-constituency boundary agreement by category:")
    for cat in sorted(stats, key=lambda c: (c != "ALL", c)):
        s = stats[cat]
        p, r, f = prf(s)
        print(f"  {cat:<14} n={s['n']:>2}  P={p:.3f} R={r:.3f} F1={f:.3f}"
              f"  exact {s['exact']}/{s['n']}")
    _, _, f1 = prf(stats["ALL"])
    assert f1 >= BOUNDARY_F1_FLOOR, (
        f"F1 {f1:.3f} fell below the documented floor "
        f"{BOUNDARY_F1_FLOOR}: {rows}")
    for cat, s in stats.items():
        if cat == "ALL":
            continue
        _, _, cf = prf(s)
        assert cf >= CATEGORY_F1_FLOOR, (
            f"category {cat} F1 {cf:.3f} below the per-category floor "
            f"{CATEGORY_F1_FLOOR} (r5 rules measured worst 0.750)")


def test_heuristic_emits_valid_syn_labels():
    for g in load_goldens():
        pl, lab = heuristic_cut(g["tokens"])
        assert all(s in (4, 5, 6) for s in lab), lab
        assert all(0 < n < MAX_LENGTH for n in pl), pl


def test_goldens_match_stanza():
    """Machine-check the hand-derived goldens when a parser is available
    (not in this image; keeps the fixture honest if that changes)."""
    stanza = pytest.importorskip("stanza")
    from boficap_tpu.prepro.labels import stanza_chunks
    nlp = stanza.Pipeline(lang="en",
                          processors="tokenize,pos,constituency")
    for g in load_goldens():
        spans = stanza_chunks(g["tokens"], nlp, depth=3)
        pl, lab, cnt = assemble_phrases(len(g["tokens"]), spans,
                                        MAX_LENGTH)
        assert [int(x) for x in pl[:cnt]] == g["phrase_length"], g
