"""SPICE_approx: scene-graph tuple extraction + tuple-F1 scoring
(eval/spice.py; reference gets SPICE from the external coco-caption java
scorer, captioning/utils/eval_utils.py:75-127 — absent in this image, so
the in-process approximation is tested against hand-worked fixtures)."""

import numpy as np
import pytest

from boficap_tpu.eval.spice import (SpiceApprox, allspice, parse_tuples,
                                    spice)


class TestParseTuples:
    def test_np_object_and_attributes(self):
        t = parse_tuples("a young girl")
        assert ("o", "girl") in t
        assert ("a", "girl", "young") in t

    def test_verb_relation(self):
        t = parse_tuples("a man riding a brown horse")
        assert ("r", "man", "ride", "hors") in t      # stemmed elements
        assert ("a", "hors", "brown") in t
        assert ("o", "man") in t and ("o", "hors") in t

    def test_copula_progressive_collapses(self):
        # "is riding" == "riding" (same relation tuple)
        assert parse_tuples("a man is riding a horse") == \
            parse_tuples("a man riding a horse")

    def test_copular_predicate_is_attribute_not_object(self):
        t = parse_tuples("the horse is brown")
        assert t == {("o", "hors"), ("a", "hors", "brown")}

    def test_copula_locative(self):
        t = parse_tuples("the cat is on the mat")
        assert t == {("o", "cat"), ("o", "mat"), ("r", "cat", "on", "mat")}

    def test_preposition_nearest_attachment(self):
        t = parse_tuples("a man riding a horse on a beach")
        assert ("r", "hors", "on", "beach") in t      # right attachment
        assert ("r", "man", "ride", "hors") in t

    def test_verb_preposition_compound_relation(self):
        t = parse_tuples("two dogs playing with a red ball")
        assert ("r", "dog", "plai with", "ball") in t

    def test_number_becomes_count_attribute(self):
        t = parse_tuples("two dogs")
        assert ("a", "dog", "two") in t

    def test_multiword_preposition(self):
        t = parse_tuples("a bench next to a tree")
        assert ("r", "bench", "next to", "tree") in t

    def test_past_participle_reduced_clause(self):
        t = parse_tuples("a bus parked on the street")
        assert ("r", "bu", "park on", "street") in t

    def test_ing_noun_after_determiner(self):
        # "a building" is a noun, not a verb
        t = parse_tuples("a man standing near a tall building")
        assert ("o", "build") in t
        assert ("a", "build", "tall") in t
        assert ("r", "man", "stand near", "build") in t

    def test_relative_pronoun_dropped(self):
        assert parse_tuples("a man who is riding a horse") == \
            parse_tuples("a man riding a horse")

    def test_lexicon_verb_without_morph_cue(self):
        t = parse_tuples("a dog sits on a couch")
        assert ("r", "dog", "sit on", "couch") in t

    def test_lexicon_stem_mid_np_is_noun(self):
        # 'watch' stems like the verb but heads the NP here
        t = parse_tuples("a man wearing a gold watch")
        assert ("o", "watch") in t
        assert ("a", "watch", "gold") in t
        assert ("r", "man", "wear", "watch") in t

    def test_conjoined_modifiers_stay_in_np(self):
        t = parse_tuples("a black and white dog")
        assert t == {("o", "dog"), ("a", "dog", "black"),
                     ("a", "dog", "white")}

    def test_punctuation_stripped(self):
        assert parse_tuples("a brown dog.") == parse_tuples("a brown dog")
        assert spice("a brown dog", ["a brown dog."]) == 1.0

    def test_plural_subject_base_verb(self):
        t = parse_tuples("two giraffes stand in a field")
        assert ("o", "giraff") in t
        assert ("a", "giraff", "two") in t
        assert ("r", "giraff", "stand in", "field") in t
        tp = parse_tuples("people walk down a street")
        assert ("o", "peopl") in tp
        assert ("r", "peopl", "walk down", "street") in tp

    def test_conjoined_nouns_stay_separate_objects(self):
        t = parse_tuples("a man and woman sitting on a bench")
        assert ("o", "man") in t and ("o", "woman") in t
        assert not any(x == ("a", "woman", "man") for x in t)

    def test_copular_predicate_not_relation_subject(self):
        t = parse_tuples("a bowl is full of fruit")
        assert ("a", "bowl", "full") in t
        assert ("r", "bowl", "of", "fruit") in t
        assert not any(x[0] == "r" and x[1] == "full" for x in t)

    def test_empty(self):
        assert parse_tuples("") == set()


class TestSpiceScore:
    def test_identical_is_one(self):
        assert spice("a man riding a horse",
                     ["a man riding a horse"]) == 1.0

    def test_disjoint_is_zero(self):
        assert spice("blue car", ["green tree"]) == 0.0

    def test_synonym_tuple_match(self):
        # guy/man share a synonym group -> tuples match
        assert spice("a guy riding a horse",
                     ["a man riding a horse"]) == 1.0

    def test_hand_worked_f1(self):
        # cand: {o dog, (dog,large), (dog,brown)}
        # refs: {o dog, (dog,big), (dog,brown), o yard, (dog,in,yard)}
        # large~big via synonyms: P = 3/3, R = 3/5, F = 2*1*.6/1.6 = .75
        got = spice("a large brown dog",
                    ["a big brown dog", "a dog in a yard"])
        assert got == pytest.approx(0.75)

    def test_reference_union(self):
        # each ref alone misses a tuple; the union covers both
        s = spice("a red ball on a table",
                  ["a red ball", "a ball on a table"])
        assert s == 1.0

    def test_empty_candidate(self):
        assert spice("", ["a dog"]) == 0.0

    def test_allspice_union_raises_recall(self):
        refs = ["a man riding a horse on a beach"]
        single = spice("a man riding a horse", refs)
        multi = allspice(["a man riding a horse", "a man on a beach"], refs)
        assert multi > single

    def test_scorer_interface(self):
        gts = {1: ["a dog on a couch"], 2: ["a red car"]}
        res = {1: ["a dog on a sofa"], 2: ["a red car"]}
        mean, scores = SpiceApprox().compute_score(gts, res)
        assert len(scores) == 2
        assert scores[1] == 1.0                      # exact
        assert scores[0] == 1.0                      # couch~sofa synonym
        assert mean == pytest.approx(np.mean(scores))


class TestWiring:
    def test_language_eval_reports_spice_approx(self):
        from boficap_tpu.eval.metrics import language_eval
        preds = [{"image_id": 1, "caption": "a dog on a couch"}]
        gts = {1: ["a dog on a couch", "a dog sits on a sofa"]}
        out = language_eval(preds, gts)
        assert out["SPICE"] is None                  # official: absent
        # cand covers 4 of the 5 ref-union tuples (the 'sit on' relation is
        # unmatched): P=1, R=4/5, F=8/9
        assert out["SPICE_approx"] == pytest.approx(8 / 9)

    def test_multi_sample_eval_reports_allspice_approx(self):
        from boficap_tpu.eval.multi_metrics import multi_sample_eval
        preds_n = [{"image_id": 1, "caption": "a man riding a horse"},
                   {"image_id": 1, "caption": "a man on a beach"}]
        gts = {1: ["a man riding a horse on a beach"]}
        out = multi_sample_eval(preds_n, gts)
        assert out["allspice"] is None               # official: absent
        assert out["allspice_approx"] is not None
        assert 0.0 < out["allspice_approx"] <= 1.0
