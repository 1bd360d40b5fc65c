"""Golden tests for BIO decode + entity-level P/R counting.

Cases mirror the reference's handcrafted sequences
(tests/model/metrics/test_entity_level_precision.py:30-107,
test_entity_level_recall.py:30-65), incl. the I-after-O rule and
padding truncation.
"""

import pytest

from bioner_ray.functions.bio import (
    B,
    I,
    O,
    PAD,
    decode_bio_spans,
    f1_from_counts,
    sentence_prf_counts,
    strip_padding,
    tag_to_index,
    truncate_predictions,
)


class TestTagCodec:
    def test_first_char_mapping(self):
        assert tag_to_index("B-T116,T123") == B
        assert tag_to_index("I-anything") == I
        assert tag_to_index("O") == O


class TestDecode:
    def test_simple_span(self):
        assert decode_bio_spans([B, I, O]) == [(0, 1)]

    def test_i_after_o_opens_span(self):
        # reference entity_level_precision_recall.py:142-146
        assert decode_bio_spans([O, I, I, O]) == [(1, 2)]

    def test_b_after_b_flushes(self):
        assert decode_bio_spans([B, B, O]) == [(0, 0), (1, 1)]

    def test_span_at_sentence_end(self):
        assert decode_bio_spans([O, B, I]) == [(1, 2)]

    def test_all_outside(self):
        assert decode_bio_spans([O, O, O]) == []

    def test_leading_i(self):
        assert decode_bio_spans([I, O, B]) == [(0, 0), (2, 2)]

    def test_empty(self):
        assert decode_bio_spans([]) == []


class TestPadding:
    def test_strip_padding(self):
        assert strip_padding([B, I, PAD, PAD]) == [B, I]

    def test_truncate_predictions_positional(self):
        # predicted padding positions can hold ANY class (reference
        # filtered_labels docstring, entity_level_precision_recall.py:171-182)
        assert truncate_predictions([B, I, B, B], 2) == [B, I]


class TestSentenceCounts:
    def test_perfect_match(self):
        tp, np_, ng = sentence_prf_counts([B, I, O, B], [B, I, O, B])
        assert (tp, np_, ng) == (2, 2, 2)

    def test_all_o_prediction_gives_zero_precision(self):
        tp, np_, ng = sentence_prf_counts([B, I, O], [O, O, O])
        assert (tp, np_, ng) == (0, 0, 1)
        p, r, f1 = f1_from_counts(tp, np_, ng)
        assert p == 0.0 and r == 0.0 and f1 == 0.0

    def test_padding_case(self):
        gold = [B, I, PAD, PAD]
        pred = [B, I, B, B]  # junk in padded region must be ignored
        tp, np_, ng = sentence_prf_counts(gold, pred)
        assert (tp, np_, ng) == (1, 1, 1)

    def test_partial_overlap_not_counted(self):
        # span identity is exact (start, end) equality (Annotation.__eq__)
        tp, np_, ng = sentence_prf_counts([B, I, I, O], [B, I, O, O])
        assert (tp, np_, ng) == (0, 1, 1)

    def test_i_after_o_parity_between_gold_and_pred(self):
        tp, np_, ng = sentence_prf_counts([O, I, I], [O, B, I])
        assert (tp, np_, ng) == (1, 1, 1)


class TestF1:
    def test_composition(self):
        p, r, f1 = f1_from_counts(3, 4, 6)
        assert p == 0.75 and r == 0.5
        assert abs(f1 - 0.6) < 1e-12

    @pytest.mark.parametrize("tp,np_,ng", [(0, 0, 0), (0, 5, 0), (0, 0, 5)])
    def test_degenerate_no_nan(self, tp, np_, ng):
        p, r, f1 = f1_from_counts(tp, np_, ng)
        assert f1 == 0.0
