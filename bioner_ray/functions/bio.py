"""BIO2 tag codec and the span-decoding automaton.

Tag index convention follows the reference enum order
(bioner/model/bio2tag.py:4-18): B=0, I=1, O=2 — ``get_index`` is
position in enum declaration order. Padding uses -100 in the reference
tensors (annotator.py:23,33); at rest in Arrow we use the uint8
sentinel 255 (``PAD``).
"""

from __future__ import annotations

from typing import Iterable, Sequence

B, I, O = 0, 1, 2
PAD = 255
TAG_CHARS = ("B", "I", "O")
_CHAR_TO_INDEX = {"B": B, "I": I, "O": O}


def tag_to_index(tag_char: str) -> int:
    """First-character BIO mapping (conll_dataset.py:83 takes ``row[3][0]``,
    so ``B-T116,T123`` → ``B``)."""
    return _CHAR_TO_INDEX[tag_char[0]]


def index_to_tag(index: int) -> str:
    """Reference ``BIO2Tag.index_to_type`` (bio2tag.py:16-18)."""
    return TAG_CHARS[index]


def decode_bio_spans(tags: Sequence[int]) -> list[tuple[int, int]]:
    """Tags → maximal [start_token, end_token] spans (inclusive).

    Exact port of the reference automaton
    ``convert_labeled_tokens_to_annotations``
    (bioner/model/metrics/entity_level_precision_recall.py:134-164):

    * ``I`` with no open span opens one (I-after-O treated as B, :142-146)
    * ``B`` flushes any open span and opens a new one (:148-151)
    * ``O`` flushes (:155-157)
    * sentence end flushes (:159-163)

    PAD entries (padding) must be filtered by the caller beforehand —
    the reference filters -100 before decoding
    (``_create_BIO2_labels_from_indices``, :126-131).
    """
    spans: list[tuple[int, int]] = []
    start = -1
    end = -1
    for idx, tag in enumerate(tags):
        if start < 0:
            if tag == B or tag == I:
                start = end = idx
        else:
            if tag == B:
                spans.append((start, end))
                start = end = idx
            elif tag == I:
                end = idx
            else:  # O
                spans.append((start, end))
                start = end = -1
    if start >= 0:
        spans.append((start, end))
    return spans


def strip_padding(tags: Iterable[int]) -> list[int]:
    """Drop PAD sentinels, mirroring the reference's -100 filter
    (entity_level_precision_recall.py:126-131)."""
    return [t for t in tags if t != PAD]


def truncate_predictions(pred: Sequence[int], gold_len: int) -> list[int]:
    """Truncate a predicted tag row to the gold row's (unpadded) length.

    Reference ``filtered_labels`` (entity_level_precision_recall.py:171-182):
    predicted padding positions can hold any class index, so padding is
    removed positionally using the gold length, never by value.
    """
    return list(pred[:gold_len])


def sentence_prf_counts(
    gold: Sequence[int], pred: Sequence[int]
) -> tuple[int, int, int]:
    """(true_positives, n_pred_spans, n_gold_spans) for one sentence.

    Matches EntityLevelPrecision/Recall.update semantics
    (entity_level_precision_recall.py:26-103): gold is PAD-filtered,
    predictions are positionally truncated to the gold length, spans are
    compared by exact (start, end) identity (Annotation.__eq__/__hash__,
    :112-123), TP = |gold ∩ pred| (:167-168).
    """
    gold_clean = strip_padding(gold)
    pred_clean = truncate_predictions(list(pred), len(gold_clean))
    gold_spans = set(decode_bio_spans(gold_clean))
    pred_spans = set(decode_bio_spans(pred_clean))
    tp = len(gold_spans & pred_spans)
    return tp, len(pred_spans), len(gold_spans)


def f1_from_counts(tp: float, n_pred: float, n_gold: float) -> tuple[float, float, float]:
    """(precision, recall, f1). F1 composition per annotator.py:108-110:
    ``P*R*2/(P+R+1e-20)``; P/R are 0 when their denominator is 0
    (ignite _BasePrecisionRecall eps semantics)."""
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = precision * recall * 2 / (precision + recall + 1e-20)
    return precision, recall, f1
