"""Sentence segmentation + tokenization (stateless map_batches stage).

Produces the engine's nested document rows (DOCUMENTS_SCHEMA): sentence
and token order live *inside* the row, mirroring the reference's
Document → Sentence → Token nesting (bioner/model/document.py:1-14,
sentence.py:6-18, token.py:6-17) so downstream position features and
BIO decoding never need cross-row order (SURVEY.md §2.9).
"""

from __future__ import annotations

import pyarrow as pa

from bioner_ray.functions.text import split_sentences, tokenize_with_offsets
from bioner_ray.schemas import SENTENCE_TYPE


def segment_document(
    text: str, max_sentence_tokens: int = 512, with_offsets: bool = True
) -> list[dict]:
    """One document's nested sentence structs.

    A sentence longer than ``max_sentence_tokens`` is split at token
    boundaries into continuation sentences (each gets its own sent_id;
    offsets stay relative to the ORIGINAL sentence, so provenance is
    preserved). This is the pad-skew guard of SURVEY.md §7.4.5: one
    pathological unpunctuated page must not inflate a whole scorer
    bucket or blow the padded recurrence's (S, L, ff) buffer.

    ``with_offsets=False`` leaves ``token_start``/``token_end`` empty
    (schema unchanged): offsets exist for CoNLL export provenance and
    the KG path never reads them — skipping them cuts tokenize time,
    Arrow construction and every downstream shuffle's payload.
    """
    out = []
    sent_id = 0
    for sent in split_sentences(text):
        if with_offsets:
            texts, starts, ends = tokenize_with_offsets(sent)
        else:
            texts = sent.split()
            starts = ends = []
        for off in range(0, max(len(texts), 1), max_sentence_tokens):
            out.append(
                {
                    "sent_id": sent_id,
                    "token_text": texts[off : off + max_sentence_tokens],
                    "token_start": starts[off : off + max_sentence_tokens],
                    "token_end": ends[off : off + max_sentence_tokens],
                }
            )
            sent_id += 1
    return out


def segment_batch(batch: pa.Table, with_offsets: bool = True) -> pa.Table:
    """(url, text, lang, …) → DOCUMENTS_SCHEMA rows (text dropped)."""
    texts = batch.column("text").to_pylist()
    sentences = []
    n_sentences = []
    n_tokens = []
    for text in texts:
        sents = segment_document(text or "", with_offsets=with_offsets)
        sentences.append(sents)
        n_sentences.append(len(sents))
        n_tokens.append(sum(len(s["token_text"]) for s in sents))
    return pa.table(
        {
            "url": batch.column("url"),
            "lang": batch.column("lang"),
            "sentences": pa.array(sentences, type=pa.list_(SENTENCE_TYPE)),
            "n_sentences": pa.array(n_sentences, type=pa.int32()),
            "n_tokens": pa.array(n_tokens, type=pa.int32()),
        }
    )


def segment_stage(ds, batch_size: int = 256, with_offsets: bool = True):
    return ds.map_batches(
        segment_batch,
        fn_kwargs={"with_offsets": with_offsets},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
