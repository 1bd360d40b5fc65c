"""BIO decode → mention rows (reference D3 as a dataflow stage).

Applies the exact span automaton (functions/bio.decode_bio_spans, the
port of entity_level_precision_recall.py:134-164 including I-after-O)
per sentence inside each document row, then EXPLODES to one row per
mention — the engine's ``Annotation`` record
(entity_level_precision_recall.py:106-123) extended with url + surface.
Stateless ``map_batches``; no cross-row order needed because sentences
are nested in the row.
"""

from __future__ import annotations

import pyarrow as pa

from bioner_ray.functions.bio import decode_bio_spans
from bioner_ray.schemas import MENTIONS_SCHEMA


def mentions_batch(batch: pa.Table) -> pa.Table:
    urls, sent_ids, starts, ends, surfaces = [], [], [], [], []
    url_col = batch.column("url").to_pylist()
    sents_col = batch.column("sentences").to_pylist()
    tags_col = batch.column("tags").to_pylist()
    for url, sentences, doc_tags in zip(url_col, sents_col, tags_col):
        for sent, tags in zip(sentences, doc_tags):
            for start, end in decode_bio_spans(tags):
                urls.append(url)
                sent_ids.append(sent["sent_id"])
                starts.append(start)
                ends.append(end)
                surfaces.append(" ".join(sent["token_text"][start : end + 1]))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "sent_id": pa.array(sent_ids, type=pa.int32()),
            "start_token": pa.array(starts, type=pa.int32()),
            "end_token": pa.array(ends, type=pa.int32()),
            "surface": pa.array(surfaces, type=pa.string()),
        },
        schema=MENTIONS_SCHEMA,
    )


def mentions_stage(tagged_ds, batch_size: int = 256):
    return tagged_ds.map_batches(mentions_batch, batch_format="pyarrow", batch_size=batch_size)
