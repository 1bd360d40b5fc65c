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
    from bioner_ray.stages.nested import doc_boundaries, flat_struct_fields, flat_tags

    urls, sent_ids, starts, ends, surfaces = [], [], [], [], []
    url_col = batch.column("url").to_pylist()
    sents = batch.column("sentences")
    bounds = doc_boundaries(sents)
    # only token_text + sent_id leave Arrow; offsets stay buffered
    tok_ll, sid_ll = flat_struct_fields(sents, ["token_text", "sent_id"])
    tags_ll = flat_tags(batch)
    for d, url in enumerate(url_col):
        for si in range(bounds[d], bounds[d + 1]):
            toks = tok_ll[si]
            for start, end in decode_bio_spans(tags_ll[si]):
                urls.append(url)
                sent_ids.append(sid_ll[si])
                starts.append(start)
                ends.append(end)
                surfaces.append(" ".join(toks[start : end + 1]))
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
