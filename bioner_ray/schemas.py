"""Fixed pyarrow schemas at every stage boundary.

The reference fixes its schema by convention (4-column TSV,
conll_dataset.py:80-84); we fix ours as explicit ``pyarrow.Schema``
constants, validated in tests. Nesting keeps sentence/token order
*inside* each document row so position features
(position_encoder.py:10-26) and BIO decoding
(entity_level_precision_recall.py:134-164) never need cross-row order.
"""

from __future__ import annotations

import pyarrow as pa

EMBEDDING_DIM = 32  # concept/test embedding width (fixture F7)

# --- flagship input: Common-Crawl-style pages (BASELINE.json input_hint) ---
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # golden extractor output (byte-identical target)
        ("lang", pa.string()),
    ]
)

# --- after extraction: html dropped immediately (wide-row hygiene) ---
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("truncated_kind", pa.string()),  # none|250|400|plain (metrics column)
    ]
)

# --- segmented documents: one row per document, sentences nested ---
SENTENCE_TYPE = pa.struct(
    [
        ("sent_id", pa.int32()),
        ("token_text", pa.list_(pa.string())),
        ("token_start", pa.list_(pa.int32())),
        ("token_end", pa.list_(pa.int32())),
    ]
)
DOCUMENTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("sentences", pa.list_(SENTENCE_TYPE)),
        ("n_sentences", pa.int32()),
        ("n_tokens", pa.int32()),
    ]
)

# --- tagged documents: + one uint8 tag list per sentence ---
TAGS_TYPE = pa.list_(pa.list_(pa.uint8()))

# --- mentions (the reference Annotation span, entity_level_precision_recall.py:106-123,
#     extended with url + surface) ---
MENTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("start_token", pa.int32()),
        ("end_token", pa.int32()),
        ("surface", pa.string()),
    ]
)

LINKED_MENTIONS_SCHEMA = pa.schema(
    list(MENTIONS_SCHEMA)
    + [
        ("concept_id", pa.string()),  # NIL sentinel when unresolved
        ("link_score", pa.float32()),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("score", pa.float32()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.int64()),  # number of supporting (url, sent) witnesses
        ("score", pa.float32()),  # max witness score
        ("first_url", pa.string()),  # provenance sample (lexicographic min)
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("concept_id", pa.string()),
        ("surface", pa.string()),  # most frequent surface (ties: lexicographic)
        ("count", pa.int64()),
        ("n_urls", pa.int64()),
    ]
)

CONCEPTS_SCHEMA = pa.schema(
    [
        ("concept_id", pa.string()),
        ("surface", pa.string()),
        ("is_canonical", pa.bool_()),
        ("embedding", pa.list_(pa.float32(), EMBEDDING_DIM)),
    ]
)

NIL_CONCEPT = "NIL"


def validate(table: pa.Table, schema: pa.Schema, allow_extra: bool = False) -> None:
    """Assert table columns conform to a stage-boundary schema."""
    for field in schema:
        col = table.schema.field(field.name) if field.name in table.schema.names else None
        if col is None:
            raise ValueError(f"missing column {field.name!r}; have {table.schema.names}")
        if col.type != field.type:
            raise ValueError(f"column {field.name!r}: {col.type} != {field.type}")
    if not allow_extra:
        extra = set(table.schema.names) - {f.name for f in schema}
        if extra:
            raise ValueError(f"unexpected columns {sorted(extra)}")
