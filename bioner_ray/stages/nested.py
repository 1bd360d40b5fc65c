"""Zero-waste child-array extraction for nested document rows.

The engine's document rows nest sentences as ``list<struct<sent_id,
token_text, token_start, token_end, …>>``. The hot stages (scorer,
mention explode, triple assembly) only ever need ONE OR TWO child
fields — converting the whole struct to Python via
``column.to_pylist()`` also materializes the offset columns nobody
reads, which profiling shows is the single largest cost of the KG path
(the VERDICT r01 "extract/segment/score ~80% of streaming wall" item).

These helpers pull exactly the requested child arrays out of the Arrow
buffers (``pyarrow.compute.list_flatten`` / ``struct_field`` — C
kernels, no Python per row) and hand back flat per-sentence Python
lists plus the document boundaries needed to regroup them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def doc_boundaries(sentences_col) -> np.ndarray:
    """(n_docs + 1,) int64 prefix boundaries of the per-document
    sentence counts — slice ``flat`` per doc as
    ``flat[b[i]:b[i+1]]``. Robust to chunked and sliced arrays (uses
    ``list_value_length``, never raw offset buffers)."""
    lengths = pc.list_value_length(sentences_col).to_numpy(zero_copy_only=False)
    out = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out[1:])
    return out


def flat_struct_fields(sentences_col, fields: list[str]) -> list[list]:
    """Flatten the list<struct> column and convert ONLY the named child
    fields to Python — one flat entry per sentence, in document order."""
    flat = pc.list_flatten(sentences_col)
    return [pc.struct_field(flat, f).to_pylist() for f in fields]


def doc_token_lists(batch: pa.Table, col: str = "sentences") -> tuple[list[list[list[str]]], np.ndarray]:
    """Per-document token lists (docs → sentences → tokens) extracted
    from only the ``token_text`` child array, plus the sentence
    boundaries used for any further per-sentence regrouping."""
    sents = batch.column(col)
    bounds = doc_boundaries(sents)
    (tok_ll,) = flat_struct_fields(sents, ["token_text"])
    docs = [tok_ll[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]
    return docs, bounds


def sentence_token_counts(batch: pa.Table, col: str = "sentences") -> tuple[np.ndarray, list[np.ndarray]]:
    """(per-doc sentence counts, per-doc arrays of sentence token
    lengths) — everything the position encoder (M4) needs, without
    touching the token strings: only the list offsets are read."""
    sents = batch.column(col)
    bounds = doc_boundaries(sents)
    flat = pc.list_flatten(sents)
    tok_lens = pc.list_value_length(pc.struct_field(flat, "token_text")).to_numpy(
        zero_copy_only=False
    )
    n_sents = np.diff(bounds)
    lengths = [tok_lens[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]
    return n_sents, lengths


def flat_tags(batch: pa.Table, col: str = "tags") -> list[list[int]]:
    """Per-sentence tag lists from the ``list<list<uint8>>`` tags
    column, flat in document order (aligned with
    ``flat_struct_fields``'s sentence order)."""
    return pc.list_flatten(batch.column(col)).to_pylist()


def add_sentence_field(batch: pa.Table, field_name: str, values_col: str = "tags") -> pa.Table:
    """Move a top-level ``list<list<T>>`` column (one inner list per
    sentence) INTO the nested sentence structs as a new field — pure
    Arrow surgery (rebuild the StructArray with one extra child and
    re-wrap with the original offsets), no Python per row. Replaces the
    to_pylist-and-rebuild pattern for the two-annotator eval shape."""
    sents = batch.column("sentences")
    if isinstance(sents, pa.ChunkedArray):
        sents = sents.combine_chunks()
    flat = pc.list_flatten(sents)  # StructArray of sentences
    vals = pc.list_flatten(batch.column(values_col))  # one list per sentence
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    names = [f.name for f in flat.type] + [field_name]
    children = [flat.field(i) for i in range(flat.type.num_fields)] + [vals]
    new_flat = pa.StructArray.from_arrays(children, names=names)
    bounds = doc_boundaries(sents)
    new_sents = pa.ListArray.from_arrays(
        pa.array(bounds.astype("int32")), new_flat
    )
    idx = batch.schema.get_field_index("sentences")
    return batch.set_column(idx, "sentences", new_sents).drop_columns([values_col])
