"""PII scrubbing: vectorized regex redaction over a text column.

The standard pre-training hygiene pass a webtext pipeline runs before
anything touches the corpus: find/replace emails, phone numbers and IP
addresses with typed placeholder tokens, and report per-document
redaction counts for the corpus audit trail.

Engine shape: one stateless ``map_batches`` over Arrow batches; every
kernel is a pyarrow.compute call (``count_substring_regex`` /
``replace_substring_regex``) — Arrow's regex engine is RE2, the same
engine DuckDB binds, so the DuckDB twin replays counts and replacements
exactly (no Python-``re`` backtracking-semantics drift). Patterns apply
SEQUENTIALLY: each type's count is taken on the text as left by the
previous replacement, exactly mirrored by the twin's chained CTEs.
Purely streaming, no shuffle, no state — at 100 TB this is a flat scan.

No reference analog (the reference corpus is PubMed abstracts, already
de-identified); extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (name, RE2 pattern, replacement token), applied in order. Patterns
#: stick to RE2-portable constructs (\b, \d, bounded repeats) so the
#: DuckDB twin can inline them verbatim.
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_table(
    t: pa.Table,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
    patterns: list[tuple[str, str, str]] | None = None,
) -> pa.Table:
    """Scrub one Arrow table: returns ``keep_cols`` + ``n_<name>``
    match counts (int64, counted on the sequentially-scrubbed text) +
    ``clean_len`` + ``clean_text``."""
    pats = DEFAULT_PII_PATTERNS if patterns is None else patterns
    out_schema = pii_schema(t.schema, text_col, keep_cols, pats)
    s = pc.cast(t.column(text_col), pa.string())
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        c: t.column(c) for c in keep_cols
    }
    for name, pat, repl in pats:
        cols[f"n_{name}"] = pc.cast(pc.count_substring_regex(s, pat), pa.int64())
        s = pc.replace_substring_regex(s, pat, repl)
    cols["clean_len"] = pc.cast(pc.utf8_length(s), pa.int64())
    cols["clean_text"] = s
    return pa.table(cols).cast(out_schema)


def pii_schema(
    in_schema: pa.Schema,
    text_col: str,
    keep_cols: tuple[str, ...],
    patterns: list[tuple[str, str, str]],
) -> pa.Schema:
    fields = [(c, in_schema.field(c).type) for c in keep_cols]
    fields += [(f"n_{name}", pa.int64()) for name, _, _ in patterns]
    fields += [("clean_len", pa.int64()), ("clean_text", pa.string())]
    return pa.schema(fields)


def pii_scrub_stage(
    ds,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
    patterns: list[tuple[str, str, str]] | None = None,
):
    """Dataset → Dataset: per-document redaction counts + clean text."""

    def fn(t: pa.Table) -> pa.Table:
        return scrub_table(t, text_col=text_col, keep_cols=keep_cols, patterns=patterns)

    return ds.map_batches(fn, batch_format="pyarrow")
