"""Duplicated-span statistics: the per-document "how much of this text
appears elsewhere in the corpus" signal (the filtering score behind
substring-level dedup à la Lee et al., *Deduplicating Training Data
Makes Language Models Better*, bounded to fixed w-token windows —
exact, SQL-replayable, no suffix array needed).

Plan shape (every step is a bounded exchange, nothing touches the
driver):

1. per-doc DISTINCT w-token windows, emitted as exact strings — one
   stateless ``map_batches`` (a doc is one row, so per-doc dedup is
   local);
2. window→doc-count via ``bucketed_aggregate`` (span strings hash into
   coarse buckets; a boilerplate span shared by millions of docs is
   one combined row per block before the shuffle);
3. the spans occurring in ≥2 docs (the duplicated set, bounded by
   shared boilerplate, far smaller than the span universe) LEFT-SEMI
   join back against the per-doc span pairs — only matching pairs
   survive the exchange;
4. per-doc aggregate of hits + a left-outer join onto the per-doc
   window totals (computed locally in step 1).

Token contract matches textstats: whitespace tokens of lower(text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones
from bioner_ray.stages.textstats import _split_lower


def dup_span_stats(
    ds,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-doc duplicated-window stats over DISTINCT w-token windows.

    Output columns (docs with ≥1 window only): id_col, ``n_windows``
    (distinct windows), ``n_dup`` (of them, how many occur in ≥2
    docs), ``dup_frac`` (single exact-int division). A document made
    of corpus boilerplate scores dup_frac → 1.0.
    """
    def pairs_batch(batch: pa.Table) -> pa.Table:
        toks = _split_lower(batch, text_col)
        ids = batch.column(id_col).to_pylist()
        out_ids: list[int] = []
        spans: list[str] = []
        for i, t in zip(ids, toks):
            m = len(t) - w + 1
            if m <= 0:
                continue
            uniq = {" ".join(t[j : j + w]) for j in range(m)}
            out_ids.extend([i] * len(uniq))
            spans.extend(uniq)
        return pa.table(
            {
                id_col: pa.array(out_ids, type=pa.int64()),
                "span": pa.array(spans, type=pa.string()),
            }
        )

    # the pair stream is consumed by the count and by the semi-join —
    # materialize once (object-store; spills at scale) instead of
    # re-tokenizing the corpus per consumer
    pairs = ds.map_batches(pairs_batch, batch_format="pyarrow").materialize()

    def totals_batch(batch: pa.Table) -> pa.Table:
        t = batch.group_by([id_col]).aggregate([("span", "count")])
        t = t.select([id_col, "span_count"])
        return t.rename_columns([id_col, "n_windows"])

    # per-doc totals: docs never split across rows, so one local
    # group_by per block is already exact
    totals = pairs.map_batches(totals_batch, batch_format="pyarrow")

    counts = bucketed_aggregate(with_ones(pairs.select_columns(["span"])), ["span"], [("one", "sum")])

    def dup_filter(t: pa.Table) -> pa.Table:
        # always emit the typed schema: an all-unique corpus otherwise
        # yields schema-less empty blocks the join cannot key on
        if t.num_rows == 0 or "span" not in t.schema.names:
            return pa.table({"span": pa.array([], type=pa.string())})
        return t.filter(pc.greater(t["one"], 1)).select(["span"])

    # bounded by shared boilerplate — materialize so the emptiness
    # check below doesn't re-run the span count, and short-circuit the
    # all-unique corpus (Ray's hash join cannot key an empty side)
    dup_spans = counts.map_batches(dup_filter, batch_format="pyarrow").materialize()
    if dup_spans.count() == 0:
        def finish_zero(t: pa.Table) -> pa.Table:
            n = t.column("n_windows").to_numpy(zero_copy_only=False).astype(np.int64)
            z = np.zeros(len(n), dtype=np.int64)
            return pa.table(
                {
                    id_col: t.column(id_col),
                    "n_windows": pa.array(n),
                    "n_dup": pa.array(z),
                    "dup_frac": pa.array(z.astype(np.float64)),
                }
            )

        return totals.map_batches(finish_zero, batch_format="pyarrow")

    from bioner_ray.stages.shuffle import bucketed_inner_join

    pair_schema = pa.schema([(id_col, pa.int64()), ("span", pa.string())])
    span_schema = pa.schema([("span", pa.string())])
    hits = bucketed_inner_join(
        pairs, dup_spans, ["span"], pair_schema, span_schema, join_type="left semi"
    )
    def per_doc_cast(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.schema.names:  # no dup spans anywhere
            return pa.table(
                {id_col: pa.array([], type=pa.int64()), "n_dup": pa.array([], type=pa.int64())}
            )
        return t.select([id_col, "one"]).rename_columns([id_col, "n_dup"])

    dup_per_doc = bucketed_aggregate(with_ones(hits), [id_col], [("one", "sum")]).map_batches(
        per_doc_cast, batch_format="pyarrow"
    )

    joined = bucketed_inner_join(
        totals,
        dup_per_doc,
        [id_col],
        pa.schema([(id_col, pa.int64()), ("n_windows", pa.int64())]),
        pa.schema([(id_col, pa.int64()), ("n_dup", pa.int64())]),
        join_type="left outer",
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_windows").to_numpy(zero_copy_only=False).astype(np.int64)
        d = pc.coalesce(t.column("n_dup"), pa.scalar(0, type=pa.int64())).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_windows": pa.array(n),
                "n_dup": pa.array(d),
                "dup_frac": pa.array(d / n),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
