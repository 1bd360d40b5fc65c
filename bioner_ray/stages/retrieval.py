"""BM25 ranked retrieval over a text column.

The query-side scoring pass of a corpus search/decontamination tool:
rank documents against a fixed bag of query terms by Okapi BM25. The
float pipeline follows the engine's exactness discipline
(doc_logprob / kg_edge_pmi): every COUNT (tf, dl, df, N, Σdl) is an
exact distributed integer; the float composition happens in ONE pinned
operation order on both sides (the idf log goes through libm
``math.log``, which DuckDB's ``ln`` matches bit-for-bit — the PMI-twin
argument; the per-document arithmetic is +,*,/ only, IEEE
exact-rounded and therefore vectorization-independent), so scores —
not just ranks — replay exactly in SQL.

Scale shape: pass 1 streams the corpus once and reduces to a BOUNDED
stat row (N, Σdl, one df per term — the broadcast-small pattern);
pass 2 streams again, scores each batch vectorized against those
constants, prunes to the batch-local top-k, and the global
sort+limit moves at most k rows per block. Two column-pruned reads,
no data-sized shuffle, no driver materialization.

BM25 constants are spelled as LITERALS (1.2, 2.2, 0.25, 0.75) in both
the numpy and SQL expressions — ``k1 + 1`` computed at runtime is a
DIFFERENT double than the literal ``2.2``, so both sides must parse
the same literal rather than derive it.

No reference analog (the reference retrieves nothing; its TF work is
the vocabulary count) — extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _doc_term_stats(batch: pa.Table, text_col: str, id_col: str, terms: list[str]) -> pa.Table:
    """Per-doc (id, dl, tf_<i>...) under the engine tokenizer contract
    (lower + \\s+ split + drop empties) — fully vectorized."""
    lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
    split = pc.split_pattern_regex(pc.fill_null(lowered, ""), r"\s+").combine_chunks()
    off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(off) - 1
    vals = split.values.slice(off[0], off[-1] - off[0])
    lengths = np.diff(off)
    docidx = np.repeat(np.arange(n), lengths)
    nonempty = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
    cols = {
        id_col: batch.column(id_col),
        "dl": pa.array(
            np.bincount(docidx, weights=nonempty, minlength=n).astype(np.int64)
        ),
    }
    for i, t in enumerate(terms):
        m = pc.equal(vals, t).to_numpy(zero_copy_only=False) & nonempty
        cols[f"tf{i}"] = pa.array(
            np.bincount(docidx, weights=m, minlength=n).astype(np.int64)
        )
    return pa.table(cols)


def bm25_topk(
    ds,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dataset(id, text) → Dataset(id, dl, score) of the global top-k
    BM25 matches (score DESC, id ASC ties; only documents containing
    at least one query term rank)."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    nt = len(terms)

    # pass 1: corpus statistics, reduced to one bounded row
    def stat_partial(batch: pa.Table) -> pa.Table:
        t = _doc_term_stats(batch, text_col, id_col, terms)
        row = {
            "g": pa.array([0], type=pa.int64()),
            "n_docs": pa.array([t.num_rows], type=pa.int64()),
            "sum_dl": pa.array([pc.sum(t.column("dl")).as_py() or 0], type=pa.int64()),
        }
        for i in range(nt):
            tf = t.column(f"tf{i}")
            row[f"df{i}"] = pa.array(
                [pc.sum(pc.cast(pc.greater(tf, 0), pa.int64())).as_py() or 0],
                type=pa.int64(),
            )
        return pa.table(row)

    stat_schema = pa.schema(
        [("g", pa.int64()), ("n_docs", pa.int64()), ("sum_dl", pa.int64())]
        + [(f"df{i}", pa.int64()) for i in range(nt)]
    )
    stats = pin_schema(
        bucketed_aggregate(
            ds.map_batches(stat_partial, batch_format="pyarrow"),
            ["g"],
            [("n_docs", "sum"), ("sum_dl", "sum")] + [(f"df{i}", "sum") for i in range(nt)],
            num_buckets=1,
        ),
        stat_schema,
    ).take_all()
    (s,) = stats
    n_docs, sum_dl = int(s["n_docs"]), int(s["sum_dl"])
    avgdl = float(sum_dl) / float(n_docs)
    idf = [
        math.log((float(n_docs - int(s[f"df{i}"])) + 0.5) / (float(s[f"df{i}"]) + 0.5) + 1.0)
        for i in range(nt)
    ]

    # pass 2: vectorized scoring + batch-local top-k prune
    out_schema = pa.schema([(id_col, pa.int64()), ("dl", pa.int64()), ("score", pa.float64())])

    def score(batch: pa.Table) -> pa.Table:
        t = _doc_term_stats(batch, text_col, id_col, terms)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        norm = 1.2 * (0.25 + 0.75 * (dl / avgdl))
        sc = np.zeros(t.num_rows, dtype=np.float64)
        matched = np.zeros(t.num_rows, dtype=bool)
        for i in range(nt):
            tf = t.column(f"tf{i}").to_numpy(zero_copy_only=False)
            matched |= tf > 0
            tff = tf.astype(np.float64)
            sc = sc + idf[i] * ((tff * 2.2) / (tff + norm))
        out = pa.table(
            {
                id_col: pc.cast(t.column(id_col), pa.int64()),
                "dl": t.column("dl"),
                "score": pa.array(sc),
            }
        ).filter(pa.array(matched))
        return out.sort_by(
            [("score", "descending"), (id_col, "ascending")]
        ).slice(0, k)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


def qlm_topk(
    ds,
    terms: list[str],
    k: int = 10,
    mu: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001) — the LM ranker next to BM25: score(d) = Σ_q ln((tf_q·|C| +
    μ·cf_q) / ((dl + μ)·|C|)), every document scored (smoothing gives
    unseen terms collection mass). Scores are INTEGER micro-nats —
    one libm log per DISTINCT (tf, dl) pair per term (numpy's SIMD log
    diverges from libm in the last ulp; the engine's established
    DuckDB-parity discipline), summed exactly, so ordering and the SQL
    twin are bit-stable. Same two-pass shape as ``bm25_topk``: one
    bounded stats row (collection frequencies + token mass), then
    vectorized scoring with batch-local top-k prune.
    Columns: id_col, dl, score_micro."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    nt = len(terms)

    def stat_partial(batch: pa.Table) -> pa.Table:
        t = _doc_term_stats(batch, text_col, id_col, terms)
        row = {
            "g": pa.array([0], type=pa.int64()),
            "c_total": pa.array([pc.sum(t.column("dl")).as_py() or 0], type=pa.int64()),
        }
        for i in range(nt):
            row[f"cf{i}"] = pa.array(
                [pc.sum(t.column(f"tf{i}")).as_py() or 0], type=pa.int64()
            )
        return pa.table(row)

    stat_schema = pa.schema(
        [("g", pa.int64()), ("c_total", pa.int64())]
        + [(f"cf{i}", pa.int64()) for i in range(nt)]
    )
    (s,) = pin_schema(
        bucketed_aggregate(
            ds.map_batches(stat_partial, batch_format="pyarrow"),
            ["g"],
            [("c_total", "sum")] + [(f"cf{i}", "sum") for i in range(nt)],
            num_buckets=1,
        ),
        stat_schema,
    ).take_all()
    c_total = int(s["c_total"])
    cf = [int(s[f"cf{i}"]) for i in range(nt)]

    out_schema = pa.schema(
        [(id_col, pa.int64()), ("dl", pa.int64()), ("score_micro", pa.int64())]
    )

    def score(batch: pa.Table) -> pa.Table:
        t = _doc_term_stats(batch, text_col, id_col, terms)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
        total = np.zeros(t.num_rows, dtype=np.int64)
        memo: dict = {}
        for i in range(nt):
            tf = t.column(f"tf{i}").to_numpy(zero_copy_only=False).astype(np.int64)
            num = tf * c_total + mu * cf[i]
            den = (dl + mu) * c_total
            # one libm log per DISTINCT (num, den) pair — tf and dl take
            # few distinct values per batch, so the memo is the dedup
            row_micro = np.empty(len(num), dtype=np.int64)
            for idx in range(len(num)):
                pair = (int(num[idx]), int(den[idx]))
                v = memo.get(pair)
                if v is None:
                    v = math.floor(math.log(pair[0] / pair[1]) * 1000000.0)
                    memo[pair] = v
                row_micro[idx] = v
            total = total + row_micro
        out = pa.table(
            {
                id_col: pc.cast(t.column(id_col), pa.int64()),
                "dl": pa.array(dl),
                "score_micro": pa.array(total),
            }
        )
        return out.sort_by(
            [("score_micro", "descending"), (id_col, "ascending")]
        ).slice(0, k)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score_micro", id_col], descending=[True, False])
        .limit(k)
    )
