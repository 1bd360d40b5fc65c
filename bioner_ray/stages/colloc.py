"""PMI collocation mining: top-k adjacent-token bigrams ranked by
pointwise mutual information — the classic corpus-analysis pass
(Church & Hanks 1990) a data pipeline runs to find multi-word
expressions worth treating as units.

Distributed shape:
  1. ONE corpus pass emits per-batch combiner dicts for BOTH the
     bigram and unigram streams (adjacency over the FILTERED token
     sequence, i.e. after empty-token removal — same `tok` universe as
     word_count); each reduces through its own bucketed aggregate.
  2. The corpus total T re-aggregates the vocab-sized unigram table
     (one tiny constant-key aggregate — never the corpus).
  3. bigrams ⋈ unigram(a) ⋈ unigram(b): vocab-keyed bucketed joins
     (broadcast would cap vocab; the join is the 10⁸-vocab path).
  4. The ``n_ab ≥ min_count`` support filter runs DISTRIBUTED before
     anything is collected; survivors (bounded: the interesting-
     collocation set) collect for the libm-log scoring + final rank.

Exactness (the exact-float-oracle contract): PMI is quantized once to
integer micro-nats ``floor(ln((n_ab·T)/(C(a)·C(b)))·1e6)`` with
``math.log`` = libm = DuckDB ``ln`` and the exact same float
composition (int products exact below 2⁵³ → one division → one log →
one multiply → floor), so ranking and values replay bit-for-bit.
Ordering: (pmi_micro desc, a, b), LIMIT k.

Columns: a, b, n_ab, pmi_micro.

No reference analog (BioNER's n-grams are char-level encoder features,
ngram_encoder.py); extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BG_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("n_ab", pa.int64())]
)
_OUT_SCHEMA = pa.schema(
    [
        ("a", pa.string()),
        ("b", pa.string()),
        ("n_ab", pa.int64()),
        ("pmi_micro", pa.int64()),
    ]
)


def _bigram_partial(batch: pa.Table, text_col: str) -> pa.Table:
    # vectorized within-doc bigram combiner (shared split-offset +
    # value_counts kernel), split back into (a, b) on the reserved
    # separator — the '\x1f' never occurs in whitespace-split tokens
    from bioner_ray.stages.textstats import BIGRAM_SEP, bigram_count_partial

    bg = bigram_count_partial(batch, text_col=text_col)
    if bg.num_rows == 0:
        return _BG_SCHEMA.empty_table()
    parts = pc.split_pattern(bg.column("bg"), BIGRAM_SEP, max_splits=1)
    flat = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    return pa.table(
        {
            "a": pc.list_element(flat, 0),
            "b": pc.list_element(flat, 1),
            "n_ab": bg.column("cnt"),
        }
    )


def _unigram_partial(batch: pa.Table, text_col: str) -> pa.Table:
    from bioner_ray.stages.textstats import token_count_partial

    tc = token_count_partial(batch, text_col=text_col)
    return pa.table({"w": tc.column("word"), "c": tc.column("cnt")})


def collocations(
    ds,
    k: int = 20,
    min_count: int = 10,
    text_col: str = "text",
    num_buckets: int = 64,
):
    """Dataset(text) → pa.Table(a, b, n_ab, pmi_micro): the top-k
    PMI-ranked bigrams with support ≥ min_count."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    uni_schema = pa.schema([("w", pa.string()), ("c", pa.int64())])
    bigrams = pin_schema(
        bucketed_aggregate(
            ds.map_batches(
                lambda t: _bigram_partial(t, text_col), batch_format="pyarrow"
            ),
            ["a", "b"],
            [("n_ab", "sum")],
            num_buckets=num_buckets,
        ),
        _BG_SCHEMA,
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_ab"), min_count)),
        batch_format="pyarrow",
    )
    unigrams = pin_schema(
        bucketed_aggregate(
            ds.map_batches(
                lambda t: _unigram_partial(t, text_col), batch_format="pyarrow"
            ),
            ["w"],
            [("c", "sum")],
            num_buckets=num_buckets,
        ),
        uni_schema,
    ).materialize()

    def to_const(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "c": t.column("c"),
            }
        )

    tot_rows = pin_schema(
        bucketed_aggregate(
            unigrams.map_batches(to_const, batch_format="pyarrow"),
            ["g"],
            [("c", "sum")],
            num_buckets=1,
        ),
        pa.schema([("g", pa.int64()), ("c", pa.int64())]),
    ).take_all()
    if not tot_rows:
        return _OUT_SCHEMA.empty_table()
    total = int(tot_rows[0]["c"])

    ua = unigrams.map_batches(
        lambda t: pa.table({"a": t.column("w"), "ca": t.column("c")}),
        batch_format="pyarrow",
    )
    ub = unigrams.map_batches(
        lambda t: pa.table({"b": t.column("w"), "cb": t.column("c")}),
        batch_format="pyarrow",
    )
    j1 = bucketed_inner_join(
        bigrams,
        ua,
        keys=["a"],
        left_schema=_BG_SCHEMA,
        right_schema=pa.schema([("a", pa.string()), ("ca", pa.int64())]),
        num_buckets=num_buckets,
    )
    j2 = bucketed_inner_join(
        j1,
        ub,
        keys=["b"],
        left_schema=pa.schema(
            [
                ("a", pa.string()),
                ("b", pa.string()),
                ("n_ab", pa.int64()),
                ("ca", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("b", pa.string()), ("cb", pa.int64())]),
        num_buckets=num_buckets,
    )

    # survivors are the ≥min_count collocation set — bounded; collect
    # for the libm-log scoring (math.log per survivor, the
    # doc_logprob/kg_edge_pmi exact-float contract) and the final rank
    rows = j2.take_all()
    scored = []
    for r in rows:
        nab, ca, cb = int(r["n_ab"]), int(r["ca"]), int(r["cb"])
        pmi = math.floor(
            math.log(float(nab * total) / (float(ca) * float(cb))) * 1e6
        )
        scored.append((r["a"], r["b"], nab, pmi))
    scored.sort(key=lambda x: (-x[3], x[0], x[1]))
    scored = scored[:k]
    if not scored:
        return _OUT_SCHEMA.empty_table()
    aa, bb, nn, pp = zip(*scored)
    return pa.table(
        {
            "a": pa.array(aa, type=pa.string()),
            "b": pa.array(bb, type=pa.string()),
            "n_ab": pa.array(nn, type=pa.int64()),
            "pmi_micro": pa.array(pp, type=pa.int64()),
        }
    )
