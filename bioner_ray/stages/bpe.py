"""Deterministic byte-pair-encoding merge learning (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) — the tokenizer-training step of an LLM data pipeline.

Classic BPE trainers are single-process dict loops over the corpus;
this is the distributed, SQL-replayable form:

* ONE corpus pass builds the word-frequency vocabulary (per-batch
  combiner dicts → ``bucketed_aggregate``) — after that the algorithm
  never touches the corpus again, only the vocab (Sennrich's own
  optimization, here it is also the scale shape: at 100 TB the vocab
  is 10^8 rows, the corpus 10^12);
* each merge round is ONE streaming pass over the vocab: adjacent
  symbol pairs are emitted vectorized (Arrow split → ListArray offsets
  → numpy gather, no per-row Python), weighted by word count, reduced
  by ONE bucketed aggregate, and the winning pair is a combiner-pruned
  global top-1 (per-block top-1 → driver min over block winners);
* the segmentation state lives INSIDE each vocab row as a
  marker-wrapped string (``\\x1f sym \\x1f\\x1f sym … \\x1f``), so
  applying a merge is a single vectorized literal
  ``replace_substring`` — pyarrow, DuckDB ``replace`` and Python
  ``str.replace`` all share left-to-right non-overlapping semantics,
  which IS greedy BPE application (``aaaa`` + (a,a) → ``aa aa``);
* ties break (count desc, lhs asc, rhs asc) — no insertion-order or
  hash-order dependence — so a fixed round count unrolls into a
  DuckDB CTE chain that replays the whole trajectory bit-for-bit
  (``__ray_entry__._bpe_sql``).

Words are lowercased whitespace tokens restricted to ``[a-z0-9]+``
(clean alphabet ⇒ the 0x1f marker can never collide with symbol
text). The vocab dataset is materialized once per round to cut
lineage, exactly like the k-means/PageRank fixed-round loops.

No reference analog (BioNER tokenizes with a fixed vocab,
ngram_encoder.py); extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: segmentation marker — outside the [a-z0-9] symbol alphabet
M = "\x1f"

_WORD_RE = re.compile(r"[a-z0-9]+\Z")

_PAIR_SCHEMA = pa.schema(
    [("lhs", pa.string()), ("rhs", pa.string()), ("pair_count", pa.int64())]
)

_MERGE_SCHEMA = pa.schema(
    [
        ("round", pa.int64()),
        ("lhs", pa.string()),
        ("rhs", pa.string()),
        ("pair_count", pa.int64()),
    ]
)


def _vocab_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch combiner: clean-word → count dict (word_count idiom)."""
    from bioner_ray.stages.textstats import _split_lower

    counts: dict[str, int] = {}
    for toks in _split_lower(batch, text_col):
        for t in toks:
            if _WORD_RE.match(t):
                counts[t] = counts.get(t, 0) + 1
    return pa.table(
        {
            "word": pa.array(list(counts.keys()), type=pa.string()),
            "cnt": pa.array(list(counts.values()), type=pa.int64()),
        }
    )


def _pairs_batch(t: pa.Table) -> pa.Table:
    """Vectorized adjacent-pair emission from the wrapped segmentation
    column: split → ListArray offsets → numpy index arithmetic; the
    downstream ``bucketed_aggregate`` combiner does the first-level
    reduction, so raw (lhs, rhs, cnt) rows per batch are fine."""
    if t.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    syms = pc.split_pattern(pc.utf8_trim(t.column("s"), M), M + M)
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    off = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    npairs = np.maximum(np.diff(off) - 1, 0)
    total = int(npairs.sum())
    if total == 0:
        return _PAIR_SCHEMA.empty_table()
    # left index of each pair: per-row run off[i] .. off[i]+npairs[i]-1
    starts = np.repeat(off[:-1], npairs)
    run_shift = np.repeat(np.cumsum(npairs) - npairs, npairs)
    li = starts + (np.arange(total, dtype=np.int64) - run_shift)
    child = syms.values
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "lhs": child.take(pa.array(li)),
            "rhs": child.take(pa.array(li + 1)),
            "pair_count": pa.array(np.repeat(cnt, npairs).astype(np.int64)),
        }
    )


def _local_top1(t: pa.Table) -> pa.Table:
    if t.num_columns == 0 or t.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    order = pc.sort_indices(
        t,
        sort_keys=[
            ("pair_count", "descending"),
            ("lhs", "ascending"),
            ("rhs", "ascending"),
        ],
    )
    return t.take(order[:1])


def _train(
    ds,
    n_merges: int,
    text_col: str,
    num_buckets: int,
):
    """Shared trainer: returns (merge list, final segmented-vocab
    Dataset). The seq dataset after the last merge IS the BPE-applied
    corpus in vocab-compressed form (symbol counts × word counts ==
    corpus symbol counts), so downstream application never re-reads
    the documents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    vocab = bucketed_aggregate(
        ds.map_batches(
            lambda t: _vocab_partial(t, text_col), batch_format="pyarrow"
        ),
        ["word"],
        [("cnt", "sum")],
        num_buckets=num_buckets,
    )

    def init_seq(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        return pa.table(
            {
                # one C-level join per vocab word, init only (the
                # per-round hot path stays fully vectorized)
                "s": pa.array([M + (M + M).join(w) + M for w in words]),
                "cnt": t.column("cnt"),
            }
        )

    seq_schema = pa.schema([("s", pa.string()), ("cnt", pa.int64())])
    seq = pin_schema(
        vocab.map_batches(init_seq, batch_format="pyarrow"), seq_schema
    ).materialize()

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        pair_counts = pin_schema(
            bucketed_aggregate(
                seq.map_batches(_pairs_batch, batch_format="pyarrow"),
                ["lhs", "rhs"],
                [("pair_count", "sum")],
                num_buckets=num_buckets,
            ),
            _PAIR_SCHEMA,
        )
        tops = (
            pair_counts.map_batches(_local_top1, batch_format="pyarrow")
            .take_all()
        )
        if not tops:
            break
        best = min(tops, key=lambda r: (-r["pair_count"], r["lhs"], r["rhs"]))
        l, r, c = best["lhs"], best["rhs"], int(best["pair_count"])
        merges.append((rnd, l, r, c))
        pat, rep = M + l + M + M + r + M, M + l + r + M

        def apply(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            return pa.table(
                {
                    "s": pc.replace_substring(
                        t.column("s"), pattern=pat, replacement=rep
                    ),
                    "cnt": t.column("cnt"),
                }
            )

        seq = pin_schema(
            seq.map_batches(apply, batch_format="pyarrow"), seq_schema
        ).materialize()

    return merges, seq


def bpe_merges(
    ds,
    n_merges: int = 8,
    text_col: str = "text",
    num_buckets: int = 64,
):
    """Dataset(text) → pa.Table(round, lhs, rhs, pair_count): the
    learned merge list, one row per round (fewer if pairs run dry —
    the SQL twin's empty-LIMIT-1 cross join goes dry identically)."""
    merges, _ = _train(ds, n_merges, text_col, num_buckets)
    if not merges:
        return _MERGE_SCHEMA.empty_table()
    rr, ll, rh, cc = zip(*merges)
    return pa.table(
        {
            "round": pa.array(rr, type=pa.int64()),
            "lhs": pa.array(ll, type=pa.string()),
            "rhs": pa.array(rh, type=pa.string()),
            "pair_count": pa.array(cc, type=pa.int64()),
        }
    )


def bpe_token_counts(
    ds,
    n_merges: int = 8,
    k: int = 20,
    text_col: str = "text",
    num_buckets: int = 64,
):
    """Apply the learned merges corpus-wide and report the top-k
    subword tokens: pa.Table(token, token_count), ordered
    (count desc, token asc). One extra vocab pass after training —
    symbols exploded vectorized, weighted by word count, ONE bucketed
    aggregate, then a combiner-pruned global top-k (per-block top-k →
    driver merge of ≤ k·blocks candidate rows)."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    _, seq = _train(ds, n_merges, text_col, num_buckets)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "token_count": pa.array([], type=pa.int64())}
            )
        syms = pc.split_pattern(pc.utf8_trim(t.column("s"), M), M + M)
        if isinstance(syms, pa.ChunkedArray):
            syms = syms.combine_chunks()
        off = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(off)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "token": syms.values,
                "token_count": pa.array(np.repeat(cnt, n).astype(np.int64)),
            }
        )

    counts_schema = pa.schema([("token", pa.string()), ("token_count", pa.int64())])
    counts = pin_schema(
        bucketed_aggregate(
            seq.map_batches(explode, batch_format="pyarrow"),
            ["token"],
            [("token_count", "sum")],
            num_buckets=num_buckets,
        ),
        counts_schema,
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return counts_schema.empty_table()
        order = pc.sort_indices(
            t, sort_keys=[("token_count", "descending"), ("token", "ascending")]
        )
        return t.take(order[:k])

    cand = counts.map_batches(local_topk, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (-r["token_count"], r["token"]))
    cand = cand[:k]
    return pa.table(
        {
            "token": pa.array([r["token"] for r in cand], type=pa.string()),
            "token_count": pa.array(
                [r["token_count"] for r in cand], type=pa.int64()
            ),
        }
    )


def bpe_fertility_by_source(
    ds,
    n_merges: int = 8,
    text_col: str = "text",
    source_col: str = "source",
    num_buckets: int = 64,
):
    """Tokenizer fertility per source — subwords emitted per word under
    the learned merges, the tokenizer-quality metric that decides
    whether a source is cheap or expensive to train on. Training reuses
    the corpus-global ``_train`` chain; the per-word subword count
    falls out of the FINAL segmented vocab (symbols = marker-split
    pieces, word = markers stripped — no re-tokenization), per-source
    word counts are ONE bucketed aggregate over the same token pass,
    and the two meet in a vocabulary-sized bucketed join. fertility =
    double(Σ n_sub·cnt) / double(Σ cnt), one replayable division.
    Columns: source, n_words, n_subwords, fertility."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema
    from bioner_ray.stages.textstats import _split_lower

    _, seq = _train(ds, n_merges, text_col, num_buckets)

    nsub_schema = pa.schema([("word", pa.string()), ("n_sub", pa.int64())])

    def nsub(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return nsub_schema.empty_table()
        syms = pc.split_pattern(pc.utf8_trim(t.column("s"), M), M + M)
        if isinstance(syms, pa.ChunkedArray):
            syms = syms.combine_chunks()
        off = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "word": pc.replace_substring(t.column("s"), pattern=M, replacement=""),
                "n_sub": pa.array(np.diff(off)),
            }
        )

    per_word = pin_schema(seq.map_batches(nsub, batch_format="pyarrow"), nsub_schema)

    def word_source(t: pa.Table) -> pa.Table:
        toks = _split_lower(t, text_col)
        srcs = t.column(source_col).to_pylist()
        words, sources = [], []
        for row, src in zip(toks, srcs):
            words.extend(row)
            sources.extend([src] * len(row))
        return pa.table(
            {
                "word": pa.array(words, type=pa.string()),
                "source": pa.array(sources, type=pa.string()),
                "cnt": pa.array(np.ones(len(words), dtype=np.int64)),
            }
        )

    ws_schema = pa.schema(
        [("word", pa.string()), ("source", pa.string()), ("cnt", pa.int64())]
    )
    wsrc = pin_schema(
        bucketed_aggregate(
            ds.map_batches(word_source, batch_format="pyarrow"),
            ["word", "source"],
            [("cnt", "sum")],
            num_buckets=num_buckets,
        ),
        ws_schema,
    )
    joined = bucketed_inner_join(
        wsrc, per_word, ["word"], ws_schema, nsub_schema, num_buckets=num_buckets
    )

    def fold(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("source", pa.string()), ("n_words", pa.int64()), ("n_subwords", pa.int64())]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        ns = t.column("n_sub").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": t.column("source"),
                "n_words": pa.array(cnt),
                "n_subwords": pa.array(ns * cnt),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            joined.map_batches(fold, batch_format="pyarrow"),
            ["source"],
            [("n_words", "sum"), ("n_subwords", "sum")],
            num_buckets=num_buckets,
        ),
        pa.schema(
            [("source", pa.string()), ("n_words", pa.int64()), ("n_subwords", pa.int64())]
        ),
        ensure_block=True,
    )

    def ratio(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("source", pa.string()),
                ("n_words", pa.int64()),
                ("n_subwords", pa.int64()),
                ("fertility", pa.float64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        return t.append_column(
            "fertility",
            pc.divide(
                pc.cast(t.column("n_subwords"), pa.float64()),
                pc.cast(t.column("n_words"), pa.float64()),
            ),
        )

    return agg.map_batches(ratio, batch_format="pyarrow")
