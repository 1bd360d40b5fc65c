"""Deletion-neighborhood fuzzy self-join (FastSS, Bocek et al. 2007):
all distinct-vocabulary word pairs at Levenshtein distance exactly 1 —
the typo/variant-canonicalization primitive entity linking runs before
alias grouping.

Naive fuzzy join is all-pairs edit distance (quadratic in vocabulary).
Deletion blocking is lossless for distance ≤ 1: for any u, v with
lev(u, v) ≤ 1, the variant sets {w} ∪ {w minus one char} intersect
(equal → identity variant; substitution at i → both share the
delete-i string; insert/delete → the shorter word IS a variant of the
longer). So candidates = words sharing a variant key, verified exactly.

Plan (all wide steps key-partitioned, vocabulary-sized, never
corpus-sized):
  1. corpus pass → (word, cnt) vocab           — bucketed aggregate
  2. variant explode: ≤ len+1 rows per word (vectorized: one numpy
     byte-matrix deletion per length class, no per-variant Python)
  3. groupby variant key → candidate pairs (sorted runs + triu, logged
     cap; variant buckets are tiny — a key collides only among words
     within edit distance 2 of each other)
  4. distinct (a, b) → exact verification (lev == 1 via the
     length-aligned mismatch scan, vectorized per length class)

Output columns: a, b, ca, cb (the two words and their corpus counts),
a < b lexicographically. Vocabulary = lowercased SURFACE forms under
the pos%4 case/digit/punct transform shared with
``analytics.alias_groups`` / ``surface_stats`` (the planted-variant
contract that gives the all-lowercase testdata lexicon real
multi-surface structure: ``batch``/``batch7``/``batch.`` are mutual
distance-1 neighbors), filtered to ``[a-z0-9.]+`` (ascii-safe). The
DuckDB twin verifies with its native ``levenshtein`` over the
length-blocked vocabulary self-join.

No reference analog (BioNER's LookupCache is exact-match only,
caching.py); extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_VOCAB_SCHEMA = pa.schema([("word", pa.string()), ("cnt", pa.int64())])
_VAR_SCHEMA = pa.schema([("variant", pa.string()), ("word", pa.string())])
_PAIR_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])
_OUT_SCHEMA = pa.schema(
    [
        ("a", pa.string()),
        ("b", pa.string()),
        ("ca", pa.int64()),
        ("cb", pa.int64()),
    ]
)


def _vocab_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch surface-form counts under the alias_groups pos%4
    transform — fully vectorized (Arrow split/if_else/regex kernels +
    one C-speed group_by), no per-token Python."""
    text = pc.fill_null(batch.column(text_col), "")
    split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
    off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = split.values.slice(off[0], off[-1] - off[0])
    lengths = np.diff(off)
    pos = (
        np.arange(len(vals), dtype=np.int64)
        - np.repeat(off[:-1] - off[0], lengths)
        + 1
    )
    pm = pos % 4
    t = pc.if_else(pa.array(pm == 1), pc.binary_join_element_wise(vals, "7", ""), vals)
    t = pc.if_else(pa.array(pm == 2), pc.binary_join_element_wise(vals, ".", ""), t)
    # pm == 0 upper-cases the surface; lower() folds it back to the
    # base word, so no branch needed here
    word = pc.utf8_lower(t)
    keep = pc.and_(
        pc.not_equal(vals, ""),
        pc.match_substring_regex(word, r"^[a-z0-9.]+$"),
    )
    kept = pa.table({"word": word}).filter(keep)
    g = kept.group_by(["word"]).aggregate([("word", "count")])
    return pa.table(
        {
            "word": g.column("word"),
            "cnt": g.column("word_count").cast(pa.int64()),
        }
    )


def _deletion_variants(words: list[str]) -> tuple[list[str], list[str]]:
    """(variant, word) rows: identity + every single-char deletion.
    Grouped by word length so each class is ONE numpy byte-matrix op
    (ascii-safe: the [a-z]+ universe guarantees 1 byte per char)."""
    out_v: list[str] = []
    out_w: list[str] = []
    by_len: dict[int, list[str]] = {}
    for w in words:
        out_v.append(w)
        out_w.append(w)
        by_len.setdefault(len(w), []).append(w)
    for L, ws in by_len.items():
        if L < 2:
            # deleting the only char yields "" — a universal key that
            # would pair every 1-char word with every other; lev(u,v)
            # for two distinct 1-char words is 1 anyway and they share
            # no other variant, so keep "" but only for this class
            if L == 1:
                out_v.extend([""] * len(ws))
                out_w.extend(ws)
            continue
        m = np.frombuffer("".join(ws).encode("ascii"), dtype=np.uint8).reshape(
            len(ws), L
        )
        for i in range(L):
            dele = np.concatenate([m[:, :i], m[:, i + 1 :]], axis=1)
            out_v.extend(
                np.char.decode(
                    dele.view(f"S{L - 1}").reshape(len(ws)), "ascii"
                ).tolist()
            )
            out_w.extend(ws)
    return out_v, out_w


def _lev_is_one(a: list[str], b: list[str]) -> np.ndarray:
    """Exact lev(a,b) == 1 for candidate pairs, vectorized per
    (len_a, len_b) class with byte-matrix mismatch scans."""
    la = np.array([len(x) for x in a], dtype=np.int64)
    lb = np.array([len(x) for x in b], dtype=np.int64)
    out = np.zeros(len(a), dtype=bool)
    arr_a = np.array(a, dtype=object)
    arr_b = np.array(b, dtype=object)
    for (L1, L2) in {(int(x), int(y)) for x, y in zip(la, lb)}:
        sel = np.flatnonzero((la == L1) & (lb == L2))
        if len(sel) == 0 or abs(L1 - L2) > 1:
            continue
        xs, ys = arr_a[sel], arr_b[sel]
        if L1 == L2:
            if L1 == 0:
                continue
            ma = np.frombuffer("".join(xs).encode("ascii"), dtype=np.uint8).reshape(
                len(xs), L1
            )
            mb = np.frombuffer("".join(ys).encode("ascii"), dtype=np.uint8).reshape(
                len(ys), L1
            )
            out[sel] = (ma != mb).sum(axis=1) == 1
        else:
            if L1 > L2:
                xs, ys = ys, xs
                Ls, Ll = L2, L1
            else:
                Ls, Ll = L1, L2
            # lev == 1 for len-diff-1 iff the short word equals the
            # long word with one char deleted: common prefix + common
            # suffix covers the short word
            ms = (
                np.frombuffer("".join(xs).encode("ascii"), dtype=np.uint8).reshape(
                    len(xs), Ls
                )
                if Ls
                else np.zeros((len(xs), 0), dtype=np.uint8)
            )
            ml = np.frombuffer("".join(ys).encode("ascii"), dtype=np.uint8).reshape(
                len(ys), Ll
            )
            if Ls == 0:
                out[sel] = True  # "" vs 1-char: lev == 1
                continue
            eq_pref = ms == ml[:, :Ls]
            pref = np.where(
                eq_pref.all(axis=1), Ls, eq_pref.argmin(axis=1)
            )
            eq_suf = ms[:, ::-1] == ml[:, :0:-1]
            suf = np.where(eq_suf.all(axis=1), Ls, eq_suf.argmin(axis=1))
            out[sel] = pref + suf >= Ls
    return out


def fuzzy_word_pairs(
    ds,
    text_col: str = "text",
    max_variant_words: int = 1024,
    num_buckets: int = 64,
):
    """Dataset(text) → Dataset(a, b, ca, cb): distinct vocabulary word
    pairs with Levenshtein distance exactly 1, with corpus counts."""
    from bioner_ray.stages.dedup import _run_pair_indices, _sorted_runs
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    vocab = pin_schema(
        bucketed_aggregate(
            ds.map_batches(
                lambda t: _vocab_partial(t, text_col), batch_format="pyarrow"
            ),
            ["word"],
            [("cnt", "sum")],
            num_buckets=num_buckets,
        ),
        _VOCAB_SCHEMA,
    ).materialize()

    def explode(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _VAR_SCHEMA.empty_table()
        vs, ws = _deletion_variants(t.column("word").to_pylist())
        # a word can reach one variant via two deletions ("aab" → "ab"
        # twice); _sorted_runs requires distinct (key, id) rows
        return (
            pa.table(
                {
                    "variant": pa.array(vs, type=pa.string()),
                    "word": pa.array(ws, type=pa.string()),
                }
            )
            .group_by(["variant", "word"])
            .aggregate([])
        )

    variants = vocab.map_batches(explode, batch_format="pyarrow")

    def var_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"_vbucket": pa.array([], type=pa.int32())})
        from bioner_ray.stages.shuffle import hash_strings_u64

        b = (hash_strings_u64(t.column("variant")) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return t.append_column("_vbucket", pa.array(b, type=pa.int32()))

    def emit_pairs(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        if "_vbucket" in group.column_names:
            group = group.drop_columns(["_vbucket"])
        t, bounds = _sorted_runs(group, "variant", "word")
        ii, jj = _run_pair_indices(bounds, max_variant_words, what="deletion-variant")
        if t.num_rows == 0 or len(ii) == 0:
            return _PAIR_SCHEMA.empty_table()
        words = t.column("word").to_numpy(zero_copy_only=False)
        a, b = words[ii], words[jj]
        neq = a != b  # a word meets itself via two different deletions
        return pa.table(
            {
                "a": pa.array(a[neq], type=pa.string()),
                "b": pa.array(b[neq], type=pa.string()),
            }
        )

    cand = pin_schema(
        bucketed_aggregate(
            with_ones(
                variants.map_batches(var_bucket, batch_format="pyarrow")
                .groupby("_vbucket")
                .map_groups(emit_pairs, batch_format="pyarrow"),
            ),
            ["a", "b"],
            [("one", "min")],
            num_buckets=num_buckets,
        ),
        pa.schema([("a", pa.string()), ("b", pa.string()), ("one", pa.int64())]),
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        keep = _lev_is_one(a, b)
        return pa.table(
            {
                "a": pa.array(np.array(a, dtype=object)[keep].tolist(), type=pa.string()),
                "b": pa.array(np.array(b, dtype=object)[keep].tolist(), type=pa.string()),
            }
        )

    pairs = pin_schema(
        cand.map_batches(verify, batch_format="pyarrow"), _PAIR_SCHEMA
    )

    ca = vocab.map_batches(
        lambda t: pa.table({"a": t.column("word"), "ca": t.column("cnt")}),
        batch_format="pyarrow",
    )
    cb = vocab.map_batches(
        lambda t: pa.table({"b": t.column("word"), "cb": t.column("cnt")}),
        batch_format="pyarrow",
    )
    j1 = bucketed_inner_join(
        pairs,
        ca,
        keys=["a"],
        left_schema=_PAIR_SCHEMA,
        right_schema=pa.schema([("a", pa.string()), ("ca", pa.int64())]),
        num_buckets=num_buckets,
    )
    j2 = bucketed_inner_join(
        j1,
        cb,
        keys=["b"],
        left_schema=pa.schema(
            [("a", pa.string()), ("b", pa.string()), ("ca", pa.int64())]
        ),
        right_schema=pa.schema([("b", pa.string()), ("cb", pa.int64())]),
        num_buckets=num_buckets,
    )
    return pin_schema(
        j2.map_batches(
            lambda t: t.select(["a", "b", "ca", "cb"])
            if t.num_columns
            else _OUT_SCHEMA.empty_table(),
            batch_format="pyarrow",
        ),
        _OUT_SCHEMA,
        ensure_block=True,
    )
