"""Property-based tests (hypothesis) for the semantics-critical pure
kernels, plus seeded brute-force equivalence checks for the dedup
operators. The reference has no property testing (SURVEY.md §5); these
pin the invariants its golden tests only sample:

* the BIO automaton (D3) against an independently-written reference
  decoder, plus structural span invariants;
* winnowing's shift tolerance (the guarantee fixed-stride windows
  break);
* popcount / minhash estimator bounds;
* SimHash pigeonhole completeness and Jaccard pair exactness against
  driver-side brute force (seeded, through the real Ray pipeline).
"""

import itertools

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bioner_ray.functions.bio import B, I, O, decode_bio_spans
from bioner_ray.stages.dedup import _popcount64, shingle_set, simhash64
from bioner_ray.stages.textstats import tokenize_ws, winnow_fingerprint

TAGS = st.lists(st.sampled_from([B, I, O]), max_size=40)


def _reference_decoder(tags):
    """Independent re-derivation: spans are maximal runs of non-O where
    every non-first element is I (a B starts a new span); I after O
    starts a span (the reference's I-after-O rule)."""
    spans, i, n = [], 0, len(tags)
    while i < n:
        if tags[i] == O:
            i += 1
            continue
        start = i
        i += 1
        while i < n and tags[i] == I:
            i += 1
        spans.append((start, i - 1))
    return spans


class TestBioAutomatonProperties:
    @given(TAGS)
    def test_matches_independent_decoder(self, tags):
        assert decode_bio_spans(tags) == _reference_decoder(tags)

    @given(TAGS)
    def test_spans_are_sorted_disjoint_and_cover_non_O(self, tags):
        spans = decode_bio_spans(tags)
        covered = set()
        prev_end = -1
        for s, e in spans:
            assert 0 <= s <= e < len(tags)
            assert s > prev_end
            prev_end = e
            covered.update(range(s, e + 1))
        assert covered == {i for i, t in enumerate(tags) if t != O}

    @given(TAGS)
    def test_roundtrip_via_reencode(self, tags):
        # re-encode spans as B I I … and decode again → same spans
        re = [O] * len(tags)
        spans = decode_bio_spans(tags)
        for s, e in spans:
            re[s] = B
            for k in range(s + 1, e + 1):
                re[k] = I
        assert decode_bio_spans(re) == spans


class TestWinnowingProperties:
    @given(st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=20, max_size=60),
           st.integers(min_value=0, max_value=8))
    @settings(max_examples=40)
    def test_shift_tolerance(self, tokens, prefix_len):
        """Prepending tokens must preserve most fingerprints of the
        common suffix: winnowing guarantees any window of `stride`
        consecutive hashes contributes its min, and the suffix's hash
        sequence is unchanged — so the original fingerprint set minus at
        most the first (stride-1) window mins survives."""
        prefix = ["zz"] * prefix_len
        fp0 = set(winnow_fingerprint(tokens, window=4, stride=3))
        fp1 = set(winnow_fingerprint(prefix + tokens, window=4, stride=3))
        # all but a bounded head of the original mins must reappear
        missing = fp0 - fp1
        assert len(missing) <= 3

    @given(st.lists(st.text(alphabet="abc", min_size=1, max_size=4), max_size=30))
    def test_deterministic_and_sorted(self, tokens):
        a = winnow_fingerprint(tokens)
        assert a == winnow_fingerprint(list(tokens))
        assert a == sorted(set(a))


class TestHashKernels:
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=50))
    def test_popcount_matches_python(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        got = _popcount64(arr)
        assert [int(x) for x in got] == [bin(v).count("1") for v in vals]

    @given(st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=30))
    def test_simhash_is_deterministic_and_64bit(self, tokens):
        h = simhash64(tokens)
        assert h == simhash64(list(tokens))
        assert 0 <= h < 2**64

    @given(st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=3, max_size=25))
    def test_shingle_set_is_set_of_kgrams(self, tokens):
        ss = shingle_set(tokens, 3)
        want = {" ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)}
        assert set(ss) == want and ss == sorted(ss)


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _random_corpus(n_docs=60, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        base = rng.choice(WORDS, size=rng.integers(8, 20))
        text = " ".join(base)
        if i % 5 == 0 and i > 0:  # planted near-dups
            prev = rows[i - 1]["text"].split()
            prev[0] = "alpha"
            text = " ".join(prev)
        rows.append({"doc_id": i, "text": text})
    return rows


class TestDedupBruteForceEquivalence:
    def test_simhash_pairs_match_brute_force(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.dedup import simhash_pairs

        rows = _random_corpus()
        got = {
            (r["a"], r["b"]): r["hamming"]
            for r in simhash_pairs(
                rd.from_arrow(pa.Table.from_pylist(rows)), max_hamming=6
            ).take_all()
        }
        hashes = {r["doc_id"]: simhash64(tokenize_ws(r["text"])) for r in rows}
        want = {}
        for a, b in itertools.combinations(sorted(hashes), 2):
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= 6:
                want[(a, b)] = d
        assert got == want

    def test_jaccard_pairs_match_brute_force(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.dedup import jaccard_pairs

        rows = _random_corpus(seed=23)
        got = {
            (r["a"], r["b"]): round(r["jaccard"], 9)
            for r in jaccard_pairs(
                rd.from_arrow(pa.Table.from_pylist(rows)), threshold=0.4
            ).take_all()
        }
        sets = {r["doc_id"]: set(shingle_set(tokenize_ws(r["text"]), 3)) for r in rows}
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            c = len(sa & sb)
            if c:
                j = c / (len(sa) + len(sb) - c)
                if j >= 0.4:
                    want[(a, b)] = round(j, 9)
        assert got == want


class TestSamplingProperties:
    @given(
        st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=200, unique=True),
        st.integers(min_value=0, max_value=1000),
    )
    @settings(max_examples=50, deadline=None)
    def test_hash_permille_matches_pure_formula(self, ids, rate):
        """The vectorized uint64-wraparound hash must equal the exact
        integer formula the SQL oracle computes with HUGEINT."""
        import pyarrow as pa

        from bioner_ray.stages.sampling import hash_permille

        got = hash_permille(pa.array(ids, type=pa.int64()))
        want = [((i * 2654435761) % 4294967296) % 1000 for i in ids]
        assert got.tolist() == want
        # the keep-decision is a pure per-id predicate: partition-free
        assert [(h < rate) for h in got] == [(w < rate) for w in want]

    @given(
        st.lists(
            st.lists(st.sampled_from("ab cd ef gh ij kl".split()), max_size=30),
            min_size=1,
            max_size=40,
        ),
        st.integers(min_value=1, max_value=200),
    )
    @settings(max_examples=25, deadline=None)
    def test_token_shards_is_exclusive_prefix_sum(self, docs, budget):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.sampling import token_shards

        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": [" ".join(d) for d in docs],
            }
        )
        out = (
            token_shards(rd.from_arrow(t), budget=budget, bucket_width=7)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        n = [len(d) for d in docs]
        excl = np.concatenate(([0], np.cumsum(n[:-1]))) if len(n) > 1 else np.array([0])
        assert out["n_tok"].tolist() == n
        assert out["shard"].tolist() == (excl // budget).tolist()


class TestDecontaminationProperties:
    @given(
        st.lists(st.sampled_from("aa bb cc dd ee".split()), min_size=3, max_size=12),
        st.integers(min_value=2, max_value=3),
    )
    @settings(max_examples=25, deadline=None)
    def test_exact_overlap_always_dropped_disjoint_always_kept(self, eval_toks, n):
        """A train doc CONTAINING the eval doc verbatim must be dropped;
        a train doc over a disjoint vocabulary must be kept."""
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.contamination import decontaminate_stage, eval_gram_set

        ev = pa.table({"doc_id": pa.array([0], type=pa.int64()), "text": [" ".join(eval_toks)]})
        train = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": [
                    "zz " + " ".join(eval_toks) + " zz",  # superset → contaminated
                    " ".join(["qq"] * len(eval_toks)),  # disjoint vocab → clean
                ],
            }
        )
        ref = eval_gram_set(rd.from_arrow(ev), n=n)
        kept = sorted(
            r["doc_id"] for r in decontaminate_stage(rd.from_arrow(train), ref, n=n).take_all()
        )
        assert kept == [2]


class TestBucketedJoinProperty:
    """bucketed_inner_join ≡ pyarrow's reference Table.join on random
    inputs — including empty sides, skewed keys and sparse buckets."""

    @given(
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(-100, 100)), max_size=40
        ),
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(-100, 100)), max_size=40
        ),
        st.sampled_from([2, 16, 64]),
    )
    @settings(max_examples=25, deadline=None)
    def test_matches_pyarrow_join(self, left_rows, right_rows, buckets):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.shuffle import bucketed_inner_join

        lschema = pa.schema([("k", pa.int64()), ("a", pa.int64())])
        rschema = pa.schema([("k", pa.int64()), ("b", pa.int64())])
        lt = pa.table(
            {"k": [k for k, _ in left_rows], "a": [v for _, v in left_rows]},
            schema=lschema,
        )
        rt = pa.table(
            {"k": [k for k, _ in right_rows], "b": [v for _, v in right_rows]},
            schema=rschema,
        )
        got = bucketed_inner_join(
            rd.from_arrow(lt).repartition(3),
            rd.from_arrow(rt).repartition(2),
            ["k"],
            lschema,
            rschema,
            num_buckets=buckets,
        ).take_all()
        want = lt.join(rt, keys=["k"], join_type="inner")
        got_set = sorted((r["k"], r["a"], r["b"]) for r in got)
        want_set = sorted(
            zip(
                want.column("k").to_pylist(),
                want.column("a").to_pylist(),
                want.column("b").to_pylist(),
            )
        )
        assert got_set == want_set
