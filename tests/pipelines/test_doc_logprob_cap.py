"""doc_logprob capped-vocab (web-scale) mode vs a Python brute force:
top-K + OOV-bucket scoring must replay exactly, and n_tokens must be
identical to full-vocab mode."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd


def test_doc_logprob_capped_matches_bruteforce():
    from bioner_ray.pipelines.analytics import doc_logprob

    sf = "/root/testdata/sf0.001"
    K = 5
    got = doc_logprob(sf, max_vocab=K).to_pandas().set_index("doc_id")
    full = doc_logprob(sf).to_pandas().set_index("doc_id")
    assert (got["n_tokens"].sort_index() == full["n_tokens"].sort_index()).all()

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    cnt: Counter = Counter()
    toks_by_doc = {}
    for d, t in zip(docs.doc_id, docs.text):
        toks = [w for w in re.split(r"\s+", (t or "").lower()) if w]
        toks_by_doc[d] = toks
        cnt.update(toks)
    n_total = float(sum(cnt.values()))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    denom = n_total + len(top) + 1.0
    lp = {w: math.floor(math.log((c + 1.0) / denom) * 1e6) for w, c in top}
    kept_total = float(sum(c for _, c in top))
    oov = math.floor(math.log((n_total - kept_total + 1.0) / denom) * 1e6)
    checked = 0
    for d, toks in toks_by_doc.items():
        if not toks:
            continue
        want = sum(lp.get(w, oov) for w in toks)
        assert got.loc[d, "logprob_micro"] == want, d
        checked += 1
    assert checked == len(got)
    # OOV fallback must actually fire with K=5 on this corpus
    assert any(w not in lp for toks in toks_by_doc.values() for w in toks)


def test_bigram_logprob_excludes_cross_doc_pairs_and_short_docs(tmp_path):
    """Crafted corpus: two docs whose boundary would create a spurious
    bigram if the stream were not doc-segmented; a 1-token doc and an
    empty doc emit no row."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioner_ray.pipelines.analytics import doc_bigram_logprob

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": ["a b", "b a", "solo", ""],
            }
        ),
        sf / "documents.parquet",
    )
    got = (
        doc_bigram_logprob(str(sf), max_bigrams=None, max_vocab=None)
        .to_pandas()
        .set_index("doc_id")
    )
    assert sorted(got.index) == [1, 2]  # no row for "solo" or ""
    # uni: a=2, b=2, solo=1 → V=3; bigrams: (a,b)=1, (b,a)=1
    lp_ab = math.floor(math.log((1 + 1.0) / (2.0 + 3.0)) * 1e6)
    assert got.loc[1, "n_bigrams"] == 1 and got.loc[1, "logprob_micro"] == lp_ab
    assert got.loc[2, "logprob_micro"] == lp_ab  # symmetric counts
    # capped DEFAULT on the same corpus: nothing is pruned (caps >>
    # table sizes) but the model carries the OOV class → V = kept + 1
    got_c = doc_bigram_logprob(str(sf)).to_pandas().set_index("doc_id")
    lp_ab_c = math.floor(math.log((1 + 1.0) / (2.0 + 4.0)) * 1e6)
    assert got_c.loc[1, "logprob_micro"] == lp_ab_c
    assert got_c.loc[2, "logprob_micro"] == lp_ab_c


def test_bigram_and_kn_prune_backoff_hand_computed(tmp_path):
    """Tiny caps force the prune/backoff branches: a bigram OUTSIDE the
    kept top-K must score the documented backoff on both LMs, and a w1
    outside the kept unigram set must use the OOV context bucket."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioner_ray.pipelines.analytics import doc_bigram_logprob, doc_kn_logprob

    sf = tmp_path / "sf"
    sf.mkdir()
    # bigram counts: (a,b)=3  (b,a)=2  (b,c)=1 → top-2 keeps ab, ba
    # unigram counts: a=4? -> text: "a b a b a b" (a=3,b=3) + "b a" (a=4,b=4) + "b c" (b=5,c=1)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": ["a b a b a b", "b a", "b c"],
            }
        ),
        sf / "documents.parquet",
    )
    m = lambda x: math.floor(math.log(x) * 1e6)  # noqa: E731
    # corpus stats: uni a=4, b=5, c=1; bigrams ab=3, ba=3 (2 in doc1 +
    # 1 in doc2), bc=1 → top-2 keeps ab, ba (tie broken by key), bc
    # pruned
    # --- add-one LM, max_bigrams=2, max_vocab=1 ---
    # kept uni top-1 = b(5) → V = 2; OOV context mass = 10 - 5 = 5
    got = (
        doc_bigram_logprob(str(sf), max_bigrams=2, max_vocab=1)
        .to_pandas()
        .set_index("doc_id")
    )
    lp_ab = m((3 + 1.0) / (5.0 + 2.0))  # kept bigram, w1=a OOV → c1'=5
    lp_ba = m((3 + 1.0) / (5.0 + 2.0))  # kept bigram, w1=b kept → c1'=5
    lp_bc = m(1.0 / (5.0 + 2.0))  # PRUNED bigram → add-one miss on w1=b
    assert got.loc[1, "logprob_micro"] == 3 * lp_ab + 2 * lp_ba
    assert got.loc[2, "logprob_micro"] == lp_ba
    assert got.loc[3, "logprob_micro"] == lp_bc
    # --- KN LM, max_bigrams=2 ---
    # kept: ab=3, ba=3 → T=2; c1(a)=3,nf(a)=1 (from ab); c1(b)=3,
    # nf(b)=1 (from ba); nb(a)=1, nb(b)=1
    def p(c12, c1, nf, nb):
        return (max(c12 - 0.75, 0.0) + 0.75 * nf * (nb / 2.0)) / c1

    kn = doc_kn_logprob(str(sf), max_bigrams=2).to_pandas().set_index("doc_id")
    kn_ab, kn_ba = m(p(3, 3.0, 1.0, 1.0)), m(p(3, 3.0, 1.0, 1.0))
    # pruned (b,c): w1=b kept side → floor(ln(0.75·nf(b)/c1(b))·1e6);
    # w2=c absent from kept continuations → floor(ln(1/T)·1e6)
    kn_bc = m(0.75 * 1.0 / 3.0) + m(1.0 / 2.0)
    assert kn.loc[1, "kn_logprob_micro"] == 3 * kn_ab + 2 * kn_ba
    assert kn.loc[2, "kn_logprob_micro"] == kn_ba
    assert kn.loc[3, "kn_logprob_micro"] == kn_bc


def test_kn_logprob_hand_computed(tmp_path):
    """Crafted corpus with a hand-derived interpolated-KN score:
    bigram types, continuation counts and the d=0.75 discount all
    exercised; 1-token and empty docs emit no row."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioner_ray.pipelines.analytics import doc_kn_logprob

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": ["a b a b", "a c", "solo", ""],
            }
        ),
        sf / "documents.parquet",
    )
    got = doc_kn_logprob(str(sf)).to_pandas().set_index("doc_id")
    assert sorted(got.index) == [1, 2]
    # bigrams: (a,b)=2, (b,a)=1, (a,c)=1 → T=3 types
    # c1(a)=3, nf(a)=2; c1(b)=1, nf(b)=1
    # nb(b)=1, nb(a)=1, nb(c)=1
    def p(c12, c1, nf, nb):
        return (max(c12 - 0.75, 0.0) + 0.75 * nf * (nb / 3.0)) / c1

    m = lambda x: math.floor(math.log(x) * 1e6)  # noqa: E731
    ab = m(p(2, 3.0, 2.0, 1.0))
    ba = m(p(1, 1.0, 1.0, 1.0))
    ac = m(p(1, 3.0, 2.0, 1.0))
    assert got.loc[1, "n_bigrams"] == 3
    assert got.loc[1, "kn_logprob_micro"] == ab + ba + ab
    assert got.loc[2, "n_bigrams"] == 1
    assert got.loc[2, "kn_logprob_micro"] == ac


def test_lesk_hand_crafted(tmp_path):
    """Crafted corpus: context overlap picks each sense; a zero-overlap
    occurrence falls to the lexicographically first concept; window
    does not cross document boundaries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioner_ray.pipelines.analytics import lesk_disambiguation

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                # doc1: 'sort' with 'order key' context -> sort/order
                "text": [
                    "the order key sort wins here",
                    # doc2: 'sort' near 'merge hash' -> sort/merge
                    "big merge hash sort pipeline",
                    # doc3: zero overlap -> tie -> sort/merge (lexicographic)
                    "a b c sort d e f",
                    # doc4: 'merge' is the LAST token of this doc; the next
                    # doc's tokens must not leak into its window
                    "x y z sort q w merge",
                ],
            }
        ),
        sf / "documents.parquet",
    )
    got = (
        lesk_disambiguation(str(sf))
        .to_pandas()
        .set_index(["surface", "concept"])["n_wins"]
        .to_dict()
    )
    # doc4: window of its 'sort' (rank 3) spans ranks 0..6 minus itself ->
    # includes 'merge' (rank 6)? no: window=3 -> ranks 0..2,4..6 -> merge IS
    # at rank 6 -> sort/merge
    assert got == {
        ("sort", "sort/order"): 1,
        ("sort", "sort/merge"): 3,
    }


def test_kn_logprob_degenerate_corpus_returns_typed_empty(tmp_path):
    # ADVICE r3: every doc < 2 tokens → zero bigrams; the KN model
    # cannot exist and the query must return a TYPED empty dataset
    # (the twin's GROUP BY over zero bigram rows), not KeyError/ZeroDiv
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioner_ray.pipelines.analytics import doc_kn_logprob

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(["one", "word", ""], type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    ds = doc_kn_logprob(str(tmp_path))
    # schema asserted on the Dataset: Ray's to_pandas() drops column
    # names when every block is empty (check_oracles compensates)
    assert ds.schema().names == ["doc_id", "n_bigrams", "kn_logprob_micro"]
    assert ds.count() == 0


def test_bigram_scorer_foreign_model_raises_clear_contract_error(tmp_path):
    # ADVICE r3: a scored bigram absent from the broadcast model with
    # an empty fallback must fail with the contract message, not an
    # opaque NaN→int64 cast crash inside the task
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray

    from bioner_ray.pipelines.analytics import _bigram_micro_score_ds

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "text": pa.array(["alpha beta gamma"], type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    ds = _bigram_micro_score_ds(
        str(tmp_path), {"alpha\x1fbeta": -5}, {}, "logprob_micro"
    )
    with pytest.raises(
        (ValueError, ray.exceptions.RayTaskError), match="missing from the broadcast LM"
    ):
        ds.to_pandas()


def test_capped_lms_on_empty_corpus(tmp_path):
    """Empty/whitespace-only corpus: the capped builds must survive
    Ray's drop-column-names-on-empty quirk and emit zero rows with the
    pinned schemas."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioner_ray.pipelines.analytics import (
        doc_bigram_logprob,
        doc_kn_logprob,
        doc_logprob,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": ["", "   \t "],
            }
        ),
        sf / "documents.parquet",
    )
    lp = doc_logprob(str(sf))
    assert lp.count() == 0
    bg = doc_bigram_logprob(str(sf))
    assert bg.count() == 0
    kn = doc_kn_logprob(str(sf))
    assert kn.count() == 0
    assert kn.schema().names == ["doc_id", "n_bigrams", "kn_logprob_micro"]


def test_bigram_heldout_scores_only_out_of_sample_docs():
    """Held-out mode: train on even doc_ids, score odd ones — every
    output doc is odd, misses fall to the documented backoff, and
    uncapped+heldout is rejected loudly."""
    import pytest

    from bioner_ray.pipelines.analytics import doc_bigram_logprob

    sf = "/root/testdata/sf0.001"
    got = (
        doc_bigram_logprob(sf, max_bigrams=4096, max_vocab=512, train_parity=0)
        .to_pandas()
    )
    assert len(got) > 0
    assert (got["doc_id"] % 2 == 1).all()
    with pytest.raises(ValueError, match="train_parity requires"):
        doc_bigram_logprob(sf, max_bigrams=None, max_vocab=None, train_parity=0)
