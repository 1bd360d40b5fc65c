"""stages/retrieval.py — BM25 ranked retrieval."""

from __future__ import annotations

import math

import pyarrow as pa


def _ds(texts, parts=3):
    import ray.data as rd

    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    return rd.from_arrow(t).repartition(parts)


def _bm25_ref(texts, terms, k):
    """Independent driver-side reference implementation."""
    toks = [[w for w in t.lower().split() if w] for t in texts]
    n = len(texts)
    avgdl = sum(len(t) for t in toks) / float(n)
    out = []
    for i, tk in enumerate(toks):
        dl = len(tk)
        norm = 1.2 * (0.25 + 0.75 * (dl / avgdl))
        score, matched = 0.0, False
        for term in terms:
            tf = tk.count(term)
            matched |= tf > 0
            df = sum(1 for t2 in toks if term in t2)
            idf = math.log((float(n - df) + 0.5) / (float(df) + 0.5) + 1.0)
            score = score + idf * ((float(tf) * 2.2) / (float(tf) + norm))
        if matched:
            out.append((i, dl, score))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


class TestBm25:
    TEXTS = [
        "apple banana apple",
        "banana cherry",
        "apple apple apple apple",
        "durian elderberry fig",
        "cherry cherry apple banana",
        "",
    ]

    def test_matches_reference_scoring(self, ray_session):
        from bioner_ray.stages.retrieval import bm25_topk

        got = bm25_topk(_ds(self.TEXTS), terms=["apple", "cherry"], k=4).to_pandas()
        want = _bm25_ref(self.TEXTS, ["apple", "cherry"], 4)
        assert list(zip(got["doc_id"], got["dl"], got["score"])) == want

    def test_unmatched_docs_never_rank(self, ray_session):
        from bioner_ray.stages.retrieval import bm25_topk

        got = bm25_topk(_ds(self.TEXTS), terms=["durian"], k=10).to_pandas()
        assert list(got["doc_id"]) == [3]

    def test_partitioning_invariant_bitwise(self, ray_session):
        from bioner_ray.stages.retrieval import bm25_topk

        texts = [f"w{i % 5} filler w{(i * 3) % 5} extra" for i in range(50)]
        outs = []
        for parts in (1, 8):
            df = bm25_topk(_ds(texts, parts=parts), terms=["w0", "w3"], k=7).to_pandas()
            outs.append(list(zip(df["doc_id"], df["score"])))
        assert outs[0] == outs[1]

    def test_rarer_term_scores_higher(self, ray_session):
        from bioner_ray.stages.retrieval import bm25_topk

        # 'rare' appears once; 'common' in every doc — equal tf and dl,
        # so the rare-term doc must outrank the common-term doc
        texts = ["rare pad pad", "common pad pad"] + ["common x y"] * 6
        got = bm25_topk(_ds(texts), terms=["rare", "common"], k=2).to_pandas()
        assert got["doc_id"][0] == 0
