"""Training-data corpus operators wired to the driver testdata tables.

Query-shaped wrappers (each takes ``sf_dir``) around the dedup /
textstats / similarity stages, so ``__ray_entry__.queries()`` can
expose them next to their DuckDB oracles. Thresholds are pinned
against the testdata's planted structure: documents carry ~5% near
duplicates (word-3-shingle Jaccard ≥ 0.9, next cluster ≤ 0.35), and
the embeddings table's cosine spectrum has a clean gap around 0.45.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _documents(sf_dir: str):
    return _read(sf_dir, "documents", columns=["doc_id", "text"])


def dedup_exact(sf_dir: str):
    """Columns: key (md5), keep_id, n_copies."""
    from bioner_ray.stages.dedup import exact_dedup

    return exact_dedup(_documents(sf_dir))


def dedup_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """Exact 3-shingle Jaccard near-dup pairs. Columns: a, b, n_common,
    jaccard."""
    from bioner_ray.stages.dedup import jaccard_pairs

    return jaccard_pairs(_documents(sf_dir), k=3, threshold=threshold)


def dedup_minhash_pairs(sf_dir: str):
    """MinHash+LSH candidates (rows-only check — banding is not
    SQL-replayable). Columns: a, b, n_bands, est_jaccard."""
    from bioner_ray.stages.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_documents(sf_dir))


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 8):
    """SimHash near-dup pairs (rows-only check). Columns: a, b, hamming."""
    from bioner_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_documents(sf_dir), max_hamming=max_hamming)


def token_stats(sf_dir: str):
    """Columns: doc_id, n_tokens, n_types, n_chars, max_token_len, ttr,
    stopword_frac."""
    from bioner_ray.stages.textstats import token_stats_stage

    return token_stats_stage(_documents(sf_dir))


def dedup_components(sf_dir: str, threshold: float = 0.5):
    """Near-dup clusters: exact Jaccard pairs → connected components →
    (node, component = min doc id in cluster); the component id is the
    cluster's keeper. Columns: node, component."""
    from bioner_ray.stages.dedup import jaccard_pairs
    from bioner_ray.stages.graph import connected_components

    pairs = jaccard_pairs(_documents(sf_dir), threshold=threshold)
    return connected_components(pairs)


def conll_roundtrip(sf_dir: str):
    """S1/S2 parity as a distributed query: each document is segmented,
    formatted to its exact CoNLL byte block (S2 writer semantics) and
    re-parsed (S1 reader semantics) inside the same batch; a token
    mismatch raises. Columns: doc_id, n_tokens (token count surviving
    the round trip — SQL-checkable as the whitespace token count)."""
    from bioner_ray.sources.conll import format_conll_document, parse_conll
    from bioner_ray.stages.segment import segment_document

    def rt(batch: pa.Table) -> pa.Table:
        ids, counts = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sents = segment_document(text or "")
            doc = {
                "doc_id": 0,
                "sentences": [
                    {
                        "sent_id": s["sent_id"],
                        "token_text": s["token_text"],
                        "token_start": [str(x) for x in s["token_start"]],
                        "token_end": [str(x) for x in s["token_end"]],
                        "gold_tags": [2] * len(s["token_text"]),  # O
                    }
                    for s in sents
                ],
            }
            parsed = parse_conll(format_conll_document(doc))
            got = [t for d in parsed for s in d["sentences"] for t in s["token_text"]]
            want = [t for s in sents for t in s["token_text"]]
            if got != want:
                raise ValueError(f"CoNLL round-trip mismatch for doc {doc_id}")
            ids.append(doc_id)
            counts.append(len(want))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(counts, type=pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(rt, batch_format="pyarrow")


def quality_docs(sf_dir: str, min_tokens: int = 20, min_ttr: float = 0.3):
    """C4-style quality gate: documents inside the token window with
    enough lexical diversity. Columns: doc_id."""
    from bioner_ray.stages.textstats import quality_filter_stage

    kept = quality_filter_stage(_documents(sf_dir), min_tokens=min_tokens, min_ttr=min_ttr)
    return kept.select_columns(["doc_id"])


def winnow_fingerprints(sf_dir: str, window: int = 5, stride: int = 4):
    """Winnowing document fingerprints (Schleimer et al. 2003) — the
    shift-tolerant near-dup signature (rows-only check; the strided-min
    selection is not SQL-replayable). Columns: doc_id, n_fp."""
    from bioner_ray.stages.textstats import winnow_stage

    fps = winnow_stage(_documents(sf_dir), window=window, stride=stride)

    def count_fp(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_fp": pc.cast(pc.list_value_length(batch.column("fingerprint")), pa.int64()),
            }
        )

    return fps.map_batches(count_fp, batch_format="pyarrow")


def fingerprints(sf_dir: str):
    """Columns: doc_id, md5, n_bpe_tokens."""
    from bioner_ray.stages.textstats import fingerprint_stage

    return fingerprint_stage(_documents(sf_dir))


def langid(sf_dir: str):
    """Stopword-profile language ID (rows-only check). Columns: doc_id,
    pred_lang, lang_score."""
    from bioner_ray.stages.textstats import langid_stage

    return langid_stage(_documents(sf_dir))


def _query_matrix(sf_dir: str, n_queries: int = 8) -> np.ndarray:
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    order = pa.compute.sort_indices(tbl.column("vec_id"))
    tbl = tbl.take(order[:n_queries])
    return np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)


def knn_topk(sf_dir: str, k: int = 10, n_queries: int = 8):
    """Brute-force cosine top-k; queries = embeddings of vec_id 0..7.
    Columns: query_id, vec_id, rank, score_r (rounded to 6 dp so the
    float matches the DuckDB oracle bit-for-bit after rounding)."""
    from bioner_ray.stages.similarity import knn_brute_force

    q = _query_matrix(sf_dir, n_queries)
    out = knn_brute_force(_read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), q, k=k)
    score_r = pa.compute.round(out.column("score"), ndigits=6)
    return pa.table(
        {
            "query_id": out.column("query_id"),
            "vec_id": out.column("vec_id"),
            "rank": out.column("rank"),
            "score_r": score_r,
        }
    )


def knn_ivf_topk(sf_dir: str, k: int = 10, n_queries: int = 8):
    """IVF approximate top-k (rows-only check; recall vs brute force is
    asserted in tests). Columns: query_id, vec_id, rank, score."""
    from bioner_ray.stages.similarity import knn_ivf

    q = _query_matrix(sf_dir, n_queries)
    return knn_ivf(_read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), q, k=k)


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.45):
    """Exact cosine near-dup pairs ≥ threshold. Columns: a, b, cosine_r
    (rounded to 6 dp for oracle bit-match)."""
    from bioner_ray.stages.similarity import cosine_dup_pairs

    pairs = cosine_dup_pairs(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), threshold=threshold
    )

    def round_batch(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "cosine_r": pa.compute.round(batch.column("cosine"), ndigits=6),
            }
        )

    return pairs.map_batches(round_batch, batch_format="pyarrow")
