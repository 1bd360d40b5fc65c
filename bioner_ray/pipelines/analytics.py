"""Oracle-checkable pipelines over the driver testdata tables.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table;
``__ray_entry__.queries()`` exposes them 1:1 with matching DuckDB SQL
in ``oracle_sql()``. Together they cover the reference operator
inventory on real tables: the G1-G3 vocabulary shuffle, the J1
broadcast semi-join, hash joins, partial+final aggregation (G4-G8
pattern), sort/limit top-k (O1), and — most importantly — the full KG
path (segment → gazetteer score → BIO decode → link → triple assembly →
canonicalize) in a SQL-checkable configuration: an *identity* concept
dictionary over a fixed surface set, so DuckDB can replay the exact
mention/triple semantics with window functions.

Exactness rules shared with the oracles:
* tokens = non-empty splits of lower(text) on '\\s+' (textstats contract);
* money/quantity aggregates in integer cents:
  CAST(round(x*100) AS BIGINT) per element BEFORE summing — per-element
  rounding is IEEE-deterministic in both engines, and int64 sums are
  exact (a float SUM would differ in low bits by association order);
* every computed column is named identically here and in the SQL.
"""

from __future__ import annotations

import os

from bioner_ray.sources.parquet_io import read_parquet_clean

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.functions.embed import hash_embedding
from bioner_ray.schemas import CONCEPTS_SCHEMA, EMBEDDING_DIM

#: gazetteer surface set (entities) and relation lexicon for the
#: oracle-checkable KG run — disjoint subsets of the testdata vocabulary.
#: "dup" is the testdata's one RARE word (~5% of docs): it gives the KG
#: a weakly-linked 11th node, so the structural-merge/publish path has a
#: non-degenerate case at every scale (the 10 uniform surfaces alone
#: form a complete K10 that folds into one merge group).
ENTITY_SURFACES = [
    "customer", "table", "row", "column", "vector", "key", "window", "line", "part", "batch",
    "dup",
]
RELATION_WORDS = ["join", "merge", "filter", "sort", "scan", "group", "hash"]

#: the "degraded annotator" surface set for the eval-harness queries:
#: 7 of the 10 entity surfaces (misses line/part/batch → false
#: negatives) plus 3 relation words (false positives) — so the G4-G6
#: precision/recall are both strictly inside (0, 1) and SQL-replayable.
PRED_SURFACES = [
    "customer", "table", "row", "column", "vector", "key", "window",
    "join", "merge", "filter",
]

TRAIN_SOURCES = [f"src{i}" for i in range(14)]
VAL_SOURCES = ["src14", "src15", "src16"]
TEST_SOURCES = ["src17", "src18", "src19"]


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _nrows(sf_dir: str, name: str) -> int:
    """Row count from Parquet footer metadata — no data read; feeds
    work-aware actor-pool sizing (stages/pool.sized_pool)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")).metadata.num_rows


def documents_as_pages(sf_dir: str, doc_parity: int | None = None):
    """Adapter: documents(doc_id, text, lang) → the flagship's extracted
    shape (url, text, lang); url = printf('doc://%08d', doc_id) so the
    lexicographic min used for provenance matches the SQL oracle.
    ``doc_parity`` keeps only doc_id % 2 == parity — the crawl-snapshot
    stand-in for the incremental kg_edge_delta query."""

    def adapt(batch: pa.Table) -> pa.Table:
        if doc_parity is not None:
            batch = batch.filter(
                pc.equal(
                    pc.bit_wise_and(pc.cast(batch.column("doc_id"), pa.int64()), 1),
                    doc_parity,
                )
            )
        urls = [f"doc://{d:08d}" for d in batch.column("doc_id").to_pylist()]
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "text": batch.column("text"),
                "lang": batch.column("lang"),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]).map_batches(
        adapt, batch_format="pyarrow"
    )


def make_identity_concepts(surfaces=None) -> pa.Table:
    """Concept dictionary where concept_id == surface (is_canonical all
    true) — makes entity linking SQL-replayable while exercising the
    real ConceptIndex path."""
    surfaces = list(surfaces if surfaces is not None else ENTITY_SURFACES)
    emb = [hash_embedding(s, EMBEDDING_DIM).tolist() for s in surfaces]
    return pa.table(
        {
            "concept_id": surfaces,
            "surface": surfaces,
            "is_canonical": [True] * len(surfaces),
            "embedding": pa.array(emb, type=pa.list_(pa.float32(), EMBEDDING_DIM)),
        },
        schema=CONCEPTS_SCHEMA,
    )


def _segmented_documents(sf_dir: str, doc_parity: int | None = None):
    from bioner_ray.stages.segment import segment_stage

    # KG/eval queries never read token offsets — skip building them
    return segment_stage(documents_as_pages(sf_dir, doc_parity=doc_parity), with_offsets=False)


# tagged-corpus memo — the in-process analog of run_kg_pipeline's tagged
# checkpoint (state/checkpoint.py): every mention-level query shares the
# segment→score prefix, and the scorer pool is its dominant cost. The
# memo key deliberately EXCLUDES concurrency/pools (they change the
# execution, never the rows); materialize() spills to the object store,
# which at production scale is exactly the on-disk checkpoint this
# stands in for.
_TAGGED_MEMO: dict = {}


def _tagged_documents(
    sf_dir: str, concurrency=None, pools: int = 1, doc_parity: int | None = None
):
    import os as _os

    import ray

    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.scorer import score_stage

    key = (_os.path.abspath(sf_dir), doc_parity)
    cached = _TAGGED_MEMO.get(key)
    if cached is not None:
        return cached

    if concurrency is None:
        concurrency = sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=16, pools=pools)
    docs = _segmented_documents(sf_dir, doc_parity=doc_parity)
    out = score_stage(
        docs,
        model_name="gazetteer",
        model_config={"surfaces": ray.put(list(ENTITY_SURFACES))},
        concurrency=concurrency,
    ).materialize()
    _TAGGED_MEMO[key] = out
    return out


def mention_counts(sf_dir: str):
    """segment → gazetteer score → BIO decode → mentions → groupby
    surface. Columns: surface, n_mentions. Surface cardinality grows
    with the corpus → bucketed Arrow merge, not Ray's per-group path."""
    from bioner_ray.stages.mentions import mentions_stage
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    mentions = mentions_stage(_tagged_documents(sf_dir))
    return bucketed_aggregate(
        with_ones(mentions.select_columns(["surface"]), "n_mentions"),
        ["surface"],
        [("n_mentions", "sum")],
    )


def entity_burstiness(sf_dir: str):
    """Entity dispersion report: per surface, the document frequency,
    total mention count and the largest single-document burst — the
    signal separating corpus-wide entities from page-local artifacts
    (a surface with n_mentions ≫ n_docs and a high max_in_doc is a
    template/boilerplate suspect). Two bucketed aggregates: (surface,
    url) partial counts, then per-surface sums/max — the shuffle moves
    per-doc-combined rows, never mention rows. Columns: surface,
    n_docs, n_mentions, max_in_doc."""
    from bioner_ray.stages.mentions import mentions_stage
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    per_doc = bucketed_aggregate(
        with_ones(
            mentions_stage(_tagged_documents(sf_dir)).select_columns(
                ["surface", "url"]
            ),
            "cnt",
        ),
        ["surface", "url"],
        [("cnt", "sum")],
    )

    def widen(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("surface", pa.string()),
                    ("one", pa.int64()),
                    ("n_mentions", pa.int64()),
                    ("max_in_doc", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "surface": t.column("surface"),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_mentions": t.column("cnt"),
                "max_in_doc": t.column("cnt"),
            }
        )

    merged = bucketed_aggregate(
        per_doc.map_batches(widen, batch_format="pyarrow"),
        ["surface"],
        [("one", "sum"), ("n_mentions", "sum"), ("max_in_doc", "max")],
    )
    return merged.map_batches(
        lambda t: t.rename_columns(
            ["n_docs" if c == "one" else c for c in t.column_names]
        )
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )


def doc_entity_density(sf_dir: str):
    """Per-document extraction audit: token count, entity-token count
    and density — the page-level signal for "this page yields no KG
    value" routing (skip-scoring pages below a density floor is the
    cheapest 100-TB optimization there is). Entirely shuffle-free: one
    stateless vectorized pass (flatten tokens from list offsets, one
    Arrow ``is_in`` probe against the broadcast entity set, segment
    sums) — the audit deliberately reads the same single-token
    entity contract the gazetteer resolves to on this lexicon, so it
    costs none of the scorer pool. Documents with zero tokens emit no
    row. Columns: doc_id, n_tokens, n_entities, density."""

    entity_set = pa.array(sorted(ENTITY_SURFACES), type=pa.string())

    def stats(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = split.values.slice(off[0], off[-1] - off[0])
        starts, ends = off[:-1] - off[0], off[1:] - off[0]
        nonempty = pc.not_equal(vals, "").to_numpy(zero_copy_only=False).astype(np.int64)
        is_ent = pc.is_in(vals, value_set=entity_set).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        cs_n = np.concatenate([[0], np.cumsum(nonempty)])
        cs_e = np.concatenate([[0], np.cumsum(is_ent)])
        n_tok = cs_n[ends] - cs_n[starts]
        n_ent = cs_e[ends] - cs_e[starts]
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok),
                "n_entities": pa.array(n_ent),
            }
        ).filter(pa.array(n_tok > 0))
        density = pc.divide(
            pc.cast(out.column("n_entities"), pa.float64()),
            pc.cast(out.column("n_tokens"), pa.float64()),
        )
        return out.append_column("density", density)

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def kg_edges_pruned(sf_dir: str, min_npmi: float = 0.0, min_weight: int = 2, edges=None):
    """The publishable graph: canonical edges filtered to
    npmi ≥ ``min_npmi`` AND weight ≥ ``min_weight`` — the composition
    (extract → canonicalize → PMI-score → prune) a production KG
    build materializes. Pure distributed filter over ``kg_edge_pmi``.
    Columns: subj, obj, w, npmi."""

    def prune(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("subj", pa.string()),
                    ("obj", pa.string()),
                    ("w", pa.int64()),
                    ("npmi", pa.float64()),
                ]
            ).empty_table()
        keep = pc.and_(
            pc.greater_equal(t.column("npmi"), min_npmi),
            pc.greater_equal(t.column("w"), min_weight),
        )
        return t.select(["subj", "obj", "w", "npmi"]).filter(keep)

    return kg_edge_pmi(sf_dir, edges=edges).map_batches(prune, batch_format="pyarrow")


def entity_centroids(sf_dir: str):
    """Per-entity embedding centroid (long form): for every entity
    surface, the per-dimension SUM of the embeddings of documents that
    mention it, plus the doc count — the entity-representation build
    step (centroid = sum_q / n_docs / 1e6 downstream). Embedding floats
    are quantized ONCE to integer micromarks (floor(x·1e6), identical
    in DuckDB), so the distributed per-dim sums are order-independent
    and exact. Shape: vectorized token scan → distinct (surface,
    doc_id) pairs → ONE bucketed join against the embeddings table →
    vectorized dim explode → ONE bucketed aggregate; output is bounded
    by entities × dims. Columns: surface, dim, sum_q, n_docs."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    entity_set = pa.array(sorted(ENTITY_SURFACES), type=pa.string())

    def pairs(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = split.values.slice(off[0], off[-1] - off[0])
        lengths = np.diff(off)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tok_doc = np.repeat(doc_ids, lengths)
        is_ent = pc.is_in(vals, value_set=entity_set).to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "surface": vals.filter(pa.array(is_ent)),
                "doc_id": pa.array(tok_doc[is_ent]),
            }
        )
        return out.append_column("one", pa.array(np.ones(out.num_rows, dtype=np.int64)))

    pair_schema = pa.schema([("surface", pa.string()), ("doc_id", pa.int64())])
    ent_docs = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
                pairs, batch_format="pyarrow"
            ),
            ["surface", "doc_id"],
            [("one", "min")],
        ),
        pair_schema,
    )

    # pyarrow's join rejects LIST payload columns but accepts BINARY —
    # so the quantized vector travels the join as one int64-LE blob per
    # doc (1 row/doc through the shuffle, not dims rows/doc), and the
    # per-dimension explode happens after, on the joined (surface, doc)
    # pairs only
    def quantize_emb(t: pa.Table) -> pa.Table:
        emb_col = t.column("embedding").combine_chunks()
        off = emb_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = emb_col.values.slice(off[0], off[-1] - off[0]).to_numpy(
            zero_copy_only=False
        )
        q = np.floor(vals.astype(np.float64) * 1_000_000.0).astype("<i8")
        blobs = [
            q[s - off[0] : e - off[0]].tobytes()
            for s, e in zip(off[:-1], off[1:])
        ]
        return pa.table(
            {
                "doc_id": t.column("vec_id"),
                "qblob": pa.array(blobs, type=pa.binary()),
            }
        )

    emb_q = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        quantize_emb, batch_format="pyarrow"
    )
    joined = bucketed_inner_join(
        ent_docs,
        emb_q,
        ["doc_id"],
        pair_schema,
        pa.schema([("doc_id", pa.int64()), ("qblob", pa.binary())]),
    )

    def explode(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("surface", pa.string()),
                    ("dim", pa.int64()),
                    ("sum_q", pa.int64()),
                    ("n_docs", pa.int64()),
                ]
            ).empty_table()
        blobs = t.column("qblob").to_pylist()
        q = np.frombuffer(b"".join(blobs), dtype="<i8")
        lengths = np.array([len(b) // 8 for b in blobs], dtype=np.int64)
        ends = np.cumsum(lengths)
        dims = np.arange(len(q), dtype=np.int64) - np.repeat(
            ends - lengths, lengths
        ) + 1
        surf = pc.take(
            t.column("surface"),
            pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64), lengths)),
        )
        return pa.table(
            {
                "surface": surf,
                "dim": pa.array(dims),
                "sum_q": pa.array(q),
                "n_docs": pa.array(np.ones(len(q), dtype=np.int64)),
            }
        )

    return bucketed_aggregate(
        joined.map_batches(explode, batch_format="pyarrow"),
        ["surface", "dim"],
        [("sum_q", "sum"), ("n_docs", "sum")],
    )


def entity_similarity(
    sf_dir: str,
    max_exact_rows: int = 6_400_000,
    threshold: float = 0.9,
):
    """Pairwise cosine between entity centroid vectors (the semantic
    merge-candidate signal, complementing alias_groups and
    kg_merge_groups), SIZE-GATED on the entity axis — the axis that
    actually grows on a real KG:

    * ≤ ``max_exact_rows`` long-form centroid rows (entities × dims —
      the quantity that actually bounds driver heap) → exact all-pairs:
      the long-form
      quantized centroids collect driver-side (bounded by the gate ×
      dims), the Gram matrix is ONE numpy int64 matmul when the products
      provably fit int64 (the pagerank big-int guard pattern), else an
      object-dtype matmul on exact Python ints. Either way the dot is
      exact integer arithmetic and the float composition is pinned to
      ``float(dot) / (sqrt(float(na)) · sqrt(float(nb)))`` — int→double
      is round-to-nearest and IEEE sqrt exactly rounded in numpy and
      DuckDB alike, so the HUGEINT twin reproduces the doubles
      bit-for-bit.
    * above the gate → the scale path: centroids assemble into dense
      unit vectors per entity (one map_groups, never driver-side) and
      feed ``cosine_dup_pairs``'s multi-table hyperplane LSH with
      in-bucket exact verification, returning pairs with cosine ≥
      ``threshold`` (an all-pairs listing is itself O(n²) output — at
      scale only the near-duplicate candidates are the useful product).
      Approximate recall near the threshold; honestly non-replayable,
      like ``knn_ivf_topk``.

    Columns: a, b, cosine."""
    cents_ds = entity_centroids(sf_dir)
    if cents_ds.count() > max_exact_rows:
        return _entity_similarity_lsh(cents_ds, threshold)

    cents = cents_ds.to_pandas()
    names = sorted(cents["surface"].unique())
    idx = {nm: i for i, nm in enumerate(names)}
    n = len(names)
    dims = cents["dim"].to_numpy(dtype=np.int64) - 1
    n_dims = int(dims.max(initial=-1)) + 1
    m = np.zeros((n, n_dims), dtype=np.int64)
    rows = cents["surface"].map(idx).to_numpy()
    m[rows, dims] = cents["sum_q"].to_numpy(dtype=np.int64)

    peak = int(np.abs(m).max(initial=0))
    if peak and peak * peak * max(n_dims, 1) < 2**63:
        gram = m @ m.T  # exact: |Σ q_i·q_j| < 2^63 by the guard
    else:
        mo = m.astype(object)  # exact Python-int matmul (rare: huge sums)
        gram = mo @ mo.T
    norms = np.sqrt(np.diag(gram).astype(np.float64))
    ii, jj = np.triu_indices(n, k=1)
    cos = gram[ii, jj].astype(np.float64) / (norms[ii] * norms[jj])
    names_arr = pa.array(names, type=pa.string())
    return pa.table(
        {
            "a": names_arr.take(pa.array(ii)),
            "b": names_arr.take(pa.array(jj)),
            "cosine": pa.array(cos, type=pa.float64()),
        }
    )


def _entity_similarity_lsh(cents_ds, threshold: float):
    """Scale path for ``entity_similarity``: long-form centroids →
    dense per-entity vectors (one groupby-assemble, distributed) →
    ``cosine_dup_pairs`` hyperplane LSH with exact in-bucket cosine."""
    from bioner_ray.stages.similarity import cosine_dup_pairs

    vec_schema = pa.schema(
        [("vec_id", pa.string()), ("embedding", pa.list_(pa.float64()))]
    )

    def assemble(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return vec_schema.empty_table()
        surf = group.column("surface").to_pylist()
        dims = group.column("dim").to_numpy(zero_copy_only=False).astype(np.int64)
        sums = group.column("sum_q").to_numpy(zero_copy_only=False).astype(np.float64)
        # every mentioned entity carries ALL dims (the explode emits the
        # full blob), so the per-group max dim IS the global vector size
        n_dims = int(dims.max())
        order = np.lexsort((dims, np.array(surf, dtype=object)))
        surf_s = np.array(surf, dtype=object)[order]
        starts = np.flatnonzero(
            np.concatenate(([True], surf_s[1:] != surf_s[:-1]))
        )
        vecs, ids = [], []
        for s, e in zip(starts, np.append(starts[1:], len(surf_s))):
            v = np.zeros(n_dims, dtype=np.float64)
            v[dims[order[s:e]] - 1] = sums[order[s:e]]
            vecs.append(v)
            ids.append(surf_s[s])
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.string()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            }
        )

    from bioner_ray.stages.shuffle import pin_schema

    out_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("cosine", pa.float64())]
    )
    from bioner_ray.stages.shuffle import bucketed_map_groups

    vecs = bucketed_map_groups(cents_ds, ["surface"], assemble)
    pairs = cosine_dup_pairs(vecs, threshold=threshold, n_planes=12)
    return pin_schema(
        pairs.map_batches(
            lambda t: t.rename_columns(["a", "b", "cosine"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        out_schema,
        ensure_block=True,  # zero candidate pairs must still carry columns
    )


def source_report(sf_dir: str):
    """The per-source corpus card a 100-TB preprocessing run publishes:
    document / token totals, quality-rule passes (same 20 ≤ tokens ≤
    10^6, TTR ≥ 0.3 rule as ``quality_docs``) and exact-duplicate
    copies (same global md5 grouping as ``dedup_exact`` — the
    representative is the min doc_id ACROSS sources, so a source
    that re-hosts another's pages shows the dups). One stateless pass
    computes per-doc facts; the dup flag needs per-key min doc_id =
    one bucketed aggregate on the md5 key + one bucketed join back;
    the rollup is one aggregate on source. Columns: source, n_docs,
    n_tokens, n_quality, n_exact_dup."""
    import hashlib

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )
    from bioner_ray.stages.textstats import _split_lower

    row_schema = pa.schema(
        [
            ("k", pa.string()),
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("n_tokens", pa.int64()),
            ("q", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        toks = _split_lower(batch, "text")
        return pa.table(
            {
                "k": pa.array(
                    [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts],
                    type=pa.string(),
                ),
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "source": batch.column("source"),
                "n_tokens": pa.array([len(ts) for ts in toks], type=pa.int64()),
                "q": pa.array(
                    [
                        1
                        if (
                            20 <= len(ts) <= 1_000_000
                            and len(set(ts)) / max(len(ts), 1) >= 0.3
                        )
                        else 0
                        for ts in toks
                    ],
                    type=pa.int64(),
                ),
            }
        )

    rows = pin_schema(
        _read(sf_dir, "documents", columns=["doc_id", "source", "text"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        row_schema,
    ).materialize()

    keymin = pin_schema(
        bucketed_aggregate(
            rows.map_batches(
                lambda t: pa.table({"k": t.column("k"), "keep_id": t.column("doc_id")}),
                batch_format="pyarrow",
            ),
            ["k"],
            [("keep_id", "min")],
        ),
        pa.schema([("k", pa.string()), ("keep_id", pa.int64())]),
    )
    joined = bucketed_inner_join(
        rows, keymin, ["k"], row_schema, pa.schema([("k", pa.string()), ("keep_id", pa.int64())])
    )

    def tag(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("source", pa.string()),
                    ("one", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("q", pa.int64()),
                    ("is_dup", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "source": t.column("source"),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_tokens": t.column("n_tokens"),
                "q": t.column("q"),
                "is_dup": pc.cast(
                    pc.not_equal(t.column("doc_id"), t.column("keep_id")), pa.int64()
                ),
            }
        )

    merged = bucketed_aggregate(
        joined.map_batches(tag, batch_format="pyarrow"),
        ["source"],
        [("one", "sum"), ("n_tokens", "sum"), ("q", "sum"), ("is_dup", "sum")],
    )
    return merged.map_batches(
        lambda t: t.rename_columns(
            ["source", "n_docs", "n_tokens", "n_quality", "n_exact_dup"]
        )
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )


def _inject_tags(key: str):
    """Move the scorer's top-level ``tags`` column into each sentence
    struct under ``key`` (so a second scorer pass can add its own tags
    and the metrics stages see both columns in-row, J4 pattern). Pure
    Arrow struct surgery — no Python row rebuild."""

    def fn(batch: pa.Table) -> pa.Table:
        from bioner_ray.stages.nested import add_sentence_field

        return add_sentence_field(batch, key, "tags")

    return fn


def _dual_tagged_documents(sf_dir: str, concurrency=None):
    """Documents with gold_tags (full gazetteer) and pred_tags (degraded
    gazetteer, PRED_SURFACES) inside each sentence — the two-annotator
    input shape for the G4-G7/J5 eval harness."""
    import ray

    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.scorer import score_stage

    if concurrency is None:
        # two scorer pools run CONCURRENTLY in this pipeline
        concurrency = sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=8, pools=2)
    docs = _segmented_documents(sf_dir)
    gold = score_stage(
        docs,
        model_name="gazetteer",
        model_config={"surfaces": ray.put(list(ENTITY_SURFACES))},
        concurrency=concurrency,
    ).map_batches(_inject_tags("gold_tags"), batch_format="pyarrow")
    return score_stage(
        gold,
        model_name="gazetteer",
        model_config={"surfaces": ray.put(list(PRED_SURFACES))},
        concurrency=concurrency,
    ).map_batches(_inject_tags("pred_tags"), batch_format="pyarrow")


def ner_eval(sf_dir: str):
    """Distributed entity-level P/R/F1 (G4-G6 + J4): per-block partial
    (tp, n_pred, n_gold) rows, three driver-side integer sums, F1 per
    annotator.py:108-110. One row: tp, n_pred, n_gold, precision,
    recall, f1."""
    import pandas as pd

    from bioner_ray.stages.metrics import entity_level_prf

    m = entity_level_prf(_dual_tagged_documents(sf_dir))
    return pd.DataFrame(
        [
            {
                "tp": m["true_positives"],
                "n_pred": m["predicted_spans"],
                "n_gold": m["gold_spans"],
                "precision": m["precision"],
                "recall": m["recall"],
                "f1": m["f1"],
            }
        ]
    )


def error_length_stats(sf_dir: str):
    """G7 grouped error ratio per gold-span length. Columns: length,
    total, errors."""
    from bioner_ray.stages.metrics import error_stats_by_length

    return error_stats_by_length(_dual_tagged_documents(sf_dir))


def ensemble_mention_counts(sf_dir: str):
    """J5 two-annotator span intersection re-encoded as BIO, then the
    mention-count aggregate over the ensemble tags. Columns: surface,
    n_mentions."""
    from bioner_ray.stages.mentions import mentions_stage
    from bioner_ray.stages.metrics import ensemble_tags_batch
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    tagged = _dual_tagged_documents(sf_dir)
    ens = tagged.map_batches(
        lambda b: ensemble_tags_batch(b, "gold_tags", "pred_tags"),
        batch_format="pyarrow",
    )

    def lift(batch: pa.Table) -> pa.Table:
        docs = batch.column("sentences").to_pylist()
        tags = [[s["ensemble_tags"] for s in sents] for sents in docs]
        from bioner_ray.schemas import TAGS_TYPE

        return batch.append_column("tags", pa.array(tags, type=TAGS_TYPE))

    mentions = mentions_stage(ens.map_batches(lift, batch_format="pyarrow"))
    return bucketed_aggregate(
        with_ones(mentions.select_columns(["surface"]), "n_mentions"),
        ["surface"],
        [("n_mentions", "sum")],
    )


def write_doc_splits(sf_dir: str, out_dir: str):
    """S7 sink parity: the reference routes each document block into one
    of three FILES (medmentions_conll_converter.py:32-77); here the same
    routing materializes as hive-partitioned Parquet
    (``out_dir/split=train/…``), so a consumer — and a resumed run —
    addresses each split as its own directory. Returns rows per split."""
    import pyarrow.dataset as pads

    ds = doc_split(sf_dir)
    ds.write_parquet(out_dir, partition_cols=["split"])
    scanned = pads.dataset(out_dir, format="parquet", partitioning="hive").to_table(
        columns=["split"]
    )
    counts: dict[str, int] = {}
    for s in scanned.column("split").to_pylist():
        counts[s] = counts.get(s, 0) + 1
    return counts


# canonical-edge memo: every kg_* analytics query starts from the SAME
# deterministic canonical edge table, and rebuilding it re-runs the whole
# extract→score→link→triples→canonicalize prefix (~3-4 s of pool work per
# query at sf0.1 — measured ~40% of the entire bench suite). A production
# KG build computes the edge table ONCE and serves every downstream
# analytic from it (exactly what run_kg_pipeline's checkpoint does across
# processes); this is the in-process form. Keyed on every argument that
# changes the result; the materialized table is edge-bounded (post-
# canonicalization), so pinning it in the object store is cheap.
_EDGE_MEMO: dict = {}


def kg_edges(
    sf_dir: str,
    salt_buckets=None,
    doc_parity: int | None = None,
    pools: int = 2,
):
    """The full SQL-checkable KG edge path. Columns: subj, pred, obj,
    weight, first_url. ``doc_parity`` restricts the corpus to
    doc_id % 2 == parity (the snapshot stand-in for kg_edge_delta);
    ``pools`` = concurrent actor-pool stages sharing this EXECUTION
    (kg_edges itself runs two — scorer + triples; callers that union
    two kg_edges branches pass 4 so the combined reservation still
    leaves CPUs for the task-pool stages). Memoized per process on the
    full argument tuple (see _EDGE_MEMO)."""
    import os as _os

    import ray

    from bioner_ray.stages.link import ConceptIndex
    from bioner_ray.stages.triples import canonicalize_edges, triples_stage

    from bioner_ray.stages.pool import sized_pool

    key = (_os.path.abspath(sf_dir), salt_buckets, doc_parity, pools)
    cached = _EDGE_MEMO.get(key)
    if cached is not None:
        return cached

    index_ref = ray.put(ConceptIndex(make_identity_concepts()))
    triples = triples_stage(
        _tagged_documents(sf_dir, pools=pools, doc_parity=doc_parity), index_ref,
        concurrency=sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=16, pools=pools),
        relation_lexicon=frozenset(RELATION_WORDS),
    )
    edges = canonicalize_edges(triples, salt_buckets=salt_buckets)
    out = edges.drop_columns(["score"]).materialize()
    _EDGE_MEMO[key] = out
    return out


_NODE_MEMO: dict = {}


def kg_nodes(sf_dir: str):
    """Linked-mention canonicalization. Columns: concept_id, surface,
    count, n_urls. Memoized per process (the kg_edges argument: the
    canonical node table is the shared, node-bounded starting point of
    every downstream analytic)."""
    import os as _os

    import ray

    from bioner_ray.stages.link import ConceptIndex, link_stage
    from bioner_ray.stages.mentions import mentions_stage
    from bioner_ray.stages.triples import canonicalize_nodes

    from bioner_ray.stages.pool import sized_pool

    key = _os.path.abspath(sf_dir)
    cached = _NODE_MEMO.get(key)
    if cached is not None:
        return cached

    index_ref = ray.put(ConceptIndex(make_identity_concepts()))
    linked = link_stage(
        mentions_stage(_tagged_documents(sf_dir, pools=2)), index_ref,
        concurrency=sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=16, pools=2),
    )
    out = canonicalize_nodes(linked)  # already a bounded pyarrow Table
    _NODE_MEMO[key] = out
    return out


def ntriples_roundtrip(sf_dir: str):
    """N-Triples sink→source parity over the canonical edge table —
    the RDF serialization a published KG ships (sources/ntriples.py).
    The distinct (subj, pred, obj) set is written as one ``part-*.nt``
    file per block (percent-encoded IRIs), read back with the
    distributed line reader, and returned; the driver's hash match
    against the trip-chain twin pins that serialization∘parse is the
    identity on the real graph. The manifest count is asserted against
    the input so a dropped block can never pass as a smaller graph.
    Columns: subj, pred, obj."""
    import os
    import shutil
    import uuid

    from bioner_ray.sources.ntriples import read_ntriples, write_ntriples

    path = os.path.join("/tmp/bioner_nt", uuid.uuid4().hex)
    shutil.rmtree(path, ignore_errors=True)
    edges = kg_edges(sf_dir).select_columns(["subj", "pred", "obj"])
    manifest = write_ntriples(edges, path)
    n_written = sum(r["n_triples"] for r in manifest.take_all())
    n_edges = edges.count()
    if n_written != n_edges:
        raise RuntimeError(f"ntriples manifest {n_written} != edges {n_edges}")
    return read_ntriples(path)


def kg_degree(sf_dir: str):
    """Graph-quality report over the canonical edge table: per-node
    out/in degree and strength (stages/graph.py degree_stats). The hub
    audit a KG build runs before any per-entity groupby. Columns:
    node, out_degree, in_degree, out_weight, in_weight."""
    from bioner_ray.stages.graph import degree_stats

    return degree_stats(kg_edges(sf_dir))


def kg_pagerank(sf_dir: str, iters: int = 3):
    """Fixed-iteration weighted PageRank over the canonical KG edges,
    in deterministic scaled-integer arithmetic (stages/graph.py
    pagerank — every step is integer floor division, so the DuckDB
    twin replays it bit-exactly). Columns: node, rank (pagerank ×
    10^12 as int64)."""
    from bioner_ray.stages.graph import pagerank

    return pagerank(kg_edges(sf_dir), iters=iters)


def kg_negative_samples(sf_dir: str, k: int = 2):
    """Deterministic negative sampling for KG-embedding training
    (TransE-style corrupted triples): for each canonical edge and
    variant j ∈ 1..k, replace the object with the node at index
    ``md5_61bit(subj‖pred‖obj‖j) mod n_nodes`` of the sorted node
    list, then drop corruptions that happen to be REAL edges via the
    engine's ``left anti`` bucketed join (the filtered-negative
    contract). No RNG: the md5 draw replays exactly in SQL (the
    error_samples/cms 61-bit-prefix idiom), and it runs over the
    EDGE table only (edge-bounded, never corpus-bounded — the node
    list is a broadcast array). Columns: subj, pred, neg_obj, variant."""
    import hashlib

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    edges = kg_edges(sf_dir).map_batches(
        lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow"
    ).materialize()

    node_rows = pin_schema(
        bucketed_aggregate(
            with_ones(
                edges.map_batches(
                    lambda t: pa.table(
                        {
                            "node": pa.chunked_array(
                                [
                                    t.column("subj").combine_chunks(),
                                    t.column("obj").combine_chunks(),
                                ]
                            ).combine_chunks()
                        }
                    ),
                    batch_format="pyarrow",
                )
            ),
            ["node"],
            [("one", "min")],
            num_buckets=16,
        ),
        pa.schema([("node", pa.string()), ("one", pa.int64())]),
    ).take_all()
    nodes = sorted(r["node"] for r in node_rows)  # bounded broadcast list
    n = len(nodes)
    if n == 0:
        return pa.schema(
            [
                ("subj", pa.string()),
                ("pred", pa.string()),
                ("neg_obj", pa.string()),
                ("variant", pa.int64()),
            ]
        ).empty_table()

    SEP = "\x1f"

    def corrupt(t: pa.Table) -> pa.Table:
        subs = t.column("subj").to_pylist()
        preds = t.column("pred").to_pylist()
        objs = t.column("obj").to_pylist()
        out_s, out_p, out_o, out_j = [], [], [], []
        for s, p, o in zip(subs, preds, objs):
            for j in range(1, k + 1):
                key = (s + SEP + p + SEP + o + SEP + str(j)).encode()
                h = int.from_bytes(hashlib.md5(key).digest()[:8], "big") % (2**61)
                out_s.append(s)
                out_p.append(p)
                out_o.append(nodes[h % n])
                out_j.append(j)
        return pa.table(
            {
                "subj": pa.array(out_s, type=pa.string()),
                "pred": pa.array(out_p, type=pa.string()),
                "neg_obj": pa.array(out_o, type=pa.string()),
                "variant": pa.array(out_j, type=pa.int64()),
            }
        )

    cand = edges.map_batches(corrupt, batch_format="pyarrow")
    real = edges.map_batches(
        lambda t: pa.table(
            {
                "subj": t.column("subj"),
                "pred": t.column("pred"),
                "neg_obj": t.column("obj"),
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed_inner_join(
        cand,
        real,
        keys=["subj", "pred", "neg_obj"],
        left_schema=pa.schema(
            [
                ("subj", pa.string()),
                ("pred", pa.string()),
                ("neg_obj", pa.string()),
                ("variant", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("subj", pa.string()),
                ("pred", pa.string()),
                ("neg_obj", pa.string()),
            ]
        ),
        num_buckets=64,
        join_type="left anti",
    )


PPR_SEEDS = ["batch", "column"]  # 2 lexicographically-smallest lexicon entities


def kg_ppr(sf_dir: str, iters: int = 3):
    """Personalized PageRank (random walk with restart) around the
    ``PPR_SEEDS`` entity set: same scaled-integer fixed-round machinery
    as kg_pagerank, but initial mass and per-round teleport go only to
    the seeds — the query-relevance score a KG serves for 'entities
    related to X'. Columns: node, rank (ppr × 10^12 as int64; non-seed
    unreachable nodes score 0)."""
    from bioner_ray.stages.graph import pagerank

    return pagerank(kg_edges(sf_dir), iters=iters, seed_nodes=PPR_SEEDS)


def kg_top_neighbors(sf_dir: str, k: int = 3):
    """Per-node neighborhood summary: each node's top-k out-neighbors
    by total edge weight (preds collapsed), ties by obj — the entity
    context-feature extraction step (neighbor lists feed embedding /
    candidate-generation stages). Combiner-pruned per-group top-k
    (stages/rank.py): the shuffle moves ≤ k rows per (block, subj).
    Columns: subj, obj, w, rk."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def to_pair(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": t.column("subj"),
                "obj": t.column("obj"),
                "w": pc.cast(t.column("weight"), pa.int64()),
            }
        )

    collapsed = pin_schema(
        bucketed_aggregate(
            kg_edges(sf_dir).map_batches(to_pair, batch_format="pyarrow"),
            ["subj", "obj"],
            [("w", "sum")],
        ),
        pa.schema([("subj", pa.string()), ("obj", pa.string()), ("w", pa.int64())]),
    )
    return top_k_per_group(
        collapsed,
        key_col="subj",
        order_by=[("w", "descending"), ("obj", "ascending")],
        k=k,
    )


def kg_walks(sf_dir: str, length: int = 3):
    """Deterministic hash-greedy walk corpus over the KG (stages/
    graph.py hash_walks): from every node with out-edges, a 3-step walk
    whose step i picks the out-neighbor minimizing md5(cur|i|nbr) —
    pseudo-random but RNG-free and SQL-replayable, the sequence
    generator KG-embedding training reads. Columns: start, n1, n2, n3."""
    from bioner_ray.stages.graph import hash_walks

    return hash_walks(kg_edges(sf_dir), length=length)


def kg_walk_pairs(sf_dir: str, window: int = 2, length: int = 3):
    """Skip-gram (center, context) training-pair counts over the
    deterministic walk corpus (kg_walks) — the DeepWalk/node2vec
    pair generator a KG-embedding trainer consumes: each completed
    walk ``[start, n1 … nL]`` contributes every ordered position pair
    within ``window`` (both directions, the word2vec contract). Pair
    expansion is a stateless vectorized map over the walk table —
    column concatenation per (i, j) position pair, no per-walk Python
    — and ONE bucketed aggregate folds to counts; exchange volume is
    pairs-per-walk × walks, never edges. Columns: center, context,
    n_pairs."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    walks = kg_walks(sf_dir, length=length)
    cols = ["start"] + [f"n{i}" for i in range(1, length + 1)]
    empty = pa.schema([("center", pa.string()), ("context", pa.string())])

    def expand(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return empty.empty_table()
        cs: list = []
        xs: list = []
        for i in range(len(cols)):
            for j in range(i + 1, min(i + window, len(cols) - 1) + 1):
                a = t.column(cols[i]).combine_chunks()
                b = t.column(cols[j]).combine_chunks()
                cs.extend((a, b))
                xs.extend((b, a))
        return pa.table(
            {
                "center": pa.concat_arrays([c.cast(pa.string()) for c in cs]),
                "context": pa.concat_arrays([x.cast(pa.string()) for x in xs]),
            }
        )

    pairs = walks.map_batches(expand, batch_format="pyarrow")
    return pin_schema(
        bucketed_aggregate(
            with_ones(pairs, "n_pairs"), ["center", "context"], [("n_pairs", "sum")]
        ),
        pa.schema(
            [("center", pa.string()), ("context", pa.string()), ("n_pairs", pa.int64())]
        ),
    )


def kg_triangles(sf_dir: str):
    """Per-node triangle participation over the KG's undirected simple
    graph (stages/graph.py triangle_counts — degree-ordered orientation
    bounds wedge generation to O(E^1.5) regardless of hubs). Columns:
    node, n_triangles."""
    from bioner_ray.stages.graph import triangle_counts

    return triangle_counts(kg_edges(sf_dir))


def kg_relation_cardinality(sf_dir: str):
    """Per-predicate schema governance: triple mass, distinct subjects
    / objects, and the functionality ratios (triples per subject /
    per object) that classify a relation as 1:1, 1:N or M:N — what a
    KG quality gate reads before trusting a predicate for entity
    merging. Engine shape: the canonical edge table re-keyed by pred,
    distinct endpoint counts via the engine's two-level exact dedup
    (one (pred, node) collapse, then a count — no driver sets), the
    ratio a replayable integer→double division. Columns: pred,
    n_triples, n_subj, n_obj, functionality, inv_functionality."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    edges = kg_edges(sf_dir).materialize()

    tri = pin_schema(
        bucketed_aggregate(
            edges.map_batches(
                lambda t: pa.table(
                    {"pred": t.column("pred"), "n_triples": pc.cast(t.column("weight"), pa.int64())}
                ),
                batch_format="pyarrow",
            ),
            ["pred"],
            [("n_triples", "sum")],
        ),
        pa.schema([("pred", pa.string()), ("n_triples", pa.int64())]),
    )

    def distinct_count(col: str, out: str):
        rows = pin_schema(
            bucketed_aggregate(
                with_ones(
                    edges.map_batches(
                        lambda t, c=col: t.select(["pred", c]).rename_columns(["pred", "node"]),
                        batch_format="pyarrow",
                    ),
                    "one",
                ),
                ["pred", "node"],
                [("one", "min")],
            ),
            pa.schema([("pred", pa.string()), ("node", pa.string())]),
        ).map_batches(lambda t: t.select(["pred"]) if t.num_columns else t, batch_format="pyarrow")
        return pin_schema(
            bucketed_aggregate(with_ones(rows, out), ["pred"], [(out, "sum")]),
            pa.schema([("pred", pa.string()), (out, pa.int64())]),
        )

    j1 = bucketed_inner_join(
        tri,
        distinct_count("subj", "n_subj"),
        ["pred"],
        pa.schema([("pred", pa.string()), ("n_triples", pa.int64())]),
        pa.schema([("pred", pa.string()), ("n_subj", pa.int64())]),
    )
    j2 = bucketed_inner_join(
        j1,
        distinct_count("obj", "n_obj"),
        ["pred"],
        pa.schema(
            [("pred", pa.string()), ("n_triples", pa.int64()), ("n_subj", pa.int64())]
        ),
        pa.schema([("pred", pa.string()), ("n_obj", pa.int64())]),
    )

    out_schema = pa.schema(
        [
            ("pred", pa.string()),
            ("n_triples", pa.int64()),
            ("n_subj", pa.int64()),
            ("n_obj", pa.int64()),
            ("functionality", pa.float64()),
            ("inv_functionality", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        f = pc.divide(
            pc.cast(t.column("n_triples"), pa.float64()),
            pc.cast(t.column("n_subj"), pa.float64()),
        )
        inv = pc.divide(
            pc.cast(t.column("n_triples"), pa.float64()),
            pc.cast(t.column("n_obj"), pa.float64()),
        )
        return pa.table(
            {
                "pred": t.column("pred"),
                "n_triples": t.column("n_triples"),
                "n_subj": t.column("n_subj"),
                "n_obj": t.column("n_obj"),
                "functionality": f,
                "inv_functionality": inv,
            },
            schema=out_schema,
        )

    return j2.map_batches(finish, batch_format="pyarrow")


def kg_conflict_edges(sf_dir: str, min_obj: int = 2):
    """Functional-consistency audit of the canonical edge table: every
    (pred, subj) carrying ≥ ``min_obj`` distinct objects — the
    contradiction candidates a KG governance pass routes to review when
    a predicate is expected functional (kg_relation_cardinality
    classifies which are). Emits the conflict size, total triple mass,
    and the heaviest object (``top_obj``, ties to the lexicographically
    smallest — the deterministic resolution candidate).

    Engine shape: ONE coarse-bucketed shuffle on (pred, subj)
    (shuffle.bucketed_map_groups) with a vectorized sort + run-scan per
    bucket — no per-key Ray groups, no driver state; input is the
    already-canonical edge stream so row count per group IS the
    distinct-object count. Columns: pred, subj, n_obj, w_total,
    top_obj."""
    import numpy as np

    from bioner_ray.stages.shuffle import bucketed_map_groups, pin_schema

    out_schema = pa.schema(
        [
            ("pred", pa.string()),
            ("subj", pa.string()),
            ("n_obj", pa.int64()),
            ("w_total", pa.int64()),
            ("top_obj", pa.string()),
        ]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        t = t.select(["pred", "subj", "obj", "weight"]).sort_by(
            [
                ("pred", "ascending"),
                ("subj", "ascending"),
                ("weight", "descending"),
                ("obj", "ascending"),
            ]
        )
        pred = t.column("pred").to_numpy(zero_copy_only=False)
        subj = t.column("subj").to_numpy(zero_copy_only=False)
        obj = t.column("obj").to_numpy(zero_copy_only=False)
        w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(
            np.r_[True, (pred[1:] != pred[:-1]) | (subj[1:] != subj[:-1])]
        )
        n = np.diff(np.r_[starts, len(pred)])
        w_total = np.add.reduceat(w, starts)
        keep = n >= min_obj
        return pa.table(
            {
                "pred": pa.array(pred[starts][keep], type=pa.string()),
                "subj": pa.array(subj[starts][keep], type=pa.string()),
                "n_obj": pa.array(n[keep].astype(np.int64)),
                "w_total": pa.array(w_total[keep]),
                "top_obj": pa.array(obj[starts][keep], type=pa.string()),
            },
            schema=out_schema,
        )

    return pin_schema(
        bucketed_map_groups(kg_edges(sf_dir), ["pred", "subj"], per_bucket),
        out_schema,
    )


def kg_adamic_adar(sf_dir: str, k: int = 50):
    """Adamic–Adar affinity of entity pairs over the canonical KG
    (stages/graph.py adamic_adar): common-neighbor evidence discounted
    by neighbor promiscuity, in exactly-replayable integer micro-nats —
    the link-prediction / merge-evidence ranking a KG serves for
    'entities that SHOULD be related'. ``is_edge`` flags pairs already
    adjacent (on the toy corpus's dense clique most are; at crawl scale
    the interesting rows are the is_edge = 0 ones). Columns: u, v,
    aa_micro, n_common, is_edge."""
    from bioner_ray.stages.graph import adamic_adar

    return adamic_adar(kg_edges(sf_dir), k=k)


def kg_edge_support(sf_dir: str, edges=None):
    """Per-edge triangle support + structural endpoint Jaccard over the
    KG's undirected simple graph (stages/graph.py edge_support — the
    k-truss building block and the structural entity-merge signal).
    ``edges`` lets a caller reuse an already-materialized edge table
    (the checkpoint shape — kg_publish computes edges once). Columns:
    lo, hi, support, deg_lo, deg_hi, jaccard."""
    from bioner_ray.stages.graph import edge_support

    return edge_support(kg_edges(sf_dir) if edges is None else edges)


def kg_truss_edges(sf_dir: str, k: int = 4):
    """Cohesion-pruned graph: edges with triangle support ≥ k−2 (the
    single-peel k-truss candidate set — the full truss iterates this
    filter; one pass already removes every bridge/whisker and is the
    standard community-core pre-filter). Pure distributed filter over
    ``kg_edge_support``. Columns: lo, hi, support."""

    def keep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("lo", pa.string()), ("hi", pa.string()), ("support", pa.int64())]
            ).empty_table()
        return t.select(["lo", "hi", "support"]).filter(
            pc.greater_equal(t.column("support"), k - 2)
        )

    return kg_edge_support(sf_dir).map_batches(keep, batch_format="pyarrow")


def kg_kcore(sf_dir: str, k: int = 3, max_rounds: int = 10):
    """k-core of the canonical KG (stages/graph.py kcore_nodes):
    iteratively peel nodes with undirected simple-graph degree < k —
    the entity-core extraction that separates the densely-attested
    vocabulary from crawl-noise whiskers before community/truss
    analysis. Columns: node, deg."""
    from bioner_ray.stages.graph import kcore_nodes

    return kcore_nodes(kg_edges(sf_dir), k=k, max_rounds=max_rounds)


def kg_bfs(sf_dir: str, n_seeds: int = 3, max_hops: int = 3):
    """Multi-source BFS hop distances over the canonical KG
    (stages/graph.py bfs_distances): seeds = the n_seeds
    lexicographically-smallest entities, frontier expansion for
    max_hops rounds — the k-hop entity-neighborhood query. Columns:
    node, dist."""
    from bioner_ray.stages.graph import bfs_distances

    return bfs_distances(kg_edges(sf_dir), n_seeds=n_seeds, max_hops=max_hops)


def kg_closeness(sf_dir: str, n_seeds: int = 3, max_hops: int = 3):
    """Sampled harmonic closeness over the canonical KG
    (stages/graph.py harmonic_centrality): BFS from the n_seeds
    lexicographically-smallest entities, score = Σ floor(10^6 / dist)
    over reaching seeds — the pivot estimator that ranks entities by
    how close they sit to the graph's core without an all-pairs BFS.
    Columns: node, hc_micro."""
    from bioner_ray.stages.graph import harmonic_centrality

    return harmonic_centrality(kg_edges(sf_dir), n_seeds=n_seeds, max_hops=max_hops)


def kg_sigma_paths(sf_dir: str, n_seeds: int = 3, max_hops: int = 3):
    """Shortest-path counts from the pivot seeds over the canonical KG
    (stages/graph.py shortest_path_counts — the Brandes forward pass
    as a first-class audit): σ(seed, node) spikes mark the corridor
    entities whose removal fragments the graph. Columns: seed, node,
    dist, sigma."""
    from bioner_ray.stages.graph import shortest_path_counts

    return shortest_path_counts(kg_edges(sf_dir), n_seeds=n_seeds, max_hops=max_hops)


def copurchase_betweenness(sf_dir: str, n_seeds: int = 3, max_hops: int = 3):
    """Sampled bounded-distance betweenness (stages/graph.py
    betweenness_centrality — Brandes forward σ via the shared pivot
    BFS, backward dependency fold in exact integer micro-units) over
    the part co-purchase graph: the broker parts shortest paths route
    through — the bridges between product clusters a recommender or
    assortment planner watches. Computed on this graph rather than the
    toy KG for the same reason as copurchase_assortativity: a complete
    clique has zero betweenness everywhere, the basket graph has real
    sparse structure. Columns: node, bc_micro."""
    from bioner_ray.stages.graph import betweenness_centrality

    return betweenness_centrality(
        _basket_pair_stream(sf_dir),
        n_seeds=n_seeds,
        max_hops=max_hops,
        subj_col="p1",
        obj_col="p2",
    )


def kg_hop_histogram(sf_dir: str, n_seeds: int = 3, max_hops: int = 3):
    """Neighborhood-function profile over the canonical KG
    (stages/graph.py hop_histogram): per hop distance, how many
    (seed, node) pairs the pivot BFS first reaches — the effective-
    diameter curve that tells a KG build whether its graph is
    small-world-tight or chain-shaped before it picks walk/BFS depths.
    Columns: dist, n_pairs."""
    from bioner_ray.stages.graph import hop_histogram

    return hop_histogram(kg_edges(sf_dir), n_seeds=n_seeds, max_hops=max_hops)


def kg_communities(sf_dir: str, rounds: int = 4):
    """Topic communities over the canonical KG: deterministic
    synchronous weighted label propagation (stages/graph.py
    label_propagation — argmax-neighbor-label by summed edge weight,
    ties to the lexicographically smallest label, fixed ``rounds``).
    The grouping pass between entity resolution (kg_merge_groups folds
    identical entities) and serving (communities cluster related ones).
    Columns: node, label."""
    from bioner_ray.stages.graph import label_propagation

    return label_propagation(kg_edges(sf_dir), rounds=rounds)


def kg_modularity(sf_dir: str, rounds: int = 4):
    """Community-quality decomposition of the kg_communities partition
    (stages/graph.py community_stats): per community, exact int64
    ``n_nodes``, ``degree_w`` (Σ weighted degree — the null-model mass)
    and ``intra_w`` (double-counted internal weight), from which
    modularity Q = Σ_c [intra_w/2m − (degree_w/2m)²]. The quality gate
    a KG build runs on its topic partition before serving — a
    community with intra_w ≪ degree_w²/2m is noise, not topic.
    Columns: label, n_nodes, degree_w, intra_w."""
    from bioner_ray.stages.graph import community_stats

    return community_stats(kg_edges(sf_dir), rounds=rounds)


def kg_edge_wjaccard(sf_dir: str, edges=None):
    """Per-edge WEIGHTED structural Jaccard of the endpoints' neighbor
    weight vectors (stages/graph.py edge_weighted_jaccard) — the
    merge-candidate score that, unlike set Jaccard, does not saturate
    when the graph densifies at crawl scale: a weakly-linked entity
    keeps a near-zero score even once every node pair is connected
    somewhere. Columns: lo, hi, w, min_sum, s_lo, s_hi, wjaccard."""
    from bioner_ray.stages.graph import edge_weighted_jaccard

    return edge_weighted_jaccard(kg_edges(sf_dir) if edges is None else edges)


def kg_merge_groups(
    sf_dir: str,
    min_wjaccard: float = 0.5,
    edges=None,
    driver_max_pairs: int = 2_000_000,
):
    """Structural entity resolution: nodes whose neighbor WEIGHT
    vectors overlap at weighted jaccard ≥ ``min_wjaccard`` (per
    ``kg_edge_wjaccard``) are merge candidates; connected components
    over that candidate graph are the merge groups, represented by the
    lexicographic-min member — the step that folds "PD-1"/"PD1"-style
    structural twins the surface normalizer can't see. The weighted
    score is used (not ``kg_edge_support``'s set jaccard) because set
    overlap saturates to 1.0 for every frequent pair once the graph
    densifies, folding the whole core into one group; the weighted form
    keeps weakly-linked entities out at any density. Candidates are
    ADJACENT pairs (bounded by the edge table — the partitioning
    assumption this op relies on; non-co-occurring twins need the
    embedding-side ``entity_similarity`` signal instead). Under
    ``driver_max_pairs`` the candidate pairs union-find driver-side;
    above it the DISTRIBUTED path runs: nodes hash to 63-bit ids,
    label propagation finds components
    (stages/graph.string_components → connected_components), and one
    bucketed aggregate takes the min STRING per component — identical
    output, no driver materialization. Columns: node, rep."""
    from bioner_ray.stages.graph import string_components

    pair_schema = pa.schema([("lo", pa.string()), ("hi", pa.string())])
    pairs_ds = kg_edge_wjaccard(sf_dir, edges=edges).map_batches(
        lambda t: t.select(["lo", "hi"]).filter(
            pc.greater_equal(t.column("wjaccard"), min_wjaccard)
        )
        if t.num_columns
        else pair_schema.empty_table(),
        batch_format="pyarrow",
    )
    return string_components(pairs_ds, driver_max_pairs=driver_max_pairs)


def kg_publish(
    sf_dir: str,
    min_npmi: float = 0.0,
    min_weight: int = 2,
    min_wjaccard: float = 0.75,
):
    """The end-to-end publishable graph — the full production DAG in
    one query: extract → canonical edges → PMI score → prune
    (npmi ≥ 0, weight ≥ 2) → entity-merge rewrite (every endpoint
    folded to its structural merge-group representative,
    ``kg_merge_groups`` at ``min_wjaccard``) → re-canonicalize
    (weights of now-identical edges re-sum; rewritten self-loops
    drop). The publish merge threshold is HIGHER than
    ``kg_merge_groups``' default 0.5: at 0.5 the dense
    co-occurrence core folds into ONE component, so every surviving
    core-core edge becomes a self-loop and drops — the published
    graph degenerates to the handful of edges touching nodes
    outside the core, and the rewrite step is only ever exercised
    as a total collapse. 0.75 folds only the tightest structural
    twins, leaving several distinct merge components whose rewritten
    edges genuinely re-sum (measured at sf0.001/0.01/0.1: 4/3/2
    merge components among the core; published rows 6/4/6). The rep map is bounded
    by the merge-candidate population, so it ships once via ``ray.put``
    and the rewrite is a stateless vectorized map; the re-merge is one
    ``bucketed_aggregate``. Columns: subj, obj, w."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate

    # ONE gazetteer/extraction pass: the canonical edge table is the
    # checkpoint every downstream stage (PMI, support, merge) reads
    edges = kg_edges(sf_dir).materialize()
    rep_df = kg_merge_groups(
        sf_dir, min_wjaccard=min_wjaccard, edges=edges
    ).to_pandas()
    rep_ref = ray.put(dict(zip(rep_df["node"], rep_df["rep"])))

    def rewrite(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("subj", pa.string()), ("obj", pa.string()), ("w", pa.int64())]
            ).empty_table()
        rep = ray.get(rep_ref)
        import pandas as pd

        subj = pd.Series(t.column("subj").to_pylist())
        obj = pd.Series(t.column("obj").to_pylist())
        subj = subj.map(rep).fillna(subj)
        obj = obj.map(rep).fillna(obj)
        out = pa.table(
            {
                "subj": pa.array(subj, type=pa.string()),
                "obj": pa.array(obj, type=pa.string()),
                "w": t.column("w"),
            }
        )
        return out.filter(pc.not_equal(out.column("subj"), out.column("obj")))

    import ray.data as rd

    pub_schema = pa.schema(
        [("subj", pa.string()), ("obj", pa.string()), ("w", pa.int64())]
    )
    merged = bucketed_aggregate(
        kg_edges_pruned(
            sf_dir, min_npmi=min_npmi, min_weight=min_weight, edges=edges
        ).map_batches(rewrite, batch_format="pyarrow"),
        ["subj", "obj"],
        [("w", "sum")],
    )
    # a fully-merged graph legitimately publishes ZERO edges — and
    # Ray's to_pandas drops the schema of any 0-row dataset, so hand
    # the degenerate case back as a typed empty Arrow table. The edge
    # table is the bounded output artifact, so materializing it (in
    # the object store, not the driver) costs one pass.
    from bioner_ray.stages.shuffle import pin_schema

    merged = pin_schema(merged, pub_schema).materialize()
    if merged.count() == 0:
        return pub_schema.empty_table()
    return merged


def kg_reach2(sf_dir: str):
    """2-hop out-reach per entity via exactly-mergeable KMV bottom-k
    sketches (stages/graph.py reach2_kmv — O(E·k) exchange instead of
    the quadratic edges⋈edges join; exact below k=64, deterministic
    md5-hash estimate above). Columns: node, n_synopsis, kth_hash,
    est_reach2."""
    from bioner_ray.stages.graph import reach2_kmv

    return reach2_kmv(kg_edges(sf_dir))


def kg_node_profiles(sf_dir: str):
    """Per-entity relation profile: dominant outgoing predicate (by
    weight, ties by pred), predicate diversity and total out-strength —
    the "what kind of node is this" typing signal a KG curation pass
    reads before schema induction. Shape: one (subj, pred) bucketed
    aggregate; the profile merge is a bucketed aggregate + a
    combiner-pruned per-group top-1 joined back on subj (all bounded
    by the node/pred table, never the corpus). Columns: node,
    dom_pred, dom_w, n_preds, out_w."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    sp_schema = pa.schema(
        [("subj", pa.string()), ("pred", pa.string()), ("w", pa.int64())]
    )
    sp = pin_schema(
        bucketed_aggregate(
            kg_edges(sf_dir).map_batches(
                lambda t: pa.table(
                    {
                        "subj": t.column("subj"),
                        "pred": t.column("pred"),
                        "w": pc.cast(t.column("weight"), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["subj", "pred"],
            [("w", "sum")],
        ),
        sp_schema,
    ).materialize()

    agg = pin_schema(
        bucketed_aggregate(
            with_ones(sp), ["subj"], [("one", "sum"), ("w", "sum")]
        ).map_batches(
            lambda t: pa.table(
                {
                    "subj": t.column("subj"),
                    "n_preds": t.column("one"),
                    "out_w": t.column("w"),
                }
            )
            if t.num_columns
            else t,
            batch_format="pyarrow",
        ),
        pa.schema([("subj", pa.string()), ("n_preds", pa.int64()), ("out_w", pa.int64())]),
    )

    dom = pin_schema(
        top_k_per_group(
            sp, key_col="subj", order_by=[("w", "descending"), ("pred", "ascending")], k=1
        ).map_batches(
            lambda t: pa.table(
                {
                    "subj": t.column("subj"),
                    "dom_pred": t.column("pred"),
                    "dom_w": t.column("w"),
                }
            )
            if t.num_columns
            else t,
            batch_format="pyarrow",
        ),
        pa.schema([("subj", pa.string()), ("dom_pred", pa.string()), ("dom_w", pa.int64())]),
    )

    joined = bucketed_inner_join(
        agg,
        dom,
        ["subj"],
        pa.schema([("subj", pa.string()), ("n_preds", pa.int64()), ("out_w", pa.int64())]),
        pa.schema([("subj", pa.string()), ("dom_pred", pa.string()), ("dom_w", pa.int64())]),
    )
    return joined.map_batches(
        lambda t: t.rename_columns(
            ["node" if c == "subj" else c for c in t.column_names]
        )
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )


def kg_edge_pmi(sf_dir: str, edges=None):
    """Association-strength edge scoring: PMI / normalized PMI per
    (subj, obj) over the collapsed co-occurrence counts — the edge
    re-weighting step that separates informative KG links from
    frequency artifacts (a hub pair with big raw weight can carry
    near-zero PMI). Distributed shape: marginals are two bucketed
    aggregates; attaching them is two bucketed joins; N is ONE scalar.
    The log itself is pinned to libm ``math.log`` per row (numpy's
    SIMD log differs by 1 ulp from DuckDB's ``ln``, which would break
    the exact-float oracle); the scored table is the bounded edge set,
    so the per-row loop prices in at O(edges), not O(corpus). Columns:
    subj, obj, w, n_subj, n_obj, pmi, npmi."""
    import math

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    pair_schema = pa.schema(
        [("subj", pa.string()), ("obj", pa.string()), ("w", pa.int64())]
    )

    def to_pair(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": t.column("subj"),
                "obj": t.column("obj"),
                "w": pc.cast(t.column("weight"), pa.int64()),
            }
        )

    pairs = pin_schema(
        bucketed_aggregate(
            (kg_edges(sf_dir) if edges is None else edges).map_batches(
                to_pair, batch_format="pyarrow"
            ),
            ["subj", "obj"],
            [("w", "sum")],
        ),
        pair_schema,
    ).materialize()
    n_total = pairs.sum("w")

    def marginal(key: str, out: str):
        return pin_schema(
            bucketed_aggregate(
                pairs.map_batches(
                    lambda t, key=key, out=out: pa.table(
                        {key: t.column(key), out: t.column("w")}
                    ),
                    batch_format="pyarrow",
                ),
                [key],
                [(out, "sum")],
            ),
            pa.schema([(key, pa.string()), (out, pa.int64())]),
        )

    j1 = bucketed_inner_join(
        pairs,
        marginal("subj", "n_subj"),
        ["subj"],
        pair_schema,
        pa.schema([("subj", pa.string()), ("n_subj", pa.int64())]),
    )
    j1_schema = pair_schema.append(pa.field("n_subj", pa.int64()))
    j2 = bucketed_inner_join(
        j1,
        marginal("obj", "n_obj"),
        ["obj"],
        j1_schema,
        pa.schema([("obj", pa.string()), ("n_obj", pa.int64())]),
    )

    out_schema = j1_schema.append(pa.field("n_obj", pa.int64())).append(
        pa.field("pmi", pa.float64())
    ).append(pa.field("npmi", pa.float64()))

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        w = t.column("w").to_pylist()
        na = t.column("n_subj").to_pylist()
        nb = t.column("n_obj").to_pylist()
        N = float(n_total)
        pmi, npmi = [], []
        for wi, ai, bi in zip(w, na, nb):
            p = math.log((float(wi) * N) / (float(ai) * float(bi)))
            pmi.append(p)
            # w == N ⇒ -ln(w/N) = 0 (one edge carries all the weight,
            # e.g. a single-edge graph): pin NPMI to 1.0, mirrored in
            # the DuckDB twin, instead of ZeroDivisionError.
            npmi.append(1.0 if float(wi) == N else p / (-math.log(float(wi) / N)))
        return t.append_column("pmi", pa.array(pmi, type=pa.float64())).append_column(
            "npmi", pa.array(npmi, type=pa.float64())
        )

    return j2.map_batches(score, batch_format="pyarrow")


def kg_edge_delta(sf_dir: str):
    """Incremental KG maintenance: diff the canonical edge table built
    from the even-doc_id snapshot ("yesterday's crawl") against the
    full corpus, reporting edges whose weight changed — the update set
    a production KG would apply instead of rebuilding. Join-free: both
    edge tables are tagged (w_a / w_b), unioned, and merged by ONE
    ``bucketed_aggregate`` on (subj, pred, obj); the ≠ filter and
    status tagging run distributed, so only the bounded delta ever
    leaves the workers. Columns: subj, pred, obj, w_a, w_b, status
    (added / removed / changed)."""
    from bioner_ray.stages.shuffle import bucketed_aggregate

    def tag(a_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            w = pc.cast(t.column("weight"), pa.int64())
            zeros = pa.array(np.zeros(t.num_rows, dtype=np.int64))
            return pa.table(
                {
                    "subj": t.column("subj"),
                    "pred": t.column("pred"),
                    "obj": t.column("obj"),
                    "w_a": w if a_side else zeros,
                    "w_b": zeros if a_side else w,
                }
            )

        return fn

    # The two snapshot pipelines run SEQUENTIALLY, each materializing
    # its bounded edge table (edges, never the corpus) — running them
    # in one execution would put 4 fixed actor pools on the cluster at
    # once and starve the task-pool stages on small clusters. This is
    # also the checkpoint shape: in production snapshot A's edge table
    # is yesterday's persisted output, not recomputed.
    a = kg_edges(sf_dir, doc_parity=0).map_batches(tag(True), batch_format="pyarrow").materialize()
    b = kg_edges(sf_dir).map_batches(tag(False), batch_format="pyarrow").materialize()
    merged = bucketed_aggregate(
        a.union(b), ["subj", "pred", "obj"], [("w_a", "sum"), ("w_b", "sum")]
    )

    delta_schema = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("w_a", pa.int64()),
            ("w_b", pa.int64()),
            ("status", pa.string()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # schema-less empty reduce partition
            return delta_schema.empty_table()
        t = t.filter(pc.not_equal(t.column("w_a"), t.column("w_b")))
        status = pc.if_else(
            pc.equal(t.column("w_a"), 0),
            pa.scalar("added"),
            pc.if_else(
                pc.equal(t.column("w_b"), 0), pa.scalar("removed"), pa.scalar("changed")
            ),
        )
        return t.append_column("status", status)

    return merged.map_batches(finish, batch_format="pyarrow")


def alias_groups(sf_dir: str, min_variants: int = 2):
    """Entity-canonicalization surface merge: map every (transformed)
    token to a normalized alias key (lowercase, letters only) and
    report keys backed by ≥ ``min_variants`` distinct surface forms —
    the "PD-1 / PD1 / pd-1 → one node" step a KG build runs between
    linking and canonicalization. The pos%4 case/digit/punct transform
    (same contract as ``surface_stats``) makes the testdata's
    all-lowercase lexicon produce real multi-surface groups.

    Fully vectorized: whitespace split, position recovery from list
    offsets, case transform, regex strip and lowercasing are all Arrow
    kernels; no per-token Python. The merge is two bucketed aggregates
    — (alias, surface) counts, then per-alias variant/occurrence sums —
    and the ≥2-variant filter runs distributed, so only the bounded
    multi-surface group table ever leaves the workers. Columns: alias,
    n_variants, n_occurrences.
    """
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = split.values.slice(off[0], off[-1] - off[0])
        lengths = np.diff(off)
        # 1-based token position within each doc (empties consume one)
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(off[:-1] - off[0], lengths) + 1
        pm = pos % 4
        upper = pc.utf8_upper(vals)
        with7 = pc.binary_join_element_wise(vals, "7", "")
        withdot = pc.binary_join_element_wise(vals, ".", "")
        t = pc.if_else(pa.array(pm == 0), upper, vals)
        t = pc.if_else(pa.array(pm == 1), with7, t)
        t = pc.if_else(pa.array(pm == 2), withdot, t)
        alias = pc.utf8_lower(pc.replace_substring_regex(t, "[^a-zA-Z]", ""))
        keep = pc.and_(pc.not_equal(vals, ""), pc.not_equal(alias, ""))
        out = pa.table({"alias": alias, "surface": t}).filter(keep)
        return out.append_column(
            "cnt", pa.array(np.ones(out.num_rows, dtype=np.int64))
        )

    per_surface = bucketed_aggregate(
        _read(sf_dir, "documents", columns=["text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["alias", "surface"],
        [("cnt", "sum")],
    )
    merged = bucketed_aggregate(
        with_ones(per_surface),
        ["alias"],
        [("one", "sum"), ("cnt", "sum")],
    ).map_batches(
        lambda t: pa.table(
            {
                "alias": t.column("alias"),
                "n_variants": t.column("one"),
                "n_occurrences": t.column("cnt"),
            }
        ).filter(pc.greater_equal(t.column("one"), min_variants)),
        batch_format="pyarrow",
    )
    return merged


def _global_top_k(counts_ds, order_by, k: int):
    """Combiner-pruned GLOBAL top-K collect: every block keeps its own
    local top-K before the single-bucket reduce, so ≤ K rows leave each
    block and the driver sees ≤ K rows total — never the full table.
    Returns a pandas frame of the kept rows (the model-broadcast step
    of every capped-LM build)."""
    from bioner_ray.stages.rank import top_k_per_group

    def grp(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    df = top_k_per_group(
        counts_ds.map_batches(grp, batch_format="pyarrow"),
        key_col="_g",
        order_by=order_by,
        k=k,
    ).to_pandas()
    if df.shape[1] == 0:
        # empty-corpus edge: Ray drops column names when every block is
        # empty — rebuild the (value, count) frame from the order spec
        import pandas as pd

        df = pd.DataFrame({c: [] for c, _ in order_by})
    return df


def doc_logprob(sf_dir: str, max_vocab: int | None = 262144):
    """Unigram-surprise document scoring — the perplexity-filter
    stand-in (CCNet-style: rank documents by how improbable their
    tokens are under a corpus LM; here an add-one-smoothed unigram
    model built from the corpus itself). Two passes:

    1. global token counts (ONE ``bucketed_aggregate`` over the
       vectorized ``token_count_partial`` combiner); the model table
       collects driver-side to build the log-prob lookup — the
       model-broadcast step. ``max_vocab`` (DEFAULT: the web-scale
       mode, the standard KenLM/CCNet shape) keeps the top-K words by
       (count desc, word) — filtered DISTRIBUTED before the collect,
       so the driver only ever sees ≤ K rows — and every other token
       scores as ONE shared OOV bucket carrying the REMAINING total
       count (add-one over kept-words + the OOV class). ``None`` is
       the explicit small-corpus escape hatch that collects the full
       vocabulary.
    2. per-document score: tokens are flattened vectorized (same
       split/offset kernel as ``alias_groups``), mapped through the
       broadcast lookup, and segment-summed — no shuffle at all.

    Exactness: each token's log-prob is quantized ONCE to integer
    micro-nats (``floor(ln(p)·1e6)``, libm log — numpy's differs by
    1 ulp from DuckDB's), so the per-document sums are integer and
    order-independent: bit-equal under any distribution. Documents
    with zero tokens emit no row (matching the SQL inner join).
    Columns: doc_id, n_tokens, logprob_micro."""
    import math

    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate
    from bioner_ray.stages.textstats import token_count_partial

    counts = bucketed_aggregate(
        _read(sf_dir, "documents", columns=["text"]).map_batches(
            token_count_partial, batch_format="pyarrow"
        ),
        ["word"],
        [("cnt", "sum")],
    )
    if max_vocab is None:
        vocab = counts.to_pandas()
        n_total = float(vocab["cnt"].sum())
        denom = n_total + float(len(vocab))
        lp = {
            w: math.floor(math.log((float(c) + 1.0) / denom) * 1000000.0)
            for w, c in zip(vocab["word"], vocab["cnt"])
        }
        oov_lp = 0  # unreachable: the model covers its own corpus
    else:
        from bioner_ray.stages.shuffle import pin_schema

        counts = pin_schema(
            counts, pa.schema([("word", pa.string()), ("cnt", pa.int64())])
        ).materialize()
        n_total = float(counts.sum("cnt") or 0)
        vocab = _global_top_k(
            counts, [("cnt", "descending"), ("word", "ascending")], max_vocab
        )
        kept_total = float(vocab["cnt"].sum())
        # classes = kept words + ONE shared OOV bucket (add-one over all)
        denom = n_total + float(len(vocab)) + 1.0
        lp = {
            w: math.floor(math.log((float(c) + 1.0) / denom) * 1000000.0)
            for w, c in zip(vocab["word"], vocab["cnt"])
        }
        oov_lp = math.floor(
            math.log((n_total - kept_total + 1.0) / denom) * 1000000.0
        )
    lp_ref = ray.put(lp)

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        table = ray.get(lp_ref)
        text = pc.fill_null(batch.column("text"), "")
        split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = split.values.slice(off[0], off[-1] - off[0])
        starts, ends = off[:-1] - off[0], off[1:] - off[0]
        toks = pd.Series(vals.to_pylist())
        keep = (toks != "").to_numpy()
        tok_lp = toks.map(table).fillna(oov_lp).to_numpy(dtype=np.int64) * keep
        cs_lp = np.concatenate([[0], np.cumsum(tok_lp)])
        cs_n = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        n_tok = cs_n[ends] - cs_n[starts]
        lp_sum = cs_lp[ends] - cs_lp[starts]
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok),
                "logprob_micro": pa.array(lp_sum),
            }
        )
        return out.filter(pc.greater(out.column("n_tokens"), 0))

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def weekly_active_users(sf_dir: str):
    """Rolling 7-day distinct users per event day (WAU) — the
    engagement metric that needs DISTINCT over a sliding window, which
    no windowed aggregate gives directly. Exact distributed plan:

    1. (day, user) dedup — ONE bucketed aggregate (the
       distinct_users_per_type two-level-dedup shape);
    2. calendar replication: each (day, user) row fans out to the ≤ 7
       window days it can serve, filtered to days that actually occur
       (the bounded day list is broadcast — calendar-sized, never
       data-sized); replication factor ≤ 7 is the price of exactness;
    3. (window, user) dedup + per-window count — two more bucketed
       aggregates. Nothing user×day-shaped is ever collected.

    Columns: day (DATE), wau."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32()).cast(
            pa.int64()
        )
        return pa.table({"day": day, "user_id": t.column("user_id")})

    ev = _read(sf_dir, "events", columns=["ts", "user_id"]).map_batches(
        prep, batch_format="pyarrow"
    )
    du_schema = pa.schema([("day", pa.int64()), ("user_id", pa.int64())])
    du = pin_schema(
        bucketed_aggregate(
            with_ones(ev), ["day", "user_id"], [("one", "min")], num_buckets=64
        ),
        pa.schema(list(du_schema) + [pa.field("one", pa.int64())]),
    ).materialize()

    day_rows = pin_schema(
        bucketed_aggregate(
            du.map_batches(
                lambda t: pa.table({"day": t.column("day"), "one": t.column("one")}),
                batch_format="pyarrow",
            ),
            ["day"],
            [("one", "min")],
            num_buckets=8,
        ),
        pa.schema([("day", pa.int64()), ("one", pa.int64())]),
    ).take_all()
    days = np.array(sorted(int(r["day"]) for r in day_rows), dtype=np.int64)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return du_schema.empty_table().rename_columns(["win", "user_id"])
        d = t.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        win = np.repeat(d, 7) + np.tile(np.arange(7, dtype=np.int64), len(d))
        uu = np.repeat(u, 7)
        keep = np.isin(win, days)
        return pa.table(
            {
                "win": pa.array(win[keep]),
                "user_id": pa.array(uu[keep]),
            }
        )

    win_users = pin_schema(
        bucketed_aggregate(
            with_ones(du.map_batches(explode, batch_format="pyarrow")),
            ["win", "user_id"],
            [("one", "min")],
            num_buckets=64,
        ),
        pa.schema(
            [("win", pa.int64()), ("user_id", pa.int64()), ("one", pa.int64())]
        ),
    )
    counts = pin_schema(
        bucketed_aggregate(
            win_users.map_batches(
                lambda t: pa.table({"win": t.column("win"), "wau": t.column("one")}),
                batch_format="pyarrow",
            ),
            ["win"],
            [("wau", "sum")],
            num_buckets=8,
        ),
        pa.schema([("win", pa.int64()), ("wau", pa.int64())]),
    )
    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.cast(
                    t.column("win").cast(pa.int32()), pa.date32()
                ),
                "wau": t.column("wau"),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow")


def _bigram_micro_score_ds(
    sf_dir: str,
    lp: dict,
    fallback: dict,
    out_col: str,
    fallback2: dict | None = None,
    fallback_default: int | None = None,
    fallback2_default: int | None = None,
    score_parity: int | None = None,
):
    """Streaming bigram score pass shared by the add-one and Kneser-Ney
    LMs: the within-doc bigram stream is built vectorized from the
    split offsets (consecutive filtered tokens, no cross-doc pairs),
    mapped through the broadcast micro-nat lookup, and segment-summed
    in int64 — order-independent, bit-equal under any partitioning.

    Absent-bigram handling (the capped-LM backoff): micro =
    ``fallback[w1]`` (→ ``fallback_default`` when w1 is itself outside
    the capped model), PLUS — when ``fallback2`` is given — the
    continuation component ``fallback2[w2]`` (→ ``fallback2_default``).
    Each component is pre-floored to integer micro-nats by the model
    builder, so the two-component sum is exact integer arithmetic the
    SQL twin replays verbatim. Pass ``{}``/None when the model is
    trained on the corpus it scores, so every bigram is present.
    Docs with < 2 tokens emit no row (matching the SQL GROUP BY)."""
    import ray

    SEP = "\x1f"
    lp_ref = ray.put(lp)
    fb_ref = ray.put(fallback)
    fb2_ref = ray.put(fallback2)

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if score_parity is not None:
            batch = batch.filter(
                pc.equal(
                    pc.bit_wise_and(
                        pc.cast(batch.column("doc_id"), pa.int64()), 1
                    ),
                    score_parity,
                )
            )
        table, fb = ray.get(lp_ref), ray.get(fb_ref)
        fb2 = ray.get(fb2_ref)
        text = pc.fill_null(batch.column("text"), "")
        split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(off) - 1
        doc_out = batch.column("doc_id")
        vals = pd.Series(split.values.slice(off[0], off[-1] - off[0]).to_pylist())
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(off))
        keep = (vals != "").to_numpy()
        toks = vals[keep].reset_index(drop=True)
        d = doc_idx[keep]
        if len(toks) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=doc_out.type),
                    "n_bigrams": pa.array([], type=pa.int64()),
                    out_col: pa.array([], type=pa.int64()),
                }
            )
        same = np.r_[d[1:] == d[:-1], False]
        keys = toks + SEP + toks.shift(-1).fillna("")
        kl = pd.Series(keys.to_numpy()[same])
        w1 = pd.Series(toks.to_numpy()[same])
        micro = kl.map(table)
        if fb or fallback_default is not None:
            fb_part = w1.map(fb) if fb else pd.Series(np.nan, index=w1.index)
            if fallback_default is not None:
                fb_part = fb_part.fillna(fallback_default)
            if fb2 is not None:
                w2 = pd.Series(toks.shift(-1).to_numpy()[same])
                fb2_part = w2.map(fb2) if fb2 else pd.Series(np.nan, index=w2.index)
                if fallback2_default is not None:
                    fb2_part = fb2_part.fillna(fallback2_default)
                fb_part = fb_part + fb2_part
            micro = micro.fillna(fb_part)
        if micro.isna().any():
            # contract violation, not a cast crash (ADVICE r3): a
            # scored bigram is absent from the broadcast model and no
            # fallback covers its w1 — only possible when a caller
            # passes a FOREIGN model with an empty/partial fallback
            missing = kl[micro.isna()].iloc[0].replace(SEP, " ")
            raise ValueError(
                f"bigram {missing!r} missing from the broadcast LM and "
                "no fallback entry for its first word — "
                "_bigram_micro_score_ds requires a model trained on "
                "the scored corpus, or a total fallback table"
            )
        micro = micro.to_numpy(dtype=np.int64)
        dd = d[same]
        sums = np.zeros(n_docs, dtype=np.int64)
        cnts = np.zeros(n_docs, dtype=np.int64)
        np.add.at(sums, dd, micro)
        np.add.at(cnts, dd, 1)
        nz = cnts > 0
        return pa.table(
            {
                "doc_id": pa.array(
                    doc_out.to_numpy(zero_copy_only=False)[nz]
                ).cast(doc_out.type),
                "n_bigrams": pa.array(cnts[nz]),
                out_col: pa.array(sums[nz]),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def doc_bigram_logprob(
    sf_dir: str,
    max_bigrams: int | None = 1048576,
    max_vocab: int | None = 262144,
    train_parity: int | None = None,
):
    """Bigram-LM document scoring — the doc_logprob upgrade from
    unigram surprise to conditional add-one bigram probability
    ``P(w2|w1) = (C12 + 1) / (C1 + V)``: the standard KenLM-shaped
    perplexity-filter signal, with the exact-replay contract.

    Model build (pass 1): bigram + unigram count tables — two bucketed
    aggregates over the vectorized ``bigram_count_partial`` /
    ``token_count_partial`` combiners. BOTH tables are capped by
    DEFAULT (the web-scale mode — at 100 TB the bigram type count is
    10⁹⁺): a combiner-pruned distributed top-K by (count desc, key)
    runs BEFORE the driver collect, so the driver only ever sees
    ≤ max_bigrams + max_vocab rows. The capped unigram model is
    doc_logprob's shape exactly — kept words + ONE shared OOV context
    bucket carrying the remaining count mass, V = kept + 1 classes —
    and a bigram pruned from (or absent from) the kept table scores
    as the add-one miss ``ln(1/(C1'+V))`` where C1' is the kept count
    of w1, or the OOV bucket's mass when w1 itself was pruned.
    ``None`` on either cap is the explicit small-corpus escape hatch
    (full-table collect, V = vocab size, no OOV class).

    Pass 2: the shared streaming score pass — within-doc bigram stream
    built vectorized from the split offsets (consecutive FILTERED
    tokens, no cross-doc pairs), mapped through the broadcast dicts,
    segment-summed in integer micro-nats (``floor(ln(p)·1e6)``, libm
    log) — order-independent, bit-equal under any partitioning. Docs
    with < 2 tokens emit no row (matching the SQL GROUP BY).
    Columns: doc_id, n_bigrams, logprob_micro."""
    import math

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import (
        BIGRAM_SEP as SEP,
        bigram_count_partial,
        token_count_partial,
    )

    if train_parity is None:
        docs = _read(sf_dir, "documents", columns=["text"])
    else:
        # held-out deployment shape (the docstring's web-scale mode):
        # train the LM on one doc_id parity, score ONLY the other —
        # every scored doc is out-of-sample, so the miss/backoff paths
        # carry real traffic. Requires the capped model (the fallback
        # machinery); the uncapped escape hatch has no OOV class.
        if max_bigrams is None or max_vocab is None:
            raise ValueError(
                "train_parity requires the capped model (max_bigrams "
                "and max_vocab set): an uncapped model has no OOV class "
                "to score out-of-sample tokens"
            )
        docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            lambda t: t.filter(
                pc.equal(
                    pc.bit_wise_and(pc.cast(t.column("doc_id"), pa.int64()), 1),
                    train_parity,
                )
            ),
            batch_format="pyarrow",
        )
    bg_counts = bucketed_aggregate(
        docs.map_batches(bigram_count_partial, batch_format="pyarrow"),
        ["bg"],
        [("cnt", "sum")],
    )
    uni_counts = bucketed_aggregate(
        docs.map_batches(token_count_partial, batch_format="pyarrow"),
        ["word"],
        [("cnt", "sum")],
    )
    if max_vocab is None:
        uni = uni_counts.to_pandas()
        v = float(len(uni))
        c1_map = dict(zip(uni["word"], (float(c) for c in uni["cnt"])))
        c1_oov = None
    else:
        uni_counts = pin_schema(
            uni_counts, pa.schema([("word", pa.string()), ("cnt", pa.int64())])
        ).materialize()
        n_uni_total = float(uni_counts.sum("cnt") or 0)
        uni = _global_top_k(
            uni_counts, [("cnt", "descending"), ("word", "ascending")], max_vocab
        )
        v = float(len(uni)) + 1.0
        c1_map = dict(zip(uni["word"], (float(c) for c in uni["cnt"])))
        c1_oov = n_uni_total - float(uni["cnt"].sum())
    if max_bigrams is None:
        bg = bg_counts.to_pandas()
    else:
        bg_counts = pin_schema(
            bg_counts, pa.schema([("bg", pa.string()), ("cnt", pa.int64())])
        ).materialize()
        bg = _global_top_k(
            bg_counts, [("cnt", "descending"), ("bg", "ascending")], max_bigrams
        )
    lp = {}
    for key, c12 in zip(bg["bg"], bg["cnt"]):
        w1 = key.split(SEP, 1)[0]
        c1p = c1_map[w1] if c1_oov is None else c1_map.get(w1, c1_oov)
        lp[key] = math.floor(
            math.log((float(c12) + 1.0) / (c1p + v)) * 1000000.0
        )
    fb = {
        w: math.floor(math.log(1.0 / (c + v)) * 1000000.0)
        for w, c in c1_map.items()
    }
    fb_default = (
        None
        if c1_oov is None
        else math.floor(math.log(1.0 / (c1_oov + v)) * 1000000.0)
    )
    return _bigram_micro_score_ds(
        sf_dir,
        lp,
        fb,
        "logprob_micro",
        fallback_default=fb_default,
        score_parity=None if train_parity is None else 1 - train_parity,
    )


def doc_kn_logprob(
    sf_dir: str,
    max_bigrams: int | None = 1048576,
    train_parity: int | None = None,
):
    """Interpolated Kneser-Ney bigram scoring (absolute discount
    d = 0.75) — the CCNet/KenLM-grade perplexity-filter signal one
    rung above doc_bigram_logprob's add-one smoothing:

        P(w2|w1) = (max(c12 − d, 0) + d · N1+(w1·) · Pcont(w2)) / c1(w1)
        Pcont(w2) = N1+(·w2) / |distinct bigram types|

    where c1(w1) is w1's left-context bigram total and N1+ are the
    forward/backward continuation type counts — ALL derived from the
    KEPT bigram table. ``max_bigrams`` (DEFAULT: the web-scale mode)
    caps that table at the top-K bigram types by (count desc, key) via
    a combiner-pruned distributed top-K BEFORE the driver collect —
    the driver only ever sees ≤ K rows, never the 10⁹⁺-type corpus
    bigram vocabulary. A scored bigram pruned from the kept table
    backs off to its two KN components with c12 = 0, each pre-floored
    to micro-nats so the sum is exact integer arithmetic:

        micro = floor(ln(d·N1+(w1·)/c1(w1))·1e6)   [w1 unseen → ln(d)]
              + floor(ln(Pcont(w2))·1e6)           [w2 unseen → ln(1/T)]

    (the unseen-side floors model a unit-count context / singleton
    continuation class — deterministic, mirrored in the SQL twin).
    ``None`` is the explicit small-corpus escape hatch: full-table
    collect, model covers its own corpus, no backoff branch. Engine
    shape: ONE bigram-count shuffle (vectorized per-block
    ``bigram_count_partial`` combiners → bucketed aggregate) over one
    corpus read; continuation stats from the bounded kept table
    driver-side, pinned to libm ``math.log`` micro-nats — DuckDB's
    ``ln`` replays them bit-exactly, numpy's SIMD log does not — and
    broadcast once; then the shared streaming score pass.
    Columns: doc_id, n_bigrams, kn_logprob_micro."""
    import math

    import pandas as pd

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import BIGRAM_SEP as SEP, bigram_count_partial

    if train_parity is None:
        docs = _read(sf_dir, "documents", columns=["text"])
    else:
        # held-out deployment shape (see doc_bigram_logprob): train on
        # one doc_id parity, score only the other — the two-component
        # KN backoff carries real out-of-sample traffic
        if max_bigrams is None:
            raise ValueError(
                "train_parity requires the capped model (max_bigrams "
                "set): the uncapped path has no backoff for unseen "
                "bigrams"
            )
        docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            lambda t: t.filter(
                pc.equal(
                    pc.bit_wise_and(pc.cast(t.column("doc_id"), pa.int64()), 1),
                    train_parity,
                )
            ),
            batch_format="pyarrow",
        )
    bg_counts = bucketed_aggregate(
        docs.map_batches(bigram_count_partial, batch_format="pyarrow"),
        ["bg"],
        [("cnt", "sum")],
    )
    if max_bigrams is None:
        bg = bg_counts.to_pandas()
    else:
        bg_counts = pin_schema(
            bg_counts, pa.schema([("bg", pa.string()), ("cnt", pa.int64())])
        ).materialize()
        bg = _global_top_k(
            bg_counts, [("cnt", "descending"), ("bg", "ascending")], max_bigrams
        )
    if bg.empty:
        # degenerate corpus (every doc < 2 tokens): no bigram model can
        # exist; pin the empty output schema (ADVICE r3 — the split
        # below would yield a zero-column frame and KeyError, and T=0
        # would divide by zero; the twin returns empty here too)
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_bigrams", pa.int64()),
                    ("kn_logprob_micro", pa.int64()),
                ]
            ).empty_table()
        )
    ks = bg["bg"].str.split(SEP, n=1, expand=True)
    df = pd.DataFrame({"w1": ks[0], "w2": ks[1], "c12": bg["cnt"].astype("int64")})
    g1 = df.groupby("w1")["c12"].agg(["sum", "size"])
    g2 = df.groupby("w2")["c12"].size()
    T = float(len(df))
    c1 = df["w1"].map(g1["sum"]).to_numpy(dtype=np.float64)
    nf = df["w1"].map(g1["size"]).to_numpy(dtype=np.float64)
    nb = df["w2"].map(g2).to_numpy(dtype=np.float64)
    c12 = df["c12"].to_numpy(dtype=np.float64)
    # element-wise float composition mirrors the SQL twin term order:
    # (greatest(c12 - d, 0) + d*nf*(nb/t)) / c1 — then libm log
    p = (np.maximum(c12 - 0.75, 0.0) + 0.75 * nf * (nb / T)) / c1
    lp = {
        k: math.floor(math.log(x) * 1000000.0)
        for k, x in zip(bg["bg"].tolist(), p.tolist())
    }
    if max_bigrams is None:
        return _bigram_micro_score_ds(sf_dir, lp, {}, "kn_logprob_micro")
    # capped mode: two-component KN backoff for pruned bigrams — each
    # component floored independently (the SQL twin sums the same two
    # floors), keyed by the kept table's per-side stats
    fb1 = {
        w: math.floor(math.log(0.75 * float(nf_w) / float(c1_w)) * 1000000.0)
        for w, c1_w, nf_w in zip(g1.index, g1["sum"], g1["size"])
    }
    fb2 = {
        w: math.floor(math.log(float(nb_w) / T) * 1000000.0)
        for w, nb_w in zip(g2.index, g2)
    }
    return _bigram_micro_score_ds(
        sf_dir,
        lp,
        fb1,
        "kn_logprob_micro",
        fallback2=fb2,
        fallback_default=math.floor(math.log(0.75) * 1000000.0),
        fallback2_default=math.floor(math.log(1.0 / T) * 1000000.0),
        score_parity=None if train_parity is None else 1 - train_parity,
    )


def word_count(sf_dir: str, min_count: int = 10):
    """G1→G3 vocabulary pipeline on real text: per-block partial counts
    (combiner) → groupby sum → min-frequency filter → pinned-total-order
    rank (-count, word — the deterministic fix for the reference's
    insertion-order ties, ngram_encoder.py:102-107). Columns: word, cnt,
    rank. The surviving vocab is bounded (reference LookupCache is
    in-memory too), so ranking collects it driver-side."""
    from bioner_ray.stages.textstats import token_count_partial as partial

    from bioner_ray.stages.shuffle import bucketed_aggregate

    # Exact high-cardinality merge (the G1/G2 path of stages/vocab.py):
    # bucketed Arrow group_by for the wide merge, then the min-frequency
    # filter runs DISTRIBUTED so only the small survivor vocabulary is
    # ever collected — the pre-filter vocabulary (10^8+ rows at web
    # scale) never reaches the driver.
    counts = bucketed_aggregate(
        _read(sf_dir, "documents", columns=["text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["word"],
        [("cnt", "sum")],
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)),
        batch_format="pyarrow",
    )
    tbl = pa.Table.from_pandas(counts.to_pandas(), preserve_index=False)
    order = pc.sort_indices(
        tbl, sort_keys=[("cnt", "descending"), ("word", "ascending")]
    )
    tbl = tbl.take(order)
    return tbl.append_column(
        "rank", pa.array(np.arange(1, tbl.num_rows + 1, dtype=np.int64))
    )


def doc_split(sf_dir: str):
    """J1/S7 broadcast semi-join: route each document to
    train/val/test by ``source`` membership (tiny id lists shipped once
    via ray.put; unknown source raises, like
    medmentions_conll_converter.py:64-66). Columns: doc_id, split."""
    import ray

    split_map = {s: "train" for s in TRAIN_SOURCES}
    split_map.update({s: "val" for s in VAL_SOURCES})
    split_map.update({s: "test" for s in TEST_SOURCES})
    map_ref = ray.put(split_map)

    def route(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        splits = []
        for s in batch.column("source").to_pylist():
            if s not in m:
                raise ValueError(f"unknown source: {s!r}")
            splits.append(m[s])
        return pa.table(
            {"doc_id": batch.column("doc_id"), "split": pa.array(splits, type=pa.string())}
        )

    return _read(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
        route, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# relational pipelines over the TPC-H-ish tables (G/J/O coverage)
# ---------------------------------------------------------------------------


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    # half_towards_infinity == DuckDB round()'s half-away-from-zero, so
    # exact-.5 cents round identically in engine and oracle
    return pc.cast(
        pc.round(pc.multiply(pc.cast(col, pa.float64()), 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped partial+final aggregate over lineitem: per-block
    Arrow group_by combiner, then the small groupby sum. Columns:
    l_returnflag, l_linestatus, n_rows, sum_qty_cents, sum_price_cents,
    sum_disc_price_cents."""

    def partial(batch: pa.Table) -> pa.Table:
        price = pc.cast(batch.column("l_extendedprice"), pa.float64())
        disc = pc.cast(batch.column("l_discount"), pa.float64())
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "n_rows": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "sum_qty_cents": _cents(batch.column("l_quantity")),
                "sum_price_cents": _cents(batch.column("l_extendedprice")),
                "sum_disc_price_cents": pc.cast(
                    pc.round(pc.multiply(disc_price, 100.0), round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("n_rows", "sum"), ("sum_qty_cents", "sum"), ("sum_price_cents", "sum"),
             ("sum_disc_price_cents", "sum")]
        ).rename_columns(
            ["l_returnflag", "l_linestatus", "n_rows", "sum_qty_cents", "sum_price_cents",
             "sum_disc_price_cents"]
        )

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    from bioner_ray.stages.shuffle import bucketed_aggregate

    return bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("n_rows", "sum"), ("sum_qty_cents", "sum"), ("sum_price_cents", "sum"),
         ("sum_disc_price_cents", "sum")],
    )


def top_orders(sf_dir: str, k: int = 10):
    """O1 sort/limit top-k. Columns: o_orderkey, total_cents."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "total_cents": _cents(batch.column("o_totalprice")),
            }
        )

    return top.map_batches(fmt, batch_format="pyarrow")


def customers_per_nation(sf_dir: str):
    """Broadcast join (small side via ray.put) + count. Columns:
    n_name, n_customers, sum_acctbal_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    lookup_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def attach(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        names = [lookup[k] for k in batch.column("c_nationkey").to_pylist()]
        return pa.table(
            {
                "n_name": pa.array(names, type=pa.string()),
                "acctbal_cents": _cents(batch.column("c_acctbal")),
            }
        )

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    out = bucketed_aggregate(
        with_ones(ds.map_batches(attach, batch_format="pyarrow"), "n_customers"),
        ["n_name"],
        [("n_customers", "sum"), ("acctbal_cents", "sum")],
    )
    return out.rename_columns({"acctbal_cents": "sum_acctbal_cents"})


def revenue_by_segment(sf_dir: str):
    """Shuffle hash join orders⋈customer (both sides large at scale) +
    final aggregate — the deliberate shuffle-join counterpart to
    customers_per_nation's broadcast join, on the engine's bucketed
    join (task-based, no aggregator actor pool to reserve cores or
    crash on empty hash partitions). Columns: c_mktsegment, n_orders,
    revenue_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "revenue_cents_row": _cents(batch.column("o_totalprice")),
            }
        )

    from bioner_ray.stages.shuffle import bucketed_inner_join

    orders = orders.map_batches(prep, batch_format="pyarrow")
    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]), batch_format="pyarrow"
    )
    joined = bucketed_inner_join(
        orders,
        customer,
        ["o_custkey"],
        pa.schema([("o_custkey", pa.int64()), ("revenue_cents_row", pa.int64())]),
        pa.schema([("o_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
    )
    keyed = joined.map_batches(
        lambda t: t.select(["c_mktsegment", "revenue_cents_row"]), batch_format="pyarrow"
    )
    out = bucketed_aggregate(
        with_ones(keyed, "n_orders"),
        ["c_mktsegment"],
        [("n_orders", "sum"), ("revenue_cents_row", "sum")],
    )
    return out.rename_columns({"revenue_cents_row": "revenue_cents"})


def order_priority(sf_dir: str):
    """TPC-H Q4 shape: priority counts over orders having at least one
    returned lineitem — the EXISTS semi-join expressed as the engine's
    bucketed ``left semi`` join (right side deduped inside each bucket,
    so duplicate lineitems never fan out). Columns: o_orderpriority,
    n_orders."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, with_ones

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    returned = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("l_returnflag"), "R")).select(
                ["l_orderkey"]
            ).rename_columns(["o_orderkey"]),
            batch_format="pyarrow",
        )
    )
    matched = bucketed_inner_join(
        orders,
        returned,
        ["o_orderkey"],
        pa.schema([("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]),
        pa.schema([("o_orderkey", pa.int64())]),
        join_type="left semi",
    )
    keyed = matched.map_batches(
        lambda t: t.select(["o_orderpriority"]), batch_format="pyarrow"
    )
    return bucketed_aggregate(
        with_ones(keyed, "n_orders"), ["o_orderpriority"], [("n_orders", "sum")]
    )


def events_cum_value(sf_dir: str):
    """Per-user running value total — the lifetime-spend-so-far column
    attached to every event (stages/window.py grouped_running_sum):
    ONE user-bucketed exchange, one per-bucket sort, one segmented
    vectorized prefix sum over integer cents, so every partial total is
    order-exact and replays bit-for-bit as the SQL running window.
    Columns: event_id, user_id, cum_cents."""
    from bioner_ray.stages.shuffle import pin_schema
    from bioner_ray.stages.window import grouped_running_sum

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_id": t.column("event_id"),
                "value_cents": _cents(t.column("value")),
            }
        )

    out = grouped_running_sum(
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="value_cents",
        out_col="cum_cents",
    )
    return pin_schema(
        out.map_batches(
            lambda t: t.select(["event_id", "user_id", "cum_cents"])
            if t.num_columns
            else t,
            batch_format="pyarrow",
        ),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("cum_cents", pa.int64()),
            ]
        ),
    )


def zipf_alpha(sf_dir: str, top_ranks: int = 1000):
    """Zipf exponent of the corpus vocabulary: −slope of the OLS fit of
    ln(freq) against ln(rank) over the top-``top_ranks`` words — the
    one-number sanity check that a crawl still looks like natural
    language (α ≈ 1) rather than template spam (α ≫ 1) or ID noise
    (α ≈ 0). Standard practice fits the head, so the truncation is an
    EXPLICIT parameter mirrored in the twin, not a silent cap. Plan:
    the full vocabulary count is the distributed G1 aggregate, the
    (cnt desc, word) sort/limit keeps ``top_ranks`` rows, and the
    driver finish over that bounded table quantizes both logs to
    integer micro-nats (one libm ln per rank and per distinct count)
    so every OLS moment is an exact Python big-int; the final doubles
    replay as HUGEINT→DOUBLE casts. Columns: n_ranks, alpha."""
    import math

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import token_count_partial as partial

    counts = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "documents", columns=["text"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["word"],
            [("cnt", "sum")],
        ),
        pa.schema([("word", pa.string()), ("cnt", pa.int64())]),
    )
    head = (
        counts.sort(["cnt", "word"], descending=[True, False])
        .limit(top_ranks)
        .to_pandas()
    )
    n = len(head)
    s = sy = q2 = sxy = 0
    lut: dict[int, int] = {}
    for r, cnt in enumerate(head["cnt"].tolist(), start=1):
        lx = lut.get(r)
        if lx is None:
            lx = lut[r] = math.floor(math.log(float(r)) * 1_000_000)
        ly = math.floor(math.log(float(cnt)) * 1_000_000)
        s += lx
        sy += ly
        q2 += lx * lx
        sxy += lx * ly
    den = n * q2 - s * s
    alpha = 0.0 if den == 0 else -(float(n * sxy - s * sy) / float(den))
    return pa.table(
        {
            "n_ranks": pa.array([n], type=pa.int64()),
            "alpha": pa.array([alpha], type=pa.float64()),
        }
    )


def doc_entropy(sf_dir: str):
    """Per-document unigram entropy in integer micro-nats — the
    information-density quality signal (near-zero entropy = boilerplate
    / repeated-token spam, a filter axis the ratio-based quality score
    misses). h_micro = Σ_w c_w · floor(10^6 · ln(n / c_w)) over the
    document's own token counts, so h_micro / (10^6 · n) ≈ H in nats.
    Embarrassingly parallel — everything is doc-local inside
    ``map_batches``, NO shuffle at all; the one ln per distinct
    (n, c) pair is libm on both sides and the quantized terms make the
    per-doc sum an exact integer (the doc_logprob convention). Docs
    with no tokens are absent (the tok-CTE contract). Columns: doc_id,
    n_tokens, h_micro."""
    import math

    from bioner_ray.stages.textstats import _split_lower

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("h_micro", pa.int64())]
    )

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        toks = _split_lower(batch, "text")
        d_out, n_out, h_out = [], [], []
        log_lut: dict[tuple[int, int], int] = {}
        for doc_id, words in zip(ids, toks):
            n = len(words)
            if n == 0:
                continue
            _, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
            h = 0
            for c in counts.tolist():
                key = (n, c)
                t = log_lut.get(key)
                if t is None:
                    t = math.floor(math.log(n / c) * 1_000_000)
                    log_lut[key] = t
                h += c * t
            d_out.append(doc_id)
            n_out.append(n)
            h_out.append(h)
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "n_tokens": pa.array(n_out, type=pa.int64()),
                "h_micro": pa.array(h_out, type=pa.int64()),
            },
            schema=out_schema,
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        per_doc, batch_format="pyarrow"
    )


def event_transitions(sf_dir: str):
    """Markov transition counts over per-user event streams — the
    clickstream LEAD() pattern: order each user's events by (ts,
    event_id), pair every event with its successor, count (from_type,
    to_type) globally. ONE user-bucketed exchange (a user's stream must
    be co-located; the bucket reducer sorts once and builds every
    user's consecutive pairs in one vectorized same-user-mask pass — no
    per-user loop), then the pair counts ride a (from, to)
    ``bucketed_aggregate`` whose key space is event-type², tiny.
    Columns: from_type, to_type, n."""
    from bioner_ray.stages.shuffle import (
        _bucket_column,
        bucketed_aggregate,
        pin_schema,
        with_ones,
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id", "event_type"])
        return t.append_column("_bucket", _bucket_column(t, ["user_id"], 256))

    pair_schema = pa.schema([("from_type", pa.string()), ("to_type", pa.string())])

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pair_schema.empty_table()
        g = g.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        types = g.column("event_type").to_numpy(zero_copy_only=False)
        same = users[1:] == users[:-1]
        return pa.table(
            {
                "from_type": pa.array(types[:-1][same], type=pa.string()),
                "to_type": pa.array(types[1:][same], type=pa.string()),
            },
            schema=pair_schema,
        )

    stream = (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pyarrow")
    )
    return pin_schema(
        bucketed_aggregate(with_ones(stream, "n"), ["from_type", "to_type"], [("n", "sum")]),
        pair_schema.append(pa.field("n", pa.int64())),
    )


def events_pivot(sf_dir: str):
    """Crosstab / PIVOT: one row per day, one count column per event
    type — the wide activity matrix a dashboard reads directly. The
    type vocabulary is discovered from the data but BOUNDED (event
    taxonomies are schema-scale, not data-scale), so the plan is the
    engine's standard shape: one (day, type) bucketed aggregate, then
    the calendar-bounded pivot runs on the aggregate, never the event
    stream. Column names are sanitized as n_<type>, ordered by type
    name for determinism. Columns: day (epoch days), n_<type>..."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(pc.cast(t.column("ts"), pa.int64()), pa.scalar(86_400_000_000, pa.int64())),
            pa.int64(),
        )
        return pa.table({"day": day, "event_type": t.column("event_type")})

    agg = pin_schema(
        bucketed_aggregate(
            with_ones(
                _read(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
                    prep, batch_format="pyarrow"
                ),
                "n",
            ),
            ["day", "event_type"],
            [("n", "sum")],
        ),
        pa.schema([("day", pa.int64()), ("event_type", pa.string()), ("n", pa.int64())]),
    ).to_pandas()  # bounded: days × types
    types = sorted(agg["event_type"].unique())
    days = sorted(agg["day"].unique())
    wide = agg.pivot_table(index="day", columns="event_type", values="n", fill_value=0)
    cols = {"day": pa.array(days, type=pa.int64())}
    for t in types:
        cols[f"n_{t}"] = pa.array(
            wide[t].reindex(days, fill_value=0).to_numpy().astype(np.int64)
        )
    return pa.table(cols)


def transition_entropy(sf_dir: str):
    """Conditional next-event entropy H(next | prev) per source event
    type — how predictable each state's outgoing behavior is (a
    near-zero row is a deterministic funnel step; a high row is a
    browse hub). Built ON the event_transitions operator: the
    transition matrix is event-type² bounded, so after the distributed
    pairing/count the per-row finish walks ≤ |types|² rows driver-side
    (the value_percentiles boundedness argument). Quantization: each
    term is c·floor(10^6·ln(n/c)) — exact integers, the doc_entropy
    convention. Columns: from_type, n_out, h_micro."""
    import math

    t = transition_entropy_input(sf_dir)
    by_from: dict[str, list[int]] = {}
    for ft, n in zip(t["from_type"].to_pylist(), t["n"].to_pylist()):
        by_from.setdefault(ft, []).append(int(n))
    f_out, n_out, h_out = [], [], []
    for ft in sorted(by_from):
        cs = by_from[ft]
        n = sum(cs)
        h = sum(c * math.floor(math.log(n / c) * 1_000_000) for c in cs)
        f_out.append(ft)
        n_out.append(n)
        h_out.append(h)
    return pa.table(
        {
            "from_type": pa.array(f_out, type=pa.string()),
            "n_out": pa.array(n_out, type=pa.int64()),
            "h_micro": pa.array(h_out, type=pa.int64()),
        }
    )


def transition_entropy_input(sf_dir: str) -> pa.Table:
    """The materialized (bounded) transition matrix transition_entropy
    finishes on — split out so tests can pin the boundedness contract."""
    ds = event_transitions(sf_dir)
    return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)


def churned_users(sf_dir: str, horizon_days: int = 0):
    """Inactivity churn: users whose LAST event is more than
    ``horizon_days`` before the corpus's final day (default 0 — "not
    active on the last day"; the sfX event streams are dense, so any
    longer horizon is empty at test scale) — the at-risk
    segment a retention campaign targets. One user-bucketed max (last
    event per user), a metadata-cheap global max over THAT bounded
    table, and a distributed filter; no joins. Columns: user_id,
    last_day (epoch days), days_silent."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(pc.cast(t.column("ts"), pa.int64()), pa.scalar(86_400_000_000, pa.int64())),
            pa.int64(),
        )
        return pa.table({"user_id": t.column("user_id"), "last_day": day})

    last = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
                prep, batch_format="pyarrow"
            ),
            ["user_id"],
            [("last_day", "max")],
        ),
        pa.schema([("user_id", pa.int64()), ("last_day", pa.int64())]),
    ).materialize()
    end_day = int(last.max("last_day"))

    def flag(t: pa.Table) -> pa.Table:
        silent = pc.subtract(pa.scalar(end_day, pa.int64()), t.column("last_day"))
        out = t.append_column("days_silent", silent)
        return out.filter(pc.greater(silent, horizon_days))

    return last.map_batches(flag, batch_format="pyarrow")


def events_props_stats(sf_dir: str):
    """Semi-structured payload extraction: pull the integer ``k`` field
    out of the JSON ``props`` column with ONE vectorized Arrow regex
    kernel (``pc.extract_regex`` — no per-row json.loads, the
    hot-path contract for sidecar payloads at crawl scale) and
    aggregate per event type. Rows whose props lack the field are
    counted separately (n_missing), not silently dropped. Columns:
    event_type, n_with_k, n_missing, sum_k, min_k, max_k."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def extract(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        present = pc.is_valid(k)
        kf = pc.fill_null(k, 0)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_with_k": pc.cast(present, pa.int64()),
                "n_missing": pc.cast(pc.invert(present), pa.int64()),
                "sum_k": kf,
                # min/max over missing rows must not bias: substitute the
                # identity elements
                "min_k": pc.if_else(present, kf, pa.scalar(2**62, pa.int64())),
                "max_k": pc.if_else(present, kf, pa.scalar(-(2**62), pa.int64())),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "events", columns=["event_type", "props"]).map_batches(
                extract, batch_format="pyarrow"
            ),
            ["event_type"],
            [
                ("n_with_k", "sum"),
                ("n_missing", "sum"),
                ("sum_k", "sum"),
                ("min_k", "min"),
                ("max_k", "max"),
            ],
        ),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n_with_k", pa.int64()),
                ("n_missing", pa.int64()),
                ("sum_k", pa.int64()),
                ("min_k", pa.int64()),
                ("max_k", pa.int64()),
            ]
        ),
    )


def orders_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value matrix: customers grouped by their FIRST
    order month, revenue tracked by months-since-first-order — the
    retention×monetization report every subscription/commerce dashboard
    serves. Two exchanges, both keyed on custkey so the partitioning is
    reused: a bucketed min finds each customer's cohort month (months
    encoded as year·12 + month−1, pure int64), ONE bucketed join
    attaches it back to the order stream, and the (cohort, age)
    aggregate is calendar-bounded. arpu_cents is the one double — an
    exact-integer division replayed as BIGINT→DOUBLE casts. Columns:
    cohort_year, cohort_month, age_months, n_orders, revenue_cents,
    arpu_cents."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.add(
            pc.multiply(pc.cast(pc.year(t.column("o_orderdate")), pa.int64()), 12),
            pc.subtract(pc.cast(pc.month(t.column("o_orderdate")), pa.int64()), 1),
        )
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "m": m,
                "rev": _cents(t.column("o_totalprice")),
            }
        )

    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(prep, batch_format="pyarrow")

    cohort = pin_schema(
        bucketed_aggregate(
            orders.map_batches(
                lambda t: t.select(["o_custkey", "m"]).rename_columns(["o_custkey", "cm"]),
                batch_format="pyarrow",
            ),
            ["o_custkey"],
            [("cm", "min")],
        ),
        pa.schema([("o_custkey", pa.int64()), ("cm", pa.int64())]),
    )
    joined = bucketed_inner_join(
        orders,
        cohort,
        ["o_custkey"],
        pa.schema([("o_custkey", pa.int64()), ("m", pa.int64()), ("rev", pa.int64())]),
        pa.schema([("o_custkey", pa.int64()), ("cm", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {
                "cm": t.column("cm"),
                "age_months": pc.subtract(t.column("m"), t.column("cm")),
                "n_orders": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "revenue_cents": t.column("rev"),
            }
        )
        if t.num_columns
        else pa.schema(
            [
                ("cm", pa.int64()),
                ("age_months", pa.int64()),
                ("n_orders", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )
    agg = bucketed_aggregate(
        joined, ["cm", "age_months"], [("n_orders", "sum"), ("revenue_cents", "sum")]
    )

    out_schema = pa.schema(
        [
            ("cohort_year", pa.int64()),
            ("cohort_month", pa.int64()),
            ("age_months", pa.int64()),
            ("n_orders", pa.int64()),
            ("revenue_cents", pa.int64()),
            ("arpu_cents", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        cm = t.column("cm")
        return pa.table(
            {
                "cohort_year": pc.divide(cm, pa.scalar(12, pa.int64())),
                "cohort_month": pc.add(
                    pc.subtract(cm, pc.multiply(pc.divide(cm, pa.scalar(12, pa.int64())), 12)),
                    pa.scalar(1, pa.int64()),
                ),
                "age_months": t.column("age_months"),
                "n_orders": t.column("n_orders"),
                "revenue_cents": t.column("revenue_cents"),
                "arpu_cents": pc.divide(
                    pc.cast(t.column("revenue_cents"), pa.float64()),
                    pc.cast(t.column("n_orders"), pa.float64()),
                ),
            },
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def customer_distribution(sf_dir: str):
    """TPC-H Q13 shape: how many customers placed exactly N orders,
    including the N = 0 bucket. Join-free under the orders→customer FK
    (every o_custkey is a real customer, verified in the testdata): the
    classic LEFT OUTER JOIN + double GROUP BY collapses to two bucketed
    aggregates over ORDERS ONLY — per-custkey order counts, then the
    histogram of those counts — and the zero bucket is recovered as
    ``count(customer) − customers-with-orders`` (one metadata-only
    ``Dataset.count`` plus a sum over the histogram, whose size is
    bounded by the max orders per customer, not by data volume). The
    customer table is never shuffled at all. Columns: c_count,
    custdist."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    per_cust = bucketed_aggregate(
        with_ones(_read(sf_dir, "orders", columns=["o_custkey"]), "c_count"),
        ["o_custkey"],
        [("c_count", "sum")],
    )
    hist = pin_schema(
        bucketed_aggregate(
            with_ones(
                per_cust.map_batches(
                    lambda t: t.select(["c_count"]), batch_format="pyarrow"
                ),
                "custdist",
            ),
            ["c_count"],
            [("custdist", "sum")],
        ),
        pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())]),
    ).to_pandas()  # bounded: one row per distinct order count
    n_customers = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    zero = n_customers - int(hist["custdist"].sum())
    cc, cd = hist["c_count"].to_numpy(), hist["custdist"].to_numpy()
    if zero > 0:  # the 0-orders bucket exists only when some customer has none
        cc, cd = np.r_[cc, 0], np.r_[cd, zero]
    return pa.table(
        {"c_count": cc.astype(np.int64), "custdist": cd.astype(np.int64)}
    )


def _basket_pair_stream(sf_dir: str):
    """Per-basket part-pair stream shared by basket_pairs and
    copurchase_assortativity: one orderkey-keyed exchange (the partial
    step dedups (orderkey, partkey) inside each block so the shuffle
    ships distinct items only), then each bucket generates its baskets'
    pairs fully vectorized — groups are sorted once and, for every
    distinct basket size ``s``, a single ``np.triu_indices`` template
    is broadcast over all size-``s`` baskets (no per-basket Python).
    Basket sizes are bounded (≤7 lineitems per order in the TPC-H
    shape), so pair fanout is ≤ C(B,2) per basket, linear in data.
    Returns a Dataset of (p1, p2) with per-basket multiplicity."""
    from bioner_ray.stages.shuffle import _bucket_column

    items = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        return t.append_column("_bucket", _bucket_column(t, ["l_orderkey"], 256))

    def emit_pairs(g: pa.Table) -> pa.Table:
        out_schema = pa.schema([("p1", pa.int64()), ("p2", pa.int64())])
        if g.num_columns == 0 or g.num_rows == 0:
            return out_schema.empty_table()
        g = g.sort_by([("l_orderkey", "ascending"), ("l_partkey", "ascending")])
        orders = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        parts = g.column("l_partkey").to_numpy(zero_copy_only=False)
        # the per-block partial dedup is only local — an order whose
        # lineitems span blocks still carries (orderkey, partkey)
        # duplicates into the bucket; drop consecutive dups post-sort
        keep = np.r_[True, (orders[1:] != orders[:-1]) | (parts[1:] != parts[:-1])]
        orders, parts = orders[keep], parts[keep]
        starts = np.flatnonzero(np.r_[True, orders[1:] != orders[:-1]])
        sizes = np.diff(np.r_[starts, len(orders)])
        p1s, p2s = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            ti, tj = np.triu_indices(int(s), k=1)
            base = starts[sizes == s]
            p1s.append(parts[(base[:, None] + ti[None, :]).ravel()])
            p2s.append(parts[(base[:, None] + tj[None, :]).ravel()])
        if not p1s:
            return out_schema.empty_table()
        return pa.table(
            {"p1": np.concatenate(p1s), "p2": np.concatenate(p2s)},
            schema=out_schema,
        )

    from bioner_ray.stages.shuffle import _shuffle_input_guard

    # inline-slice guard (r5 blowup audit): the (orderkey, partkey)
    # stream is ~16 B/row — estimate from the parquet footer so the
    # small-block regime coalesces before the bucket shuffle
    est = _nrows(sf_dir, "lineitem") * 24
    return _shuffle_input_guard(
        items.map_batches(partial, batch_format="pyarrow"), est, 256
    ).groupby("_bucket").map_groups(
        lambda g: emit_pairs(g), batch_format="pyarrow"
    )


def basket_pairs(sf_dir: str, min_support: int = 2, k: int = 100):
    """Market-basket co-occurrence mining (the Apriori pass-2 /
    frequent-pair step): each order is a basket of distinct parts; emit
    every unordered part pair per basket (_basket_pair_stream), count
    global support, keep pairs with support ≥ ``min_support`` and
    return the top-``k`` by (support desc, p1, p2). The pair counts
    ride the standard (p1, p2) ``bucketed_aggregate``; the min-support
    filter runs distributed before the bounded sort/limit; hot parts
    cannot skew the first exchange (keyed by orderkey) and the second
    is keyed by the pair. No reference analog; §2.11 scale extension.
    Columns: p1, p2, support."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    pairs = _basket_pair_stream(sf_dir)
    counts = pin_schema(
        bucketed_aggregate(
            with_ones(pairs, "support"),
            ["p1", "p2"],
            [("support", "sum")],
            # pair fanout ≤ C(7,2)/order ≈ 2×items; 24 B/pair row
            est_bytes=_nrows(sf_dir, "lineitem") * 48,
        ),
        pa.schema([("p1", pa.int64()), ("p2", pa.int64()), ("support", pa.int64())]),
    )
    frequent = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("support"), min_support)),
        batch_format="pyarrow",
    )
    return frequent.sort(["support", "p1", "p2"], descending=[True, False, False]).limit(k)


def kg_completeness_matrix(sf_dir: str):
    """KG completeness / coverage matrix — for every (inferred entity
    type, predicate): what fraction of that type's entities carry at
    least one such edge. The schema-coverage report a KG curator reads
    to find systematically MISSING facts (a type×predicate cell near
    zero that the shape expectations say should be dense is an
    extraction gap, the complement of kg_shape_violations' wrong-type
    audit). Coverage in exact integer micro.

    Scale shape: distinct (subj, pred) via ONE bucketed aggregate over
    the canonical edges; the node→type map is vocab-bounded (the
    kg_type_inference output) and broadcast once via ``ray.put``; the
    (type, pred) fold is type×predicate-bounded. Columns: type, pred,
    n_nodes, n_with, coverage_micro."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    ty = kg_type_inference(sf_dir).to_pandas()  # vocab-bounded
    ty_map = dict(zip(ty["node"], ty["type"]))
    n_nodes = ty.groupby("type")["node"].size().to_dict()
    ty_ref = ray.put(ty_map)

    sp = pin_schema(
        bucketed_aggregate(
            with_ones(
                kg_edges(sf_dir).map_batches(
                    lambda t: pa.table(
                        {"subj": t.column("subj"), "pred": t.column("pred")}
                    )
                    if t.num_columns
                    else pa.schema(
                        [("subj", pa.string()), ("pred", pa.string())]
                    ).empty_table(),
                    batch_format="pyarrow",
                )
            ),
            ["subj", "pred"],
            [("one", "min")],
        ),
        pa.schema(
            [("subj", pa.string()), ("pred", pa.string()), ("one", pa.int64())]
        ),
    )

    def to_type(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("type", pa.string()), ("pred", pa.string()), ("n_with", pa.int64())]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        tmap = ray.get(ty_ref)
        types = [tmap.get(s_) for s_ in t.column("subj").to_pylist()]
        keep = pa.array([x is not None for x in types])
        return pa.table(
            {
                "type": pa.array(
                    [x for x in types if x is not None], type=pa.string()
                ),
                "pred": t.column("pred").filter(keep),
                "n_with": pa.array(
                    np.ones(sum(1 for x in types if x is not None), dtype=np.int64)
                ),
            },
            schema=schema,
        )

    counts = pin_schema(
        bucketed_aggregate(
            sp.map_batches(to_type, batch_format="pyarrow"),
            ["type", "pred"],
            [("n_with", "sum")],
        ),
        pa.schema(
            [("type", pa.string()), ("pred", pa.string()), ("n_with", pa.int64())]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("type", pa.string()),
                ("pred", pa.string()),
                ("n_nodes", pa.int64()),
                ("n_with", pa.int64()),
                ("coverage_micro", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        nn = np.array(
            [n_nodes[x] for x in t.column("type").to_pylist()], dtype=np.int64
        )
        nw = t.column("n_with").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "type": t.column("type"),
                "pred": t.column("pred"),
                "n_nodes": pa.array(nn),
                "n_with": pa.array(nw),
                "coverage_micro": pa.array((nw * np.int64(1000000)) // nn),
            },
            schema=out_schema,
        )

    return counts.map_batches(finish, batch_format="pyarrow")


def discount_volume_corr(sf_dir: str):
    """Does a deeper discount actually move more units? Per part
    brand, the Pearson-correlation MOMENTS of (discount, quantity)
    over its lineitems — kept as EXACT integer second-moment
    numerators (the events_fano convention, one step richer):

        sxy = n·Σxy − Σx·Σy     sxx = n·Σxx − (Σx)²     syy = n·Σyy − (Σy)²

    with x = discount in exact cents (the ``_cents`` half-away
    contract) and y = quantity in exact cents. r² = sxy²/(sxx·syy)
    whenever a consumer wants the float; the engine ships the exact
    integers so the twin replays bit-for-bit and the fold is
    order-independent. Scale shape: ONE partkey-bucketed join
    (lineitem ⋈ part's brand projection, inline-slice-guarded), then a
    six-sum brand fold — brands are catalog-bounded. Columns: p_brand,
    n_items, sxy, sxx, syy."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_discount", "l_quantity"]
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "x": _cents(t.column("l_discount")),
                "y": _cents(t.column("l_quantity")),
            }
        ),
        batch_format="pyarrow",
    )
    pt = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    j = bucketed_inner_join(
        li,
        pt,
        ["p_partkey"],
        pa.schema([("p_partkey", pa.int64()), ("x", pa.int64()), ("y", pa.int64())]),
        pa.schema([("p_partkey", pa.int64()), ("p_brand", pa.string())]),
        est_bytes=_nrows(sf_dir, "lineitem") * 32,  # inline-slice guard
    )

    def moments(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("p_brand", pa.string()),
                ("n", pa.int64()),
                ("sx", pa.int64()),
                ("sy", pa.int64()),
                ("sxx", pa.int64()),
                ("syy", pa.int64()),
                ("sxy", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "p_brand": t.column("p_brand"),
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            },
            schema=schema,
        )

    m = pin_schema(
        bucketed_aggregate(
            j.map_batches(moments, batch_format="pyarrow"),
            ["p_brand"],
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")],
        ),
        pa.schema(
            [
                ("p_brand", pa.string()),
                ("n", pa.int64()),
                ("sx", pa.int64()),
                ("sy", pa.int64()),
                ("sxx", pa.int64()),
                ("syy", pa.int64()),
                ("sxy", pa.int64()),
            ]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("p_brand", pa.string()),
                ("n_items", pa.int64()),
                ("sxy", pa.int64()),
                ("sxx", pa.int64()),
                ("syy", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.int64)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False).astype(np.int64)
        syy = t.column("syy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "p_brand": t.column("p_brand"),
                "n_items": pa.array(n),
                "sxy": pa.array(n * sxy - sx * sy),
                "sxx": pa.array(n * sxx - sx * sx),
                "syy": pa.array(n * syy - sy * sy),
            },
            schema=out_schema,
        )

    return m.map_batches(finish, batch_format="pyarrow")


def events_fano_burstiness(sf_dir: str):
    """Overdispersion of the daily event-count series per event type —
    the Fano factor (variance/mean) as an EXACT integer ratio:

        fano_num = n_days·Σx² − (Σx)²        fano_den = n_days·Σx

    (variance/mean = num/den after the common n_days² cancels; a
    Poisson-like steady stream has num ≈ den, a bursty/campaign-driven
    type has num ≫ den). Kept as a numerator/denominator pair — no
    float, no division — so the twin replays it bit-for-bit. Scale
    shape: ONE (type, day) bucketed count, then a three-sum fold per
    type; int64 headroom to ~3·10⁹ events/day. Columns: event_type,
    n_days, total, fano_num, fano_den."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    ev = _read(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "day": pc.cast(
                    pc.cast(t.column("ts"), pa.date32()), pa.int32()
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    daily = pin_schema(
        bucketed_aggregate(
            with_ones(ev), ["event_type", "day"], [("one", "sum")]
        ),
        pa.schema(
            [("event_type", pa.string()), ("day", pa.int64()), ("one", pa.int64())]
        ),
    )

    def moments(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n_days", pa.int64()),
                    ("total", pa.int64()),
                    ("total_sq", pa.int64()),
                ]
            ).empty_table()
        x = t.column("one").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_days": pa.array(np.ones(len(x), dtype=np.int64)),
                "total": pa.array(x),
                "total_sq": pa.array(x * x),
            }
        )

    m = pin_schema(
        bucketed_aggregate(
            daily.map_batches(moments, batch_format="pyarrow"),
            ["event_type"],
            [("n_days", "sum"), ("total", "sum"), ("total_sq", "sum")],
        ),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n_days", pa.int64()),
                ("total", pa.int64()),
                ("total_sq", pa.int64()),
            ]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("event_type", pa.string()),
                ("n_days", pa.int64()),
                ("total", pa.int64()),
                ("fano_num", pa.int64()),
                ("fano_den", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        n = t.column("n_days").to_numpy(zero_copy_only=False).astype(np.int64)
        tot = t.column("total").to_numpy(zero_copy_only=False).astype(np.int64)
        sq = t.column("total_sq").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_days": pa.array(n),
                "total": pa.array(tot),
                "fano_num": pa.array(n * sq - tot * tot),
                "fano_den": pa.array(n * tot),
            },
            schema=out_schema,
        )

    return m.map_batches(finish, batch_format="pyarrow")


def ship_lag_deciles(sf_dir: str):
    """Order-to-ship lag deciles per order priority — the fulfillment
    SLA profile (does URGENT actually ship faster, and where do the
    tails sit?). Exact equi-depth deciles with doc_length_deciles'
    verified integer contract: cutoff = first lag with cumulative
    count ≥ ⌈p·n⌉ (quantile_disc semantics), ties to the lower bin,
    duplicate cutoffs leave empty bins on both sides.

    Scale shape: ONE orderkey-bucketed join (lineitem ⋈ orders
    projection, inline-slice-guarded), then a (priority, lag) count
    aggregate whose cardinality is priorities × the lag-day domain —
    physically bounded, so the decile walk (and the whole output)
    finishes on that histogram driver-side; the fact table is never
    collected. Columns: priority, decile, n_items, lo_days, hi_days."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "ship_day": pc.cast(
                    pc.cast(t.column("l_shipdate"), pa.date32()), pa.int32()
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    od = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "order_day": pc.cast(
                    pc.cast(t.column("o_orderdate"), pa.date32()), pa.int32()
                ).cast(pa.int64()),
                "priority": t.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )
    j = bucketed_inner_join(
        li,
        od,
        ["o_orderkey"],
        pa.schema([("o_orderkey", pa.int64()), ("ship_day", pa.int64())]),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("order_day", pa.int64()),
                ("priority", pa.string()),
            ]
        ),
        est_bytes=_nrows(sf_dir, "lineitem") * 32,  # inline-slice guard
    )
    hist_schema = pa.schema(
        [("priority", pa.string()), ("lag", pa.int64()), ("one", pa.int64())]
    )
    hist = pin_schema(
        bucketed_aggregate(
            with_ones(
                j.map_batches(
                    lambda t: pa.table(
                        {
                            "priority": t.column("priority"),
                            "lag": pc.subtract(
                                t.column("ship_day"), t.column("order_day")
                            ),
                        }
                    )
                    if t.num_columns
                    else pa.schema(
                        [("priority", pa.string()), ("lag", pa.int64())]
                    ).empty_table(),
                    batch_format="pyarrow",
                )
            ),
            ["priority", "lag"],
            [("one", "sum")],
            num_buckets=16,
        ),
        hist_schema,
    ).take_all()  # bounded: priorities × lag-day domain

    by_p: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        by_p.setdefault(r["priority"], []).append((int(r["lag"]), int(r["one"])))
    rows = []
    for prio in sorted(by_p):
        bins = sorted(by_p[prio])
        n = sum(c for _, c in bins)
        cuts = []
        for p_ in range(1, 10):
            target = (p_ * n + 9) // 10
            cum = 0
            for v, c in bins:
                cum += c
                if cum >= target:
                    cuts.append(v)
                    break
        agg: dict[int, list[int]] = {}
        for v, c in bins:
            d = 1 + sum(1 for cv in cuts if v > cv)
            cur = agg.setdefault(d, [0, v, v])
            cur[0] += c
            cur[1] = min(cur[1], v)
            cur[2] = max(cur[2], v)
        for d in sorted(agg):
            cnt, lo, hi = agg[d]
            rows.append((prio, d, cnt, lo, hi))
    return pa.table(
        {
            "priority": pa.array([r[0] for r in rows], type=pa.string()),
            "decile": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_items": pa.array([r[2] for r in rows], type=pa.int64()),
            "lo_days": pa.array([r[3] for r in rows], type=pa.int64()),
            "hi_days": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )


def basket_rules(sf_dir: str, min_support: int = 2, k: int = 100):
    """Association-rule mining metrics (the Apriori rule step on top of
    basket_pairs): for every frequent unordered part pair, support
    (baskets containing both), both directed confidences and the lift
    — all in EXACT integer micro units so the distributed fold and the
    SQL twin land on identical integers:

        conf(p1→p2)_micro = ⌊support·10⁶ / c(p1)⌋
        lift_micro        = ⌊support·N·10⁶ / (c(p1)·c(p2))⌋

    with c(p) = baskets containing p and N = total baskets. Scale
    shape: the shared orderkey-keyed pair stream folds to ONE (p1, p2)
    bucketed aggregate (inline-slice-guarded); the per-part basket
    counts are catalog-bounded and broadcast once via ``ray.put`` (the
    parts_supplier_counts dim-broadcast pattern); the rule filter runs
    distributed and a combiner-pruned global top-k keeps the
    ``k``-bounded result (lift desc, p1, p2). int64 headroom:
    support·N·10⁶ < 2^63 up to N ≈ 3M baskets — beyond that the
    micro scale drops to 10³ (documented, not silent). Columns: p1,
    p2, support, conf12_micro, conf21_micro, lift_micro."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    # per-part basket counts + total baskets: catalog-bounded collect
    items = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def op_dedup(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        return pa.table({"o": g.column("l_orderkey"), "p": g.column("l_partkey")})

    op = pin_schema(
        bucketed_aggregate(
            with_ones(items.map_batches(op_dedup, batch_format="pyarrow")),
            ["o", "p"],
            [("one", "min")],
            est_bytes=_nrows(sf_dir, "lineitem") * 24,
        ),
        pa.schema([("o", pa.int64()), ("p", pa.int64()), ("one", pa.int64())]),
    ).materialize()
    cp = (
        pin_schema(
            bucketed_aggregate(
                op.map_batches(
                    lambda t: pa.table({"p": t.column("p"), "c": t.column("one")}),
                    batch_format="pyarrow",
                ),
                ["p"],
                [("c", "sum")],
            ),
            pa.schema([("p", pa.int64()), ("c", pa.int64())]),
        )
        .to_pandas()
    )
    cp_map = dict(zip(cp["p"].astype(int), cp["c"].astype(int)))
    n_baskets = int(
        pin_schema(
            bucketed_aggregate(
                op.map_batches(
                    lambda t: pa.table(
                        {"o": t.column("o"), "one": t.column("one")}
                    ),
                    batch_format="pyarrow",
                ),
                ["o"],
                [("one", "min")],
            ),
            pa.schema([("o", pa.int64()), ("one", pa.int64())]),
        ).count()
    )
    cp_ref = ray.put(cp_map)

    counts = pin_schema(
        bucketed_aggregate(
            with_ones(_basket_pair_stream(sf_dir), "support"),
            ["p1", "p2"],
            [("support", "sum")],
            est_bytes=_nrows(sf_dir, "lineitem") * 48,
        ),
        pa.schema([("p1", pa.int64()), ("p2", pa.int64()), ("support", pa.int64())]),
    )

    out_schema = pa.schema(
        [
            ("p1", pa.int64()),
            ("p2", pa.int64()),
            ("support", pa.int64()),
            ("conf12_micro", pa.int64()),
            ("conf21_micro", pa.int64()),
            ("lift_micro", pa.int64()),
        ]
    )

    def rules(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        t = t.filter(pc.greater_equal(t.column("support"), min_support))
        if t.num_rows == 0:
            return out_schema.empty_table()
        cmap = ray.get(cp_ref)
        p1 = t.column("p1").to_numpy(zero_copy_only=False).astype(np.int64)
        p2 = t.column("p2").to_numpy(zero_copy_only=False).astype(np.int64)
        sup = t.column("support").to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = np.array([cmap[x] for x in p1], dtype=np.int64)
        c2 = np.array([cmap[x] for x in p2], dtype=np.int64)
        m = np.int64(1000000)
        return pa.table(
            {
                "p1": pa.array(p1),
                "p2": pa.array(p2),
                "support": pa.array(sup),
                "conf12_micro": pa.array((sup * m) // c1),
                "conf21_micro": pa.array((sup * m) // c2),
                "lift_micro": pa.array((sup * np.int64(n_baskets) * m) // (c1 * c2)),
            },
            schema=out_schema,
        )

    ranked = _global_top_k(
        counts.map_batches(rules, batch_format="pyarrow"),
        [
            ("lift_micro", "descending"),
            ("p1", "ascending"),
            ("p2", "ascending"),
        ],
        k,
    )
    import pandas as pd

    return pd.DataFrame(
        {
            c: ranked[c]
            for c in [
                "p1",
                "p2",
                "support",
                "conf12_micro",
                "conf21_micro",
                "lift_micro",
            ]
        }
    )


def parts_supplier_counts(sf_dir: str, min_acctbal: float = 1000.0):
    """TPC-H Q16 shape: how many distinct (non-excluded) suppliers ship
    each (p_brand, p_size) part family — supplier-diversity per
    catalogue segment. The exclusion list (suppliers with account
    balance below ``min_acctbal``, the complaints-filter analog) is a
    small dim broadcast once via ``ray.put``; the data-scale work is
    ONE partkey-bucketed join (lineitem ⋈ part projection) and the
    engine's two-level exact distinct: a (brand, size, suppkey)
    ``bucketed_aggregate`` collapses duplicates, then a second counts
    survivors per (brand, size) — no driver-side set, the
    distinct_users_per_type pattern over a join. Columns: p_brand,
    p_size, supplier_cnt."""
    import ray

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]).to_pandas()
    excl_ref = ray.put(
        np.sort(
            supp.loc[supp["s_acctbal"] < min_acctbal, "s_suppkey"].to_numpy().astype(np.int64)
        )
    )

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]).map_batches(
        lambda t: t.filter(
            pa.array(
                ~np.isin(
                    t.column("l_suppkey").to_numpy(zero_copy_only=False),
                    ray.get(excl_ref),
                )
            )
        ),
        batch_format="pyarrow",
    )
    parts = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("p_partkey"),
                "p_brand": t.column("p_brand"),
                "p_size": pc.cast(t.column("p_size"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        li,
        parts,
        ["l_partkey"],
        pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]),
        pa.schema([("l_partkey", pa.int64()), ("p_brand", pa.string()), ("p_size", pa.int64())]),
    ).map_batches(
        lambda t: t.select(["p_brand", "p_size", "l_suppkey"]) if t.num_columns else t,
        batch_format="pyarrow",
    )
    dedup_schema = pa.schema(
        [("p_brand", pa.string()), ("p_size", pa.int64()), ("l_suppkey", pa.int64())]
    )
    distinct = pin_schema(
        bucketed_aggregate(
            with_ones(joined, "one"),
            ["p_brand", "p_size", "l_suppkey"],
            [("one", "min")],
        ),
        dedup_schema,
    ).map_batches(
        lambda t: t.select(["p_brand", "p_size"]) if t.num_columns else t,
        batch_format="pyarrow",
    )
    return pin_schema(
        bucketed_aggregate(
            with_ones(distinct, "supplier_cnt"),
            ["p_brand", "p_size"],
            [("supplier_cnt", "sum")],
        ),
        pa.schema(
            [("p_brand", pa.string()), ("p_size", pa.int64()), ("supplier_cnt", pa.int64())]
        ),
    )


def market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_2",
    p_type: str = "PROMO",
):
    """TPC-H Q8 shape: among purchases by customers in ``region`` of
    parts of ``p_type``, the per-year revenue share supplied by
    ``nation`` — the engine's most join-heavy query, exercising the
    full dimensional pattern at once. Tiny dims (nation ⋈ region)
    resolve driver-side to two key sets; the three data-scale sides
    each ride ONE bucketed exchange: orders ⋉ region-customers (semi,
    custkey), lineitem ⋉ promo-parts (semi, partkey) then ⋈ supplier
    projection (suppkey → target flag), and finally lineitem ⋈ orders
    (orderkey, reusing the per-order join key for the year). Volume is
    integer cents with per-element rounding; the share is ONE double
    division of two exact integer sums per year, so it replays
    bit-for-bit. Columns: o_year, num_cents, den_cents, mkt_share."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(
        nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        .query("r_name == @region")["n_nationkey"]
        .astype(int)
    )
    target_nk = set(nat.query("n_name == @nation")["n_nationkey"].astype(int))
    region_ref = ray.put(np.fromiter(sorted(region_keys), dtype=np.int64))
    # supplier → target-nation flag rides a broadcast of the supplier
    # projection (small dim), shipped to the object store ONCE and read
    # zero-copy by every batch; at a scale where supplier outgrows
    # broadcast this becomes a third bucketed join, same shape as the
    # parts semi-join
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp_ref = ray.put(
        np.sort(
            supp.loc[supp["s_nationkey"].astype(int).isin(target_nk), "s_suppkey"]
            .to_numpy()
            .astype(np.int64)
        )
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("c_custkey").filter(
                    pa.array(
                        np.isin(
                            t.column("c_nationkey").to_numpy(zero_copy_only=False),
                            ray.get(region_ref),
                        )
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    orders = bucketed_inner_join(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        cust,
        ["o_custkey"],
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
            ]
        ),
        pa.schema([("o_custkey", pa.int64())]),
        join_type="left semi",
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        )
        if t.num_columns
        else pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )

    promo = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("p_type"), p_type))
        .select(["p_partkey"])
        .rename_columns(["l_partkey"]),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        vol = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "o_orderkey": t.column("l_orderkey"),
                "vol_cents": vol,
            }
        )

    li = bucketed_inner_join(
        _read(
            sf_dir,
            "lineitem",
            columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow"),
        promo,
        ["l_partkey"],
        pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("vol_cents", pa.int64()),
            ]
        ),
        pa.schema([("l_partkey", pa.int64())]),
        join_type="left semi",
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "vol_cents": t.column("vol_cents"),
                "is_target": pc.cast(
                    pa.array(
                        np.isin(
                            t.column("l_suppkey").to_numpy(zero_copy_only=False),
                            ray.get(supp_ref),
                        )
                    ),
                    pa.int64(),
                ),
            }
        )
        if t.num_columns
        else pa.schema(
            [("o_orderkey", pa.int64()), ("vol_cents", pa.int64()), ("is_target", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )

    joined = bucketed_inner_join(
        li,
        orders,
        ["o_orderkey"],
        pa.schema(
            [("o_orderkey", pa.int64()), ("vol_cents", pa.int64()), ("is_target", pa.int64())]
        ),
        pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {
                "o_year": t.column("o_year"),
                "num_cents": pc.multiply(t.column("vol_cents"), t.column("is_target")),
                "den_cents": t.column("vol_cents"),
            }
        )
        if t.num_columns
        else pa.schema(
            [("o_year", pa.int64()), ("num_cents", pa.int64()), ("den_cents", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )
    agg = bucketed_aggregate(
        joined, ["o_year"], [("num_cents", "sum"), ("den_cents", "sum")]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("o_year", pa.int64()),
                    ("num_cents", pa.int64()),
                    ("den_cents", pa.int64()),
                    ("mkt_share", pa.float64()),
                ]
            ).empty_table()
        share = pc.divide(
            pc.cast(t.column("num_cents"), pa.float64()),
            pc.cast(t.column("den_cents"), pa.float64()),
        )
        return t.append_column("mkt_share", share)

    return agg.map_batches(finish, batch_format="pyarrow")


def copurchase_assortativity(sf_dir: str):
    """Degree assortativity (Pearson r of endpoint degrees over every
    directed edge sample) of the part co-purchase graph — the one-
    number answer to "do popular parts sell WITH popular parts?", and
    deliberately computed on this graph rather than the toy KG, whose
    complete clique has zero degree variance.

    Exactness without a global float sum: with x = deg(src), y =
    deg(dst) over the n = 2E directed samples, r = (n·Σxy − S²) /
    (n·Σx² − S²) with S = Σx (symmetry makes the x and y moments
    equal). Every moment is an integer; per block the row products
    (< 2^62 while degrees < 2^31) are split into 32-bit hi/lo halves so
    int64 block sums cannot overflow, and the driver finish sums ONE
    partial row per block in Python big-ints (exact, unbounded) —
    bounded by block count, not rows, the engine's standard
    driver-finish argument. The final doubles replay bit-for-bit:
    float(num)/float(den) mirrors SQL's CAST(HUGEINT AS DOUBLE)
    division exactly. Columns: n_samples, assortativity."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    pair_schema = pa.schema([("p1", pa.int64()), ("p2", pa.int64())])
    und = pin_schema(
        bucketed_aggregate(
            with_ones(_basket_pair_stream(sf_dir), "one"),
            ["p1", "p2"],
            [("one", "min")],
            est_bytes=_nrows(sf_dir, "lineitem") * 48,  # inline-slice guard
        ),
        pair_schema,
    ).materialize()

    nbr_schema = pa.schema([("c", pa.int64()), ("n", pa.int64())])

    def both_dirs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return nbr_schema.empty_table()
        a = t.column("p1").combine_chunks()
        b = t.column("p2").combine_chunks()
        return pa.table(
            {
                "c": pa.chunked_array([a, b]).combine_chunks(),
                "n": pa.chunked_array([b, a]).combine_chunks(),
            },
            schema=nbr_schema,
        )

    nbr = und.map_batches(both_dirs, batch_format="pyarrow")
    deg = pin_schema(
        bucketed_aggregate(
            with_ones(
                nbr.map_batches(lambda t: t.select(["c"]), batch_format="pyarrow"),
                "deg",
            ),
            ["c"],
            [("deg", "sum")],
        ),
        pa.schema([("c", pa.int64()), ("deg", pa.int64())]),
    ).materialize()

    j1 = bucketed_inner_join(
        nbr,
        deg.map_batches(lambda t: t.rename_columns(["c", "x"]) if t.num_columns else t, batch_format="pyarrow"),
        ["c"],
        nbr_schema,
        pa.schema([("c", pa.int64()), ("x", pa.int64())]),
    )
    j2 = bucketed_inner_join(
        j1,
        deg.map_batches(lambda t: t.rename_columns(["n", "y"]) if t.num_columns else t, batch_format="pyarrow"),
        ["n"],
        nbr_schema.append(pa.field("x", pa.int64())),
        pa.schema([("n", pa.int64()), ("y", pa.int64())]),
    )

    part_schema = pa.schema(
        [
            ("n", pa.int64()),
            ("s", pa.int64()),
            ("q_hi", pa.int64()),
            ("q_lo", pa.int64()),
            ("sxy_hi", pa.int64()),
            ("sxy_lo", pa.int64()),
        ]
    )

    def partial_moments(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return part_schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        if x.max() >= 1 << 31:
            raise ValueError("degree exceeds 2^31; hi/lo split would overflow")
        q = x * x
        xy = x * y
        mask = np.int64((1 << 32) - 1)
        return pa.table(
            {
                "n": [int(len(x))],
                "s": [int(x.sum())],
                "q_hi": [int((q >> 32).sum())],
                "q_lo": [int((q & mask).sum())],
                "sxy_hi": [int((xy >> 32).sum())],
                "sxy_lo": [int((xy & mask).sum())],
            },
            schema=part_schema,
        )

    parts = pin_schema(
        j2.map_batches(partial_moments, batch_format="pyarrow"), part_schema
    ).to_pandas()  # one row per block — bounded by block count
    n = int(parts["n"].sum())
    s = int(parts["s"].sum())
    q = (int(parts["q_hi"].sum()) << 32) + int(parts["q_lo"].sum())
    sxy = (int(parts["sxy_hi"].sum()) << 32) + int(parts["sxy_lo"].sum())
    num, den = n * sxy - s * s, n * q - s * s
    r = 0.0 if den == 0 else float(num) / float(den)
    return pa.table(
        {
            "n_samples": pa.array([n], type=pa.int64()),
            "assortativity": pa.array([r], type=pa.float64()),
        }
    )


def shipping_priority(sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H Q3 shape: customer(segment) ⋉ orders(before cutoff) ⋈
    lineitem(shipped after cutoff) → per-order discounted revenue →
    global top-k. Two bucketed exchanges (semi-join on o_custkey, then
    join + aggregate both keyed on o_orderkey — the join's partitioning
    is reused by the aggregate) and a sort/limit on the already-reduced
    per-order table. Revenue in integer cents, per-element rounding
    (module contract). Columns: o_orderkey, revenue_cents, o_orderdate."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join

    cut = pa.scalar(np.datetime64(cutoff, "us"), type=pa.timestamp("us"))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), segment))
        .select(["c_custkey"])
        .rename_columns(["o_custkey"]),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.less(t.column("o_orderdate"), cut)),
        batch_format="pyarrow",
    )
    orders = bucketed_inner_join(
        orders,
        cust,
        ["o_custkey"],
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
            ]
        ),
        pa.schema([("o_custkey", pa.int64())]),
        join_type="left semi",
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "date_us": pc.cast(t.column("o_orderdate"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), cut))
        disc = pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pc.subtract(pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())),
        )
        cents = pc.cast(
            pc.round(pc.multiply(disc, 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table({"o_orderkey": t.column("l_orderkey"), "disc_cents": cents})

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(li_prep, batch_format="pyarrow")

    joined = bucketed_inner_join(
        li,
        orders,
        ["o_orderkey"],
        pa.schema([("o_orderkey", pa.int64()), ("disc_cents", pa.int64())]),
        pa.schema([("o_orderkey", pa.int64()), ("date_us", pa.int64())]),
    )
    per_order = bucketed_aggregate(
        joined, ["o_orderkey"], [("disc_cents", "sum"), ("date_us", "min")]
    )
    top = per_order.sort(["disc_cents", "o_orderkey"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "revenue_cents": t.column("disc_cents"),
                "o_orderdate": pc.cast(t.column("date_us"), pa.timestamp("us")),
            }
        ),
        batch_format="pyarrow",
    )


def purchase_context(sf_dir: str, window_hours: int = 1):
    """Range (band) join: per purchase event, the same user's activity
    count within ±window_hours (stages/window.py range_join_count —
    hour-cell replication + one bucketed composite join; the
    purchase-context feature a behavioral pipeline extracts). The
    purchase itself is inside its own band, so n_context ≥ 1. Columns:
    event_id, n_context."""
    from bioner_ray.stages.window import range_join_count

    purchases = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "purchase")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    events = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = range_join_count(
        purchases,
        events,
        left_key="user_id",
        left_ts="ts",
        left_id="event_id",
        right_key="user_id",
        right_ts="ts",
        window_us=window_hours * 3_600_000_000,
    )
    return out.rename_columns({"lid": "event_id", "n_matches": "n_context"})


def events_by_type(sf_dir: str):
    """Streaming aggregate over the events table. Columns: event_type,
    n_events, sum_value_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "value_cents": _cents(batch.column("value")),
            }
        )

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = bucketed_aggregate(
        with_ones(ds.map_batches(prep, batch_format="pyarrow"), "n_events"),
        ["event_type"],
        [("n_events", "sum"), ("value_cents", "sum")],
    )
    return out.rename_columns({"value_cents": "sum_value_cents"})


def event_anomaly(sf_dir: str):
    """Daily anomaly score per event type — the monitoring report a
    streaming ingest publishes: z-score of each day's cent-quantized
    value total against the type's own daily distribution. The float
    algebra is reduced to ONE integer numerator and ONE integer
    radicand per row, z = (n·x − S) / sqrt(n·Q − S²) with S = Σ daily,
    Q = Σ daily² in exact big-int arithmetic — so the doubles replay
    bit-for-bit in SQL (sqrt is exactly rounded). The wide step is the
    (type, day) bucketed aggregate; the per-type finish walks a table
    bounded by types × calendar days (same driver-finish argument as
    value_percentiles). Columns: event_type, day, total_cents, z."""
    import math

    from bioner_ray.stages.shuffle import bucketed_aggregate

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.floor_temporal(batch.column("ts"), unit="day"),
                "total_cents": _cents(batch.column("value")),
            }
        )

    daily = bucketed_aggregate(
        _read(sf_dir, "events", columns=["event_type", "ts", "value"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["event_type", "day"],
        [("total_cents", "sum")],
    ).to_pandas()  # bounded: types × calendar days

    stats: dict[str, tuple[int, int, int]] = {}
    for et, g in daily.groupby("event_type"):
        xs = [int(v) for v in g["total_cents"]]
        stats[et] = (len(xs), sum(xs), sum(x * x for x in xs))
    z = []
    for et, x in zip(daily["event_type"], daily["total_cents"]):
        n, s, q = stats[et]
        rad = n * q - s * s
        z.append(
            0.0 if rad <= 0 else float(n * int(x) - s) / math.sqrt(float(rad))
        )
    tbl = pa.Table.from_pandas(daily, preserve_index=False)
    return tbl.append_column("z", pa.array(z, type=pa.float64()))


def user_retention(sf_dir: str):
    """Cohort retention matrix: users are cohorted by their FIRST
    active day; each (cohort_day, active_day) cell counts the distinct
    cohort members active that day — the standard product-analytics
    rollup, in the engine's bounded-shuffle shape: distinct (user, day)
    activity via one bucketed aggregate (the combiner collapses event
    multiplicity per block), per-user min-day via another, ONE bucketed
    join back, and a final (cohort, day) count over rows that are
    distinct by construction — no count-distinct shuffle needed.
    Columns: cohort_day, day, offset_days, n_users."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            }
        ).append_column("one", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    ud_schema = pa.schema([("user_id", pa.int64()), ("day", pa.timestamp("us"))])
    ud = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
                prep, batch_format="pyarrow"
            ),
            ["user_id", "day"],
            [("one", "min")],
        ),
        ud_schema,
    ).materialize()

    cohort = pin_schema(
        bucketed_aggregate(
            ud.map_batches(
                lambda t: pa.table(
                    {"user_id": t.column("user_id"), "cohort_day": t.column("day")}
                ),
                batch_format="pyarrow",
            ),
            ["user_id"],
            [("cohort_day", "min")],
        ),
        pa.schema([("user_id", pa.int64()), ("cohort_day", pa.timestamp("us"))]),
    )

    joined = bucketed_inner_join(
        ud,
        cohort,
        ["user_id"],
        ud_schema,
        pa.schema([("user_id", pa.int64()), ("cohort_day", pa.timestamp("us"))]),
    )

    def cells(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("cohort_day", pa.timestamp("us")),
                    ("day", pa.timestamp("us")),
                    ("offset_days", pa.int64()),
                    ("n_users", pa.int64()),
                ]
            ).empty_table()
        offset = pc.cast(
            pc.days_between(t.column("cohort_day"), t.column("day")), pa.int64()
        )
        return pa.table(
            {
                "cohort_day": t.column("cohort_day"),
                "day": t.column("day"),
                "offset_days": offset,
                "n_users": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    return bucketed_aggregate(
        joined.map_batches(cells, batch_format="pyarrow"),
        ["cohort_day", "day", "offset_days"],
        [("n_users", "sum")],
    )


def funnel(sf_dir: str, steps: tuple = ("view", "click", "purchase")):
    """Ordered multi-step funnel: users whose first 'view' strictly
    precedes a 'click' that strictly precedes a 'purchase' (first-match
    semantics at each stage). Per stage: one filtered per-user min-ts
    aggregate, then one bucketed join against the previous stage's
    frontier + a strictly-after filter — K stages cost K bounded
    (user-keyed) joins, never a per-user sort or session rebuild.
    Columns: stage, step_idx, n_users."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    ev = (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t.column("event_type"), value_set=pa.array(list(steps)))),
            batch_format="pyarrow",
        )
        .materialize()
    )
    frontier_schema = pa.schema([("user_id", pa.int64()), ("t", pa.timestamp("us"))])
    cur = None
    out_stage, out_idx, out_n = [], [], []
    for i, step in enumerate(steps):

        def step_rows(t: pa.Table, step=step) -> pa.Table:
            t = t.filter(pc.equal(t.column("event_type"), step))
            return pa.table(
                {
                    "user_id": pc.cast(t.column("user_id"), pa.int64()),
                    "t": t.column("ts"),
                }
            )

        step_ev = ev.map_batches(step_rows, batch_format="pyarrow")
        if i == 0:
            cand = step_ev
        else:
            joined = bucketed_inner_join(
                step_ev,
                cur.rename_columns({"t": "prev_t"}),
                ["user_id"],
                frontier_schema,
                pa.schema([("user_id", pa.int64()), ("prev_t", pa.timestamp("us"))]),
            )
            cand = joined.map_batches(
                lambda t: pa.table(
                    {"user_id": t.column("user_id"), "t": t.column("t")}
                ).filter(pc.greater(t.column("t"), t.column("prev_t")))
                if t.num_columns
                else frontier_schema.empty_table(),
                batch_format="pyarrow",
            )
        cur = pin_schema(
            bucketed_aggregate(cand, ["user_id"], [("t", "min")]), frontier_schema
        ).materialize()
        out_stage.append(step)
        out_idx.append(i + 1)
        out_n.append(cur.count())
    return pa.table(
        {
            "stage": pa.array(out_stage, type=pa.string()),
            "step_idx": pa.array(out_idx, type=pa.int64()),
            "n_users": pa.array(out_n, type=pa.int64()),
        }
    )


def events_per_day(sf_dir: str):
    """Tumbling daily window as a calendar groupby (the streaming-window
    analog in a batch engine; the reference has no windows, SURVEY §2.9).
    Columns: day, n_events, sum_value_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        return pa.table(
            {
                "day": day,
                "value_cents": _cents(batch.column("value")),
            }
        )

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    out = bucketed_aggregate(
        with_ones(ds.map_batches(prep, batch_format="pyarrow"), "n_events"),
        ["day"],
        [("n_events", "sum"), ("value_cents", "sum")],
    )
    return out.rename_columns({"value_cents": "sum_value_cents"})


def events_rolling_7d(sf_dir: str):
    """Trailing 7-day calendar window over the daily aggregate (the
    windowed-aggregate custom operator; stages/window.py). Columns:
    day, n_events, sum_value_cents, n_events_7d, sum_value_cents_7d."""
    from bioner_ray.stages.window import rolling_daily_aggregate

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({"ts": batch.column("ts"), "value_cents": _cents(batch.column("value"))})

    ds = _read(sf_dir, "events", columns=["ts", "value"]).map_batches(
        cents, batch_format="pyarrow"
    )
    return rolling_daily_aggregate(ds, window_days=7)


def events_last_order(sf_dir: str):
    """As-of join: each event matched to the user's latest order at or
    before the event time (stages/window.py:asof_join_latest — union →
    key-bucket shuffle → per-bucket sort + forward-fill). Columns:
    event_id, last_o_orderkey (-1 when no prior order)."""
    from bioner_ray.stages.window import asof_join_latest

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    return asof_join_latest(
        ev,
        orders,
        left_key="user_id",
        left_ts="ts",
        left_id="event_id",
        right_key="o_custkey",
        right_ts="o_orderdate",
        right_payload="o_orderkey",
    )

def surface_stats(sf_dir: str):
    """M3 surface encoder as an oracle-checked query: tokens get a
    deterministic case/digit/punct transform (pos % 4 — the testdata
    lexicon is all-lowercase, so the transform makes every predicate
    family non-trivial), then the REAL 11-predicate kernel
    (functions/text.surface_features, surface_encoder.py:12-104 parity)
    runs and four SQL-replayable predicate counts aggregate per doc.

    Token/pos contract matches the shared ``_TOK_CTE``: 1-based index
    into the '\\s+' split of lower(text), empties skipped but their
    index consumed. Columns: doc_id, n_upper_start, n_all_upper,
    n_incl_numeric, n_ends_punct.
    """
    import re as _re

    from bioner_ray.functions.text import surface_features

    ws_re = _re.compile(r"\s+")

    def stats(batch: pa.Table) -> pa.Table:
        ids, c0, c2, c6, c10 = [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            n0 = n2 = n6 = n10 = 0
            for pos, w in enumerate(ws_re.split((text or "").lower()), start=1):
                if not w:
                    continue
                if pos % 4 == 0:
                    t = w.upper()
                elif pos % 4 == 1:
                    t = w + "7"
                elif pos % 4 == 2:
                    t = w + "."
                else:
                    t = w
                f = surface_features(t)
                n0 += int(f[0])   # starts_with_uppercase
                n2 += int(f[2])   # is_all_uppercase
                n6 += int(f[6])   # includes_numeric
                n10 += int(f[10])  # ends_with_punctuation
            ids.append(doc_id)
            c0.append(n0)
            c2.append(n2)
            c6.append(n6)
            c10.append(n10)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_upper_start": pa.array(c0, type=pa.int64()),
                "n_all_upper": pa.array(c2, type=pa.int64()),
                "n_incl_numeric": pa.array(c6, type=pa.int64()),
                "n_ends_punct": pa.array(c10, type=pa.int64()),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def doc_shuffle(sf_dir: str, seed: int = 1632737901):
    """O2 document shuffle. The PERMUTATION is seeded Ray internals
    (not SQL-replayable), but the driver compare is order-insensitive,
    so the SQL twin pins the property that matters: the shuffle is a
    lossless, duplication-free permutation of the input multiset.
    Columns: doc_id, n_chars."""
    from bioner_ray.stages.metrics import shuffle_documents

    def width(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        width, batch_format="pyarrow"
    )
    return shuffle_documents(ds, seed=seed)


def error_samples(sf_dir: str, n: int = 10):
    """O3 seeded error sampling over the dual-tagged corpus. The draw
    is a deterministic md5(url|seed) rank (combiner-pruned global
    top-n), so the exact sample is machine-independent and the SQL
    twin replays it. Columns: url, n_sentences."""
    from bioner_ray.stages.metrics import sample_error_documents

    sampled = sample_error_documents(_dual_tagged_documents(sf_dir), n=n)
    return sampled.select_columns(["url", "n_sentences"])


def position_stats(sf_dir: str):
    """M4 position encoder over real segmented documents: run
    ``position_features`` per document and aggregate each feature
    channel (the four one-hot position flags of
    position_encoder.py:27-33) to per-doc sums the oracle can replay
    from sentence/token counts. Columns: url, n_sentences, n_tokens,
    n_begin_doc, n_begin_sent, n_end_sent, n_end_doc."""
    from bioner_ray.functions.text import position_features
    from bioner_ray.stages.nested import sentence_token_counts

    def stats(batch: pa.Table) -> pa.Table:
        n_sents_col, lengths_per_doc = sentence_token_counts(batch)
        sums = np.zeros((batch.num_rows, 4), dtype=np.int64)
        n_tokens = np.zeros(batch.num_rows, dtype=np.int64)
        for i, lengths in enumerate(lengths_per_doc):
            blocks = position_features(len(lengths), lengths)
            if blocks:
                sums[i] = np.add.reduce([b.sum(axis=0) for b in blocks]).astype(np.int64)
            n_tokens[i] = sum(lengths)
        return pa.table(
            {
                "url": batch.column("url"),
                "n_sentences": pa.array(n_sents_col, type=pa.int64()),
                "n_tokens": pa.array(n_tokens),
                "n_begin_doc": pa.array(sums[:, 0]),
                "n_begin_sent": pa.array(sums[:, 1]),
                "n_end_sent": pa.array(sums[:, 2]),
                "n_end_doc": pa.array(sums[:, 3]),
            }
        )

    return _segmented_documents(sf_dir).map_batches(stats, batch_format="pyarrow")


def unknown_words(sf_dir: str, n: int = 3, min_word_frequency: int = 10):
    """M8 unknown-word predicate composed with the G1→G2 vocabulary
    build (ngram_encoder.py:179-186: a token is unknown iff ANY of its
    n-grams is missing from the min-frequency-filtered vocabulary).
    The vocab is built distributed (partial counts → bucketed merge →
    distributed min-count filter), collected only post-filter, and
    broadcast once via ray.put; the per-doc unknown scan memoizes per
    unique token. Columns: doc_id, n_tokens, n_unknown."""
    import ray

    from bioner_ray.functions.text import create_n_grams
    from bioner_ray.stages.shuffle import bucketed_aggregate
    from bioner_ray.stages.textstats import _split_lower
    from bioner_ray.stages.vocab import Vocab

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter[str] = Counter()
        for toks in _split_lower(batch, "text"):
            for t in toks:
                counter.update(create_n_grams(t, n))
        items = list(counter.items())
        return pa.table(
            {
                "ngram": pa.array([k for k, _ in items], type=pa.string()),
                "count": pa.array([v for _, v in items], type=pa.int64()),
            }
        )

    counts = bucketed_aggregate(
        _read(sf_dir, "documents", columns=["text"]).map_batches(partial, batch_format="pyarrow"),
        ["ngram"],
        [("count", "sum")],
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["count"], min_word_frequency)),
        batch_format="pyarrow",
    )
    surviving = counts.to_pandas()
    surviving = surviving.sort_values(["count", "ngram"], ascending=[False, True])
    vocab_ref = ray.put(Vocab(list(surviving["ngram"]), n=n))

    def scan(batch: pa.Table) -> pa.Table:
        import ray as _ray

        v = _ray.get(vocab_ref)
        memo: dict[str, bool] = {}
        n_tokens, n_unknown = [], []
        for toks in _split_lower(batch, "text"):
            unk = 0
            for t in toks:
                got = memo.get(t)
                if got is None:
                    got = memo[t] = v.is_unknown(t)
                unk += got
            n_tokens.append(len(toks))
            n_unknown.append(unk)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "n_unknown": pa.array(n_unknown, type=pa.int64()),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow"
    )


def bioul_map(sf_dir: str):
    """M9 BIOUL→BIO2 mapper over a deterministic synthetic tagging:
    token at 0-based position p gets BIOUL tag 'BILOU'[p % 5] + '-ENT',
    is mapped through ``bioul_to_bio2`` (scibert_eval.py:125-134
    semantics: L→I, U→B, suffix ignored), and the BIO2 outcome is
    counted per document. Columns: doc_id, n_b, n_i, n_o."""
    from bioner_ray.functions.text import bioul_to_bio2
    from bioner_ray.stages.textstats import _split_lower

    letters = "BILOU"
    mapped = [bioul_to_bio2(letters[r] + "-ENT") for r in range(5)]

    def scan(batch: pa.Table) -> pa.Table:
        n_b, n_i, n_o = [], [], []
        for toks in _split_lower(batch, "text"):
            c = {"B": 0, "I": 0, "O": 0}
            for p in range(len(toks)):
                c[mapped[p % 5]] += 1
            n_b.append(c["B"])
            n_i.append(c["I"])
            n_o.append(c["O"])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_b": pa.array(n_b, type=pa.int64()),
                "n_i": pa.array(n_i, type=pa.int64()),
                "n_o": pa.array(n_o, type=pa.int64()),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow"
    )


def datexis_mentions(sf_dir: str):
    """M7/A2/A4 through the driver: segment → G1-G3 vocab build
    (distributed, broadcast once) → datexis-numpy scorer actor pool
    (composite DATEXIS encoder + length-bucketed padded BiRNN collator)
    → BIO decode → mention counts. Rows-only check: the seeded
    random-init recurrence is deterministic but not SQL-replayable.
    Columns: surface, n_mentions."""
    import ray

    from bioner_ray.stages.mentions import mentions_stage
    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.scorer import score_stage
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones
    from bioner_ray.stages.vocab import build_vocab

    docs = _segmented_documents(sf_dir)
    vocab = build_vocab(docs, n=3, min_word_frequency=10)
    tagged = score_stage(
        docs,
        model_name="datexis-numpy",
        model_config={"vocab": ray.put(vocab)},
        concurrency=sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=16),
    )
    mentions = mentions_stage(tagged)
    return bucketed_aggregate(
        with_ones(mentions.select_columns(["surface"]), "n_mentions"),
        ["surface"],
        [("n_mentions", "sum")],
    )


def bilstm_mentions(sf_dir: str):
    """A2 made executable in-container (VERDICT r3, Next #1): the REAL
    BioNER BiLSTM architecture (bioner_model.py:16-93) run as a pure
    numpy forward — relu(ff1) → BiLSTM → 2×BiLSTM → LSTM → linear —
    loaded from the golden tiny state dict
    (tests/golden/bilstm_tiny.npz, torch key names/layouts) whose
    logits are parity-pinned against the stored reference outputs in
    tests/stages/test_torch_backend.py. Pipeline shape is identical to
    ``datexis_mentions``: segment → scorer actor pool (weights
    broadcast once via ray.put, length-bucketed padded recurrence) →
    BIO decode → mention counts. Golden-parquet oracle: the recurrence
    is deterministic but not SQL-replayable.
    Columns: surface, n_mentions."""
    import ray

    from bioner_ray.stages.mentions import mentions_stage
    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.scorer import load_npz_state_dict, score_stage
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    docs = _segmented_documents(sf_dir)
    # broadcast the state dict once (a real checkpoint is ~100 MB; the
    # ray.put → per-actor resolve path is the production shape)
    sd = load_npz_state_dict("/root/repo/tests/golden/bilstm_tiny.npz")
    tagged = score_stage(
        docs,
        model_name="bilstm-numpy",
        model_config={"weights": ray.put(sd), "encoder_backend": "hash"},
        concurrency=sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=16),
    )
    mentions = mentions_stage(tagged)
    return bucketed_aggregate(
        with_ones(mentions.select_columns(["surface"]), "n_mentions"),
        ["surface"],
        [("n_mentions", "sum")],
    )


def sessions(sf_dir: str, gap_seconds: int = 1800):
    """Gap-based sessionization over the event stream
    (stages/window.py:sessionize — one sort-based key groupby +
    vectorized diff/cumsum). Columns: event_id, user_id, session_id."""
    from bioner_ray.stages.window import sessionize

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return sessionize(ev, gap_seconds=gap_seconds)


def top_orders_per_customer(sf_dir: str, k: int = 3):
    """Per-group top-k (stages/rank.py — block-local top-k prune, then
    per-group re-rank; shuffle moves ≤ k rows per (block, customer)).
    Columns: o_custkey, o_orderkey, o_totalprice, rk."""
    from bioner_ray.stages.rank import top_k_per_group

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return top_k_per_group(
        orders,
        key_col="o_custkey",
        order_by=[("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        k=k,
    )


def value_percentiles(sf_dir: str):
    """Exact distributed order statistics per event type: p50/p90/p99
    of the cent-quantized value. The wide step is ONE
    ``bucketed_aggregate`` over (event_type, value_cents) — the
    shuffle moves one combined row per distinct (type, cents) per
    block, and the driver finish walks a table bounded by
    types × distinct cents (the price domain), never the event
    stream. For genuinely unbounded real-valued domains the same plan
    runs over fixed-width histogram bins (then the result is
    approximate); cents quantization keeps it exact here, matching
    DuckDB ``quantile_disc`` (first value with cumulative count ≥
    ceil(p·n) — verified rule). Columns: event_type, p50_cents,
    p90_cents, p99_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": _cents(batch.column("value")),
            }
        )

    ev = _read(sf_dir, "events", columns=["event_type", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    counts = bucketed_aggregate(with_ones(ev), ["event_type", "cents"], [("one", "sum")])
    rows = counts.take_all()  # bounded: types x distinct cents

    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["cents"], r["one"]))
    out_type, out = [], {p: [] for p in (50, 90, 99)}
    for et in sorted(by_type):
        qs = _ceil_quantiles(sorted(by_type[et]), (50, 90, 99))
        for p, v in zip((50, 90, 99), qs):
            out[p].append(v)
        out_type.append(et)
    return pa.table(
        {
            "event_type": pa.array(out_type, type=pa.string()),
            "p50_cents": pa.array(out[50], type=pa.int64()),
            "p90_cents": pa.array(out[90], type=pa.int64()),
            "p99_cents": pa.array(out[99], type=pa.int64()),
        }
    )


def distinct_users_per_type(sf_dir: str):
    """Exact distributed count-distinct: first ``bucketed_aggregate``
    collapses to one row per distinct (event_type, user_id) — the G1
    combiner applied to dedup — then a second counts survivors per
    type. No driver-side set, no per-group Python. Columns:
    event_type, n_users."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = bucketed_aggregate(
        with_ones(ev), ["event_type", "user_id"], [("one", "sum")]
    ).select_columns(["event_type", "user_id"])
    out = bucketed_aggregate(
        with_ones(pairs, "n_users"), ["event_type"], [("n_users", "sum")]
    )
    return out.select_columns(["event_type", "n_users"])


def distinct_users_hll(sf_dir: str, p: int = 8):
    """Distinct users per event type via HyperLogLog (stages/sketch.py
    hll_distinct) — the FIXED-size mergeable synopsis (≤ 2^p register
    rows per block per type, whatever the cardinality). At the
    testdata's 15/150 users the small-range linear-counting branch
    fires; the raw-estimate branch is pinned by the pytest brute-force
    twin. Columns: event_type, v_zero, s_int, est_distinct."""
    from bioner_ray.stages.sketch import hll_distinct

    return hll_distinct(
        _read(sf_dir, "events", columns=["event_type", "user_id"]),
        "event_type",
        "user_id",
        p=p,
    )


def distinct_users_kmv(sf_dir: str, k: int = 64):
    """Distinct users per event type via the KMV bottom-k sketch
    (stages/sketch.py) — the bounded-shuffle scale path next to the
    exact ``distinct_users_per_type`` (the shuffle moves ≤ k hashes
    per (block, type) instead of one row per distinct user). k=64 so
    the testdata exercises BOTH branches: estimator at sf0.01 (150
    distinct > k), exact at sf0.001 (15 < k). Deterministic md5-derived
    hashing → the DuckDB oracle replays the estimate bit-for-bit.
    Columns: event_type, n_synopsis, kth_hash, est_distinct."""
    from bioner_ray.stages.sketch import kmv_distinct

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return kmv_distinct(ev, key_col="event_type", value_col="user_id", k=k)


def customers_without_orders(sf_dir: str):
    """Distributed anti-join: customers with NO high-value order
    (o_totalprice > 400000) — the NOT IN / NOT EXISTS shape (docs never
    linked, urls never fetched). Rides the engine's
    ``bucketed_inner_join(join_type="left anti")``, not Ray's native
    join — the native hash exchange crashes on empty hash partitions
    (the hazard ``stages/shuffle.py`` documents), which skew can
    produce at any scale. Both sides stream through the bucket
    exchange; no driver-side key set, no broadcast of an unbounded
    side; the right side is filter-pruned (and column-pruned to the
    key) before the shuffle. Columns: c_custkey, c_nationkey."""
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import bucketed_inner_join

    cust_schema = pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int32())])
    key_schema = pa.schema([("c_custkey", pa.int64())])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": t.filter(pc.greater(t["o_totalprice"], 400000.0)).column("o_custkey")}
        ),
        batch_format="pyarrow",
    )
    return bucketed_inner_join(
        cust, orders, ["c_custkey"], cust_schema, key_schema, join_type="left anti"
    )


def promo_revenue(sf_dir: str, year: int = 1996, p_type: str = "PROMO"):
    """TPC-H Q14 shape: the share of discounted revenue in a shipdate
    year carried by parts of ``p_type``. The part dim ships ONCE as a
    broadcast sorted-key array (``ray.put`` + ``np.isin`` per batch —
    at a scale where part outgrows broadcast this becomes the
    market_share semi-join); lineitem then needs NO shuffle at all:
    each batch folds to two integer-cent partials and the driver sums
    a handful of per-block rows. The share is ONE double division of
    two exact integer sums, so it replays bit-for-bit. Columns:
    promo_cents, total_cents, promo_share."""
    import ray

    promo = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    promo_ref = ray.put(
        np.sort(
            promo.loc[promo["p_type"] == p_type, "p_partkey"].to_numpy().astype(np.int64)
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.year(t.column("l_shipdate")), year))
        disc = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(
                            pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())
                        ),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        is_promo = np.isin(
            t.column("l_partkey").to_numpy(zero_copy_only=False), ray.get(promo_ref)
        )
        return pa.table(
            {
                "promo_cents": pa.array([int(disc[is_promo].sum())], type=pa.int64()),
                "total_cents": pa.array([int(disc.sum())], type=pa.int64()),
            }
        )

    parts = (
        _read(
            sf_dir,
            "lineitem",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    promo_c = int(parts["promo_cents"].sum())
    total_c = int(parts["total_cents"].sum())
    share = 0.0 if total_c == 0 else float(promo_c) / float(total_c)
    return pa.table(
        {
            "promo_cents": pa.array([promo_c], type=pa.int64()),
            "total_cents": pa.array([total_c], type=pa.int64()),
            "promo_share": pa.array([share], type=pa.float64()),
        }
    )


def top_supplier(sf_dir: str, start: str = "1996-01-01", months: int = 3):
    """TPC-H Q15 shape: the supplier(s) with maximum discounted revenue
    over a ``months``-long shipdate window. Lineitem folds through ONE
    bucketed exchange keyed on l_suppkey (per-block partial sums
    first, so the shuffle moves supplier-count rows, not lineitems);
    the per-supplier table — bounded by the supplier dim — then takes
    a driver max and an equality filter, exactly Q15's ``revenue =
    (SELECT max ...)`` including ties. Names attach from a broadcast
    of the supplier dim. Columns: s_suppkey, s_name, revenue_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate

    lo = np.datetime64(start, "us")
    hi = np.datetime64(start, "M") + np.int64(months)
    hi = hi.astype("datetime64[us]")

    def prep(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate")
        mask = pc.and_(
            pc.greater_equal(sd, pa.scalar(lo.item(), type=pa.timestamp("us"))),
            pc.less(sd, pa.scalar(hi.item(), type=pa.timestamp("us"))),
        )
        t = t.filter(mask)
        disc = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(
                            pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())
                        ),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"s_suppkey": t.column("l_suppkey"), "revenue_cents": disc})

    per_supp = bucketed_aggregate(
        _read(
            sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(prep, batch_format="pyarrow"),
        ["s_suppkey"],
        [("revenue_cents", "sum")],
    ).to_pandas()  # bounded by the supplier dim (post-aggregate)
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    if len(per_supp) == 0:
        return pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "revenue_cents": pa.array([], type=pa.int64()),
            }
        )
    best = int(per_supp["revenue_cents"].max())
    out = (
        per_supp.loc[per_supp["revenue_cents"] == best]
        .merge(supp, on="s_suppkey")
        .sort_values("s_suppkey", ignore_index=True)
    )
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].astype(np.int64)),
            "s_name": pa.array(out["s_name"], type=pa.string()),
            "revenue_cents": pa.array(out["revenue_cents"].astype(np.int64)),
        }
    )


def large_orders(sf_dir: str, min_qty: int = 150, k: int = 100):
    """TPC-H Q18 shape: the top-``k`` orders (by total price) whose
    lineitem quantity sum exceeds ``min_qty``. Lineitem folds to
    per-order quantity sums through ONE bucketed exchange (partial
    per-block combine first); the surviving big orders ride a bucketed
    inner join to orders (orderkey) and a second to customer
    (custkey) — both sides large at scale, so no broadcast — and only
    the k-bounded sort/limit touches the driver. Quantities sum in
    exact integer centi-units. Columns: c_name, o_custkey, o_orderkey,
    total_cents, sum_qty_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "sum_qty_cents": _cents(t.column("l_quantity")),
            }
        )

    qty = bucketed_aggregate(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["o_orderkey"],
        [("sum_qty_cents", "sum")],
    )
    qty_schema = pa.schema([("o_orderkey", pa.int64()), ("sum_qty_cents", pa.int64())])
    big = pin_schema(qty, qty_schema).map_batches(
        lambda t: t.filter(pc.greater(t.column("sum_qty_cents"), min_qty * 100)),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    joined = bucketed_inner_join(
        big,
        orders,
        ["o_orderkey"],
        qty_schema,
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_totalprice", pa.float64()),
            ]
        ),
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name"]), batch_format="pyarrow"
    )
    named = bucketed_inner_join(
        joined,
        cust,
        ["o_custkey"],
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("sum_qty_cents", pa.int64()),
                ("o_totalprice", pa.float64()),
            ]
        ),
        pa.schema([("o_custkey", pa.int64()), ("c_name", pa.string())]),
    )
    named = pin_schema(
        named,
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("sum_qty_cents", pa.int64()),
                ("o_totalprice", pa.float64()),
                ("c_name", pa.string()),
            ]
        ),
    )
    top = named.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_name": t.column("c_name"),
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "total_cents": _cents(t.column("o_totalprice")),
                "sum_qty_cents": t.column("sum_qty_cents"),
            }
        )

    return top.map_batches(fmt, batch_format="pyarrow")


def kg_hits(sf_dir: str, iters: int = 2):
    """Fixed-iteration weighted HITS hubs/authorities over the
    canonical KG edges (stages/graph.py hits — scaled-integer,
    floor-divide renormalization, so the DuckDB twin replays it
    bit-exactly). Authority ranks entity importance; hub ranks
    aggregator pages in a web KG. Columns: node, hub, auth
    (score × 10^6 as int64)."""
    from bioner_ray.stages.graph import hits

    return hits(kg_edges(sf_dir), iters=iters)


def kg_katz(sf_dir: str, iters: int = 3):
    """Fixed-iteration weighted Katz centrality over the canonical KG
    edges (stages/graph.py katz — scaled-integer per-edge attenuation
    α = 1/8, floor-divide renormalization, so the DuckDB twin replays
    it bit-exactly). The out-degree-unnormalized complement to
    PageRank: attenuated-walk mass, the classic prior for entity
    prominence in citation/mention graphs. Columns: node, katz
    (score × 10^6 as int64)."""
    from bioner_ray.stages.graph import katz

    return katz(kg_edges(sf_dir), iters=iters)


def forecast_revenue(
    sf_dir: str,
    year: int = 1996,
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
):
    """TPC-H Q6 shape: the pure scan-bound query — one column-pruned
    pass over lineitem, a three-predicate vectorized filter, and a
    per-batch integer-cent fold; NO shuffle, NO join. This is the
    engine's scan-throughput anchor: wall time here is parquet decode
    + Arrow compute and nothing else. Columns: n_rows, revenue_cents."""

    def partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("l_discount"), pa.float64())
        mask = pc.and_(
            pc.and_(
                pc.equal(pc.year(t.column("l_shipdate")), year),
                pc.and_(pc.greater_equal(d, disc_lo), pc.less_equal(d, disc_hi)),
            ),
            pc.less(pc.cast(t.column("l_quantity"), pa.float64()), max_qty),
        )
        t = t.filter(mask)
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.cast(t.column("l_discount"), pa.float64()),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_rows": pa.array([t.num_rows], type=pa.int64()),
                "revenue_cents": pa.array([int(rev.sum())], type=pa.int64()),
            }
        )

    parts = (
        _read(
            sf_dir,
            "lineitem",
            columns=["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table(
        {
            "n_rows": pa.array([int(parts["n_rows"].sum())], type=pa.int64()),
            "revenue_cents": pa.array([int(parts["revenue_cents"].sum())], type=pa.int64()),
        }
    )


def kg_pred_cooccurrence(sf_dir: str, min_support: int = 2, k: int = 100):
    """Predicate co-occurrence for schema induction: for every pair of
    predicates attested on the SAME subject entity, the number of
    subjects carrying both — the signal that drives relation-synonym
    and schema-clustering decisions in KG construction (companion to
    kg_relation_cardinality). Shape: distinct (subj, pred) via one
    bucketed exchange, then per-subject vectorized pair emission
    (bounded: the per-subject pair fan-out is predicate-vocabulary-
    choose-2, a constant, never corpus-sized), then one pair-keyed
    aggregate and a k-bounded top-k. Columns: p1, p2, n_subjects."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    edges = kg_edges(sf_dir)
    sp = pin_schema(
        bucketed_aggregate(
            with_ones(
                edges.map_batches(
                    lambda t: t.select(["subj", "pred"]), batch_format="pyarrow"
                )
            ),
            ["subj", "pred"],
            [("one", "min")],
        ),
        pa.schema([("subj", pa.string()), ("pred", pa.string()), ("one", pa.int64())]),
    )

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return pa.schema([("p1", pa.string()), ("p2", pa.string())]).empty_table()
        g = g.sort_by([("subj", "ascending"), ("pred", "ascending")])
        subj = g.column("subj").to_numpy(zero_copy_only=False)
        pred = g.column("pred").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, subj[1:] != subj[:-1]])
        lens = np.diff(np.r_[starts, len(subj)])
        out1, out2 = [], []
        for s, ln in zip(starts.tolist(), lens.tolist()):
            if ln < 2:
                continue
            ps = pred[s : s + ln]
            ii, jj = np.triu_indices(ln, k=1)
            out1.append(ps[ii])
            out2.append(ps[jj])
        if not out1:
            return pa.schema([("p1", pa.string()), ("p2", pa.string())]).empty_table()
        return pa.table(
            {
                "p1": pa.array(np.concatenate(out1), type=pa.string()),
                "p2": pa.array(np.concatenate(out2), type=pa.string()),
            }
        )

    # per-subject grouping rides the SAME bucketed machinery: group by
    # subj inside each bucket's reduce partition
    from bioner_ray.stages.shuffle import bucketed_map_groups

    emitted = bucketed_map_groups(sp, ["subj"], pairs)
    counted = pin_schema(
        bucketed_aggregate(
            with_ones(emitted, "n_subjects"), ["p1", "p2"], [("n_subjects", "sum")]
        ),
        pa.schema([("p1", pa.string()), ("p2", pa.string()), ("n_subjects", pa.int64())]),
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_subjects"), min_support)),
        batch_format="pyarrow",
    )
    return counted.sort(
        ["n_subjects", "p1", "p2"], descending=[True, False, False]
    ).limit(k)


def kg_metapaths(sf_dir: str, edges=None):
    """2-hop metapath support for schema induction: for every ORDERED
    predicate pair (p1, p2), the number of path instances
    ``subj -p1-> m -p2-> obj`` in the canonical edge table — the
    signal relation-composition mining (e.g. "treats ∘ causes") reads
    before proposing inferred relations. Complements
    ``kg_pred_cooccurrence`` (same-SUBJECT predicate pairs): metapaths
    chain THROUGH a shared mid node.

    Scale shape: paths are never materialized. Per mid node m,
    #paths(p1, p2 | m) = in_count(m, p1) × out_count(m, p2), so the
    plan is two (node, pred)-keyed bucketed aggregates, ONE bounded
    join on m, a vectorized multiply, and a predicate-pair-sized final
    fold — exchange is O(distinct (node, pred)), never O(paths), and
    a hub entity costs one multiplication instead of a quadratic
    fan-out. int64 is safe up to ~3·10^9 in-edges × out-edges per
    (m, pred) pair. Columns: p1, p2, n_paths."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    if edges is None:
        # materialize BEFORE the two-branch fan-out: inc and outc both
        # re-execute their upstream, and two concurrent KG scoring
        # pools would deadlock on the shared 3/4-cluster pool budget
        # (the kg_mention_drift / kg_edge_pmi convention)
        edges = kg_edges(sf_dir).materialize()
    i_schema = pa.schema([("m", pa.string()), ("p1", pa.string()), ("c1", pa.int64())])
    o_schema = pa.schema([("m", pa.string()), ("p2", pa.string()), ("c2", pa.int64())])

    def to_in(t: pa.Table) -> pa.Table:
        return pa.table({"m": t.column("obj"), "p1": t.column("pred")})

    def to_out(t: pa.Table) -> pa.Table:
        return pa.table({"m": t.column("subj"), "p2": t.column("pred")})

    inc = pin_schema(
        bucketed_aggregate(
            with_ones(edges.map_batches(to_in, batch_format="pyarrow"), "c1"),
            ["m", "p1"],
            [("c1", "sum")],
        ),
        i_schema,
    )
    outc = pin_schema(
        bucketed_aggregate(
            with_ones(edges.map_batches(to_out, batch_format="pyarrow"), "c2"),
            ["m", "p2"],
            [("c2", "sum")],
        ),
        o_schema,
    )
    joined = bucketed_inner_join(inc, outc, ["m"], i_schema, o_schema)

    def multiply(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("p1", pa.string()), ("p2", pa.string()), ("n_paths", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "p1": t.column("p1"),
                "p2": t.column("p2"),
                "n_paths": pc.multiply(t.column("c1"), t.column("c2")),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            joined.map_batches(multiply, batch_format="pyarrow"),
            ["p1", "p2"],
            [("n_paths", "sum")],
        ),
        pa.schema([("p1", pa.string()), ("p2", pa.string()), ("n_paths", pa.int64())]),
    )


def _neighbor_sample_params(seed: int = 42):
    """The (A, B, C) 61-bit affine-mix constants kg_neighbor_sample
    ranks with — shared with the DuckDB twin, which inlines them
    verbatim (the _walk_params convention)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    bound = 1 << 61
    return rng.integers(1, bound, size=3, dtype=np.uint64)


def kg_neighbor_sample(sf_dir: str, fanout: int = 4, seed: int = 42, edges=None):
    """Deterministic fixed-fanout neighbor sampling — the per-node
    ≤ ``fanout`` out-edge draw a GraphSAGE-style GNN trainer reads as
    its layer-0 adjacency (Hamilton et al. 2017, arXiv:1706.02216
    uses uniform sampling; here the draw is RNG-free so the sample is
    bit-stable across runs, worker counts and resumes). Each edge is
    ranked by the 64-bit affine mix ``(A·h(node) + B·h(nbr) + C·h(pred))
    mod 2^64`` over 61-bit md5 node hashes — the same SQL-replayable
    family as ``hash_walks``/minhash — and each node keeps its
    ``fanout`` smallest.

    Scale shape: ranking is a numpy multiply-add per edge batch
    (md5 memoized per DISTINCT string); the top-k rides
    ``rank.top_k_per_group``'s combiner prune, so the shuffle moves
    ≤ fanout × nodes-per-block rows, never the edge table. Columns:
    node, pred, nbr, rk."""
    import numpy as np

    from bioner_ray.stages.graph import _node_hash_column
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import pin_schema

    a, b, c = _neighbor_sample_params(seed)

    ranked_schema = pa.schema(
        [
            ("node", pa.string()),
            ("pred", pa.string()),
            ("nbr", pa.string()),
            ("rank_hash", pa.uint64()),
        ]
    )

    def rank_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return ranked_schema.empty_table()
        memo: dict = {}
        hn = _node_hash_column(t.column("subj"), memo)
        hb = _node_hash_column(t.column("obj"), memo)
        hp = _node_hash_column(t.column("pred"), memo)
        # natural uint64 wrap == the twin's HUGEINT sum mod 2^64
        rank = a * hn + b * hb + c * hp
        return pa.table(
            {
                "node": t.column("subj"),
                "pred": t.column("pred"),
                "nbr": t.column("obj"),
                "rank_hash": pa.array(rank),
            }
        )

    out_schema = pa.schema(
        [
            ("node", pa.string()),
            ("pred", pa.string()),
            ("nbr", pa.string()),
            ("rk", pa.int64()),
        ]
    )
    if edges is None:
        edges = kg_edges(sf_dir)
    top = top_k_per_group(
        edges.map_batches(rank_rows, batch_format="pyarrow"),
        key_col="node",
        order_by=[
            ("rank_hash", "ascending"),
            ("pred", "ascending"),
            ("nbr", "ascending"),
        ],
        k=fanout,
    )
    return pin_schema(
        top.map_batches(
            lambda t: t.select(["node", "pred", "nbr", "rk"])
            if t.num_columns
            else out_schema.empty_table(),
            batch_format="pyarrow",
        ),
        out_schema,
    )


def _pred_body_counts(edges, out_col: str = "n_body"):
    """Per-predicate head-count table: #(subj, obj) pairs attested for
    each predicate — the rule-body denominator kg_rule_confidence and
    kg_inverse_predicates both normalize by. The edge table is already
    distinct per (subj, pred, obj) (canonicalize_edges groups on the
    triple), so one predicate-keyed aggregate suffices. Columns:
    p1, ``out_col``."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    return pin_schema(
        bucketed_aggregate(
            with_ones(
                edges.map_batches(
                    lambda t: pa.table({"p1": t.column("pred")}),
                    batch_format="pyarrow",
                ),
                out_col,
            ),
            ["p1"],
            [(out_col, "sum")],
        ),
        pa.schema([("p1", pa.string()), (out_col, pa.int64())]),
    )


def _attach_confidence(counted, body, n_col: str, min_support: int):
    """Join per-(p1, p2) pair counts to the p1 body counts and emit
    ``confidence = n / n_body`` (one IEEE double division — exactly
    replayed by the twins' CAST(...AS DOUBLE)/CAST(...AS DOUBLE)),
    filtered to ``n >= min_support``. Columns: p1, p2, n_col, n_body,
    confidence."""
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    out_schema = pa.schema(
        [
            ("p1", pa.string()),
            ("p2", pa.string()),
            (n_col, pa.int64()),
            ("n_body", pa.int64()),
            ("confidence", pa.float64()),
        ]
    )
    joined = bucketed_inner_join(
        counted,
        body,
        ["p1"],
        pa.schema([("p1", pa.string()), ("p2", pa.string()), (n_col, pa.int64())]),
        pa.schema([("p1", pa.string()), ("n_body", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        t = t.filter(pc.greater_equal(t.column(n_col), min_support))
        conf = pc.divide(
            pc.cast(t.column(n_col), pa.float64()),
            pc.cast(t.column("n_body"), pa.float64()),
        )
        return pa.table(
            {
                "p1": t.column("p1"),
                "p2": t.column("p2"),
                n_col: t.column(n_col),
                "n_body": t.column("n_body"),
                "confidence": conf,
            }
        )

    return pin_schema(joined.map_batches(finish, batch_format="pyarrow"), out_schema)


def kg_rule_confidence(sf_dir: str, min_support: int = 2, edges=None):
    """AMIE-style single-atom rule mining (Galárraga et al., WWW 2013):
    for every ordered predicate pair, the support and confidence of the
    rule ``p1(x, y) ⇒ p2(x, y)`` — support = #(x, y) pairs carrying
    BOTH predicates, confidence = support / #(x, y) pairs carrying p1.
    High-confidence rows are relation-subsumption / synonym candidates
    (e.g. "binds ⇒ interacts_with"), the schema-induction signal that
    complements kg_pred_cooccurrence (same SUBJECT only) by requiring
    the same subject AND object.

    Scale shape: per-(subj, obj) predicate-set grouping via ONE
    bucketed exchange, vectorized ordered-pair emission inside each
    group (fan-out bounded by predicate-vocabulary², a constant, never
    corpus-sized), then a pair-keyed aggregate and one predicate-keyed
    bounded join for the denominator — exchange is O(distinct
    (subj, obj, pred)), never O(pairs²). Columns: p1, p2, n_both,
    n_body, confidence."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_map_groups,
        pin_schema,
        with_ones,
    )

    if edges is None:
        # materialize BEFORE the two-branch fan-out (pairs + body) —
        # the kg_metapaths pool-budget convention; triple columns only
        # (weight/first_url would double the pinned footprint unused)
        edges = (
            kg_edges(sf_dir)
            .map_batches(
                lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow"
            )
            .materialize()
        )

    def so_rows(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t.column("subj"), t.column("obj"), "\x1f"
        )
        return pa.table({"so": key, "pred": t.column("pred")})

    sp = pin_schema(
        edges.map_batches(so_rows, batch_format="pyarrow"),
        pa.schema([("so", pa.string()), ("pred", pa.string())]),
    )

    pair_schema = pa.schema([("p1", pa.string()), ("p2", pa.string())])

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return pair_schema.empty_table()
        g = g.sort_by([("so", "ascending"), ("pred", "ascending")])
        so = g.column("so").to_numpy(zero_copy_only=False)
        pred = g.column("pred").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, so[1:] != so[:-1]])
        lens = np.diff(np.r_[starts, len(so)])
        out1, out2 = [], []
        for s, ln in zip(starts.tolist(), lens.tolist()):
            if ln < 2:
                continue
            ps = pred[s : s + ln]
            ii, jj = np.nonzero(~np.eye(ln, dtype=bool))
            out1.append(ps[ii])
            out2.append(ps[jj])
        if not out1:
            return pair_schema.empty_table()
        return pa.table(
            {
                "p1": pa.array(np.concatenate(out1), type=pa.string()),
                "p2": pa.array(np.concatenate(out2), type=pa.string()),
            }
        )

    emitted = bucketed_map_groups(sp, ["so"], pairs)
    counted = pin_schema(
        bucketed_aggregate(
            with_ones(emitted, "n_both"), ["p1", "p2"], [("n_both", "sum")]
        ),
        pa.schema([("p1", pa.string()), ("p2", pa.string()), ("n_both", pa.int64())]),
    )
    return _attach_confidence(
        counted, _pred_body_counts(edges), "n_both", min_support
    )


def kg_inverse_predicates(sf_dir: str, min_support: int = 2, edges=None):
    """owl:inverseOf candidate mining: for every ordered predicate
    pair, the number of (x, y) with ``p1(x, y) ∧ p2(y, x)`` and the
    confidence n_inv / #p1 — high-confidence rows are inverse-relation
    candidates ("treats"/"treated_by"), and the p1 == p2 diagonal is
    the predicate's SYMMETRY score, both standard KG-refinement
    signals (companion to kg_rule_confidence's same-direction rules).

    Scale shape: the edge table joins its own reversal on the
    (subj, obj) key pair via ONE empty-partition-proof bucketed join
    (per-key fan-out bounded by predicate-vocabulary², a constant),
    then a pair-keyed aggregate and the shared bounded denominator
    join. Columns: p1, p2, n_inv, n_body, confidence."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    if edges is None:
        edges = (
            kg_edges(sf_dir)
            .map_batches(
                lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow"
            )
            .materialize()
        )

    fwd_schema = pa.schema(
        [("k1", pa.string()), ("k2", pa.string()), ("p1", pa.string())]
    )
    rev_schema = pa.schema(
        [("k1", pa.string()), ("k2", pa.string()), ("p2", pa.string())]
    )
    fwd = pin_schema(
        edges.map_batches(
            lambda t: pa.table(
                {"k1": t.column("subj"), "k2": t.column("obj"), "p1": t.column("pred")}
            ),
            batch_format="pyarrow",
        ),
        fwd_schema,
    )
    rev = pin_schema(
        edges.map_batches(
            lambda t: pa.table(
                {"k1": t.column("obj"), "k2": t.column("subj"), "p2": t.column("pred")}
            ),
            batch_format="pyarrow",
        ),
        rev_schema,
    )
    matched = bucketed_inner_join(fwd, rev, ["k1", "k2"], fwd_schema, rev_schema)
    counted = pin_schema(
        bucketed_aggregate(
            with_ones(
                matched.map_batches(
                    lambda t: t.select(["p1", "p2"])
                    if t.num_columns
                    else pa.schema(
                        [("p1", pa.string()), ("p2", pa.string())]
                    ).empty_table(),
                    batch_format="pyarrow",
                ),
                "n_inv",
            ),
            ["p1", "p2"],
            [("n_inv", "sum")],
        ),
        pa.schema([("p1", pa.string()), ("p2", pa.string()), ("n_inv", pa.int64())]),
    )
    return _attach_confidence(
        counted, _pred_body_counts(edges), "n_inv", min_support
    )


def kg_synonym_pairs(sf_dir: str, min_conf: float = 0.9, edges=None):
    """Relation-synonym candidates: unordered predicate pairs whose
    AMIE rule confidence (``kg_rule_confidence``) clears ``min_conf``
    in BOTH directions — p1 ⇒ p2 AND p2 ⇒ p1 — the signal that two
    predicate surface forms name one relation ("binds"/"binds_to").
    Both direction scores are kept so the schema curator can see
    asymmetry before merging; one-directional high confidence is
    subsumption, not synonymy, and stays in kg_rule_confidence.

    Scale shape: rides kg_rule_confidence's exchange, then ONE
    predicate-pair-keyed bounded join of the table's two direction
    halves (predicate-vocabulary² rows, a constant). The threshold
    compares the same IEEE doubles both engines computed, so the
    filter is exactly replayable. Columns: lo, hi, conf_fwd
    (lo ⇒ hi), conf_rev (hi ⇒ lo)."""
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    rules = kg_rule_confidence(sf_dir, edges=edges).materialize()

    fwd_schema = pa.schema(
        [("lo", pa.string()), ("hi", pa.string()), ("conf_fwd", pa.float64())]
    )
    rev_schema = pa.schema(
        [("lo", pa.string()), ("hi", pa.string()), ("conf_rev", pa.float64())]
    )

    def fwd_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return fwd_schema.empty_table()
        t = t.filter(pc.less(t.column("p1"), t.column("p2")))
        return pa.table(
            {"lo": t.column("p1"), "hi": t.column("p2"), "conf_fwd": t.column("confidence")}
        )

    def rev_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return rev_schema.empty_table()
        t = t.filter(pc.greater(t.column("p1"), t.column("p2")))
        return pa.table(
            {"lo": t.column("p2"), "hi": t.column("p1"), "conf_rev": t.column("confidence")}
        )

    joined = bucketed_inner_join(
        pin_schema(rules.map_batches(fwd_rows, batch_format="pyarrow"), fwd_schema),
        pin_schema(rules.map_batches(rev_rows, batch_format="pyarrow"), rev_schema),
        ["lo", "hi"],
        fwd_schema,
        rev_schema,
    )
    out_schema = pa.schema(
        [
            ("lo", pa.string()),
            ("hi", pa.string()),
            ("conf_fwd", pa.float64()),
            ("conf_rev", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        keep = pc.greater_equal(
            pc.min_element_wise(t.column("conf_fwd"), t.column("conf_rev")), min_conf
        )
        t = t.filter(keep)
        return t.select(["lo", "hi", "conf_fwd", "conf_rev"])

    return pin_schema(joined.map_batches(finish, batch_format="pyarrow"), out_schema)


def kg_edge_recency(
    sf_dir: str,
    horizon_days: int = 365,
    half_life_days: int = 30,
    pools: int = 2,
):
    """Freshness-weighted edge confidence — the temporal-KG maintenance
    signal (recrawl prioritization, stale-fact decay: an edge seen only
    in old crawls should outrank-decay one re-attested yesterday).
    Each supporting mention contributes ``10^6 // 2^(age_days //
    half_life_days)`` micro-units (exact integer half-life decay — a
    bit shift, no libm), where age_days derives deterministically from
    the source page id (``doc_id % horizon_days`` — the fixture's
    stand-in for now() − warc_ts; on the real crawl this is a timestamp
    subtraction on the ``warc_ts`` column and nothing downstream
    changes). ONE corpus-sized pass over the triple stream + ONE
    bucketed aggregate on the edge key; no joins. Columns: subj, pred,
    obj, weight, fresh_micro (Σ decayed support), min_age_days
    (freshest attestation)."""
    import numpy as np
    import ray

    from bioner_ray.stages.link import ConceptIndex
    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.triples import triples_stage

    index_ref = ray.put(ConceptIndex(make_identity_concepts()))
    triples = triples_stage(
        _tagged_documents(sf_dir, pools=pools),
        index_ref,
        concurrency=sized_pool(
            _nrows(sf_dir, "documents"), batch_size=64, max_actors=16, pools=pools
        ),
        relation_lexicon=frozenset(RELATION_WORDS),
    )
    out_schema = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("weight", pa.int64()),
            ("fresh_micro", pa.int64()),
            ("min_age_days", pa.int64()),
        ]
    )

    def decay(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        doc_id = pc.cast(
            pc.utf8_slice_codeunits(t.column("url"), 6), pa.int64()
        ).to_numpy(zero_copy_only=False)
        age = doc_id % horizon_days
        fresh = (10**6) >> np.minimum(age // half_life_days, 62)
        return pa.table(
            {
                "subj": t.column("subj"),
                "pred": t.column("pred"),
                "obj": t.column("obj"),
                "weight": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "fresh_micro": pa.array(fresh.astype(np.int64)),
                "min_age_days": pa.array(age.astype(np.int64)),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            triples.map_batches(decay, batch_format="pyarrow"),
            ["subj", "pred", "obj"],
            [("weight", "sum"), ("fresh_micro", "sum"), ("min_age_days", "min")],
        ),
        out_schema,
    )


def kg_edge_provenance(sf_dir: str, pools: int = 2):
    """Per-edge provenance ledger — the audit table a production KG
    publishes next to the edge list: how many mentions support each
    (subj, pred, obj), across how many distinct source pages, and the
    first/last page by id. Exact distinct-url counting via the
    engine's two-level aggregate (level 1 collapses to (edge, url)
    mention counts — the only corpus-sized exchange; level 2 folds the
    edge-bounded residue), so no per-key url set is ever held in
    memory. Columns: subj, pred, obj, n_mentions, n_urls, first_url,
    last_url."""
    import ray

    from bioner_ray.stages.link import ConceptIndex
    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.triples import triples_stage

    index_ref = ray.put(ConceptIndex(make_identity_concepts()))
    triples = triples_stage(
        _tagged_documents(sf_dir, pools=pools),
        index_ref,
        concurrency=sized_pool(
            _nrows(sf_dir, "documents"), batch_size=64, max_actors=16, pools=pools
        ),
        relation_lexicon=frozenset(RELATION_WORDS),
    )
    lvl1_schema = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("url", pa.string()),
            ("n_mentions", pa.int64()),
        ]
    )
    lvl1 = pin_schema(
        bucketed_aggregate(
            with_ones(
                triples.map_batches(
                    lambda t: t.select(["subj", "pred", "obj", "url"]),
                    batch_format="pyarrow",
                ),
                "n_mentions",
            ),
            ["subj", "pred", "obj", "url"],
            [("n_mentions", "sum")],
        ),
        lvl1_schema,
    )

    def widen(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": t.column("subj"),
                "pred": t.column("pred"),
                "obj": t.column("obj"),
                "n_mentions": t.column("n_mentions"),
                "n_urls": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "first_url": t.column("url"),
                "last_url": t.column("url"),
            }
        )

    out = bucketed_aggregate(
        lvl1.map_batches(widen, batch_format="pyarrow"),
        ["subj", "pred", "obj"],
        [
            ("n_mentions", "sum"),
            ("n_urls", "sum"),
            ("first_url", "min"),
            ("last_url", "max"),
        ],
    )
    return pin_schema(
        out,
        pa.schema(
            [
                ("subj", pa.string()),
                ("pred", pa.string()),
                ("obj", pa.string()),
                ("n_mentions", pa.int64()),
                ("n_urls", pa.int64()),
                ("first_url", pa.string()),
                ("last_url", pa.string()),
            ]
        ),
    )


def local_supplier_volume(sf_dir: str, year: int = 1996):
    """TPC-H Q5 shape: revenue in ``year`` from lineitems where the
    ordering customer and the supplier sit in the SAME nation, grouped
    by that nation — the classic multi-join with a join-key-free
    equality predicate (c_nationkey = s_nationkey) resolved AFTER the
    joins. Tiny dims broadcast once (nation names, supplier→nation);
    the two data-scale sides each ride ONE bucketed exchange: orders
    (year-filtered) ⋈ customer-nation projection on custkey, then
    lineitem ⋈ that order table on orderkey; the nation equality is a
    vectorized in-row filter after the second join. Revenue is integer
    cents with per-element rounding. Columns: n_name, revenue_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_ref = ray.put(dict(zip(nat["n_nationkey"].astype(int), nat["n_name"])))
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp_ref = ray.put(
        dict(zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int)))
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("c_custkey"),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.equal(pc.year(t.column("o_orderdate")), year)).select(
            ["o_orderkey", "o_custkey"]
        ),
        batch_format="pyarrow",
    )
    ord_nat = bucketed_inner_join(
        orders,
        cust,
        ["o_custkey"],
        pa.schema([("o_custkey", pa.int64()), ("o_orderkey", pa.int64())]),
        pa.schema([("o_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
    ).map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"])
        if t.num_columns
        else pa.schema(
            [("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        smap = ray.get(supp_ref)
        sn = np.array(
            [smap[k] for k in t.column("l_suppkey").to_pylist()], dtype=np.int64
        )
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(
                            pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())
                        ),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "s_nationkey": pa.array(sn),
                "revenue_cents": rev,
            }
        )

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_prep, batch_format="pyarrow")
    joined = bucketed_inner_join(
        li,
        ord_nat,
        ["o_orderkey"],
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("s_nationkey", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        ),
        pa.schema([("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())]),
    )

    def local_only(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("n_name", pa.string()), ("revenue_cents", pa.int64())]
            ).empty_table()
        t = t.filter(pc.equal(t.column("s_nationkey"), t.column("c_nationkey")))
        names = ray.get(name_ref)
        nn = [names[k] for k in t.column("s_nationkey").to_pylist()]
        return pa.table(
            {
                "n_name": pa.array(nn, type=pa.string()),
                "revenue_cents": t.column("revenue_cents"),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            joined.map_batches(local_only, batch_format="pyarrow"),
            ["n_name"],
            [("revenue_cents", "sum")],
        ),
        pa.schema([("n_name", pa.string()), ("revenue_cents", pa.int64())]),
    )


# Ambiguous-surface sense inventory for the Lesk disambiguator:
# (surface, concept_id, profile tokens). Module-level so the DuckDB
# twin generator inlines the SAME table (the cms_params/bloom_params
# contract). Profiles use real corpus vocabulary so overlaps occur.
LESK_SENSES = (
    ("sort", "sort/order", ("order", "key")),
    ("sort", "sort/merge", ("merge", "hash")),
    ("join", "join/hash", ("hash", "batch")),
    ("join", "join/merge", ("merge", "sort")),
    ("scan", "scan/table", ("table", "row")),
    ("scan", "scan/filter", ("filter", "query")),
)


def lesk_disambiguation(sf_dir: str, window: int = 3):
    """Simplified-Lesk word-sense disambiguation — the WSD step an
    entity linker runs on ambiguous surface forms before concept
    assignment (Lesk 1986: pick the sense whose signature overlaps the
    occurrence's context most): every occurrence of an ambiguous
    surface scores each candidate sense by the count of ±``window``
    context tokens inside the sense's profile, the argmax wins (ties →
    concept id ascending — every occurrence gets a sense, the Lesk
    default), and wins fold to per-(surface, concept) totals.

    Engine shape: ONE streaming pass over the corpus — the flat token
    stream comes from the split offsets, occurrences and per-shift
    context membership are numpy masks (shifts × senses passes over
    the occurrence vector, never a per-token Python loop), per-block
    partial win counts combine before the single sense-bounded
    shuffle. The DuckDB twin replays the window join and the
    (overlap DESC, concept ASC) vote verbatim. Columns: surface,
    concept, n_wins."""
    import pandas as pd

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    surfaces = sorted({s for s, _, _ in LESK_SENSES})
    by_surface: dict = {}
    for su, co, prof in LESK_SENSES:
        by_surface.setdefault(su, []).append((co, np.array(prof, dtype=object)))
    for su in by_surface:
        by_surface[su].sort()  # concept ascending = argmax tie rule

    out_schema = pa.schema(
        [("surface", pa.string()), ("concept", pa.string()), ("n_wins", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(off) - 1
        vals = pd.Series(split.values.slice(off[0], off[-1] - off[0]).to_pylist())
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(off))
        keep = (vals != "").to_numpy()
        tok = vals[keep].to_numpy()
        d = doc_idx[keep]
        n = len(tok)
        counts: dict = {}
        if n:
            occ_mask = np.isin(tok, surfaces)
            occ = np.flatnonzero(occ_mask)
            if len(occ):
                # context token per shift (None where out of doc/bounds)
                shifts = [s for s in range(-window, window + 1) if s != 0]
                neigh = []
                for sh in shifts:
                    j = occ + sh
                    valid = (j >= 0) & (j < n)
                    jj = np.clip(j, 0, n - 1)
                    valid &= d[jj] == d[occ]
                    nt = tok[jj].copy()
                    nt[~valid] = ""
                    neigh.append(nt)
                occ_tok = tok[occ]
                for su in surfaces:
                    m = occ_tok == su
                    if not m.any():
                        continue
                    cands = by_surface[su]
                    ov = np.zeros((int(m.sum()), len(cands)), dtype=np.int64)
                    for ci, (_co, prof) in enumerate(cands):
                        for nt in neigh:
                            ov[:, ci] += np.isin(nt[m], prof)
                    winner = np.argmax(ov, axis=1)  # first max = concept asc
                    for ci, cnt in zip(*np.unique(winner, return_counts=True)):
                        key = (su, cands[int(ci)][0])
                        counts[key] = counts.get(key, 0) + int(cnt)
        return pa.table(
            {
                "surface": pa.array([k[0] for k in counts], type=pa.string()),
                "concept": pa.array([k[1] for k in counts], type=pa.string()),
                "n_wins": pa.array(list(counts.values()), type=pa.int64()),
            },
            schema=out_schema,
        )

    docs = _read(sf_dir, "documents", columns=["text"])
    return pin_schema(
        bucketed_aggregate(
            docs.map_batches(partial, batch_format="pyarrow"),
            ["surface", "concept"],
            [("n_wins", "sum")],
        ),
        out_schema,
    )


def kg_window_cooccurrence(sf_dir: str, window: int = 5):
    """Windowed entity co-mention graph — the PMI-graph builder used
    when KG edges come from proximity rather than adjacency: every
    UNORDERED pair of entity occurrences at most ``window`` kept-token
    positions apart in a document counts once. Shuffle-free pair
    emission: inside each batch the token stream is flattened once and
    the window unrolls into ``window`` vectorized shift comparisons
    (entity mask ∧ same-doc mask — no per-token Python, no per-doc
    loop); the only exchange is the final entity-vocab²-bounded pair
    aggregate. Columns: a, b, n_cooc."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.textstats import _split_lower

    ent_arr = np.array(sorted(ENTITY_SURFACES), dtype=object)

    def pairs(batch: pa.Table) -> pa.Table:
        toks = _split_lower(batch, "text")
        words = np.array([w for row in toks for w in row], dtype=object)
        if len(words) == 0:
            return pa.schema([("a", pa.string()), ("b", pa.string())]).empty_table()
        docs = np.repeat(np.arange(len(toks), dtype=np.int64), [len(r) for r in toks])
        is_ent = np.isin(words, ent_arr)
        out_a, out_b = [], []
        for d in range(1, window + 1):
            if d >= len(words):
                break
            ok = is_ent[:-d] & is_ent[d:] & (docs[:-d] == docs[d:])
            if not ok.any():
                continue
            w1, w2 = words[:-d][ok], words[d:][ok]
            lo = np.minimum(w1, w2)
            hi = np.maximum(w1, w2)
            out_a.append(lo)
            out_b.append(hi)
        if not out_a:
            return pa.schema([("a", pa.string()), ("b", pa.string())]).empty_table()
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.string()),
                "b": pa.array(np.concatenate(out_b), type=pa.string()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["text"]).map_batches(
        pairs, batch_format="pyarrow"
    )
    return pin_schema(
        bucketed_aggregate(with_ones(ds, "n_cooc"), ["a", "b"], [("n_cooc", "sum")]),
        pa.schema([("a", pa.string()), ("b", pa.string()), ("n_cooc", pa.int64())]),
    )


def volume_shipping(sf_dir: str, nation_a: str = "NATION_13", nation_b: str = "NATION_19"):
    """TPC-H Q7 shape: shipped revenue BETWEEN two nations (either
    direction) per ship-year — the bidirectional-pair predicate
    resolved in-row after the joins. Supplier→nation and nation-name
    maps broadcast once (`ray.put`); the data-scale sides ride the
    same two bucketed exchanges as local_supplier_volume: orders ⋈
    customer-nation on custkey, then year-filtered lineitem ⋈ that on
    orderkey. Columns: supp_nation, cust_nation, l_year, revenue_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    name_ref = ray.put(names)
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp_ref = ray.put(
        dict(zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int)))
    )
    pair_keys = {k for k, v in names.items() if v in (nation_a, nation_b)}

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("c_custkey"),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ).filter(pc.is_in(pc.cast(t.column("c_nationkey"), pa.int64()),
                          value_set=pa.array(sorted(pair_keys), type=pa.int64()))),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    ord_nat = bucketed_inner_join(
        orders,
        cust,
        ["o_custkey"],
        pa.schema([("o_custkey", pa.int64()), ("o_orderkey", pa.int64())]),
        pa.schema([("o_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
    ).map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"])
        if t.num_columns
        else pa.schema(
            [("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        yr = pc.year(t.column("l_shipdate"))
        t = t.filter(pc.or_(pc.equal(yr, 1996), pc.equal(yr, 1997)))
        smap = ray.get(supp_ref)
        sn = np.array(
            [smap[k] for k in t.column("l_suppkey").to_pylist()], dtype=np.int64
        )
        keep = np.isin(sn, np.array(sorted(pair_keys), dtype=np.int64))
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(
                            pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())
                        ),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        out = pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "s_nationkey": pa.array(sn),
                "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
                "revenue_cents": rev,
            }
        )
        return out.filter(pa.array(keep))

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")
    joined = bucketed_inner_join(
        li,
        ord_nat,
        ["o_orderkey"],
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("s_nationkey", pa.int64()),
                ("l_year", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        ),
        pa.schema([("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())]),
    )

    def pair_only(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("supp_nation", pa.string()),
                ("cust_nation", pa.string()),
                ("l_year", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        )
        if t.num_columns == 0:
            return out_schema.empty_table()
        sn = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        cn = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = sn != cn  # both endpoints already restricted to the pair set
        t = t.filter(pa.array(keep))
        nm = ray.get(name_ref)
        return pa.table(
            {
                "supp_nation": pa.array(
                    [nm[k] for k in t.column("s_nationkey").to_pylist()], type=pa.string()
                ),
                "cust_nation": pa.array(
                    [nm[k] for k in t.column("c_nationkey").to_pylist()], type=pa.string()
                ),
                "l_year": t.column("l_year"),
                "revenue_cents": t.column("revenue_cents"),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            joined.map_batches(pair_only, batch_format="pyarrow"),
            ["supp_nation", "cust_nation", "l_year"],
            [("revenue_cents", "sum")],
        ),
        pa.schema(
            [
                ("supp_nation", pa.string()),
                ("cust_nation", pa.string()),
                ("l_year", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        ),
        ensure_block=True,
    )


def returned_customers(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape: top-k customers by revenue lost to returns
    (l_returnflag = 'R') on 1996-Q1 orders. Returned lineitems fold to
    (orderkey, revenue) in-block, ride ONE bucketed join against the
    window-filtered orders, ONE bucketed aggregate to per-customer
    revenue (bounded by |customer|), then a combiner-pruned global
    top-k: each block keeps its local top-k before the single sort, so
    the sort moves k×blocks rows, never the customer table. Customer
    attributes join AFTER the top-k (k rows broadcast-filtered).
    Columns: c_custkey, c_name, n_name, acctbal_cents, revenue_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_ref = ray.put(dict(zip(nat["n_nationkey"].astype(int), nat["n_name"])))

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(
                            pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())
                        ),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"o_orderkey": t.column("l_orderkey"), "revenue_cents": rev})

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(li_prep, batch_format="pyarrow")

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), pa.scalar(np.datetime64("1996-01-01", "us"))),
                pc.less(t.column("o_orderdate"), pa.scalar(np.datetime64("1996-04-01", "us"))),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        li,
        orders,
        ["o_orderkey"],
        pa.schema([("o_orderkey", pa.int64()), ("revenue_cents", pa.int64())]),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    ).map_batches(
        lambda t: t.select(["o_custkey", "revenue_cents"])
        if t.num_columns
        else pa.schema(
            [("o_custkey", pa.int64()), ("revenue_cents", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )
    per_cust = pin_schema(
        bucketed_aggregate(joined, ["o_custkey"], [("revenue_cents", "sum")]),
        pa.schema([("o_custkey", pa.int64()), ("revenue_cents", pa.int64())]),
    )

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        t = t.sort_by([("revenue_cents", "descending"), ("o_custkey", "ascending")])
        return t.slice(0, k)

    top = (
        per_cust.map_batches(prune, batch_format="pyarrow")
        .sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    cust_keys = set(top["o_custkey"].astype(int))
    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
        .map_batches(
            lambda t: t.filter(
                pc.is_in(t.column("c_custkey"), value_set=pa.array(sorted(cust_keys), type=pa.int64()))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    nm = ray.get(name_ref)
    cust["n_name"] = [nm[int(x)] for x in cust["c_nationkey"]]
    cust["acctbal_cents"] = (
        np.sign(cust["c_acctbal"]) * np.round(np.abs(cust["c_acctbal"]) * 100.0)
    ).astype(np.int64)
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(["revenue_cents", "c_custkey"], ascending=[False, True])
    return pa.table(
        {
            "c_custkey": pa.array(out["c_custkey"].astype(np.int64)),
            "c_name": pa.array(out["c_name"], type=pa.string()),
            "n_name": pa.array(out["n_name"], type=pa.string()),
            "acctbal_cents": pa.array(out["acctbal_cents"].astype(np.int64)),
            "revenue_cents": pa.array(out["revenue_cents"].astype(np.int64)),
        }
    )


def small_qty_revenue(sf_dir: str, brand: str = "Brand#23"):
    """TPC-H Q17 shape: revenue locked in small-quantity orders of one
    brand — lineitems whose quantity is below 20% of their part's mean
    quantity. The brand's partkey slice (1/|brands| of part) broadcasts
    once; lineitem is read twice, both passes pruned to that slice at
    the scan: pass 1 folds to per-part (sum_qty, n) via ONE bucketed
    aggregate, pass 2 re-joins that |slice|-bounded table on partkey
    (bucketed) and keeps rows with 5·qty·n < sum_qty — the avg
    comparison cross-multiplied into exact integers, no float division
    on either side. Columns: n_rows, revenue_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    parts = (
        _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("p_brand"), brand)).select(["p_partkey"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    pk = np.sort(parts["p_partkey"].to_numpy().astype(np.int64))
    pk_ref = ray.put(pk)

    def li_prep(t: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = np.isin(lp, keys)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "price_cents": _cents(t.column("l_extendedprice")),
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li1 = _read(sf_dir, "lineitem", columns=cols).map_batches(li_prep, batch_format="pyarrow")
    per_part = pin_schema(
        bucketed_aggregate(
            li1.map_batches(
                lambda t: pa.table(
                    {
                        "l_partkey": t.column("l_partkey"),
                        "sum_qty": t.column("qty"),
                        "n_li": t.column("n"),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["l_partkey"],
            [("sum_qty", "sum"), ("n_li", "sum")],
        ),
        pa.schema([("l_partkey", pa.int64()), ("sum_qty", pa.int64()), ("n_li", pa.int64())]),
    )
    li2 = _read(sf_dir, "lineitem", columns=cols).map_batches(li_prep, batch_format="pyarrow")
    joined = bucketed_inner_join(
        li2.select_columns(["l_partkey", "qty", "price_cents"]),
        per_part,
        ["l_partkey"],
        pa.schema([("l_partkey", pa.int64()), ("qty", pa.int64()), ("price_cents", pa.int64())]),
        pa.schema([("l_partkey", pa.int64()), ("sum_qty", pa.int64()), ("n_li", pa.int64())]),
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {
                    "_one": pa.array([], type=pa.int64()),
                    "n_rows": pa.array([], type=pa.int64()),
                    "revenue_cents": pa.array([], type=pa.int64()),
                }
            )
        qty = t.column("qty").to_numpy(zero_copy_only=False)
        sq = t.column("sum_qty").to_numpy(zero_copy_only=False)
        n = t.column("n_li").to_numpy(zero_copy_only=False)
        keep = 5 * qty * n < sq
        price = t.column("price_cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_one": pa.array([1], type=pa.int64()),
                "n_rows": pa.array([int(keep.sum())], type=pa.int64()),
                "revenue_cents": pa.array([int(price[keep].sum())], type=pa.int64()),
            }
        )

    out = pin_schema(
        bucketed_aggregate(
            joined.map_batches(fold, batch_format="pyarrow"),
            ["_one"],
            [("n_rows", "sum"), ("revenue_cents", "sum")],
            num_buckets=1,
        ),
        pa.schema([("_one", pa.int64()), ("n_rows", pa.int64()), ("revenue_cents", pa.int64())]),
    )
    return out.map_batches(
        lambda t: t.select(["n_rows", "revenue_cents"])
        if t.num_columns
        else pa.schema([("n_rows", pa.int64()), ("revenue_cents", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )


def disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: discounted revenue under a 3-arm disjunction of
    (brand, size-range, quantity-range) predicates that mixes columns
    from BOTH join sides — the case where predicate pushdown can prune
    neither side alone. ONE bucketed join on partkey, then the whole
    disjunction evaluates as vectorized boolean algebra in-row; the
    final fold is a single-group combine. Columns: n_rows, revenue_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    ARMS = [
        ("Brand#3", 1, 5, 1, 11),
        ("Brand#14", 1, 10, 10, 20),
        ("Brand#25", 1, 15, 20, 30),
    ]
    brands = sorted({a[0] for a in ARMS})

    def part_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("p_brand"), value_set=pa.array(brands)))
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "p_brand": t.column("p_brand"),
                "p_size": pc.cast(t.column("p_size"), pa.int64()),
            }
        )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        part_prep, batch_format="pyarrow"
    )

    def li_prep(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pc.subtract(pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())),
        )
        return pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "rev_cents": pc.cast(
                    pc.round(pc.multiply(disc_price, 100.0), round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
            }
        )

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(li_prep, batch_format="pyarrow")
    joined = bucketed_inner_join(
        li,
        part,
        ["p_partkey"],
        pa.schema([("p_partkey", pa.int64()), ("qty", pa.int64()), ("rev_cents", pa.int64())]),
        pa.schema([("p_partkey", pa.int64()), ("p_brand", pa.string()), ("p_size", pa.int64())]),
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {
                    "_one": pa.array([], type=pa.int64()),
                    "n_rows": pa.array([], type=pa.int64()),
                    "revenue_cents": pa.array([], type=pa.int64()),
                }
            )
        brand = t.column("p_brand").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False)
        qty = t.column("qty").to_numpy(zero_copy_only=False)
        keep = np.zeros(t.num_rows, dtype=bool)
        for b, s_lo, s_hi, q_lo, q_hi in ARMS:
            keep |= (brand == b) & (size >= s_lo) & (size <= s_hi) & (qty >= q_lo) & (qty <= q_hi)
        rev = t.column("rev_cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_one": pa.array([1], type=pa.int64()),
                "n_rows": pa.array([int(keep.sum())], type=pa.int64()),
                "revenue_cents": pa.array([int(rev[keep].sum())], type=pa.int64()),
            }
        )

    out = pin_schema(
        bucketed_aggregate(
            joined.map_batches(fold, batch_format="pyarrow"),
            ["_one"],
            [("n_rows", "sum"), ("revenue_cents", "sum")],
            num_buckets=1,
        ),
        pa.schema([("_one", pa.int64()), ("n_rows", pa.int64()), ("revenue_cents", pa.int64())]),
    )
    return out.map_batches(
        lambda t: t.select(["n_rows", "revenue_cents"])
        if t.num_columns
        else pa.schema([("n_rows", pa.int64()), ("revenue_cents", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )


def sales_opportunity(sf_dir: str, cutoff: str = "2000-01-01"):
    """TPC-H Q22 shape: per-nation count + balance of rich-but-lapsed
    customers — acctbal above the global positive mean AND no order
    since ``cutoff`` (the synthetic orders table covers every customer,
    so the classic no-orders-ever predicate would be vacuously empty at
    every scale; the recency cutoff keeps the identical anti-join shape
    with a non-degenerate answer). The global mean stays exact: one
    combiner pass folds customer to (sum_pos_cents, n_pos) scalars, and
    the filter cross-multiplies (bal·n > sum) so no float division
    exists on either side. The anti-join rides the engine's
    empty-partition-proof bucketed ``left anti`` (orders' custkeys
    pre-deduped per block before the exchange).
    Columns: n_name, n_custs, sum_acctbal_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema, with_ones

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_ref = ray.put(dict(zip(nat["n_nationkey"].astype(int), nat["n_name"])))

    def bal_cents(t: pa.Table) -> pa.Table:
        b = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = (np.sign(b) * np.round(np.abs(b) * 100.0)).astype(np.int64)
        return t.append_column("bal_cents", pa.array(cents))

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(bal_cents, batch_format="pyarrow")

    # pass 1: exact global positive mean as two int64 scalars
    tot = (
        cust.map_batches(
            lambda t: pa.table(
                {
                    "_one": pa.array([1], type=pa.int64()),
                    "sum_pos": pa.array(
                        [
                            int(
                                t.column("bal_cents")
                                .to_numpy(zero_copy_only=False)[
                                    t.column("bal_cents").to_numpy(zero_copy_only=False) > 0
                                ]
                                .sum()
                            )
                        ],
                        type=pa.int64(),
                    ),
                    "n_pos": pa.array(
                        [int((t.column("bal_cents").to_numpy(zero_copy_only=False) > 0).sum())],
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("_one")
        .sum(["sum_pos", "n_pos"])
        .to_pandas()
    )
    sum_pos, n_pos = int(tot["sum(sum_pos)"][0]), int(tot["sum(n_pos)"][0])

    rich = cust.map_batches(
        lambda t: t.filter(
            pa.array(t.column("bal_cents").to_numpy(zero_copy_only=False) * n_pos > sum_pos)
        ).select(["c_custkey", "c_nationkey", "bal_cents"]),
        batch_format="pyarrow",
    )
    cut = pa.scalar(np.datetime64(cutoff, "us"))
    order_keys = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.unique(
                    t.filter(pc.greater_equal(t.column("o_orderdate"), cut)).column("o_custkey")
                )
            }
        ),
        batch_format="pyarrow",
    )
    inactive = bucketed_inner_join(
        rich,
        order_keys,
        ["c_custkey"],
        pa.schema(
            [("c_custkey", pa.int64()), ("c_nationkey", pa.int32()), ("bal_cents", pa.int64())]
        ),
        pa.schema([("c_custkey", pa.int64())]),
        join_type="left anti",
    )

    def by_nation(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("n_name", pa.string()), ("n_custs", pa.int64()), ("sum_acctbal_cents", pa.int64())]
            ).empty_table()
        nm = ray.get(name_ref)
        return pa.table(
            {
                "n_name": pa.array(
                    [nm[int(k)] for k in t.column("c_nationkey").to_pylist()], type=pa.string()
                ),
                "n_custs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sum_acctbal_cents": t.column("bal_cents"),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            inactive.map_batches(by_nation, batch_format="pyarrow"),
            ["n_name"],
            [("n_custs", "sum"), ("sum_acctbal_cents", "sum")],
        ),
        pa.schema(
            [("n_name", pa.string()), ("n_custs", pa.int64()), ("sum_acctbal_cents", pa.int64())]
        ),
        ensure_block=True,
    )


def kg_type_inference(sf_dir: str, exclude_preds: tuple = ()):
    """Per-node type induction by predicate majority vote — the KG
    schema-bootstrap step: a node's inferred type is the predicate that
    carries the most triple mass with the node as SUBJECT (ties broken
    lexicographically, so the vote is deterministic and replayable).
    ``exclude_preds`` drops topic-neutral catch-all relations (e.g. a
    generic co-occurrence predicate) from the vote — they dominate
    every node's mass while carrying no type signal; the shape audit
    passes the corpus' generic predicate here.
    The canonical edge table folds to (node, pred) mass via ONE
    bucketed aggregate (vocab²-bounded), then the combiner-pruned
    top-1-per-group keeps each block's local argmax before the single
    per-node shuffle. Columns: node, type, n."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    mass = pin_schema(
        bucketed_aggregate(
            kg_edges(sf_dir).map_batches(
                lambda t: (
                    lambda f: pa.table(
                        {
                            "node": f.column("subj"),
                            "type": f.column("pred"),
                            "n": pc.cast(f.column("weight"), pa.int64()),
                        }
                    )
                )(
                    t.filter(
                        pc.invert(
                            pc.is_in(
                                t.column("pred"),
                                value_set=pa.array(list(exclude_preds), type=pa.string()),
                            )
                        )
                    )
                    if exclude_preds
                    else t
                ),
                batch_format="pyarrow",
            ),
            ["node", "type"],
            [("n", "sum")],
        ),
        pa.schema([("node", pa.string()), ("type", pa.string()), ("n", pa.int64())]),
    )
    top = top_k_per_group(
        mass, "node", [("n", "descending"), ("type", "ascending")], k=1
    )
    return pin_schema(
        top,
        pa.schema(
            [
                ("node", pa.string()),
                ("type", pa.string()),
                ("n", pa.int64()),
                ("rk", pa.int64()),
            ]
        ),
    ).drop_columns(["rk"])


def _typed_edges(sf_dir: str, exclude_preds: tuple = ()):
    """Canonical edges annotated with both endpoints' induced types
    (kg_type_inference majority vote; never-subject nodes — and, when
    ``exclude_preds`` is set, nodes with only excluded-predicate mass —
    fill to 'untyped') — the shared input of the domain/range induction
    and the shape-violation audit. Two edge-scale bucketed LEFT OUTER
    joins (subj then obj). Columns: subj, pred, obj, w, type_s,
    type_o."""
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    edges = kg_edges(sf_dir)
    types = kg_type_inference(sf_dir, exclude_preds=exclude_preds).map_batches(
        lambda t: t.select(["node", "type"]) if t.num_columns else t,
        batch_format="pyarrow",
    )
    e_schema = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("w", pa.int64()),
        ]
    )
    e = edges.map_batches(
        lambda t: pa.table(
            {
                "subj": t.column("subj"),
                "pred": t.column("pred"),
                "obj": t.column("obj"),
                "w": pc.cast(t.column("weight"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j1 = pin_schema(
        bucketed_inner_join(
            e,
            types.map_batches(
                lambda t: t.rename_columns(["subj", "type_s"]), batch_format="pyarrow"
            ),
            ["subj"],
            e_schema,
            pa.schema([("subj", pa.string()), ("type_s", pa.string())]),
            join_type="left outer",
        ),
        pa.schema(list(e_schema) + [("type_s", pa.string())]),
    )
    j2 = pin_schema(
        bucketed_inner_join(
            j1,
            types.map_batches(
                lambda t: t.rename_columns(["obj", "type_o"]), batch_format="pyarrow"
            ),
            ["obj"],
            pa.schema(list(e_schema) + [("type_s", pa.string())]),
            pa.schema([("obj", pa.string()), ("type_o", pa.string())]),
            join_type="left outer",
        ),
        pa.schema(
            list(e_schema) + [("type_s", pa.string()), ("type_o", pa.string())]
        ),
    )
    typed_schema = pa.schema(
        list(e_schema) + [("type_s", pa.string()), ("type_o", pa.string())]
    )

    def fill(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return typed_schema.empty_table()
        return pa.table(
            {
                "subj": t.column("subj"),
                "pred": t.column("pred"),
                "obj": t.column("obj"),
                "w": t.column("w"),
                "type_s": pc.fill_null(t.column("type_s"), "untyped"),
                "type_o": pc.fill_null(t.column("type_o"), "untyped"),
            }
        )

    return pin_schema(j2.map_batches(fill, batch_format="pyarrow"), typed_schema)


def kg_pred_domains(sf_dir: str):
    """Predicate domain/range induction — the ontology-bootstrap step
    after per-node typing (kg_type_inference): for every predicate, the
    dominant (subject-type, object-type) signature by triple mass, with
    the predicate's total mass alongside so coverage = w / w_total is
    one replayable division away. Nodes never seen as a subject carry
    no induced type and fold into 'untyped' (left-outer fill) instead
    of silently dropping their edges.

    Scale shape: the node-type table rides two edge-scale bucketed
    LEFT OUTER joins (subj then obj — the community_stats plan), one
    (pred, type_s, type_o) aggregate bounded by preds x types², a
    combiner-pruned per-pred top-1 and one pred-bounded join for the
    totals. Columns: pred, type_s, type_o, w, w_total."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    typed = _typed_edges(sf_dir)

    g_schema = pa.schema(
        [
            ("pred", pa.string()),
            ("type_s", pa.string()),
            ("type_o", pa.string()),
            ("w", pa.int64()),
        ]
    )
    g = pin_schema(
        bucketed_aggregate(
            typed.map_batches(
                lambda t: t.select(["pred", "type_s", "type_o", "w"])
                if t.num_columns
                else t,
                batch_format="pyarrow",
            ),
            ["pred", "type_s", "type_o"],
            [("w", "sum")],
        ),
        g_schema,
    )
    totals = pin_schema(
        bucketed_aggregate(
            g.map_batches(
                lambda t: pa.table({"pred": t.column("pred"), "w_total": t.column("w")}),
                batch_format="pyarrow",
            ),
            ["pred"],
            [("w_total", "sum")],
        ),
        pa.schema([("pred", pa.string()), ("w_total", pa.int64())]),
    )
    top = pin_schema(
        top_k_per_group(
            g,
            key_col="pred",
            order_by=[("w", "descending"), ("type_s", "ascending"), ("type_o", "ascending")],
            k=1,
        ),
        g_schema,
    )
    out = bucketed_inner_join(
        top,
        totals,
        ["pred"],
        g_schema,
        pa.schema([("pred", pa.string()), ("w_total", pa.int64())]),
    )
    out_schema = pa.schema(
        [
            ("pred", pa.string()),
            ("type_s", pa.string()),
            ("type_o", pa.string()),
            ("w", pa.int64()),
            ("w_total", pa.int64()),
        ]
    )
    return pin_schema(
        out.map_batches(
            lambda t: t.select(out_schema.names) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        out_schema,
    )


def kg_shape_violations(sf_dir: str, exclude_preds: tuple = ("co_occurs_with",)):
    """SHACL-style shape audit over the induced schema: edges whose
    (subject-type, object-type) signature disagrees with their
    predicate's DOMINANT signature — the per-edge violation queue a KG
    quality gate reviews before publishing, the edge-level drill-down
    of the relation-cardinality and conflict audits. Types are induced
    EXCLUDING the corpus' generic co-occurrence predicate
    (``exclude_preds``): the catch-all relation dominates every node's
    subject mass while carrying no type signal, which would collapse
    every signature to one value and make the audit vacuous. Engine
    shape: the shared typed-edge table (``_typed_edges`` — two
    edge-scale left-outer joins, materialized once and reused for both
    the signature fold and the drill-down) → ONE pred×types²-bounded
    aggregate → combiner-pruned per-pred top-1 → ONE pred-keyed
    bucketed join back + a vectorized mismatch filter; violation
    fan-out tracks real off-signature mass. Columns: pred, subj, obj,
    type_s, type_o, exp_s, exp_o, w."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    typed = _typed_edges(sf_dir, exclude_preds=exclude_preds).materialize()
    typed_schema = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("w", pa.int64()),
            ("type_s", pa.string()),
            ("type_o", pa.string()),
        ]
    )
    g_schema = pa.schema(
        [
            ("pred", pa.string()),
            ("type_s", pa.string()),
            ("type_o", pa.string()),
            ("w", pa.int64()),
        ]
    )
    g = pin_schema(
        bucketed_aggregate(
            typed.map_batches(
                lambda t: t.select(["pred", "type_s", "type_o", "w"])
                if t.num_columns
                else t,
                batch_format="pyarrow",
            ),
            ["pred", "type_s", "type_o"],
            [("w", "sum")],
        ),
        g_schema,
    )
    dom_schema = pa.schema(
        [("pred", pa.string()), ("exp_s", pa.string()), ("exp_o", pa.string())]
    )
    dom = pin_schema(
        top_k_per_group(
            g,
            key_col="pred",
            order_by=[
                ("w", "descending"),
                ("type_s", "ascending"),
                ("type_o", "ascending"),
            ],
            k=1,
        ),
        pa.schema(list(g_schema) + [("rk", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {
                "pred": t.column("pred"),
                "exp_s": t.column("type_s"),
                "exp_o": t.column("type_o"),
            }
        )
        if t.num_columns
        else dom_schema.empty_table(),
        batch_format="pyarrow",
    )
    joined = pin_schema(
        bucketed_inner_join(typed, dom, ["pred"], typed_schema, dom_schema),
        pa.schema(list(typed_schema) + [("exp_s", pa.string()), ("exp_o", pa.string())]),
    )
    out_schema = pa.schema(
        [
            ("pred", pa.string()),
            ("subj", pa.string()),
            ("obj", pa.string()),
            ("type_s", pa.string()),
            ("type_o", pa.string()),
            ("exp_s", pa.string()),
            ("exp_o", pa.string()),
            ("w", pa.int64()),
        ]
    )

    def viol(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        keep = pc.or_(
            pc.not_equal(t.column("type_s"), t.column("exp_s")),
            pc.not_equal(t.column("type_o"), t.column("exp_o")),
        )
        return t.filter(keep).select(out_schema.names)

    return pin_schema(joined.map_batches(viol, batch_format="pyarrow"), out_schema)


def ngram_diversity(sf_dir: str, n: int = 3):
    """Per-source corpus diversity: the type/token ratio of word
    ``n``-grams — the repetition audit an LLM-data pipeline runs per
    source before mixing (low distinct/total = template spam). Totals
    fold in-block; the distinct count is the engine's exact two-level
    dedup: ONE bucketed aggregate collapses (source, gram) — the only
    key-cardinality-scale exchange — then per-source counts are
    source-bounded. No gram string ever reaches the driver. Columns:
    source, n_total, n_distinct, ttr."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.textstats import _split_lower

    def grams(batch: pa.Table) -> pa.Table:
        toks = _split_lower(batch, "text")
        srcs = batch.column("source").to_pylist()
        out_s, out_g = [], []
        for src, row in zip(srcs, toks):
            if len(row) < n:
                continue
            arr = np.array(row, dtype=object)
            g = arr[: len(arr) - n + 1]
            for j in range(1, n):
                g = np.char.add(np.char.add(g.astype(str), " "), arr[j : len(arr) - n + 1 + j].astype(str))
            out_s.append(np.full(len(g), src, dtype=object))
            out_g.append(g.astype(object))
        if not out_s:
            return pa.schema([("source", pa.string()), ("gram", pa.string())]).empty_table()
        return pa.table(
            {
                "source": pa.array(np.concatenate(out_s), type=pa.string()),
                "gram": pa.array(np.concatenate(out_g), type=pa.string()),
            }
        )

    stream = _read(sf_dir, "documents", columns=["text", "source"]).map_batches(
        grams, batch_format="pyarrow"
    )
    # level 1: exact (source, gram) collapse carrying the occurrence count
    collapsed = pin_schema(
        bucketed_aggregate(with_ones(stream, "cnt"), ["source", "gram"], [("cnt", "sum")]),
        pa.schema([("source", pa.string()), ("gram", pa.string()), ("cnt", pa.int64())]),
    )
    # level 2: per-source totals (distinct = one row per surviving key)
    per_source = pin_schema(
        bucketed_aggregate(
            collapsed.map_batches(
                lambda t: pa.table(
                    {
                        "source": t.column("source"),
                        "n_total": t.column("cnt"),
                        "n_distinct": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["source"],
            [("n_total", "sum"), ("n_distinct", "sum")],
        ),
        pa.schema([("source", pa.string()), ("n_total", pa.int64()), ("n_distinct", pa.int64())]),
    )
    return per_source.map_batches(
        lambda t: t.append_column(
            "ttr",
            pc.divide(
                pc.cast(t.column("n_distinct"), pa.float64()),
                pc.cast(t.column("n_total"), pa.float64()),
            ),
        ),
        batch_format="pyarrow",
    )


def _ceil_quantiles(sorted_value_counts, ps):
    """Exact order statistics over a sorted (value, count) histogram:
    for each p (percent), the first value whose cumulative count ≥
    ceil(p·n/100) — the verified DuckDB ``quantile_disc`` rule shared
    by value_percentiles / events_gap_percentiles / orders_rfm (ONE
    implementation so the exactness-critical walk can never
    desynchronize between them)."""
    n = sum(c for _, c in sorted_value_counts)
    out = []
    for p in ps:
        target = (p * n + 99) // 100  # ceil(p/100 · n), exact ints
        cum = 0
        for v, c in sorted_value_counts:
            cum += c
            if cum >= target:
                out.append(v)
                break
    return out


def _user_gap_stream(sf_dir: str):
    """Same-user inter-arrival gap stream (event_type, gap_us): ONE
    user-bucketed exchange, per-bucket sort, vectorized same-user diff
    — the single implementation behind interarrival_stats and
    events_gap_percentiles (the gap semantics must stay identical or
    their twins desynchronize)."""
    from bioner_ray.stages.shuffle import _bucket_column

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id", "event_type"])
        return t.append_column("_bucket", _bucket_column(t, ["user_id"], 256))

    gap_schema = pa.schema([("event_type", pa.string()), ("gap_us", pa.int64())])

    def gaps(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return gap_schema.empty_table()
        g = g.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = g.column("event_type").to_numpy(zero_copy_only=False)
        same = users[1:] == users[:-1]
        return pa.table(
            {
                "event_type": pa.array(types[1:][same], type=pa.string()),
                "gap_us": pa.array((ts[1:] - ts[:-1])[same]),
            },
            schema=gap_schema,
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(gaps, batch_format="pyarrow")
    )


def interarrival_stats(sf_dir: str):
    """Per-event-type inter-arrival statistics: each event's gap to the
    SAME user's previous event (microseconds, attributed to the later
    event's type) folded to n_gaps / sum / min / max, with the mean as
    the replayable int→double division. Same single user-bucketed
    exchange as event_transitions — the reducer sorts each bucket once
    and diffs timestamps under one vectorized same-user mask; the final
    aggregate is event-type-bounded. Columns: event_type, n_gaps,
    sum_gap_us, min_gap_us, max_gap_us, avg_gap_us."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    stream = _user_gap_stream(sf_dir)
    folded = pin_schema(
        bucketed_aggregate(
            stream.map_batches(
                lambda t: pa.table(
                    {
                        "event_type": t.column("event_type"),
                        "n_gaps": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                        "sum_gap_us": t.column("gap_us"),
                        "min_gap_us": t.column("gap_us"),
                        "max_gap_us": t.column("gap_us"),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["event_type"],
            [("n_gaps", "sum"), ("sum_gap_us", "sum"), ("min_gap_us", "min"), ("max_gap_us", "max")],
        ),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n_gaps", pa.int64()),
                ("sum_gap_us", pa.int64()),
                ("min_gap_us", pa.int64()),
                ("max_gap_us", pa.int64()),
            ]
        ),
    )
    return folded.map_batches(
        lambda t: t.append_column(
            "avg_gap_us",
            pc.divide(
                pc.cast(t.column("sum_gap_us"), pa.float64()),
                pc.cast(t.column("n_gaps"), pa.float64()),
            ),
        ),
        batch_format="pyarrow",
    )


def kg_cluster_coeff(sf_dir: str):
    """Per-entity local clustering coefficient over the canonical KG
    (stages/graph.py clustering_coefficients): one degree-oriented
    triangle plan + a left-outer degree join, coeff = 2·tri/(deg·(deg−1))
    pinned 0.0 below deg 2. Columns: node, deg, n_triangles, coeff."""
    from bioner_ray.stages.graph import clustering_coefficients

    return clustering_coefficients(kg_edges(sf_dir))


def late_shipments(sf_dir: str, late_days: int = 90):
    """TPC-H Q12 shape adapted to the testdata's columns (no
    l_shipmode/l_commitdate): per order priority, how many lineitems
    shipped, and how many shipped more than ``late_days`` after the
    order date. ONE bucketed orderkey exchange joins the two
    data-scale tables; the lag is an exact integer day difference
    computed in-row after the join (both Arrow ``days_between`` and
    DuckDB ``date_diff('day', …)`` count calendar-day boundaries, so
    the twin replays the cutoff bit-for-bit). The per-priority fold is
    combiner-pruned: blocks ship one row per priority (5 rows), never
    the lineitem stream. Columns: o_orderpriority, n_items, n_late."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t.column("l_orderkey"), "l_shipdate": t.column("l_shipdate")}
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        li,
        orders,
        ["o_orderkey"],
        pa.schema([("o_orderkey", pa.int64()), ("l_shipdate", pa.timestamp("us"))]),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    def fold(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("o_orderpriority", pa.string()),
                ("n_items", pa.int64()),
                ("n_late", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        lag = pc.days_between(t.column("o_orderdate"), t.column("l_shipdate"))
        late = pc.cast(pc.greater(lag, late_days), pa.int64())
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "n_items": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_late": late,
            }
        )

    return pin_schema(
        bucketed_aggregate(
            joined.map_batches(fold, batch_format="pyarrow"),
            ["o_orderpriority"],
            [("n_items", "sum"), ("n_late", "sum")],
        ),
        pa.schema(
            [
                ("o_orderpriority", pa.string()),
                ("n_items", pa.int64()),
                ("n_late", pa.int64()),
            ]
        ),
        ensure_block=True,
    )


def min_cost_supplier(sf_dir: str, size: int = 15):
    """TPC-H Q2 shape adapted (no partsupp table): for every part of
    one size class, the supplier that shipped it cheapest — the
    per-group ARGMIN resolved distributed, with a deterministic
    tie-break. The size-class partkey slice broadcasts once and prunes
    lineitem at the scan; per-part min price is ONE bucketed
    aggregate; the join-back on (partkey) re-reads the pruned slice
    and keeps rows at the minimum, and a second bucketed aggregate
    takes min(suppkey) among price ties (TPC-H Q2's own tie rule is a
    sort; min-key is the order-free equivalent). Supplier/part names
    attach from broadcast dimension dicts — never a shuffle. Columns:
    p_partkey, p_name, s_suppkey, s_name, price_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    part = (
        _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_size"])
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("p_size"), size)).select(
                ["p_partkey", "p_name"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    pk = np.sort(part["p_partkey"].to_numpy().astype(np.int64))
    pk_ref = ray.put(pk)
    pname_ref = ray.put(dict(zip(part["p_partkey"].astype(int), part["p_name"])))
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    sname_ref = ray.put(dict(zip(supp["s_suppkey"].astype(int), supp["s_name"])))

    def li_prep(t: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        keep = np.isin(t.column("l_partkey").to_numpy(zero_copy_only=False), keys)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "price_cents": _cents(t.column("l_extendedprice")),
            }
        )

    cols = ["l_partkey", "l_suppkey", "l_extendedprice"]
    # one scan: the pruned slice is small (one size class) and feeds
    # both the min aggregate and the join-back
    li1 = (
        _read(sf_dir, "lineitem", columns=cols)
        .map_batches(li_prep, batch_format="pyarrow")
        .materialize()
    )
    mins = pin_schema(
        bucketed_aggregate(
            li1.map_batches(
                lambda t: pa.table(
                    {"l_partkey": t.column("l_partkey"), "min_cents": t.column("price_cents")}
                ),
                batch_format="pyarrow",
            ),
            ["l_partkey"],
            [("min_cents", "min")],
        ),
        pa.schema([("l_partkey", pa.int64()), ("min_cents", pa.int64())]),
    )
    joined = bucketed_inner_join(
        li1,
        mins,
        ["l_partkey"],
        pa.schema(
            [("l_partkey", pa.int64()), ("l_suppkey", pa.int64()), ("price_cents", pa.int64())]
        ),
        pa.schema([("l_partkey", pa.int64()), ("min_cents", pa.int64())]),
    )

    def at_min(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("l_partkey", pa.int64()), ("s_suppkey", pa.int64()), ("price_cents", pa.int64())]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        t = t.filter(pc.equal(t.column("price_cents"), t.column("min_cents")))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "s_suppkey": t.column("l_suppkey"),
                "price_cents": t.column("price_cents"),
            }
        )

    winners = pin_schema(
        bucketed_aggregate(
            joined.map_batches(at_min, batch_format="pyarrow"),
            ["l_partkey", "price_cents"],
            [("s_suppkey", "min")],
        ),
        pa.schema(
            [("l_partkey", pa.int64()), ("price_cents", pa.int64()), ("s_suppkey", pa.int64())]
        ),
        ensure_block=True,
    )

    def attach_names(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("price_cents", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        pnames = ray.get(pname_ref)
        snames = ray.get(sname_ref)
        return pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "p_name": pa.array(
                    [pnames[k] for k in t.column("l_partkey").to_pylist()], type=pa.string()
                ),
                "s_suppkey": t.column("s_suppkey"),
                "s_name": pa.array(
                    [snames[k] for k in t.column("s_suppkey").to_pylist()], type=pa.string()
                ),
                "price_cents": t.column("price_cents"),
            }
        )

    return winners.map_batches(attach_names, batch_format="pyarrow")


def product_profit(sf_dir: str, name_word: str = "widget"):
    """TPC-H Q9 shape adapted (no partsupp: supply cost stands in as
    the part's retail price): profit per supplier nation per order
    year over the parts whose name contains ``name_word``. The part
    slice (partkey → retail cents) and supplier → nation-name maps
    broadcast once; profit per lineitem is exact integer cents
    (revenue − retail·qty) computed in-row at the scan, so the only
    data-scale exchange is ONE bucketed orderkey join against orders
    for the year, followed by the (nation, year)-keyed combiner-pruned
    aggregate. Columns: nation, o_year, profit_cents."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    part = (
        _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
        .map_batches(
            lambda t: t.filter(
                pc.match_substring(t.column("p_name"), name_word)
            ).select(["p_partkey", "p_retailprice"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    retail_cents = {
        int(k): int(v)
        for k, v in zip(
            part["p_partkey"],
            np.round(np.abs(part["p_retailprice"].to_numpy()) * 100.0)
            * np.sign(part["p_retailprice"].to_numpy()),
        )
    }
    retail_ref = ray.put(retail_cents)
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    snat_ref = ray.put(
        {int(k): names[int(v)] for k, v in zip(supp["s_suppkey"], supp["s_nationkey"])}
    )

    def li_prep(t: pa.Table) -> pa.Table:
        rc = ray.get(retail_ref)
        snat = ray.get(snat_ref)
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = np.isin(lp, np.fromiter(rc.keys(), dtype=np.int64, count=len(rc)))
        t = t.filter(pa.array(keep))
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(
                            pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())
                        ),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        cost = np.array([rc[k] for k in lp], dtype=np.int64) * qty
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "nation": pa.array(
                    [snat[k] for k in t.column("l_suppkey").to_pylist()], type=pa.string()
                ),
                "profit_cents": pa.array(rev - cost),
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        li,
        orders,
        ["o_orderkey"],
        pa.schema(
            [("o_orderkey", pa.int64()), ("nation", pa.string()), ("profit_cents", pa.int64())]
        ),
        pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
    )
    return pin_schema(
        bucketed_aggregate(
            joined.map_batches(
                lambda t: t.select(["nation", "o_year", "profit_cents"])
                if t.num_columns
                else pa.schema(
                    [("nation", pa.string()), ("o_year", pa.int64()), ("profit_cents", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["nation", "o_year"],
            [("profit_cents", "sum")],
        ),
        pa.schema(
            [("nation", pa.string()), ("o_year", pa.int64()), ("profit_cents", pa.int64())]
        ),
        ensure_block=True,
    )


def kg_sssp(sf_dir: str, n_seeds: int = 3, rounds: int = 4):
    """Multi-source weighted shortest paths over the canonical KG
    (stages/graph.py sssp_distances): fixed-round Bellman-Ford with
    integer edge cost 1_000_000 // weight (strong associations = short
    hops), seeds = the n_seeds lexicographically-smallest entities.
    The weighted companion to kg_bfs's unweighted hop counts — "how
    tightly is this entity coupled to the seed set", the KG-serving
    proximity query. Columns: node, dist."""
    from bioner_ray.stages.graph import sssp_distances

    return sssp_distances(kg_edges(sf_dir), n_seeds=n_seeds, rounds=rounds)


def important_parts(sf_dir: str, mean_num: int = 3, mean_den: int = 2):
    """TPC-H Q11 shape adapted (no partsupp: lineitem revenue stands in
    for stock value): parts whose total revenue exceeds (``mean_num``/``mean_den``)×
    the MEAN per-part revenue — the per-group-vs-global-scalar filter,
    with a scale-free cutoff (Q11's literal 0.0001 fraction empties as
    the part dimension grows; the mean-relative form stays non-vacuous
    at every sf). Per-part value is ONE combiner-pruned bucketed
    aggregate; the global total and part count re-aggregate that
    part-dim-bounded table (never the lineitem stream) and the
    comparison cross-multiplies into exact integers
    (value · n_parts · mean_den > mean_num · total), no division on either side.
    Columns: p_partkey, value_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(
                            pa.scalar(1.0), pc.cast(t.column("l_discount"), pa.float64())
                        ),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"p_partkey": t.column("l_partkey"), "value_cents": rev})

    per_part = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])
            .map_batches(prep, batch_format="pyarrow"),
            ["p_partkey"],
            [("value_cents", "sum")],
        ),
        pa.schema([("p_partkey", pa.int64()), ("value_cents", pa.int64())]),
        ensure_block=True,
    ).materialize()
    # global total + part count: fold the part-dim-bounded table
    total, n_parts = 0, 0
    for b in per_part.iter_batches(batch_format="pyarrow"):
        if b.num_columns:
            total += int(pc.sum(b.column("value_cents")).as_py() or 0)
            n_parts += b.num_rows

    def keep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("p_partkey", pa.int64()), ("value_cents", pa.int64())]
            ).empty_table()
        # python-int (object) arithmetic: the cross-multiply exceeds
        # int64 once total revenue × part count passes 2^63 at scale
        v = t.column("value_cents").to_numpy(zero_copy_only=False).astype(object)
        keep = (v * n_parts * mean_den) > (mean_num * total)
        return t.filter(pa.array(keep.astype(bool)))

    return per_part.map_batches(keep, batch_format="pyarrow")


def waiting_suppliers(sf_dir: str, k: int = 10):
    """TPC-H Q21 shape adapted to the testdata's columns (returnflag
    marks the fault instead of the missing commit/receipt dates): for
    finalized orders (o_orderstatus = 'F') that involve ≥ 2 suppliers
    where EXACTLY ONE supplier had lineitems returned, blame that
    supplier; rank suppliers by orders blamed. The classic
    multi-EXISTS/NOT-EXISTS correlated pair collapses into ONE
    orderkey-bucketed aggregate: per (orderkey, suppkey) fold
    (returned-any), then per orderkey count suppliers / count returned
    suppliers / max(returned ? suppkey) — blame iff n_ret_supp = 1 AND
    n_supp ≥ 2. The order-status filter joins the per-order table
    (orders-sized, not lineitem-sized) against filtered orders; the
    final per-supplier count is combiner-pruned with a k-bounded
    global top-k (numwait DESC, suppkey ASC). Columns: s_suppkey,
    s_name, numwait."""
    import ray

    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    sname_ref = ray.put(dict(zip(supp["s_suppkey"].astype(int), supp["s_name"])))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "ret": pc.cast(pc.equal(t.column("l_returnflag"), "R"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    per_os = pin_schema(
        bucketed_aggregate(
            li,
            ["o_orderkey", "l_suppkey"],
            [("ret", "max")],
            est_bytes=_nrows(sf_dir, "lineitem") * 24,  # inline-slice guard
        ),
        pa.schema([("o_orderkey", pa.int64()), ("l_suppkey", pa.int64()), ("ret", pa.int64())]),
    )

    def order_fold(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("n_supp", pa.int64()),
                ("n_ret_supp", pa.int64()),
                ("blamed", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        ret = t.column("ret").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "n_supp": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_ret_supp": pa.array(ret.astype(np.int64)),
                # max over (ret ? suppkey : -1) identifies the single
                # returned supplier whenever n_ret_supp == 1
                "blamed": pa.array(np.where(ret > 0, sk, -1).astype(np.int64)),
            }
        )

    per_order = pin_schema(
        bucketed_aggregate(
            per_os.map_batches(order_fold, batch_format="pyarrow"),
            ["o_orderkey"],
            [("n_supp", "sum"), ("n_ret_supp", "sum"), ("blamed", "max")],
            est_bytes=_nrows(sf_dir, "lineitem") * 40,  # inline-slice guard
        ),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("n_supp", pa.int64()),
                ("n_ret_supp", pa.int64()),
                ("blamed", pa.int64()),
            ]
        ),
    )
    fin = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderstatus"), "F")).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    blamed = bucketed_inner_join(
        per_order,
        fin,
        ["o_orderkey"],
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("n_supp", pa.int64()),
                ("n_ret_supp", pa.int64()),
                ("blamed", pa.int64()),
            ]
        ),
        pa.schema([("o_orderkey", pa.int64())]),
        est_bytes=_nrows(sf_dir, "orders") * 48,  # inline-slice guard
    ).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.filter(
                    pc.and_(
                        pc.equal(t.column("n_ret_supp"), 1),
                        pc.greater_equal(t.column("n_supp"), 2),
                    )
                ).column("blamed"),
            }
        )
        if t.num_columns
        else pa.schema([("s_suppkey", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )
    counts = pin_schema(
        bucketed_aggregate(
            blamed.map_batches(
                lambda t: t.append_column(
                    "numwait", pa.array(np.ones(t.num_rows, dtype=np.int64))
                ),
                batch_format="pyarrow",
            ),
            ["s_suppkey"],
            [("numwait", "sum")],
        ),
        pa.schema([("s_suppkey", pa.int64()), ("numwait", pa.int64())]),
        ensure_block=True,
    )
    top = top_k_per_group(
        counts.map_batches(
            lambda t: t.append_column("_one", pa.array(np.ones(t.num_rows, dtype=np.int64)))
            if t.num_columns
            else pa.schema(
                [("s_suppkey", pa.int64()), ("numwait", pa.int64()), ("_one", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        ),
        "_one",
        [("numwait", "descending"), ("s_suppkey", "ascending")],
        k,
    )

    def attach(t: pa.Table) -> pa.Table:
        import ray as _ray

        schema = pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("numwait", pa.int64()),
                ("rk", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        names = _ray.get(sname_ref)
        return pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "s_name": pa.array(
                    [names[s] for s in t.column("s_suppkey").to_pylist()], type=pa.string()
                ),
                "numwait": t.column("numwait"),
                "rk": t.column("rk"),
            }
        )

    return top.map_batches(attach, batch_format="pyarrow")


def bulk_suppliers(sf_dir: str, name_word: str = "bolt", year: int = 1996):
    """TPC-H Q20 shape adapted (no partsupp: a supplier "dominates" a
    part when it shipped MORE THAN HALF of that part's total quantity
    in the year, standing in for availqty > ½·shipped): suppliers that
    dominate ≥ 1 part of the name slice, with how many. The correlated
    scalar subquery (per-part total vs per-(part, supplier) share)
    collapses into TWO aggregates over the scan-pruned slice — per
    (part, supplier) then per part over that already-combined table —
    plus one partkey-bucketed join-back and the exact cross-multiplied
    comparison 2·supp_qty > part_qty. Supplier names broadcast.
    Columns: s_suppkey, s_name, n_parts_dominated."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    part = (
        _read(sf_dir, "part", columns=["p_partkey", "p_name"])
        .map_batches(
            lambda t: t.filter(pc.match_substring(t.column("p_name"), name_word)).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    pk_ref = ray.put(np.sort(part["p_partkey"].to_numpy().astype(np.int64)))
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    sname_ref = ray.put(dict(zip(supp["s_suppkey"].astype(int), supp["s_name"])))

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.year(t.column("l_shipdate")), year))
        keys = ray.get(pk_ref)
        keep = np.isin(t.column("l_partkey").to_numpy(zero_copy_only=False), keys)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).map_batches(li_prep, batch_format="pyarrow")
    ps_schema = pa.schema(
        [("l_partkey", pa.int64()), ("l_suppkey", pa.int64()), ("qty", pa.int64())]
    )
    per_ps = pin_schema(
        bucketed_aggregate(li, ["l_partkey", "l_suppkey"], [("qty", "sum")]), ps_schema
    ).materialize()
    per_part = pin_schema(
        bucketed_aggregate(
            per_ps.map_batches(
                lambda t: pa.table(
                    {"l_partkey": t.column("l_partkey"), "part_qty": t.column("qty")}
                ),
                batch_format="pyarrow",
            ),
            ["l_partkey"],
            [("part_qty", "sum")],
        ),
        pa.schema([("l_partkey", pa.int64()), ("part_qty", pa.int64())]),
    )
    joined = bucketed_inner_join(
        per_ps,
        per_part,
        ["l_partkey"],
        ps_schema,
        pa.schema([("l_partkey", pa.int64()), ("part_qty", pa.int64())]),
    )

    def dominate(t: pa.Table) -> pa.Table:
        schema = pa.schema([("s_suppkey", pa.int64()), ("n_parts_dominated", pa.int64())])
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        q = t.column("qty").to_numpy(zero_copy_only=False)
        pq_ = t.column("part_qty").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(2 * q > pq_))
        return pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "n_parts_dominated": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    counts = pin_schema(
        bucketed_aggregate(
            joined.map_batches(dominate, batch_format="pyarrow"),
            ["s_suppkey"],
            [("n_parts_dominated", "sum")],
        ),
        pa.schema([("s_suppkey", pa.int64()), ("n_parts_dominated", pa.int64())]),
        ensure_block=True,
    )

    def attach(t: pa.Table) -> pa.Table:
        import ray as _ray

        schema = pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("n_parts_dominated", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        names = _ray.get(sname_ref)
        return pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "s_name": pa.array(
                    [names[s] for s in t.column("s_suppkey").to_pylist()], type=pa.string()
                ),
                "n_parts_dominated": t.column("n_parts_dominated"),
            }
        )

    return counts.map_batches(attach, batch_format="pyarrow")


def events_day_over_day(sf_dir: str):
    """Day-over-day deltas per event type — LAG() OVER (PARTITION BY
    type ORDER BY day) applied to the CALENDAR-BOUNDED daily aggregate,
    never the event stream: one combiner-pruned bucketed aggregate to
    (type, day) rows, then the lag pairing runs driver-side on the
    types × days table (the events_pivot / value_percentiles finish
    pattern). First day per type has no predecessor and is dropped,
    matching the twin's LAG IS NOT NULL. Columns: event_type, day,
    value_cents, prev_cents, delta_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.floor_temporal(batch.column("ts"), unit="day"),
                "value_cents": _cents(batch.column("value")),
            }
        )

    daily = bucketed_aggregate(
        _read(sf_dir, "events", columns=["ts", "event_type", "value"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["event_type", "day"],
        [("value_cents", "sum")],
    )
    rows = sorted(
        (
            (r["event_type"], r["day"], r["value_cents"])
            for r in daily.take_all()  # bounded: types × calendar days
        )
    )
    out = {"event_type": [], "day": [], "value_cents": [], "prev_cents": [], "delta_cents": []}
    for i in range(1, len(rows)):
        (et0, _, v0), (et1, d1, v1) = rows[i - 1], rows[i]
        if et0 != et1:
            continue
        out["event_type"].append(et1)
        out["day"].append(d1)
        out["value_cents"].append(v1)
        out["prev_cents"].append(v0)
        out["delta_cents"].append(v1 - v0)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "day": pa.array(out["day"], type=pa.timestamp("us")),
            "value_cents": pa.array(out["value_cents"], type=pa.int64()),
            "prev_cents": pa.array(out["prev_cents"], type=pa.int64()),
            "delta_cents": pa.array(out["delta_cents"], type=pa.int64()),
        }
    )


def embedding_drift(sf_dir: str):
    """Split-half centroid drift per label — the training-data drift
    monitor: embeddings split into two deterministic halves by vec_id
    parity, and per label the squared distance between the halves'
    centroids is computed EXACTLY. Floats quantize once to integer
    micromarks (floor(x·1e6), identical in DuckDB); per-(label, half,
    dim) sums and per-(label, half) counts are two combiner-pruned
    bucketed aggregates; the finish walks the labels × dims bounded
    table with arbitrary-precision ints — the centroid difference
    clears denominators as (sa·nb − sb·na) per dim, so drift_num =
    Σ_dim (sa·nb − sb·na)² and den = (na·nb)² are exact integers and
    drift = double(num)/double(den) replays DuckDB's HUGEINT→DOUBLE
    rounding bit-for-bit (the copurchase_assortativity pattern).
    Columns: label, n_a, n_b, drift."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def explode(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("label", pa.int64()),
                    ("parity", pa.int64()),
                    ("dim", pa.int64()),
                    ("sum_q", pa.int64()),
                ]
            ).empty_table()
        emb = t.column("embedding").combine_chunks()
        off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[off[0] : off[-1]]
        lengths = np.diff(off)
        lab = np.repeat(
            t.column("label").to_numpy(zero_copy_only=False).astype(np.int64), lengths
        )
        par = np.repeat(
            (t.column("vec_id").to_numpy(zero_copy_only=False) % 2).astype(np.int64),
            lengths,
        )
        # 1-based dim matches DuckDB list indexing
        dim = np.concatenate([np.arange(1, n + 1, dtype=np.int64) for n in lengths])
        q = np.floor(vals * 1_000_000.0).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(lab),
                "parity": pa.array(par),
                "dim": pa.array(dim),
                "sum_q": pa.array(q),
            }
        )

    emb_ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    sums = pin_schema(
        bucketed_aggregate(
            emb_ds.map_batches(explode, batch_format="pyarrow"),
            ["label", "parity", "dim"],
            [("sum_q", "sum")],
        ),
        pa.schema(
            [
                ("label", pa.int64()),
                ("parity", pa.int64()),
                ("dim", pa.int64()),
                ("sum_q", pa.int64()),
            ]
        ),
    )
    counts = bucketed_aggregate(
        emb_ds.map_batches(
            lambda t: pa.table(
                {
                    "label": pc.cast(t.column("label"), pa.int64()),
                    "parity": pc.cast(
                        pc.bit_wise_and(t.column("vec_id"), 1), pa.int64()
                    ),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["label", "parity"],
        [("n", "sum")],
    )
    n_by = {(r["label"], r["parity"]): r["n"] for r in counts.take_all()}
    s_by: dict[tuple[int, int], dict[int, int]] = {}
    for r in sums.take_all():  # bounded: labels × 2 × dims
        s_by.setdefault((r["label"], r["parity"]), {})[r["dim"]] = r["sum_q"]

    labels = sorted({k[0] for k in n_by})
    out = {"label": [], "n_a": [], "n_b": [], "drift": []}
    for lab in labels:
        na, nb = n_by.get((lab, 0), 0), n_by.get((lab, 1), 0)
        if na == 0 or nb == 0:
            continue  # a one-sided label has no drift to measure
        sa, sb = s_by.get((lab, 0), {}), s_by.get((lab, 1), {})
        num = 0
        for d in set(sa) | set(sb):
            diff = sa.get(d, 0) * nb - sb.get(d, 0) * na  # exact python int
            num += diff * diff
        den = (na * nb) ** 2
        out["label"].append(lab)
        out["n_a"].append(na)
        out["n_b"].append(nb)
        out["drift"].append(float(num) / float(den))
    return pa.table(
        {
            "label": pa.array(out["label"], type=pa.int64()),
            "n_a": pa.array(out["n_a"], type=pa.int64()),
            "n_b": pa.array(out["n_b"], type=pa.int64()),
            "drift": pa.array(out["drift"], type=pa.float64()),
        }
    )


def daily_reconciliation(sf_dir: str):
    """Cross-table audit: daily event value vs daily order value,
    FULL OUTER joined on the day so days present in only one stream
    still surface (the data-quality reconciliation every ingest
    pipeline runs between its activity log and its transaction store).
    Both sides fold to calendar-bounded daily aggregates BEFORE the
    join — the exchange moves days, never events — and the join is the
    engine's empty-partition-proof bucketed join in its ``full outer``
    mode (pyarrow coalesces the key, so the day is never null; missing
    sides are 0-filled). Columns: day, events_cents, orders_cents,
    gap_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    ev = bucketed_aggregate(
        _read(sf_dir, "events", columns=["ts", "value"]).map_batches(
            lambda t: pa.table(
                {
                    "day": pc.floor_temporal(t.column("ts"), unit="day"),
                    "events_cents": _cents(t.column("value")),
                }
            ),
            batch_format="pyarrow",
        ),
        ["day"],
        [("events_cents", "sum")],
    )
    orders = bucketed_aggregate(
        _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]).map_batches(
            lambda t: pa.table(
                {
                    "day": pc.floor_temporal(t.column("o_orderdate"), unit="day"),
                    "orders_cents": _cents(t.column("o_totalprice")),
                }
            ),
            batch_format="pyarrow",
        ),
        ["day"],
        [("orders_cents", "sum")],
    )
    joined = bucketed_inner_join(
        pin_schema(ev, pa.schema([("day", pa.timestamp("us")), ("events_cents", pa.int64())])),
        pin_schema(
            orders, pa.schema([("day", pa.timestamp("us")), ("orders_cents", pa.int64())])
        ),
        ["day"],
        pa.schema([("day", pa.timestamp("us")), ("events_cents", pa.int64())]),
        pa.schema([("day", pa.timestamp("us")), ("orders_cents", pa.int64())]),
        join_type="full outer",
    )

    def fill(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("day", pa.timestamp("us")),
                ("events_cents", pa.int64()),
                ("orders_cents", pa.int64()),
                ("gap_cents", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        e = pc.fill_null(t.column("events_cents"), 0)
        o = pc.fill_null(t.column("orders_cents"), 0)
        return pa.table(
            {
                "day": t.column("day"),
                "events_cents": e,
                "orders_cents": o,
                "gap_cents": pc.subtract(e, o),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def kg_degree_histogram(sf_dir: str):
    """Power-law audit of the KG: node count per log2 degree bucket
    (bucket floor = 2^⌊log2 deg⌋, computed by INTEGER bit length on
    both sides — no libm, exact at bucket boundaries; DuckDB replays
    it as len(printf('%b', deg)) − 1). Runs on kg_degree's node-sized
    output, so the histogram fold is one bounded aggregate. Columns:
    bucket_floor, n_nodes."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    deg = kg_degree(sf_dir)

    def bucket(t: pa.Table) -> pa.Table:
        schema = pa.schema([("bucket_floor", pa.int64()), ("n_nodes", pa.int64())])
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        d = (
            t.column("out_degree").to_numpy(zero_copy_only=False)
            + t.column("in_degree").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        d = d[d > 0]
        # floor(log2) via frexp's exponent — exact for d < 2^53 (no
        # libm rounding: frexp only splits the IEEE representation)
        bl = np.frexp(d.astype(np.float64))[1].astype(np.int64) - 1
        return pa.table(
            {
                "bucket_floor": pa.array(np.left_shift(np.int64(1), bl)),
                "n_nodes": pa.array(np.ones(len(d), dtype=np.int64)),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            deg.map_batches(bucket, batch_format="pyarrow"),
            ["bucket_floor"],
            [("n_nodes", "sum")],
        ),
        pa.schema([("bucket_floor", pa.int64()), ("n_nodes", pa.int64())]),
        ensure_block=True,
    )


def lang_confusion(sf_dir: str):
    """Declared-vs-detected language confusion matrix — the metadata
    audit a crawl corpus needs before trusting its `lang` column
    (mislabeled pages poison per-language sampling and stopword
    quality gates). The langid kernel (stages/textstats.langid_batch,
    same LANG_PROFILES as its twin) runs in the SAME batch pass that
    carries the declared label, so there is no join; the fold is one
    combiner-pruned aggregate bounded by langs². Columns: lang,
    pred_lang, n_docs."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import langid_batch

    def detect(t: pa.Table) -> pa.Table:
        lid = langid_batch(t)
        return pa.table(
            {
                "lang": t.column("lang"),
                "pred_lang": lid.column("pred_lang"),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]).map_batches(
                detect, batch_format="pyarrow"
            ),
            ["lang", "pred_lang"],
            [("n_docs", "sum")],
        ),
        pa.schema(
            [("lang", pa.string()), ("pred_lang", pa.string()), ("n_docs", pa.int64())]
        ),
        ensure_block=True,
    )


def kg_pred_symmetry(sf_dir: str):
    """Per-predicate symmetry governance: the fraction of a predicate's
    edges whose REVERSE edge (obj, pred, subj) also exists — symmetric
    predicates ("spouse", "interacts-with") need undirected handling
    downstream, asymmetric ones ("treats") must not be folded. One
    left-semi bucketed SELF-join of the edge table against its reversed
    projection on the composite (pred, subj, obj) key, then two
    predicate-bounded aggregates; ratio = replayable int→double
    division. Self-loops carry no direction signal and are excluded
    from both counts. Columns: pred, n_edges, n_sym, symmetry."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    edges = kg_edges(sf_dir).map_batches(
        lambda t: t.select(["subj", "pred", "obj"]).filter(
            pc.not_equal(t.column("subj"), t.column("obj"))
        )
        if t.num_columns
        else pa.schema(
            [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
        ).empty_table(),
        batch_format="pyarrow",
    ).materialize()
    key_schema = pa.schema([("pred", pa.string()), ("subj", pa.string()), ("obj", pa.string())])
    reversed_ = edges.map_batches(
        lambda t: pa.table(
            {"pred": t.column("pred"), "subj": t.column("obj"), "obj": t.column("subj")}
        )
        if t.num_columns
        else key_schema.empty_table(),
        batch_format="pyarrow",
    )
    sym = bucketed_inner_join(
        pin_schema(edges, key_schema),
        reversed_,
        ["pred", "subj", "obj"],
        key_schema,
        key_schema,
        join_type="left semi",
    )

    def ones(name):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.schema([("pred", pa.string()), (name, pa.int64())]).empty_table()
            return pa.table(
                {
                    "pred": t.column("pred"),
                    name: pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )

        return fn

    n_edges = bucketed_aggregate(
        edges.map_batches(ones("n_edges"), batch_format="pyarrow"),
        ["pred"],
        [("n_edges", "sum")],
    )
    n_sym = bucketed_aggregate(
        sym.map_batches(ones("n_sym"), batch_format="pyarrow"), ["pred"], [("n_sym", "sum")]
    )
    joined = bucketed_inner_join(
        pin_schema(n_edges, pa.schema([("pred", pa.string()), ("n_edges", pa.int64())])),
        pin_schema(n_sym, pa.schema([("pred", pa.string()), ("n_sym", pa.int64())])),
        ["pred"],
        pa.schema([("pred", pa.string()), ("n_edges", pa.int64())]),
        pa.schema([("pred", pa.string()), ("n_sym", pa.int64())]),
        join_type="left outer",
    )

    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("pred", pa.string()),
                ("n_edges", pa.int64()),
                ("n_sym", pa.int64()),
                ("symmetry", pa.float64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        ns = pc.fill_null(t.column("n_sym"), 0)
        ne = t.column("n_edges")
        return pa.table(
            {
                "pred": t.column("pred"),
                "n_edges": ne,
                "n_sym": ns,
                "symmetry": pc.divide(
                    pc.cast(ns, pa.float64()), pc.cast(ne, pa.float64())
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def event_attribution(sf_dir: str, horizon_days: int = 7):
    """Conversion attribution — the FORWARD as-of join: every event is
    matched to the user's NEXT order placed strictly after it and
    within ``horizon_days`` (stages/window.py asof_join_next; the
    mirror of events_last_order's backward fill). One key-bucketed
    exchange, per-bucket sort + vectorized backward fill; ties at the
    winning date resolve to the smallest orderkey. Columns: event_id,
    next_o_orderkey (−1 when no conversion), gap_us (−1 likewise)."""
    from bioner_ray.stages.window import asof_join_next

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    return asof_join_next(
        ev,
        orders,
        left_key="user_id",
        left_ts="ts",
        left_id="event_id",
        right_key="o_custkey",
        right_ts="o_orderdate",
        right_payload="o_orderkey",
        horizon_us=horizon_days * 86_400_000_000,
    )


def entropy_quota(sf_dir: str, k: int = 10):
    """Per-source information-density quota: each source keeps its k
    docs with the HIGHEST unigram entropy (doc_entropy's exact integer
    micro-nats; ties → smaller doc_id) — the quality-ranked sibling of
    source_quota's flat cap, preferring diverse text over boilerplate
    within every source. The per-doc signal is shuffle-free; source
    attaches via ONE doc_id-bucketed join; the rank is the
    combiner-pruned per-group top-k. Columns: source, doc_id,
    n_tokens, h_micro, rk."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    ent_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("h_micro", pa.int64())]
    )
    src_schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])
    ent = pin_schema(doc_entropy(sf_dir), ent_schema)
    src = _read(sf_dir, "documents", columns=["doc_id", "source"])
    joined = pin_schema(
        bucketed_inner_join(ent, src, ["doc_id"], ent_schema, src_schema),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("h_micro", pa.int64()),
                ("source", pa.string()),
            ]
        ),
        ensure_block=True,
    )
    return top_k_per_group(
        joined, "source", [("h_micro", "descending"), ("doc_id", "ascending")], k
    )


def sorted_export(sf_dir: str, parts: int = 8):
    """Distributed global sort of orders by price — the terasort shape
    with EXPLICIT range partitioning (stages/rangesort.py): exact
    histogram-derived cutoffs (ceil-rule order statistic, the
    quantile_disc contract), deterministic pid assignment (#cutoffs <
    value — resumable: a re-run assigns identical pids), one pid
    shuffle, local sorts. The query returns the per-partition summary
    (the artifact that proves global order without re-reading data);
    the sorted dataset itself is the stage's other output. Columns:
    pid, n_rows, min_cents, max_cents."""
    from bioner_ray.stages.rangesort import range_partitioned_sort

    cents = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "cents": _cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )
    _, summary = range_partitioned_sort(cents, "cents", "o_orderkey", parts=parts)
    return summary.map_batches(
        lambda t: t.rename_columns(["pid", "n_rows", "min_cents", "max_cents"])
        if t.num_columns
        else pa.schema(
            [
                ("pid", pa.int64()),
                ("n_rows", pa.int64()),
                ("min_cents", pa.int64()),
                ("max_cents", pa.int64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )


def kg_mention_contexts(sf_dir: str, window: int = 2):
    """Entity context-window export — the KG→LM training-data emitter:
    for every entity mention, the ±``window``-token text snippet around
    it (the entity-context sample an alignment/grounding fine-tune
    consumes). Pure per-document pass fused into one ``map_batches``
    (documents are never shuffled; output is mention-sized). Positions
    follow the tok-CTE contract: 1-based indices into the RAW
    whitespace split (empty pieces keep their position but never match
    or appear), so the twin's ``t.pos BETWEEN e.pos−w AND e.pos+w``
    replays the same window even around doubled whitespace. Columns:
    doc_id, pos, surface, context."""
    entity_set = pa.array(sorted(ENTITY_SURFACES), type=pa.string())
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("pos", pa.int64()),
            ("surface", pa.string()),
            ("context", pa.string()),
        ]
    )

    def contexts(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(batch.column("text"), "")), r"\s+"
        ).combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = split.values
        flat = vals.to_pylist()
        nonempty = np.fromiter((bool(t) for t in flat), dtype=bool, count=len(flat))
        is_ent = pc.is_in(vals, value_set=entity_set).to_numpy(zero_copy_only=False)
        is_ent = is_ent & nonempty
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        starts = off[:-1] - off[0]
        ends = off[1:] - off[0]
        out = {"doc_id": [], "pos": [], "surface": [], "context": []}
        hit_idx = np.flatnonzero(is_ent)
        doc_of_hit = np.searchsorted(ends, hit_idx, side="right")
        for gi, d in zip(hit_idx, doc_of_hit):
            s, e = starts[d], ends[d]
            p = gi - s + 1  # 1-based raw position
            lo, hi = max(s, gi - window), min(e, gi + window + 1)
            ctx = " ".join(t for t in flat[lo:hi] if t)
            out["doc_id"].append(int(doc_ids[d]))
            out["pos"].append(int(p))
            out["surface"].append(flat[gi])
            out["context"].append(ctx)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "pos": pa.array(out["pos"], type=pa.int64()),
                "surface": pa.array(out["surface"], type=pa.string()),
                "context": pa.array(out["context"], type=pa.string()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        contexts, batch_format="pyarrow"
    )
    from bioner_ray.stages.shuffle import pin_schema

    return pin_schema(ds, out_schema, ensure_block=True)


def kg_component_sizes(sf_dir: str, min_wjaccard: float = 0.5):
    """Merge-group size distribution — the governance histogram over
    kg_merge_groups' entity-resolution output (how aggressive is the
    fold: many singletons = conservative, one giant component = a
    threshold bug). One bounded aggregate per (rep), one more over
    (size); both node-vocabulary-sized. Columns: group_size, n_groups."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    groups = kg_merge_groups(sf_dir, min_wjaccard=min_wjaccard)
    per_rep = pin_schema(
        bucketed_aggregate(
            groups.map_batches(
                lambda t: pa.table(
                    {
                        "rep": t.column("rep"),
                        "group_size": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    }
                )
                if t.num_columns
                else pa.schema(
                    [("rep", pa.string()), ("group_size", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["rep"],
            [("group_size", "sum")],
        ),
        pa.schema([("rep", pa.string()), ("group_size", pa.int64())]),
    )
    return pin_schema(
        bucketed_aggregate(
            per_rep.map_batches(
                lambda t: pa.table(
                    {
                        "group_size": t.column("group_size"),
                        "n_groups": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    }
                )
                if t.num_columns
                else pa.schema(
                    [("group_size", pa.int64()), ("n_groups", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["group_size"],
            [("n_groups", "sum")],
        ),
        pa.schema([("group_size", pa.int64()), ("n_groups", pa.int64())]),
        ensure_block=True,
    )


def event_trend(sf_dir: str):
    """Per-type activity trend: the exact OLS slope of daily value over
    the day ordinal — the drift detector behind alerting ("is this
    event type growing?"). One combiner-pruned aggregate to the
    calendar-bounded (type, day) table; the OLS moments (Σx, Σy, Σxy,
    Σx², n with x = epoch-day ordinal, y = cents) are exact Python
    ints on the bounded table, and slope = double(n·Σxy − Σx·Σy) /
    double(n·Σx² − (Σx)²) is ONE replayable division
    (HUGEINT→DOUBLE both sides). Types with a single day have no
    defined slope and are dropped. Columns: event_type, n_days,
    slope."""
    from bioner_ray.stages.shuffle import bucketed_aggregate

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": day,
                "value_cents": _cents(batch.column("value")),
            }
        )

    daily = bucketed_aggregate(
        _read(sf_dir, "events", columns=["ts", "event_type", "value"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["event_type", "day"],
        [("value_cents", "sum")],
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in daily.take_all():  # bounded: types × calendar days
        x = int(np.datetime64(r["day"], "D").astype(np.int64))  # epoch days
        by_type.setdefault(r["event_type"], []).append((x, int(r["value_cents"])))
    out = {"event_type": [], "n_days": [], "slope": []}
    for et in sorted(by_type):
        pts = by_type[et]
        n = len(pts)
        if n < 2:
            continue
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num = n * sxy - sx * sy  # exact python ints
        den = n * sxx - sx * sx
        out["event_type"].append(et)
        out["n_days"].append(n)
        out["slope"].append(float(num) / float(den))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "n_days": pa.array(out["n_days"], type=pa.int64()),
            "slope": pa.array(out["slope"], type=pa.float64()),
        }
    )


def event_dow_profile(sf_dir: str):
    """Day-of-week seasonality per event type — the weekly rhythm
    behind capacity planning and anomaly baselines. One combiner-pruned
    aggregate to the types × 7 table. Day numbering is PINNED to ISO
    (Monday = 1 … Sunday = 7): Arrow's default day_of_week (Mon = 0)
    plus one equals DuckDB's isodow — the cross-engine numbering trap
    this docstring exists to record. Columns: event_type, dow,
    n_events, value_cents."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "dow": pc.cast(
                    pc.add(pc.day_of_week(batch.column("ts")), 1), pa.int64()
                ),
                "value_cents": _cents(batch.column("value")),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            with_ones(
                _read(sf_dir, "events", columns=["ts", "event_type", "value"]).map_batches(
                    prep, batch_format="pyarrow"
                ),
                "n_events",
            ),
            ["event_type", "dow"],
            [("n_events", "sum"), ("value_cents", "sum")],
        ),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("dow", pa.int64()),
                ("n_events", pa.int64()),
                ("value_cents", pa.int64()),
            ]
        ),
        ensure_block=True,
    )


def spend_activity_corr(sf_dir: str):
    """Cross-table signal correlation: exact Pearson r between a
    user's event count and their total order spend — "does activity
    predict revenue". Two per-user aggregates (each combiner-pruned),
    ONE user-bucketed join (users with no orders count as 0 spend via
    the left-outer mode), then exact big-int moments on the
    user-bounded table and one HUGEINT→DOUBLE division pair (the
    copurchase_assortativity pattern). Columns: n_users, r."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema, with_ones

    ev = pin_schema(
        bucketed_aggregate(
            with_ones(
                _read(sf_dir, "events", columns=["user_id"]).map_batches(
                    lambda t: pa.table({"user_id": pc.cast(t.column("user_id"), pa.int64())}),
                    batch_format="pyarrow",
                ),
                "n_events",
            ),
            ["user_id"],
            [("n_events", "sum")],
        ),
        pa.schema([("user_id", pa.int64()), ("n_events", pa.int64())]),
    )
    orders = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
                lambda t: pa.table(
                    {
                        "user_id": pc.cast(t.column("o_custkey"), pa.int64()),
                        "spend_cents": _cents(t.column("o_totalprice")),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["user_id"],
            [("spend_cents", "sum")],
        ),
        pa.schema([("user_id", pa.int64()), ("spend_cents", pa.int64())]),
    )
    joined = bucketed_inner_join(
        ev,
        orders,
        ["user_id"],
        pa.schema([("user_id", pa.int64()), ("n_events", pa.int64())]),
        pa.schema([("user_id", pa.int64()), ("spend_cents", pa.int64())]),
        join_type="left outer",
    )
    # moments over the user-bounded table: exact python big-ints
    n = sx = sy = sxy = sxx = syy = 0
    for b in joined.iter_batches(batch_format="pyarrow"):
        if b.num_columns == 0 or b.num_rows == 0:
            continue
        x = b.column("n_events").to_numpy(zero_copy_only=False).astype(np.int64)
        y_col = pc.fill_null(b.column("spend_cents"), 0)
        y = y_col.to_numpy(zero_copy_only=False).astype(np.int64)
        n += len(x)
        sx += int(x.sum())
        sy += int(y.sum())
        sxy += int((x.astype(object) * y.astype(object)).sum())
        sxx += int((x.astype(object) * x.astype(object)).sum())
        syy += int((y.astype(object) * y.astype(object)).sum())
    num = n * sxy - sx * sy
    den2x = n * sxx - sx * sx
    den2y = n * syy - sy * sy
    import math

    r = float(num) / (math.sqrt(float(den2x)) * math.sqrt(float(den2y))) if den2x and den2y else 0.0
    return pa.table(
        {
            "n_users": pa.array([n], type=pa.int64()),
            "r": pa.array([r], type=pa.float64()),
        }
    )


def user_overlap_kmv(sf_dir: str, k: int = 64):
    """Audience overlap between event-type pairs via mergeable KMV
    sketches (stages/sketch.py kmv_pair_overlap) — the set-algebra
    companion to distinct_users_kmv. Columns: ta, tb, n_both,
    est_union, est_inter."""
    from bioner_ray.stages.sketch import kmv_pair_overlap

    return kmv_pair_overlap(
        _read(sf_dir, "events", columns=["event_type", "user_id"]),
        "event_type",
        "user_id",
        k=k,
    )


def hll_accuracy(sf_dir: str):
    """Sketch-vs-truth audit for HyperLogLog (the distinct-count
    sibling of minhash_precision): per event type, the HLL estimate
    next to the exact two-level distinct count and the signed relative
    error — the calibration row that justifies spending 2^p registers
    instead of a values-sized shuffle. Both inputs are existing
    type-bounded results; the join runs driver-side on that bounded
    table. rel_err = (est − exact)/exact in replayable doubles.
    Columns: event_type, n_users, est_distinct, rel_err."""
    est = {r["event_type"]: r["est_distinct"] for r in distinct_users_hll(sf_dir).take_all()}
    exact = {
        r["event_type"]: r["n_users"] for r in distinct_users_per_type(sf_dir).take_all()
    }
    types = sorted(exact)
    return pa.table(
        {
            "event_type": pa.array(types, type=pa.string()),
            "n_users": pa.array([exact[t] for t in types], type=pa.int64()),
            "est_distinct": pa.array([est[t] for t in types], type=pa.float64()),
            "rel_err": pa.array(
                [
                    (est[t] - float(exact[t])) / float(exact[t])
                    for t in types
                ],
                type=pa.float64(),
            ),
        }
    )


def events_gap_percentiles(sf_dir: str):
    """Exact order statistics of same-user inter-arrival gaps per event
    type (p50/p90/p99 in SECONDS — the floor-quantized domain keeps the
    histogram bounded and the result exact, the value_percentiles
    argument): the latency profile behind sessionization thresholds.
    Same single user-bucketed exchange as interarrival_stats; the gap
    stream folds to a (type, gap_s) histogram and the ceil-rule walk
    (DuckDB quantile_disc) finishes on that bounded table. Columns:
    event_type, p50_s, p90_s, p99_s."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    quant = _user_gap_stream(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "gap_s": pc.divide(t.column("gap_us"), 1_000_000),
            }
        ),
        batch_format="pyarrow",
    )
    hist = bucketed_aggregate(
        with_ones(quant), ["event_type", "gap_s"], [("one", "sum")]
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in hist.take_all():  # bounded: types × distinct gap seconds
        by_type.setdefault(r["event_type"], []).append((r["gap_s"], r["one"]))
    out_type, out = [], {p: [] for p in (50, 90, 99)}
    for et in sorted(by_type):
        qs = _ceil_quantiles(sorted(by_type[et]), (50, 90, 99))
        for p, v in zip((50, 90, 99), qs):
            out[p].append(v)
        out_type.append(et)
    return pa.table(
        {
            "event_type": pa.array(out_type, type=pa.string()),
            "p50_s": pa.array(out[50], type=pa.int64()),
            "p90_s": pa.array(out[90], type=pa.int64()),
            "p99_s": pa.array(out[99], type=pa.int64()),
        }
    )


def kg_mention_drift(sf_dir: str):
    """Entity trending between crawl snapshots (doc-parity halves, the
    kg_edge_delta convention): per surface, mention counts in the old
    (even) and new (odd) half and their delta — the signal that
    re-prioritizes linking dictionaries and KG refresh order. The
    parity CASE folds INSIDE the one surface-keyed aggregate (join-free
    full-outer: a surface missing from one half just sums zero there).
    Columns: surface, n_old, n_new, delta."""
    from bioner_ray.stages.mentions import mentions_stage
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    mentions = mentions_stage(_tagged_documents(sf_dir))

    def fold(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("surface", pa.string()), ("n_old", pa.int64()), ("n_new", pa.int64())]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        # url = doc://%08d → parity of the numeric suffix
        ids = np.fromiter(
            (int(u[-8:]) for u in t.column("url").to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        par = ids & 1
        return pa.table(
            {
                "surface": t.column("surface"),
                "n_old": pa.array((1 - par).astype(np.int64)),
                "n_new": pa.array(par.astype(np.int64)),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            mentions.map_batches(fold, batch_format="pyarrow"),
            ["surface"],
            [("n_old", "sum"), ("n_new", "sum")],
        ),
        pa.schema(
            [("surface", pa.string()), ("n_old", pa.int64()), ("n_new", pa.int64())]
        ),
        ensure_block=True,
    )
    return agg.map_batches(
        lambda t: t.append_column("delta", pc.subtract(t.column("n_new"), t.column("n_old")))
        if t.num_columns
        else pa.schema(
            [
                ("surface", pa.string()),
                ("n_old", pa.int64()),
                ("n_new", pa.int64()),
                ("delta", pa.int64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )


def kg_link_candidates(sf_dir: str, k: int = 50):
    """KG-completion candidates: the top non-adjacent entity pairs by
    Adamic–Adar affinity — 2-hop evidence proposes the edge, the
    left-outer adjacency flag guarantees it does not already exist
    (stages/graph.py adamic_adar with exclude_edges=True; same hub cap,
    same exact micro-nat scoring). The candidate facts a curation or
    re-crawl queue consumes. Columns: u, v, aa_micro, n_common."""
    from bioner_ray.stages.graph import adamic_adar

    schema = pa.schema(
        [
            ("u", pa.string()),
            ("v", pa.string()),
            ("aa_micro", pa.int64()),
            ("n_common", pa.int64()),
        ]
    )
    # k-bounded finish: collect the ≤k winners into a typed Table so a
    # legitimately EMPTY candidate set (fully-connected graph) still
    # carries its schema (Dataset.to_pandas drops columns when empty)
    rows = adamic_adar(kg_edges(sf_dir), k=k, exclude_edges=True).take_all()
    return pa.table(
        {
            "u": pa.array([r["u"] for r in rows], type=pa.string()),
            "v": pa.array([r["v"] for r in rows], type=pa.string()),
            "aa_micro": pa.array([r["aa_micro"] for r in rows], type=pa.int64()),
            "n_common": pa.array([r["n_common"] for r in rows], type=pa.int64()),
        },
        schema=schema,
    )


def orders_rfm(sf_dir: str):
    """RFM segmentation (recency / frequency / monetary quintile codes
    per customer) — the canonical customer-value table. ONE
    custkey-bucketed aggregate folds orders to (last_order, n_orders,
    m_cents); recency = exact day difference to the corpus max date
    (one tiny max over the per-customer table). Quintile cutoffs come
    from value-DOMAIN histograms of the three signals (never a
    customer-count sort), ceil-rule as everywhere
    (quantile_disc([.2 .4 .6 .8])), assignment q = 1 + #{cutoffs < x}
    ties-to-lower; the recency code is reversed (recent = 5). Columns:
    c_custkey, r_days, n_orders, m_cents, r_q, f_q, m_q."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    per_cust_schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("last_us", pa.int64()),
            ("n_orders", pa.int64()),
            ("m_cents", pa.int64()),
        ]
    )
    per_cust = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
            .map_batches(
                lambda t: pa.table(
                    {
                        "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                        "last_us": pc.cast(t.column("o_orderdate"), pa.int64()),
                        "n_orders": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                        "m_cents": _cents(t.column("o_totalprice")),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["c_custkey"],
            [("last_us", "max"), ("n_orders", "sum"), ("m_cents", "sum")],
        ),
        per_cust_schema,
    ).materialize()

    def rdays(t: pa.Table, max_us: int) -> pa.Table:
        last = t.column("last_us").to_numpy(zero_copy_only=False)
        # whole days elapsed since the customer's last order
        r = (max_us - last) // 86_400_000_000
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "r_days": pa.array(r.astype(np.int64)),
                "n_orders": t.column("n_orders"),
                "m_cents": t.column("m_cents"),
            }
        )

    # one scalar: a single-bucket aggregate, never the table itself
    mx_rows = bucketed_aggregate(
        per_cust.map_batches(
            lambda t: pa.table(
                {
                    "_one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "last_us": t.column("last_us"),
                }
            ),
            batch_format="pyarrow",
        ),
        ["_one"],
        [("last_us", "max")],
        num_buckets=1,
    ).take_all()
    max_us = int(mx_rows[0]["last_us"]) if mx_rows else 0
    rfm = per_cust.map_batches(
        lambda t, m=max_us: rdays(t, m), batch_format="pyarrow"
    ).materialize()

    def cutoffs(col: str) -> np.ndarray:
        hist = bucketed_aggregate(
            with_ones(rfm.select_columns([col])), [col], [("one", "sum")]
        )
        vals = sorted((r[col], r["one"]) for r in hist.take_all())  # domain-bounded
        return np.array(_ceil_quantiles(vals, (20, 40, 60, 80)), dtype=np.int64)

    cuts_ref = ray.put({c: cutoffs(c) for c in ("r_days", "n_orders", "m_cents")})

    def code(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("r_days", pa.int64()),
                ("n_orders", pa.int64()),
                ("m_cents", pa.int64()),
                ("r_q", pa.int64()),
                ("f_q", pa.int64()),
                ("m_q", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        cuts = ray.get(cuts_ref)

        def q(col):
            v = t.column(col).to_numpy(zero_copy_only=False)
            return 1 + np.searchsorted(cuts[col], v, side="left").astype(np.int64)

        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "r_days": t.column("r_days"),
                "n_orders": t.column("n_orders"),
                "m_cents": t.column("m_cents"),
                "r_q": pa.array(6 - q("r_days")),  # recent = high score
                "f_q": pa.array(q("n_orders")),
                "m_q": pa.array(q("m_cents")),
            }
        )

    return rfm.map_batches(code, batch_format="pyarrow")


def supplier_hhi(sf_dir: str):
    """Supply-concentration governance: the Herfindahl–Hirschman index
    of supplier quantity shares per part type — HHI → 1 flags part
    families owned by one supplier (re-sourcing risk), → 1/n means an
    even market. Broadcast part-type dim; per (type, supplier) ONE
    combiner-pruned aggregate; per type HHI = double(Σ q_s²)/double(Q)²
    — exact integer moments, one pinned division (sum-of-squares ships
    as HUGEINT-safe python ints on the type-bounded finish). Columns:
    p_type, n_suppliers, total_qty, hhi."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    type_ref = ray.put(dict(zip(part["p_partkey"].astype(int), part["p_type"])))

    def prep(t: pa.Table) -> pa.Table:
        types = ray.get(type_ref)
        return pa.table(
            {
                "p_type": pa.array(
                    [types[k] for k in t.column("l_partkey").to_pylist()], type=pa.string()
                ),
                "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
            }
        )

    per_ts = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])
            .map_batches(prep, batch_format="pyarrow"),
            ["p_type", "l_suppkey"],
            [("qty", "sum")],
        ),
        pa.schema([("p_type", pa.string()), ("l_suppkey", pa.int64()), ("qty", pa.int64())]),
    )
    # finish on the types × suppliers bounded table with exact ints
    agg: dict[str, list[int]] = {}
    for r in per_ts.take_all():
        agg.setdefault(r["p_type"], []).append(int(r["qty"]))
    out = {"p_type": [], "n_suppliers": [], "total_qty": [], "hhi": []}
    for pt in sorted(agg):
        qs = agg[pt]
        total = sum(qs)
        ss = sum(q * q for q in qs)  # exact python ints
        out["p_type"].append(pt)
        out["n_suppliers"].append(len(qs))
        out["total_qty"].append(total)
        out["hhi"].append(float(ss) / (float(total) * float(total)))
    return pa.table(
        {
            "p_type": pa.array(out["p_type"], type=pa.string()),
            "n_suppliers": pa.array(out["n_suppliers"], type=pa.int64()),
            "total_qty": pa.array(out["total_qty"], type=pa.int64()),
            "hhi": pa.array(out["hhi"], type=pa.float64()),
        }
    )


def kg_edge_confidence(sf_dir: str):
    """Per-predicate confidence normalization: each edge's
    percent-rank of weight WITHIN its predicate — the score that makes
    a weight of 3 mean something different for a rare precise relation
    than for a promiscuous one (raw weights are incomparable across
    predicates). ONE (pred, weight)-domain histogram aggregate; the
    per-pred cumulative table broadcasts (domain-bounded) into a
    stateless assignment pass over the edge stream: rank = 1 +
    #{w' < w} (ties share the min rank, DuckDB percent_rank's rule),
    pct = double(rank−1)/double(n−1), 0.0 for single-edge predicates.
    Columns: subj, pred, obj, weight, pct_rank."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    edges = kg_edges(sf_dir).map_batches(
        lambda t: t.select(["subj", "pred", "obj", "weight"])
        if t.num_columns
        else pa.schema(
            [
                ("subj", pa.string()),
                ("pred", pa.string()),
                ("obj", pa.string()),
                ("weight", pa.int64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    ).materialize()
    hist = bucketed_aggregate(
        with_ones(edges.select_columns(["pred", "weight"])), ["pred", "weight"], [("one", "sum")]
    )
    cum: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    per_pred: dict[str, list[tuple[int, int]]] = {}
    for r in hist.take_all():  # bounded: preds × weight domain
        per_pred.setdefault(r["pred"], []).append((r["weight"], r["one"]))
    for p, vals in per_pred.items():
        vals.sort()
        w = np.array([v for v, _ in vals], dtype=np.int64)
        c = np.array([c_ for _, c_ in vals], dtype=np.int64)
        below = np.concatenate([[0], np.cumsum(c)[:-1]])
        cum[p] = (w, below, int(c.sum()))
    cum_ref = ray.put(cum)

    def assign(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("subj", pa.string()),
                ("pred", pa.string()),
                ("obj", pa.string()),
                ("weight", pa.int64()),
                ("pct_rank", pa.float64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        table = ray.get(cum_ref)
        preds = t.column("pred").to_pylist()
        ws = t.column("weight").to_numpy(zero_copy_only=False)
        pct = np.empty(t.num_rows, dtype=np.float64)
        for i, (p, w) in enumerate(zip(preds, ws)):
            wv, below, n = table[p]
            j = np.searchsorted(wv, w)
            rank = 1 + int(below[j])
            pct[i] = 0.0 if n <= 1 else float(rank - 1) / float(n - 1)
        return t.append_column("pct_rank", pa.array(pct))

    return edges.map_batches(assign, batch_format="pyarrow")


def zorder_export(sf_dir: str, parts: int = 8, bits: int = 16):
    """Z-order (Morton) layout audit — the multi-dimensional
    data-clustering primitive behind lakehouse file skipping: orders
    keyed by the bit-interleave of (custkey, order-day) so ONE sort
    clusters BOTH dimensions, and per range partition the min/max of
    each dimension shows the locality a reader's zone map would prune
    on. zval = Σ_i ((cust>>i & 1) << 2i) | ((day>>i & 1) << 2i+1) over
    the low ``bits`` bits (vectorized shifts; the twin inlines the
    same 2·bits-term expression, generated from this loop — zero
    drift). Partitioning reuses the exact ceil-rule cutoff machinery
    of sorted_export. Columns: pid, n_rows, min_cust, max_cust,
    min_day, max_day."""
    import ray

    from bioner_ray.stages.rangesort import range_sort_cutoffs
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def zprep(t: pa.Table) -> pa.Table:
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        z = np.zeros(len(cust), dtype=np.int64)
        for i in range(bits):
            z |= ((cust >> i) & 1) << (2 * i)
            z |= ((day >> i) & 1) << (2 * i + 1)
        return pa.table(
            {
                "zval": pa.array(z),
                "cust": pa.array(cust),
                "day": pa.array(day.astype(np.int64)),
            }
        )

    zds = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
        .map_batches(zprep, batch_format="pyarrow")
        .materialize()
    )
    cutoffs = np.array(range_sort_cutoffs(zds, "zval", parts), dtype=np.int64)
    cut_ref = ray.put(cutoffs)

    def assign(t: pa.Table) -> pa.Table:
        cuts = ray.get(cut_ref)
        v = t.column("zval").to_numpy(zero_copy_only=False)
        pid = np.searchsorted(cuts, v, side="left").astype(np.int64)
        return pa.table(
            {
                "pid": pa.array(pid),
                "n_rows": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "min_cust": t.column("cust"),
                "max_cust": t.column("cust"),
                "min_day": t.column("day"),
                "max_day": t.column("day"),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            zds.map_batches(assign, batch_format="pyarrow"),
            ["pid"],
            [
                ("n_rows", "sum"),
                ("min_cust", "min"),
                ("max_cust", "max"),
                ("min_day", "min"),
                ("max_day", "max"),
            ],
            num_buckets=max(parts, 8),
        ),
        pa.schema(
            [
                ("pid", pa.int64()),
                ("n_rows", pa.int64()),
                ("min_cust", pa.int64()),
                ("max_cust", pa.int64()),
                ("min_day", pa.int64()),
                ("max_day", pa.int64()),
            ]
        ),
        ensure_block=True,
    )


def session_conversion(sf_dir: str, gap_seconds: int = 1800):
    """Session-outcome analysis: conversion rate (any 'purchase') by
    session length — the engagement-vs-intent curve a funnel team reads
    before changing session timeouts. Composes the sessionizer (ONE
    sort-based user exchange), an event_id-bucketed join back to the
    type column, a (user, session) fold, and a session-length-bounded
    final aggregate; conversion = replayable int→double division.
    Columns: session_len, n_sessions, n_converted, conversion."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema
    from bioner_ray.stages.window import sessionize

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    sess = pin_schema(
        sessionize(ev, gap_seconds=gap_seconds),
        pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()), ("session_id", pa.int64())]
        ),
    )
    types = _read(sf_dir, "events", columns=["event_id", "event_type"]).map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "conv": pc.cast(pc.equal(t.column("event_type"), "purchase"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        sess,
        types,
        ["event_id"],
        pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()), ("session_id", pa.int64())]
        ),
        pa.schema([("event_id", pa.int64()), ("conv", pa.int64())]),
    )
    per_sess = pin_schema(
        bucketed_aggregate(
            joined.map_batches(
                lambda t: pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "session_id": t.column("session_id"),
                        "n_events": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                        "conv": t.column("conv"),
                    }
                )
                if t.num_columns
                else pa.schema(
                    [
                        ("user_id", pa.int64()),
                        ("session_id", pa.int64()),
                        ("n_events", pa.int64()),
                        ("conv", pa.int64()),
                    ]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["user_id", "session_id"],
            [("n_events", "sum"), ("conv", "max")],
        ),
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("session_id", pa.int64()),
                ("n_events", pa.int64()),
                ("conv", pa.int64()),
            ]
        ),
    )
    agg = pin_schema(
        bucketed_aggregate(
            per_sess.map_batches(
                lambda t: pa.table(
                    {
                        "session_len": t.column("n_events"),
                        "n_sessions": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                        "n_converted": t.column("conv"),
                    }
                )
                if t.num_columns
                else pa.schema(
                    [
                        ("session_len", pa.int64()),
                        ("n_sessions", pa.int64()),
                        ("n_converted", pa.int64()),
                    ]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["session_len"],
            [("n_sessions", "sum"), ("n_converted", "sum")],
        ),
        pa.schema(
            [
                ("session_len", pa.int64()),
                ("n_sessions", pa.int64()),
                ("n_converted", pa.int64()),
            ]
        ),
        ensure_block=True,
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "conversion",
            pc.divide(
                pc.cast(t.column("n_converted"), pa.float64()),
                pc.cast(t.column("n_sessions"), pa.float64()),
            ),
        )
        if t.num_columns
        else pa.schema(
            [
                ("session_len", pa.int64()),
                ("n_sessions", pa.int64()),
                ("n_converted", pa.int64()),
                ("conversion", pa.float64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )


def kg_star_ids(sf_dir: str, edges=None):
    """Surrogate-integer-id graph materialization — the serving export
    every downstream graph store / embedding trainer consumes: node
    names dictionary-encoded to dense 1-based ids (lexicographic
    order, so the assignment is content-deterministic, not
    partition-dependent), edges rewritten to (src_id, dst_id, pred,
    weight). The node vocabulary is bounded (post-canonicalization
    entity set), so the id table ships ONCE as a broadcast sorted
    array and each edge batch resolves ids via one vectorized
    ``np.searchsorted`` — the corpus-scale extraction stays streaming,
    the id join never shuffles. Columns: src_id, dst_id, pred,
    weight."""
    import ray

    e = (kg_edges(sf_dir) if edges is None else edges).materialize()
    nodes: set[str] = set()
    for b in e.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_columns:
            nodes.update(b.column("subj").to_pylist())
            nodes.update(b.column("obj").to_pylist())
    vocab = np.array(sorted(nodes), dtype=object)
    vocab_ref = ray.put(vocab)

    out_schema = pa.schema(
        [
            ("src_id", pa.int64()),
            ("dst_id", pa.int64()),
            ("pred", pa.string()),
            ("weight", pa.int64()),
        ]
    )

    def to_ids(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        v = ray.get(vocab_ref)
        subj = np.asarray(t.column("subj").to_pylist(), dtype=object)
        obj = np.asarray(t.column("obj").to_pylist(), dtype=object)
        return pa.table(
            {
                "src_id": pa.array(np.searchsorted(v, subj) + 1, type=pa.int64()),
                "dst_id": pa.array(np.searchsorted(v, obj) + 1, type=pa.int64()),
                "pred": t.column("pred"),
                "weight": pc.cast(t.column("weight"), pa.int64()),
            }
        )

    return e.map_batches(to_ids, batch_format="pyarrow")


def kg_shuffle_skew(sf_dir: str, num_buckets: int = 64, edges=None):
    """Shuffle-skew telemetry for the KG edge exchange — the audit
    behind the engine's salted-groupby design (north rule: skew from
    hot entities handled explicitly): per hash bucket of the subject
    key, how many keys, edges and total weight land there, and the
    hottest single key's weight. A bucket whose ``max_key_w``
    approaches its ``w_total`` is one hub entity — the case
    canonicalize_edges' salt_buckets exists for. Bucket assignment is
    the SQL-replayable md5-61-bit family (stages/sketch._M61), applied
    ONCE per distinct subject on the vocabulary-bounded per-key table —
    never per edge. Columns: bucket, n_keys, n_edges, w_total,
    max_key_w."""
    import hashlib

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.sketch import _M61

    e = kg_edges(sf_dir) if edges is None else edges

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("subj", pa.string()), ("one", pa.int64()), ("w", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "subj": t.column("subj"),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "w": pc.cast(t.column("weight"), pa.int64()),
            }
        )

    per_subj = pin_schema(
        bucketed_aggregate(
            e.map_batches(prep, batch_format="pyarrow"),
            ["subj"],
            [("one", "sum"), ("w", "sum")],
        ),
        pa.schema([("subj", pa.string()), ("one", pa.int64()), ("w", pa.int64())]),
        ensure_block=True,
    )

    mid_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("n_keys", pa.int64()),
            ("n_edges", pa.int64()),
            ("w_total", pa.int64()),
            ("max_key_w", pa.int64()),
        ]
    )

    def to_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return mid_schema.empty_table()
        subs = t.column("subj").to_pylist()
        bk = [
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") % _M61)
            % num_buckets
            for s in subs
        ]
        w = pc.cast(t.column("w"), pa.int64())
        return pa.table(
            {
                "bucket": pa.array(bk, type=pa.int64()),
                "n_keys": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_edges": t.column("one"),
                "w_total": w,
                "max_key_w": w,
            }
        )

    return pin_schema(
        bucketed_aggregate(
            per_subj.map_batches(to_bucket, batch_format="pyarrow"),
            ["bucket"],
            [
                ("n_keys", "sum"),
                ("n_edges", "sum"),
                ("w_total", "sum"),
                ("max_key_w", "max"),
            ],
        ),
        mid_schema,
        ensure_block=True,
    )


def copurchase_ego(sf_dir: str, hops: int = 1):
    """Ego-network export: the ``hops``-hop neighborhood subgraph
    around the part co-purchase graph's lexicographically-smallest
    node — keep an edge iff BOTH endpoints sit within ``hops`` of the
    seed, annotated with each endpoint's hop distance and the edge's
    basket support. The bounded "pull the neighborhood of this entity"
    extract a KG or recommender serves interactively; computed on the
    basket graph rather than the toy KG for the same reason as
    copurchase_assortativity/betweenness — the near-clique KG makes
    any ego cut vacuous. Default ``hops=1`` (the closed neighborhood):
    the basket graph's effective diameter is so small that 2 hops
    already cover every edge at every test scale — 1 hop keeps the
    membership cut non-vacuous (~2.4k of 8.9k edges at sf0.001).

    Scale shape: the shared orderkey-keyed pair stream folds to a
    (p1, p2) bucketed aggregate; the seed BFS is stages/graph.py
    bfs_distances (one semi join + one anti join per round, node-sized
    tables); membership + distance tagging are two doc_id-style
    bucketed joins of the edge table against the node-sized distance
    table. Nothing materializes; no all-pairs step. Columns: p1, p2,
    n_baskets, d1, d2."""
    from bioner_ray.stages.graph import bfs_distances
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    e_schema = pa.schema(
        [("p1", pa.int64()), ("p2", pa.int64()), ("n_baskets", pa.int64())]
    )
    edges = pin_schema(
        bucketed_aggregate(
            with_ones(_basket_pair_stream(sf_dir), "n_baskets"),
            ["p1", "p2"],
            [("n_baskets", "sum")],
            est_bytes=_nrows(sf_dir, "lineitem") * 48,  # inline-slice guard
        ),
        e_schema,
    )
    dist = bfs_distances(edges, n_seeds=1, max_hops=hops, subj_col="p1", obj_col="p2")

    ek_schema = pa.schema(list(e_schema) + [("p1s", pa.string()), ("p2s", pa.string())])

    def with_keys(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return ek_schema.empty_table()
        return t.append_column(
            "p1s", pc.cast(t.column("p1"), pa.string())
        ).append_column("p2s", pc.cast(t.column("p2"), pa.string()))

    ek = pin_schema(edges.map_batches(with_keys, batch_format="pyarrow"), ek_schema)

    def dist_as(key: str, out: str):
        schema = pa.schema([(key, pa.string()), (out, pa.int64())])

        def rn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return schema.empty_table()
            return pa.table({key: t.column("node"), out: t.column("dist")})

        return pin_schema(dist.map_batches(rn, batch_format="pyarrow"), schema), schema

    d1, d1_schema = dist_as("p1s", "d1")
    d2, d2_schema = dist_as("p2s", "d2")
    j1_schema = pa.schema(list(ek_schema) + [("d1", pa.int64())])
    j1 = pin_schema(
        bucketed_inner_join(ek, d1, ["p1s"], ek_schema, d1_schema), j1_schema
    )
    out = bucketed_inner_join(j1, d2, ["p2s"], j1_schema, d2_schema)
    out_schema = pa.schema(
        [
            ("p1", pa.int64()),
            ("p2", pa.int64()),
            ("n_baskets", pa.int64()),
            ("d1", pa.int64()),
            ("d2", pa.int64()),
        ]
    )
    return pin_schema(
        out.map_batches(
            lambda t: t.select([f.name for f in out_schema])
            if t.num_columns
            else out_schema.empty_table(),
            batch_format="pyarrow",
        ),
        out_schema,
        ensure_block=True,
    )


def kg_entity_salience(sf_dir: str):
    """Per-entity salience profile: document frequency, total mention
    count, and how EARLY the entity first appears in the documents
    that mention it — `mean_first_micro` = the per-doc normalized
    first-mention offset (first compacted token position × 10^6 //
    doc token count, exact ints) averaged over mentioning docs with an
    integer floor divide. Title/lead entities (low values) are
    high-salience linking anchors; entities that only ever appear deep
    in boilerplate tails score near 10^6 — the salience prior an
    entity linker feeds on. Reads the same single-token entity
    contract the gazetteer resolves to on this lexicon
    (doc_entity_density's argument), so it costs none of the scorer
    pool.

    Scale shape: one stateless vectorized pass (flat tokens + parent
    indices, per-surface equality masks, minimum.at/bincount folds)
    emitting ≤ |lexicon| rows per block, then ONE surface-keyed
    bucketed aggregate over those bounded partials. Columns: surface,
    n_docs, n_mentions, mean_first_micro."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    entity_list = sorted(ENTITY_SURFACES)
    part_schema = pa.schema(
        [
            ("surface", pa.string()),
            ("one", pa.int64()),
            ("n_mentions", pa.int64()),
            ("sal_sum", pa.int64()),
        ]
    )

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return part_schema.empty_table()
        n = batch.num_rows
        text = pc.fill_null(batch.column("text"), "")
        split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
        flat = pc.list_flatten(split)
        par = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        ne = pc.not_equal(flat, "")
        mask = ne.to_numpy(zero_copy_only=False)
        flat_ne = flat.filter(ne)
        par = par[mask].astype(np.int64)
        counts = np.bincount(par, minlength=n)
        doc_first = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = np.arange(par.size, dtype=np.int64) - doc_first[par]
        surfs, ones, ments, sals = [], [], [], []
        for s in entity_list:
            m = pc.equal(flat_ne, s).to_numpy(zero_copy_only=False)
            if not m.any():
                continue
            docs_idx = par[m]
            cnt = np.bincount(docs_idx, minlength=n)
            first = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(first, docs_idx, pos[m])
            hit = cnt > 0
            sal = first[hit] * 1_000_000 // counts[hit]
            surfs.extend([s] * int(hit.sum()))
            ones.extend([1] * int(hit.sum()))
            ments.extend(cnt[hit].tolist())
            sals.extend(sal.tolist())
        return pa.table(
            {
                "surface": pa.array(surfs, type=pa.string()),
                "one": pa.array(ones, type=pa.int64()),
                "n_mentions": pa.array(ments, type=pa.int64()),
                "sal_sum": pa.array(sals, type=pa.int64()),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
                partials, batch_format="pyarrow"
            ),
            ["surface"],
            [("one", "sum"), ("n_mentions", "sum"), ("sal_sum", "sum")],
        ),
        part_schema,
    )
    out_schema = pa.schema(
        [
            ("surface", pa.string()),
            ("n_docs", pa.int64()),
            ("n_mentions", pa.int64()),
            ("mean_first_micro", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        nd = t.column("one").to_numpy(zero_copy_only=False)
        ss = t.column("sal_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "surface": t.column("surface"),
                "n_docs": pa.array(nd),
                "n_mentions": t.column("n_mentions"),
                "mean_first_micro": pa.array(ss // nd),
            }
        )

    return pin_schema(
        agg.map_batches(finish, batch_format="pyarrow"), out_schema, ensure_block=True
    )


def kg_graph_card(sf_dir: str):
    """One-row KG governance card — the graph-level corpus card
    (source_report's analog on the graph axis) a build publishes next
    to its node/edge tables: canonical-edge and node counts, predicate
    vocabulary size, total evidence weight, hub ceiling (max total
    degree), global triangle count and integer-micro undirected
    density. Every number is derived from the SAME canonical edge
    table the publishable graph ships, so the card can't drift from
    the export.

    Scale shape: the edge table materializes once (the standard
    kg_publish checkpoint shape) and five bounded consumers fold it —
    degree_stats and triangle_counts are node-grain, the distinct
    pred/pair folds are bucketed aggregates, and every final number is
    a Dataset scalar fold (count/sum/max), never a driver-side row
    scan. Columns: n_nodes, n_edges, n_und_pairs, n_preds,
    total_weight, max_degree, n_triangles, density_micro
    (2·pairs·10^6 // (n·(n−1)), 0 when n < 2)."""
    from bioner_ray.stages.graph import degree_stats, triangle_counts
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    e = kg_edges(sf_dir).materialize()
    deg = degree_stats(e)
    tri = triangle_counts(e)

    n_edges = int(e.count())
    total_weight = int(e.sum("weight") or 0)

    pred_schema = pa.schema([("pred", pa.string())])
    preds = pin_schema(
        bucketed_aggregate(
            with_ones(
                e.map_batches(
                    lambda t: t.select(["pred"])
                    if t.num_columns
                    else pred_schema.empty_table(),
                    batch_format="pyarrow",
                )
            ),
            ["pred"],
            [("one", "min")],
        ).map_batches(lambda t: t.select(["pred"]), batch_format="pyarrow"),
        pred_schema,
    )
    n_preds = int(preds.count())

    pair_schema = pa.schema([("lo", pa.string()), ("hi", pa.string())])

    def und(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pair_schema.empty_table()
        s, o = t.column("subj"), t.column("obj")
        keep = pc.not_equal(s, o)
        s, o = s.filter(keep), o.filter(keep)
        return pa.table(
            {"lo": pc.min_element_wise(s, o), "hi": pc.max_element_wise(s, o)}
        )

    pairs = pin_schema(
        bucketed_aggregate(
            with_ones(e.map_batches(und, batch_format="pyarrow")),
            ["lo", "hi"],
            [("one", "min")],
        ).map_batches(lambda t: t.select(["lo", "hi"]), batch_format="pyarrow"),
        pair_schema,
    )
    n_und = int(pairs.count())

    n_nodes = int(deg.count())
    tot = deg.map_batches(
        lambda t: pa.table(
            {
                "tot": pc.add(
                    pc.cast(t.column("out_degree"), pa.int64()),
                    pc.cast(t.column("in_degree"), pa.int64()),
                )
            }
        )
        if t.num_columns
        else pa.schema([("tot", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )
    max_degree = int(tot.max("tot") or 0)
    n_triangles = int(tri.sum("n_triangles") or 0) // 3
    density_micro = (
        (2 * n_und * 1_000_000) // (n_nodes * (n_nodes - 1)) if n_nodes >= 2 else 0
    )
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], type=pa.int64()),
            "n_edges": pa.array([n_edges], type=pa.int64()),
            "n_und_pairs": pa.array([n_und], type=pa.int64()),
            "n_preds": pa.array([n_preds], type=pa.int64()),
            "total_weight": pa.array([total_weight], type=pa.int64()),
            "max_degree": pa.array([max_degree], type=pa.int64()),
            "n_triangles": pa.array([n_triangles], type=pa.int64()),
            "density_micro": pa.array([density_micro], type=pa.int64()),
        }
    )


def user_state_scd2(sf_dir: str):
    """SCD-2 state history per user (stages/window.scd2_intervals):
    the event stream collapses into per-user state runs with validity
    intervals — the incremental-upsert table a warehouse merge
    maintains. One coarse-bucket shuffle, vectorized run-scan.
    Columns: user_id, state, valid_from_us, valid_to_us, n_events."""
    from bioner_ray.stages.window import scd2_intervals

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return scd2_intervals(ev)


def relation_patterns(sf_dir: str, min_support: int = 2):
    """Relation-pattern induction between consecutive entity mentions —
    the distant-supervision step that proposes textual templates for
    new predicates (Hearst-pattern family): for every adjacent entity
    pair in token order, the inter-entity token string is the pattern
    instance ('' = entities touching); patterns with ≥ ``min_support``
    instances are reported with instance and distinct-document counts.
    The candidate inventory kg-schema curation reviews before
    promoting a pattern to a predicate (the trip chain's relation
    lexicon is the promoted subset).

    Shape: per-doc vectorized entity-position scan (set membership
    over the token sequence), bounded per-batch pattern partials, then
    the two-level count-distinct — (pattern, doc) sums, per-pattern
    fold — with the support filter distributed. Columns: pattern,
    n_instances, n_docs."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import _split_lower

    ent = frozenset(ENTITY_SURFACES)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        for doc_id, toks in zip(
            batch.column("doc_id").to_pylist(), _split_lower(batch, "text")
        ):
            pos = [i for i, t in enumerate(toks) if t in ent]
            for p1, p2 in zip(pos, pos[1:]):
                key = (" ".join(toks[p1 + 1 : p2]), doc_id)
                counts[key] = counts.get(key, 0) + 1
        return pa.table(
            {
                "pattern": pa.array([p for p, _ in counts], type=pa.string()),
                "doc_id": pa.array([d for _, d in counts], type=pa.int64()),
                "inst": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    per_doc = bucketed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["pattern", "doc_id"],
        [("inst", "sum")],
    )

    def fold_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("pattern", pa.string()),
                    ("n_instances", pa.int64()),
                    ("n_docs", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "pattern": t.column("pattern"),
                "n_instances": t.column("inst"),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    out_schema = pa.schema(
        [("pattern", pa.string()), ("n_instances", pa.int64()), ("n_docs", pa.int64())]
    )
    agg = bucketed_aggregate(
        per_doc.map_batches(fold_rows, batch_format="pyarrow"),
        ["pattern"],
        [("n_instances", "sum"), ("n_docs", "sum")],
    )
    return pin_schema(
        agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n_instances"), min_support))
            if t.num_columns
            else out_schema.empty_table(),
            batch_format="pyarrow",
        ),
        out_schema,
    )


def edge_cut_audit(sf_dir: str, num_parts: int = 16):
    """Partitioning-quality audit for the canonical edge table: with
    nodes hash-partitioned by the engine's replayable md5-61-bit hash
    (the same key every kg_* shuffle buckets on), how many edges CROSS
    partitions? The cut fraction is the co-location cost model for
    graph stages — a high cut on the chosen key argues for a different
    partitioning (or edge-cut-aware placement) before a 100-TB graph
    job ships its adjacency twice per round. Per source partition:
    edge count, cut count, and the weight-weighted cut. Pure
    vectorized arithmetic over the edge table; one bounded aggregate.
    Columns: part, n_edges, n_cut, w_total, w_cut."""
    import hashlib

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    edges = kg_edges(sf_dir)
    m61 = 1 << 61
    out_schema = pa.schema(
        [
            ("part", pa.int64()),
            ("n_edges", pa.int64()),
            ("n_cut", pa.int64()),
            ("w_total", pa.int64()),
            ("w_cut", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        memo: dict = {}

        def h(col):
            from bioner_ray.stages.graph import _node_hash_column

            return (_node_hash_column(col, memo) % np.uint64(num_parts)).astype(
                np.int64
            )

        ps = h(t.column("subj"))
        po = h(t.column("obj"))
        w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.int64)
        cut = (ps != po).astype(np.int64)
        tbl = pa.table(
            {
                "part": pa.array(ps),
                "n_edges": pa.array(np.ones(len(ps), dtype=np.int64)),
                "n_cut": pa.array(cut),
                "w_total": pa.array(w),
                "w_cut": pa.array(w * cut),
            }
        )
        return tbl

    return pin_schema(
        bucketed_aggregate(
            edges.map_batches(partial, batch_format="pyarrow"),
            ["part"],
            [
                ("n_edges", "sum"),
                ("n_cut", "sum"),
                ("w_total", "sum"),
                ("w_cut", "sum"),
            ],
        ),
        out_schema,
    )


def user_activity_outliers(sf_dir: str):
    """Behavioral burst audit over the event stream — the
    abuse/automation screen a pipeline runs before trusting engagement
    counts: per user, active-day count, total events, the busiest
    day's count, and an integer burstiness verdict
    (``max_day · n_days > 3 · n_events`` — the peak day exceeds 3× the
    user's own mean daily rate; exact cross-multiplication, no
    floats). Two bucketed aggregates: (user, day) counts, then the
    per-user fold — the shuffle moves day-combined rows. Columns:
    user_id, n_days, n_events, max_day, bursty."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def day_rows(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("user_id"), pa.int64())
        days = pc.divide(
            pc.cast(t.column("ts"), pa.int64()), pa.scalar(86400000000, type=pa.int64())
        )
        return pa.table({"user_id": us, "day": pc.cast(days, pa.int64())})

    per_day = pin_schema(
        bucketed_aggregate(
            with_ones(ev.map_batches(day_rows, batch_format="pyarrow"), "cnt"),
            ["user_id", "day"],
            [("cnt", "sum")],
        ),
        pa.schema([("user_id", pa.int64()), ("day", pa.int64()), ("cnt", pa.int64())]),
    )

    def fold_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("n_days", pa.int64()),
                    ("n_events", pa.int64()),
                    ("max_day", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_days": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_events": t.column("cnt"),
                "max_day": t.column("cnt"),
            }
        )

    agg = bucketed_aggregate(
        per_day.map_batches(fold_rows, batch_format="pyarrow"),
        ["user_id"],
        [("n_days", "sum"), ("n_events", "sum"), ("max_day", "max")],
    )
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_days", pa.int64()),
            ("n_events", pa.int64()),
            ("max_day", pa.int64()),
            ("bursty", pa.int64()),
        ]
    )

    def verdict(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        b = pc.cast(
            pc.greater(
                pc.multiply(t.column("max_day"), t.column("n_days")),
                pc.multiply(t.column("n_events"), pa.scalar(3, type=pa.int64())),
            ),
            pa.int64(),
        )
        return t.append_column("bursty", b)

    return pin_schema(agg.map_batches(verdict, batch_format="pyarrow"), out_schema)


def referential_audit(sf_dir: str):
    """Referential-integrity audit over the relational tables — the
    data-quality gate a warehouse load runs before trusting joins:
    orphan counts for the three core foreign keys (lineitem→orders,
    orders→customer, customer→nation) plus each child table's row
    count. Three bucketed LEFT ANTI joins (the engine's
    empty-partition-proof join, key columns only leave the scan), each
    reduced to one bounded count row. Columns: fk, n_rows, n_orphans."""
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    checks = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    rows = []
    for name, child, ck, parent, pk in checks:
        c = _read(sf_dir, child, columns=[ck]).map_batches(
            lambda t, ck=ck: pa.table({"k": pc.cast(t.column(ck), pa.int64())}),
            batch_format="pyarrow",
        )
        p = _read(sf_dir, parent, columns=[pk]).map_batches(
            lambda t, pk=pk: pa.table({"k": pc.cast(t.column(pk), pa.int64())}),
            batch_format="pyarrow",
        )
        key_schema = pa.schema([("k", pa.int64())])
        orphans = bucketed_inner_join(
            pin_schema(c, key_schema),
            pin_schema(p, key_schema),
            ["k"],
            key_schema,
            key_schema,
            join_type="left anti",
        )
        rows.append((name, c.count(), orphans.count()))
    return pa.table(
        {
            "fk": pa.array([r[0] for r in rows], type=pa.string()),
            "n_rows": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_orphans": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def retention_cohorts(sf_dir: str):
    """Weekly cohort retention — the product-analytics matrix every
    engagement dashboard serves: users grouped by FIRST-event week
    (cohort), counted as retained in each later week they appear
    (week offset 0, 1, 2, …). Integer week keys
    (epoch_us // (7·86400·10⁶)). Two wide steps: distinct
    (user, week) pairs, then per-user min week joined back — both
    bucketed; output bounded by weeks². Columns: cohort_week,
    week_offset, n_users."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    wk = pa.scalar(7 * 86400 * 1000000, type=pa.int64())

    def week_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "week": pc.cast(
                    pc.divide(pc.cast(t.column("ts"), pa.int64()), wk), pa.int64()
                ),
            }
        )

    uw_schema = pa.schema([("user_id", pa.int64()), ("week", pa.int64())])
    # distinct (user, week)
    uw = pin_schema(
        bucketed_aggregate(
            with_ones(ev.map_batches(week_rows, batch_format="pyarrow"), "one"),
            ["user_id", "week"],
            [("one", "min")],
        ),
        uw_schema,
    ).materialize()
    # cohort = per-user min week
    cohort = pin_schema(
        bucketed_aggregate(
            uw.map_batches(
                lambda t: pa.table(
                    {"user_id": t.column("user_id"), "cohort_week": t.column("week")}
                )
                if t.num_columns
                else pa.schema(
                    [("user_id", pa.int64()), ("cohort_week", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["user_id"],
            [("cohort_week", "min")],
        ),
        pa.schema([("user_id", pa.int64()), ("cohort_week", pa.int64())]),
    )
    joined = bucketed_inner_join(
        uw,
        cohort,
        ["user_id"],
        uw_schema,
        pa.schema([("user_id", pa.int64()), ("cohort_week", pa.int64())]),
    )
    out_schema = pa.schema(
        [
            ("cohort_week", pa.int64()),
            ("week_offset", pa.int64()),
            ("n_users", pa.int64()),
        ]
    )

    def offset_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "cohort_week": t.column("cohort_week"),
                "week_offset": pc.subtract(t.column("week"), t.column("cohort_week")),
                "n_users": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            joined.map_batches(offset_rows, batch_format="pyarrow"),
            ["cohort_week", "week_offset"],
            [("n_users", "sum")],
        ),
        out_schema,
    )


def event_type_stationary(sf_dir: str, rounds: int = 3):
    """Quasi-stationary mass of the event-type Markov chain — scaled-
    integer power iteration (the kg_pagerank idiom on the behavioral
    transition matrix): start every type at 10¹², apply
    p′(t) = Σ_f p(f)·n(f→t) // out(f) for ``rounds`` fixed rounds
    (types with no outgoing transitions evaporate their mass, the
    pagerank dangling convention — document, don't hide). The
    transition counts come from ``event_transitions`` (types²-bounded);
    the iteration is exact integer arithmetic over that tiny table, so
    the twin unrolls the same rounds in HUGEINT. Columns: event_type,
    mass_scaled."""
    rows = event_transitions(sf_dir).take_all()  # event-type² bounded
    n: dict = {}
    out: dict = {}
    types = set()
    for r in rows:
        f, t, c = r["from_type"], r["to_type"], int(r["n"])
        n[(f, t)] = c
        out[f] = out.get(f, 0) + c
        types.add(f)
        types.add(t)
    p = {t: 10**12 for t in types}
    for _ in range(rounds):
        nxt = {t: 0 for t in types}
        for (f, t), c in n.items():
            nxt[t] += p[f] * c // out[f]
        p = nxt
    ordered = sorted(types)
    return pa.table(
        {
            "event_type": pa.array(ordered, type=pa.string()),
            "mass_scaled": pa.array([p[t] for t in ordered], type=pa.int64()),
        }
    )


def hll_merge_proof(sf_dir: str, p: int = 8):
    """Distributed-sketch mergeability, proven END TO END: the event
    stream is split into two shards (event_id parity — users overlap
    both), each shard builds its own HLL register table, the two are
    MERGED (per-(type, bucket) max — the operation a tree of cluster
    nodes applies), and the merged estimate is reported next to the
    single-pass full-stream estimate. Equality is the property that
    makes HLL safe to combine across 256 nodes without a central pass;
    the twin re-derives BOTH sides independently (the half registers
    max-merged in SQL vs the full registers), so the hash pins the
    merge law itself, not one shared expression. Columns: event_type,
    v_zero, s_int, est_distinct, v_zero_merged, s_int_merged,
    est_merged, equal."""
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema
    from bioner_ray.stages.sketch import hll_finish, hll_merge, hll_registers

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "user_id"])

    def half(parity: int):
        return ev.map_batches(
            lambda t, parity=parity: t.filter(
                pc.equal(
                    pc.bit_wise_and(pc.cast(t.column("event_id"), pa.int64()), 1),
                    parity,
                )
            ).select(["event_type", "user_id"]),
            batch_format="pyarrow",
        )

    full = hll_finish(
        hll_registers(ev.select_columns(["event_type", "user_id"]), "event_type", "user_id", p=p),
        "event_type",
        p=p,
    )
    merged = hll_finish(
        hll_merge(
            hll_registers(half(0), "event_type", "user_id", p=p),
            hll_registers(half(1), "event_type", "user_id", p=p),
            "event_type",
        ),
        "event_type",
        p=p,
    )
    f_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("v_zero", pa.int64()),
            ("s_int", pa.int64()),
            ("est_distinct", pa.float64()),
        ]
    )
    m_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("v_zero_merged", pa.int64()),
            ("s_int_merged", pa.int64()),
            ("est_merged", pa.float64()),
        ]
    )
    joined = bucketed_inner_join(
        pin_schema(full, f_schema),
        pin_schema(
            merged.map_batches(
                lambda t: t.rename_columns(
                    ["event_type", "v_zero_merged", "s_int_merged", "est_merged"]
                )
                if t.num_columns
                else t,
                batch_format="pyarrow",
            ),
            m_schema,
        ),
        ["event_type"],
        f_schema,
        m_schema,
    )
    out_schema = pa.schema(
        list(f_schema)
        + [
            ("v_zero_merged", pa.int64()),
            ("s_int_merged", pa.int64()),
            ("est_merged", pa.float64()),
            ("equal", pa.int64()),
        ]
    )

    def verdict(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        eq = pc.cast(
            pc.and_(
                pc.equal(t.column("s_int"), t.column("s_int_merged")),
                pc.equal(t.column("v_zero"), t.column("v_zero_merged")),
            ),
            pa.int64(),
        )
        return t.append_column("equal", eq)

    return pin_schema(joined.map_batches(verdict, batch_format="pyarrow"), out_schema)


def rfm_segments(sf_dir: str):
    """RFM customer segmentation — the classic marketing-analytics
    cube: per customer, Recency (days since last order, against the
    corpus max order day), Frequency (order count) and Monetary (cent
    total), each scored 1-3 by EXACT discrete tercile cutpoints
    (``quantile_disc`` rule — the value_percentiles idiom: integer
    order statistics, no interpolation, identical in DuckDB), composed
    into the segment code 100·r + 10·f + m. Shape: one bucketed
    per-customer aggregate; cutpoints are six scalars from the bounded
    customer table; scoring is a vectorized second pass. Columns:
    o_custkey, recency_days, n_orders, total_cents, segment."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"]
    )

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(
                pc.cast(t.column("o_orderdate"), pa.int64()),
                pa.scalar(86400000000, type=pa.int64()),
            ),
            pa.int64(),
        )
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), 100)), pa.int64())
        return pa.table(
            {
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "last_day": day,
                "n_orders": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "total_cents": cents,
            }
        )

    per_cust = pin_schema(
        bucketed_aggregate(
            orders.map_batches(prep, batch_format="pyarrow"),
            ["o_custkey"],
            [("last_day", "max"), ("n_orders", "sum"), ("total_cents", "sum")],
        ),
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("last_day", pa.int64()),
                ("n_orders", pa.int64()),
                ("total_cents", pa.int64()),
            ]
        ),
    ).materialize()

    # cutpoints over the CUSTOMER-bounded table (quantile_disc rule:
    # the element at ceil(q*n)-1 of the ascending sort)
    df = per_cust.to_pandas()
    max_day = int(df["last_day"].max())
    df["recency_days"] = max_day - df["last_day"]

    def cuts(col):
        v = np.sort(df[col].to_numpy(np.int64))
        n = len(v)
        idx = lambda q: v[max(0, int(np.ceil(q * n)) - 1)]
        return int(idx(1 / 3)), int(idx(2 / 3))

    rc1, rc2 = cuts("recency_days")
    fc1, fc2 = cuts("n_orders")
    mc1, mc2 = cuts("total_cents")

    def score(v, c1, c2, invert=False):
        s = np.where(v <= c1, 1, np.where(v <= c2, 2, 3)).astype(np.int64)
        return (4 - s) if invert else s

    r = score(df["recency_days"].to_numpy(np.int64), rc1, rc2, invert=True)
    f = score(df["n_orders"].to_numpy(np.int64), fc1, fc2)
    m = score(df["total_cents"].to_numpy(np.int64), mc1, mc2)
    return pa.table(
        {
            "o_custkey": pa.array(df["o_custkey"].to_numpy(np.int64)),
            "recency_days": pa.array(df["recency_days"].to_numpy(np.int64)),
            "n_orders": pa.array(df["n_orders"].to_numpy(np.int64)),
            "total_cents": pa.array(df["total_cents"].to_numpy(np.int64)),
            "segment": pa.array(100 * r + 10 * f + m, type=pa.int64()),
        }
    )


def dau_wau_stickiness(sf_dir: str):
    """Stickiness (DAU/WAU) per week — the engagement ratio product
    dashboards track: per week, the weekly-active count, the SUM of
    daily-active counts, and stickiness_milli = 1000·Σdau // (7·wau)
    (exact integers; the mean-DAU-over-WAU convention with a fixed
    7-day denominator so partial weeks read honestly low). Two
    distinct-pair aggregates ((user, day) and (user, week)) plus
    bounded folds — the two-level count-distinct pattern twice.
    Columns: week, wau, sum_dau, stickiness_milli."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    day_us = pa.scalar(86400000000, type=pa.int64())

    def keys(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64())
        day = pc.cast(pc.divide(ts, day_us), pa.int64())
        week = pc.cast(
            pc.divide(ts, pa.scalar(604800000000, type=pa.int64())), pa.int64()
        )
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "day": day,
                "week": week,
            }
        )

    kd = ev.map_batches(keys, batch_format="pyarrow").materialize()
    ud = pin_schema(
        bucketed_aggregate(
            with_ones(
                kd.map_batches(
                    lambda t: t.select(["user_id", "day", "week"]),
                    batch_format="pyarrow",
                ),
                "one",
            ),
            ["user_id", "day", "week"],
            [("one", "min")],
        ),
        pa.schema(
            [("user_id", pa.int64()), ("day", pa.int64()), ("week", pa.int64())]
        ),
    )
    # Σdau per week: distinct (user, day) rows folded by week
    dau = bucketed_aggregate(
        ud.map_batches(
            lambda t: pa.table(
                {
                    "week": t.column("week"),
                    "sum_dau": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            if t.num_columns
            else pa.schema([("week", pa.int64()), ("sum_dau", pa.int64())]).empty_table(),
            batch_format="pyarrow",
        ),
        ["week"],
        [("sum_dau", "sum")],
    )
    # wau: distinct (user, week)
    uw = pin_schema(
        bucketed_aggregate(
            with_ones(
                kd.map_batches(
                    lambda t: t.select(["user_id", "week"]), batch_format="pyarrow"
                ),
                "one",
            ),
            ["user_id", "week"],
            [("one", "min")],
        ),
        pa.schema([("user_id", pa.int64()), ("week", pa.int64())]),
    )
    wau = bucketed_aggregate(
        uw.map_batches(
            lambda t: pa.table(
                {
                    "week": t.column("week"),
                    "wau": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            if t.num_columns
            else pa.schema([("week", pa.int64()), ("wau", pa.int64())]).empty_table(),
            batch_format="pyarrow",
        ),
        ["week"],
        [("wau", "sum")],
    )
    from bioner_ray.stages.shuffle import bucketed_inner_join

    wk_schema_d = pa.schema([("week", pa.int64()), ("sum_dau", pa.int64())])
    wk_schema_w = pa.schema([("week", pa.int64()), ("wau", pa.int64())])
    joined = bucketed_inner_join(
        pin_schema(dau, wk_schema_d),
        pin_schema(wau, wk_schema_w),
        ["week"],
        wk_schema_d,
        wk_schema_w,
    )
    out_schema = pa.schema(
        [
            ("week", pa.int64()),
            ("wau", pa.int64()),
            ("sum_dau", pa.int64()),
            ("stickiness_milli", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        import numpy as np

        sd = t.column("sum_dau").to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("wau").to_numpy(zero_copy_only=False).astype(np.int64)
        st = np.where(w > 0, (1000 * sd) // (7 * np.maximum(w, 1)), 0)
        return pa.table(
            {
                "week": t.column("week"),
                "wau": pa.array(w),
                "sum_dau": pa.array(sd),
                "stickiness_milli": pa.array(st),
            },
            schema=out_schema,
        )

    return pin_schema(joined.map_batches(finish, batch_format="pyarrow"), out_schema)


def kg_reciprocity(sf_dir: str):
    """Directed-edge reciprocity of the canonical KG — the graph-shape
    scalar separating citation-like DAGs (→0) from social/co-occurrence
    graphs (→1), the sanity bound KG link-prediction baselines quote:
    among distinct directed (subj, obj) pairs (self-loops out), the
    fraction whose reverse pair also exists, in exact integer milli.
    One dedup aggregate + one pair-keyed left-semi join against the
    swapped table + a bounded fold. Columns: n_directed,
    n_reciprocated, reciprocity_milli."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    edges = kg_edges(sf_dir)

    def to_pairs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pair_schema.empty_table()
        f = t.filter(pc.not_equal(t.column("subj"), t.column("obj")))
        return pa.table({"a": f.column("subj"), "b": f.column("obj")})

    distinct = pin_schema(
        bucketed_aggregate(
            with_ones(edges.map_batches(to_pairs, batch_format="pyarrow"), "one"),
            ["a", "b"],
            [("one", "min")],
        ),
        pair_schema,
    ).materialize()
    swapped = distinct.map_batches(
        lambda t: pa.table({"a": t.column("b"), "b": t.column("a")})
        if t.num_columns
        else pair_schema.empty_table(),
        batch_format="pyarrow",
    )
    mutual = bucketed_inner_join(
        distinct, swapped, ["a", "b"], pair_schema, pair_schema, join_type="left semi"
    )
    n_dir = distinct.count()
    n_rec = mutual.count()
    return pa.table(
        {
            "n_directed": pa.array([n_dir], type=pa.int64()),
            "n_reciprocated": pa.array([n_rec], type=pa.int64()),
            "reciprocity_milli": pa.array(
                [(1000 * n_rec) // n_dir if n_dir else 0], type=pa.int64()
            ),
        }
    )
