"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline; ``queries()``
exposes one callable per implemented operator/pipeline from SURVEY.md
§2 (plus the training-data corpus operators); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible query, with
identical column names (non-SQL-expressible entries — LSH banding,
approximate ANN, seeded shuffles — are intentionally omitted and
get the rows-only check).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` anywhere down this import tree.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

ENTITY_LIST_SQL = "('customer','table','row','column','vector','key','window','line','part','batch','dup')"
RELATION_LIST_SQL = "('join','merge','filter','sort','scan','group','hash')"
#: the degraded-annotator surface set (analytics.PRED_SURFACES) and its
#: intersection with the gold entity set — the eval-harness oracles.
PRED_LIST_SQL = "('customer','table','row','column','vector','key','window','join','merge','filter')"
BOTH_LIST_SQL = "('customer','table','row','column','vector','key','window')"
STOPWORDS_SQL = (
    "('the','a','of','and','to','in','is','was','for','on','with','as','by','at','from','that','it')"
)

#: shared token CTE — the engine's tokenization contract
#: (bioner_ray.stages.textstats.tokenize_ws) spelled in SQL.
_TOK_CTE = """
tok AS (
  SELECT doc_id, i AS pos, ws[i] AS w
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents),
       UNNEST(generate_series(1, len(ws))) AS t(i)
  WHERE ws[i] <> ''
)
"""

# The KG triple chain (tokenize → entity gazetteer → consecutive-entity
# pairs → relation pick) shared by the kg_edges / kg_degree /
# kg_pagerank oracles — one text, three consumers, zero drift.
_KG_TRIP_CTES = f"""{_TOK_CTE},
ent AS (SELECT * FROM tok WHERE w IN {ENTITY_LIST_SQL}),
pairs AS (
  SELECT doc_id, pos AS p1, w AS subj,
         LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS p2,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS obj
  FROM ent
),
trip AS (
  SELECT p.doc_id, p.subj, p.obj,
         coalesce((SELECT min_by(t.w, t.pos) FROM tok t
                   WHERE t.doc_id = p.doc_id AND t.pos > p.p1 AND t.pos < p.p2
                     AND t.w IN {RELATION_LIST_SQL}),
                  'co_occurs_with') AS pred
  FROM pairs p WHERE p.p2 IS NOT NULL
)"""


def _walks_sql(length: int = 3, seed: int = 42) -> str:
    """DuckDB twin of stages/graph.py:hash_walks — the per-step affine
    mix ``(A_i·h(cur) + B_i·h(nxt) + C_i) mod 2^64`` with the SAME
    seeded 61-bit constants inlined (HUGEINT products ≤ 2^122 replay
    numpy's uint64 wrap exactly, the minhash-twin pattern); h(node) =
    md5-prefix mod 2^61. Chained inner joins drop walks whose current
    node has no out-edges, exactly as the engine's inner join does."""
    from bioner_ray.stages.graph import _walk_params

    a, b, c = _walk_params(length, seed=seed)
    m64 = 18446744073709551616  # 2^64
    ctes = [
        f"WITH {_KG_TRIP_CTES}",
        "e0 AS (SELECT DISTINCT subj, obj FROM trip)",
        "hn AS (SELECT node, CAST(concat('0x', substr(md5(node), 1, 16)) AS UBIGINT)"
        " % 2305843009213693952 AS h"
        " FROM (SELECT subj AS node FROM e0 UNION SELECT obj FROM e0))",
        "w0 AS (SELECT DISTINCT subj AS start, subj AS cur FROM e0)",
    ]
    cols = ["start"]
    for i in range(1, length + 1):
        prev = f"w{i - 1}"
        carried = ", ".join(f"{prev}.{col}" for col in cols)
        ctes.append(
            f"c{i} AS (SELECT {carried}, e0.obj AS n{i}, "
            f"row_number() OVER (PARTITION BY {prev}.start ORDER BY "
            f"(CAST({int(a[i - 1])} AS HUGEINT) * hc.h"
            f" + CAST({int(b[i - 1])} AS HUGEINT) * ho.h"
            f" + {int(c[i - 1])}) % {m64}, e0.obj) AS rn "
            f"FROM {prev} JOIN e0 ON e0.subj = {prev}.cur "
            f"JOIN hn hc ON hc.node = {prev}.cur JOIN hn ho ON ho.node = e0.obj)"
        )
        cols = cols + [f"n{i}"]
        ctes.append(
            f"w{i} AS (SELECT {', '.join(cols)}, n{i} AS cur FROM c{i} WHERE rn = 1)"
        )
    return (
        ",\n".join([ctes[0]] + ctes[1:])
        + f"\nSELECT {', '.join(cols)} FROM w{length}"
    )


def _kcore_sql(k: int = 3, rounds: int = 10) -> str:
    """DuckDB twin of pipelines/analytics.kg_kcore — the fixed-round
    peel chained as ``rounds`` CTE pairs (degree → survivors → edge
    restriction); the engine's early exit is fixpoint-safe so the
    full-round replay matches whether or not it converged early."""
    # AS MATERIALIZED is load-bearing: each e{r} is referenced three
    # times by round r+1, so an inlining planner would expand the chain
    # ~4^rounds ways (and open the documents parquet once per expansion
    # — "Too many open files" long before it finishes)
    ctes = [
        f"WITH {_KG_TRIP_CTES}",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(subj, obj) AS lo,"
        " greatest(subj, obj) AS hi FROM trip WHERE subj <> obj)",
    ]
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT node, count(*) AS deg FROM"
            f" (SELECT lo AS node FROM {prev} UNION ALL SELECT hi FROM {prev})"
            f" GROUP BY node)"
        )
        ctes.append(f"s{r} AS (SELECT node FROM d{r} WHERE deg >= {k})")
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT {prev}.lo, {prev}.hi FROM {prev}"
            f" JOIN s{r} a ON a.node = {prev}.lo"
            f" JOIN s{r} b ON b.node = {prev}.hi)"
        )
    last = f"e{rounds}"
    return (
        ",\n".join(ctes)
        + f"\nSELECT node, CAST(count(*) AS BIGINT) AS deg FROM"
        + f" (SELECT lo AS node FROM {last} UNION ALL SELECT hi FROM {last})"
        + " GROUP BY node"
    )


def _bloom_sql(n: int = 5, m_bits: int = 1 << 20, k: int = 4, seed: int = 42) -> str:
    """DuckDB twin of pipelines/corpus.bloom_decontaminate — replays the
    Bloom filter's exact bit behavior, false positives included: gram
    hash = md5-prefix mod 2^61, positions ((A_i·h + B_i) mod 2^64) mod
    m (HUGEINT products ≤ 2^122, same seeded constants), the filter =
    the distinct eval position set, and a train gram hits iff ALL k of
    its positions are present."""
    from bioner_ray.stages.bloom import bloom_params

    a, b = bloom_params(k, seed=seed)
    m64 = 18446744073709551616  # 2^64
    gm = " || ' ' || ".join(f"ws[i+{j}]" if j else "ws[i]" for j in range(n))
    pos = [
        f"CAST((CAST({int(a[i])} AS HUGEINT) * h + {int(b[i])}) % {m64} AS UBIGINT)"
        f" % {m_bits}"
        for i in range(k)
    ]
    epos = " UNION SELECT ".join(f"{p} AS pos FROM eh" for p in pos)
    hit_cond = " AND ".join(f"({p}) IN (SELECT pos FROM epos)" for p in pos)
    return f"""
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
           FROM documents),
g AS (SELECT doc_id, {gm} AS gm
      FROM w, UNNEST(generate_series(1, len(ws) - {n - 1})) AS t(i)),
eh AS (SELECT DISTINCT CAST(concat('0x', substr(md5(gm), 1, 16)) AS UBIGINT)
              % 2305843009213693952 AS h
       FROM g WHERE doc_id % 97 = 0),
epos AS (SELECT {epos}),
tv AS (SELECT gm, CAST(concat('0x', substr(md5(gm), 1, 16)) AS UBIGINT)
              % 2305843009213693952 AS h
       FROM (SELECT DISTINCT gm FROM g WHERE doc_id % 97 <> 0)),
hitv AS (SELECT gm FROM tv WHERE {hit_cond}),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                  CAST(count(*) FILTER (WHERE gm IN (SELECT gm FROM hitv)) AS BIGINT) AS n_hits
           FROM g WHERE doc_id % 97 <> 0 GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.n_grams, 0) AS n_grams, coalesce(c.n_hits, 0) AS n_hits,
       coalesce(c.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN counts c USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


def entry() -> Any:
    """Flagship KG pipeline at sf0.001: read documents parquet → adapt
    to the page shape → segment → gazetteer score (actor pool) → link →
    triples → canonicalized edge Dataset."""
    from bioner_ray.pipelines.analytics import kg_edges

    return kg_edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from bioner_ray.pipelines import analytics as an
    from bioner_ray.pipelines import corpus as co

    return {
        # --- flagship KG path (segment → score → mentions → link → triples) ---
        "kg_edges": an.kg_edges,
        "kg_nodes": an.kg_nodes,
        "kg_degree": an.kg_degree,            # per-node degree/strength (hub audit)
        "kg_pagerank": an.kg_pagerank,        # scaled-integer fixed-iteration PageRank
        "kg_top_neighbors": an.kg_top_neighbors,  # per-node top-k neighbor lists
        "kg_edge_delta": an.kg_edge_delta,    # snapshot-diff incremental KG update set
        "kg_edge_pmi": an.kg_edge_pmi,        # PMI/NPMI edge association scoring
        "kg_walks": an.kg_walks,              # hash-greedy walk corpus (RNG-free)
        "kg_node_profiles": an.kg_node_profiles,  # per-entity relation typing signal
        "kg_triangles": an.kg_triangles,      # degree-oriented triangle counting
        "kg_edge_support": an.kg_edge_support,  # per-edge truss support + structural jaccard
        "kg_edge_wjaccard": an.kg_edge_wjaccard,  # weighted structural jaccard (merge signal)
        "kg_merge_groups": an.kg_merge_groups,  # structural entity-resolution groups
        "kg_reach2": an.kg_reach2,            # 2-hop reach via mergeable KMV sketches
        "kg_truss_edges": an.kg_truss_edges,
        "kg_kcore": an.kg_kcore,              # iterative-peel entity core (fixed-round SQL twin)  # cohesion-pruned graph (support >= k-2)
        "kg_publish": an.kg_publish,          # full DAG: prune + merge-rewrite + re-canonicalize
        "mention_counts": an.mention_counts,
        "entity_burstiness": an.entity_burstiness,  # doc-frequency vs burst dispersion
        "source_report": an.source_report,    # per-source corpus card (docs/tokens/quality/dups)
        "entity_centroids": an.entity_centroids,  # per-entity embedding centroid sums (int-exact)
        "entity_similarity": an.entity_similarity,  # centroid cosine (semantic merge signal)
        "doc_entity_density": an.doc_entity_density,  # shuffle-free page-value audit
        "kg_edges_pruned": an.kg_edges_pruned,  # NPMI-thresholded publishable graph
        # --- eval harness (G4-G7, J4/J5: two-annotator in-row metrics) ---
        "ner_eval": an.ner_eval,
        "error_length_stats": an.error_length_stats,
        "ensemble_mention_counts": an.ensemble_mention_counts,
        "surface_stats": an.surface_stats,                 # M3 surface encoder
        "position_stats": an.position_stats,               # M4 position encoder
        "unknown_words": an.unknown_words,                 # M8 + G1/G2 vocab
        "bioul_map": an.bioul_map,                         # M9 BIOUL→BIO2
        "datexis_mentions": an.datexis_mentions,           # M7/A2/A4 (golden-parquet oracle)
        "encoding_fasttext": co.encoding_fasttext,         # M6/A1 real .bin path (golden-parquet oracle)
        "doc_shuffle": an.doc_shuffle,                     # O2 (rows-only, seeded)
        "error_samples": an.error_samples,                 # O3 (rows-only, seeded)
        # --- reference operator pipelines ---
        "word_count": an.word_count,          # G1-G3 vocab shuffle + rank
        "alias_groups": an.alias_groups,      # surface-form merge (canonicalization)
        "doc_logprob": an.doc_logprob,        # unigram-surprise (perplexity-filter stand-in)
        "doc_split": an.doc_split,            # J1/S7 broadcast semi-join
        # --- relational / aggregate coverage (G4-G8, J, O patterns) ---
        "pricing_summary": an.pricing_summary,
        "top_orders": an.top_orders,
        "customers_per_nation": an.customers_per_nation,
        "revenue_by_segment": an.revenue_by_segment,
        "events_by_type": an.events_by_type,
        "events_per_day": an.events_per_day,
        "event_anomaly": an.event_anomaly,           # daily z-score (int-algebra exact)
        "user_retention": an.user_retention,         # cohort retention matrix
        "funnel": an.funnel,                         # ordered multi-step funnel
        "events_rolling_7d": an.events_rolling_7d,   # windowed aggregate
        "events_last_order": an.events_last_order,   # as-of join
        "sessions": an.sessions,                     # gap-based sessionization
        "value_percentiles": an.value_percentiles,   # exact distributed order statistics
        "distinct_users_per_type": an.distinct_users_per_type,  # exact count-distinct
        "distinct_users_kmv": an.distinct_users_kmv,            # KMV bottom-k distinct sketch
        "top_orders_per_customer": an.top_orders_per_customer,  # per-group top-k rank
        "customers_without_orders": an.customers_without_orders,  # native left_anti join
        # --- training-data corpus operators ---
        "dedup_exact": co.dedup_exact,
        "dedup_jaccard_pairs": co.dedup_jaccard_pairs,
        "dedup_components": co.dedup_components,          # near-dup clusters (iterative)
        "dedup_minhash_pairs": co.dedup_minhash_pairs,    # SQL twin with inlined seeded perms
        "dedup_simhash_pairs": co.dedup_simhash_pairs,    # SQL twin (exact Hamming)
        "dedup_filter": co.dedup_filter,                  # pairs→components→keep-representatives
        "corpus_clean": co.corpus_clean,                  # lang→quality→dedup flagship
        "token_stats": co.token_stats,
        "conll_roundtrip": co.conll_roundtrip,            # S1/S2 format↔parse parity
        "jsonl_roundtrip": co.jsonl_roundtrip,            # JSONL sink→source byte parity
        "csv_roundtrip": co.csv_roundtrip,                # CSV sink→source typed parity
        "pubmed_extract": co.pubmed_extract,              # S4/S5/G8 XML extract round-trip
        "pubtator_conll": co.pubtator_conll,              # S6 PubTator→CoNLL (native)
        "conlleval_export": co.conlleval_export,          # S3/S8/M12/J3 export round-trip
        "quality_docs": co.quality_docs,
        "winnow_fingerprints": co.winnow_fingerprints,    # SQL twin (Karp-Rabin replay)
        "fingerprints": co.fingerprints,
        "langid": co.langid,                              # SQL twin generated from LANG_PROFILES
        "encoding_stats": co.encoding_stats,              # M6/A1 hash backend (golden-parquet oracle)
        "knn_topk": co.knn_topk,
        "knn_ivf_topk": co.knn_ivf_topk,                  # approximate, deterministic (golden-parquet oracle)
        "embedding_dup_pairs": co.embedding_dup_pairs,
        "token_shards": co.token_shards,                  # distributed prefix-sum packing
        "stratified_sample": co.stratified_sample,        # deterministic hash sampling
        "decontaminate": co.decontaminate,                # benchmark n-gram decontamination
        "bloom_decontaminate": co.bloom_decontaminate,     # Bloom-filter membership scale path (exact FP replay)
        "repetition_stats": co.repetition_stats,          # Gopher-style repetition signals
        "training_shards": co.training_shards,            # clean corpus → token-budget shards
        "dup_span_stats": co.dup_span_stats,              # Lee-et-al duplicated-window fraction
        "doc_top_terms": co.doc_top_terms,                # integer-exact TF-IDF top-k per doc
        "source_quota": co.source_quota,                  # per-source doc cap (source balancing)
        "upsample_mix": co.upsample_mix,                  # fractional-epoch replication mix
        "incremental_dedup": co.incremental_dedup,        # LSH store ingest (SQL: filtered minhash twin)
        "media_features": co.media_features,              # multimodal actor pool, real PGM codec (golden-parquet oracle)
    }


def _langid_sql() -> str:
    """DuckDB twin of stages/textstats.py:langid_batch, generated from
    the SAME ``LANG_PROFILES`` constant so the two can never drift:
    per-language stopword hit counts over the shared whitespace
    tokenization, pinned-order argmax, tie-on-positive-max → 'und',
    score = max_hits / max(n_tokens, 1) (kept even when tied)."""
    from bioner_ray.stages.textstats import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    hits = ",\n       ".join(
        "len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES[lang]))
        + f"], x))) AS hits_{lang}"
        for lang in langs
    )
    mx = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    ntie = " + ".join(f"CAST(hits_{lang} = mx AS INT)" for lang in langs)
    pred = "".join(f"\n         WHEN hits_{lang} = mx THEN '{lang}'" for lang in langs)
    return f"""
WITH t AS (SELECT doc_id,
       list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
h AS (SELECT doc_id, greatest(len(toks), 1) AS n,
       {hits}
  FROM t),
m AS (SELECT *, {mx} AS mx FROM h)
SELECT doc_id,
       CASE WHEN mx = 0 OR {ntie} >= 2 THEN 'und'{pred}
       END AS pred_lang,
       CAST(mx AS DOUBLE) / n AS lang_score
FROM m
"""


#: DuckDB twin of stages/textstats.py:rolling_hashes + winnow_fingerprint
#: (window=5 tokens, stride=4 hashes). Token hash = first 8 bytes of md5
#: big-endian; recurrence out=(out*1000003+h) & (2^61-1) — the AND keeps
#: only low bits, so it commutes through numpy's mod-2^64 wrap and SQL
#: can replay it exactly with HUGEINT intermediates and % 2^61.
_WINNOW_SQL = """
WITH tok AS (
  SELECT doc_id, i AS pos, ws[i] AS w
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents),
       UNNEST(generate_series(1, len(ws))) AS t(i)
  WHERE ws[i] <> ''
),
th AS (SELECT doc_id, pos,
              CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS h
       FROM tok),
l AS (SELECT doc_id, pos, h,
             lead(h, 1) OVER win AS h1, lead(h, 2) OVER win AS h2,
             lead(h, 3) OVER win AS h3, lead(h, 4) OVER win AS h4
      FROM th WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
rh AS (SELECT doc_id, pos,
              CAST(((((((((CAST(h AS HUGEINT) % 2305843009213693952)
                 * 1000003 + h1) % 2305843009213693952)
                 * 1000003 + h2) % 2305843009213693952)
                 * 1000003 + h3) % 2305843009213693952)
                 * 1000003 + h4) % 2305843009213693952 AS UBIGINT) AS r
       FROM l WHERE h4 IS NOT NULL),
w4 AS (SELECT doc_id, r,
              lead(r, 1) OVER win AS r1, lead(r, 2) OVER win AS r2,
              lead(r, 3) OVER win AS r3,
              count(*) OVER (PARTITION BY doc_id) AS nr
       FROM rh WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
mins AS (
  SELECT doc_id, least(r, r1, r2, r3) AS fp FROM w4 WHERE nr > 4 AND r3 IS NOT NULL
  UNION ALL
  SELECT doc_id, min(r) AS fp FROM rh GROUP BY doc_id HAVING count(*) <= 4
)
SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fp FROM mins
"""


def _minhash_sql() -> str:
    """DuckDB twin of stages/dedup.py:minhash_dedup_pairs (num_perm=64,
    bands=16, k=3, seed=42), with the seeded permutation constants
    generated by the SAME ``_minhash_params`` call and inlined: distinct
    3-token shingles → md5-based 61-bit shingle hash → min over
    shingles of (a_i·h + b_i) mod 2^64 per permutation (HUGEINT
    replays numpy's uint64 wrap) → docs pair iff a 4-slot band agrees,
    n_bands = agreeing-band count, est = (n/16)^(1/4). Shingle-less
    docs carry the all-max signature, exactly as the engine."""
    from bioner_ray.stages.dedup import _minhash_params

    a, b = _minhash_params(64, seed=42)
    perms = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(64))
    return f"""
WITH tok AS (
  SELECT doc_id, i AS pos, ws[i] AS w
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents),
       UNNEST(generate_series(1, len(ws))) AS t(i)
  WHERE ws[i] <> ''
),
tri AS (SELECT doc_id, w || ' ' || w1 || ' ' || w2 AS s
        FROM (SELECT doc_id, w,
                     lead(w, 1) OVER win AS w1, lead(w, 2) OVER win AS w2
              FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos))
        WHERE w2 IS NOT NULL),
hsh AS (SELECT DISTINCT doc_id,
               CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT)
                 % 2305843009213693952 AS h
        FROM tri),
perms(i, pa, pb) AS (VALUES {perms}),
sigp AS (SELECT d.doc_id, p.i,
                coalesce(min((CAST(p.pa AS HUGEINT) * h.h + p.pb)
                             % 18446744073709551616),
                         18446744073709551615) AS v
         FROM (SELECT doc_id FROM documents) d
         CROSS JOIN perms p
         LEFT JOIN hsh h ON h.doc_id = d.doc_id
         GROUP BY d.doc_id, p.i),
bnd AS (SELECT doc_id, i // 4 AS band,
               string_agg(v::VARCHAR, ',' ORDER BY i) AS bv
        FROM sigp GROUP BY doc_id, i // 4)
SELECT x.doc_id AS a, y.doc_id AS b,
       count(*) AS n_bands,
       power(count(*) / 16.0, 0.25) AS est_jaccard
FROM bnd x JOIN bnd y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
"""


#: DuckDB twin of stages/dedup.py:simhash_pairs (max_hamming=8). The
#: engine's pigeonhole banding + first-agreeing-chunk ownership emits
#: each qualifying pair exactly once and drops none (hamming ≤ 8 over
#: 64 bits guarantees ≥1 clean 7-bit chunk), so the oracle is simply
#: every (a < b) pair with exact Hamming ≤ 8 between the SimHash
#: fingerprints — bit j set iff the term-frequency-weighted ±1 sum over
#: md5 token-hash bits is positive; token-less docs hash to 0.
_SIMHASH_SQL = """
WITH tok AS (
  SELECT doc_id, ws[i] AS w
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents),
       UNNEST(generate_series(1, len(ws))) AS t(i)
  WHERE ws[i] <> ''
),
tc AS (SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY doc_id, w),
th AS (SELECT doc_id, cnt,
              CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS h
       FROM tc),
bits AS (SELECT doc_id, j.j,
                sum(CASE WHEN (h >> j.j) & 1 = 1 THEN cnt ELSE -cnt END) AS acc
         FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) j
         GROUP BY doc_id, j.j),
sims0 AS (SELECT doc_id,
                 CAST(sum(CASE WHEN acc > 0 THEN CAST(1 AS HUGEINT) << j ELSE 0 END)
                      AS UBIGINT) AS s
          FROM bits GROUP BY doc_id),
sims AS (SELECT d.doc_id, coalesce(s0.s, CAST(0 AS UBIGINT)) AS s
         FROM documents d LEFT JOIN sims0 s0 ON s0.doc_id = d.doc_id)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.s, y.s)) AS INTEGER) AS hamming
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.s, y.s)) <= 8
"""


def oracle_sql() -> dict[str, str]:
    d = {
        "langid": _langid_sql(),
        "winnow_fingerprints": _WINNOW_SQL,
        "dedup_minhash_pairs": _minhash_sql(),
        "dedup_simhash_pairs": _SIMHASH_SQL,
        # the incremental ingest is pinned (tests/pipelines/test_ingest.py)
        # to equal the batch LSH pass restricted to pairs involving a
        # NEW doc (doc_id >= split_at=250), so its oracle is the
        # minhash twin plus that filter.
        "incremental_dedup": (
            f"SELECT * FROM ({_minhash_sql()}) WHERE a >= 250 OR b >= 250"
        ),
        "doc_top_terms": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, w AS term, count(*) AS tf FROM tok GROUP BY doc_id, w),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
j AS (SELECT tf.doc_id, tf.term, tf.tf, df.df FROM tf JOIN df USING (term)),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tf DESC, df ASC, term ASC) AS rk
      FROM j)
SELECT doc_id, term, tf, df, rk FROM r WHERE rk <= 3
""",
        "source_quota": """
SELECT doc_id, source,
       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
FROM documents
QUALIFY rk <= 10
""",
        # KMV sketch twin: same md5-derived 61-bit hash, bottom-64
        # synopsis, (k-1)*2^61/h_k estimator (exact when nd < k).
        "distinct_users_kmv": """
WITH h AS (SELECT DISTINCT event_type,
                  CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
                       AS UBIGINT) % 2305843009213693952 AS hv
           FROM events),
r AS (SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h)
SELECT event_type,
       CAST(least(nd, 64) AS BIGINT) AS n_synopsis,
       CAST(hv AS BIGINT) AS kth_hash,
       CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
            ELSE 63 * 2305843009213693952.0 / hv END AS est_distinct
FROM r WHERE rk = least(nd, 64)
""",
        "customers_without_orders": """
SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
""",
        "upsample_mix": """
WITH w AS (SELECT doc_id, source,
                  CASE WHEN source IN ('src0', 'src1') THEN 2500
                       WHEN source = 'src2' THEN 1500
                       ELSE 400 END AS pm
           FROM documents),
r AS (SELECT doc_id, source,
             pm // 1000
             + CASE WHEN (CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296) % 1000
                         < pm % 1000 THEN 1 ELSE 0 END AS reps
      FROM w)
SELECT doc_id, source, copy
FROM r, UNNEST(generate_series(1, reps)) AS t(copy)
""",
        "kg_edges": f"""
WITH {_KG_TRIP_CTES}
SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS weight,
       min(printf('doc://%08d', doc_id)) AS first_url
FROM trip GROUP BY subj, pred, obj
""",
        "kg_degree": f"""
WITH {_KG_TRIP_CTES},
e AS (SELECT subj, obj, CAST(count(*) AS BIGINT) AS weight
      FROM trip GROUP BY subj, pred, obj),
o AS (SELECT subj AS node, count(*) AS od, sum(weight) AS ow FROM e GROUP BY subj),
i AS (SELECT obj AS node, count(*) AS idg, sum(weight) AS iw FROM e GROUP BY obj)
SELECT coalesce(o.node, i.node) AS node,
       CAST(coalesce(od, 0) AS BIGINT) AS out_degree,
       CAST(coalesce(idg, 0) AS BIGINT) AS in_degree,
       CAST(coalesce(ow, 0) AS BIGINT) AS out_weight,
       CAST(coalesce(iw, 0) AS BIGINT) AS in_weight
FROM o FULL JOIN i ON o.node = i.node
""",
        "kg_top_neighbors": f"""
WITH {_KG_TRIP_CTES},
spo AS (SELECT subj, pred, obj, count(*) AS c FROM trip GROUP BY subj, pred, obj),
e0 AS (SELECT subj, obj, CAST(sum(c) AS BIGINT) AS w FROM spo GROUP BY subj, obj),
r AS (SELECT subj, obj, w,
             row_number() OVER (PARTITION BY subj ORDER BY w DESC, obj) AS rk
      FROM e0)
SELECT subj, obj, w, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 3
""",
        "kg_triangles": f"""
WITH {_KG_TRIP_CTES},
p AS (SELECT DISTINCT subj, obj FROM trip WHERE subj <> obj),
e0 AS (SELECT DISTINCT least(subj, obj) AS lo, greatest(subj, obj) AS hi FROM p),
d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT lo AS node FROM e0 UNION ALL SELECT hi FROM e0) GROUP BY node),
o AS (SELECT CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg AND e0.lo < e0.hi)
                  THEN e0.lo ELSE e0.hi END AS u,
             CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg AND e0.lo < e0.hi)
                  THEN e0.hi ELSE e0.lo END AS v
      FROM e0 JOIN d dl ON dl.node = e0.lo JOIN d dh ON dh.node = e0.hi),
w AS (SELECT a.u, a.v AS v1, b.v AS v2 FROM o a JOIN o b ON a.u = b.u AND a.v < b.v),
t AS (SELECT w.u, w.v1, w.v2 FROM w JOIN e0 ON e0.lo = w.v1 AND e0.hi = w.v2),
n AS (SELECT u AS node FROM t UNION ALL SELECT v1 FROM t UNION ALL SELECT v2 FROM t)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM n GROUP BY node
""",
        "kg_edge_support": f"""
WITH {_KG_TRIP_CTES},
p AS (SELECT DISTINCT subj, obj FROM trip WHERE subj <> obj),
e0 AS (SELECT DISTINCT least(subj, obj) AS lo, greatest(subj, obj) AS hi FROM p),
d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT lo AS node FROM e0 UNION ALL SELECT hi FROM e0) GROUP BY node),
o AS (SELECT CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg AND e0.lo < e0.hi)
                  THEN e0.lo ELSE e0.hi END AS u,
             CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg AND e0.lo < e0.hi)
                  THEN e0.hi ELSE e0.lo END AS v
      FROM e0 JOIN d dl ON dl.node = e0.lo JOIN d dh ON dh.node = e0.hi),
w AS (SELECT a.u, a.v AS v1, b.v AS v2 FROM o a JOIN o b ON a.u = b.u AND a.v < b.v),
t AS (SELECT w.u, w.v1, w.v2 FROM w JOIN e0 ON e0.lo = w.v1 AND e0.hi = w.v2),
te AS (SELECT least(u, v1) AS lo, greatest(u, v1) AS hi FROM t
       UNION ALL SELECT least(u, v2), greatest(u, v2) FROM t
       UNION ALL SELECT least(v1, v2), greatest(v1, v2) FROM t),
sup AS (SELECT e0.lo, e0.hi, CAST(count(te.lo) AS BIGINT) AS support
        FROM e0 LEFT JOIN te ON te.lo = e0.lo AND te.hi = e0.hi
        GROUP BY e0.lo, e0.hi)
SELECT sup.lo, sup.hi, sup.support, dl.deg AS deg_lo, dh.deg AS deg_hi,
       CASE WHEN dl.deg - 1 + dh.deg - 1 - sup.support = 0 THEN 0.0
            ELSE CAST(sup.support AS DOUBLE)
                 / CAST(dl.deg - 1 + dh.deg - 1 - sup.support AS DOUBLE) END AS jaccard
FROM sup JOIN d dl ON dl.node = sup.lo JOIN d dh ON dh.node = sup.hi
""",
        # weighted structural jaccard: integer min/strength sums, ONE
        # float division (both engines IEEE-exact) — the merge signal
        # that does not saturate when the graph densifies
        "kg_edge_wjaccard": f"""
WITH {_KG_TRIP_CTES},
spo AS (SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS c FROM trip GROUP BY subj, pred, obj),
und AS (SELECT least(subj, obj) AS lo, greatest(subj, obj) AS hi, CAST(sum(c) AS BIGINT) AS w
        FROM spo WHERE subj <> obj GROUP BY 1, 2),
adj AS (SELECT lo AS u, hi AS v, w FROM und UNION ALL SELECT hi, lo, w FROM und),
st AS (SELECT u AS node, CAST(sum(w) AS BIGINT) AS s FROM adj GROUP BY u),
wd AS (SELECT a.v AS lo, b.v AS hi, CAST(sum(least(a.w, b.w)) AS BIGINT) AS min_sum
       FROM adj a JOIN adj b ON a.u = b.u AND a.v < b.v GROUP BY 1, 2)
SELECT und.lo, und.hi, und.w, coalesce(wd.min_sum, 0) AS min_sum, sl.s AS s_lo, sh.s AS s_hi,
       CASE WHEN sl.s + sh.s - coalesce(wd.min_sum, 0) <= 0 THEN 0.0
            ELSE CAST(coalesce(wd.min_sum, 0) AS DOUBLE)
                 / CAST(sl.s + sh.s - coalesce(wd.min_sum, 0) AS DOUBLE) END AS wjaccard
FROM und LEFT JOIN wd ON wd.lo = und.lo AND wd.hi = und.hi
JOIN st sl ON sl.node = und.lo JOIN st sh ON sh.node = und.hi
""",
        # KMV twin of the 2-hop sketch: the exact join is affordable in
        # SQL at test scale; the bottom-64 synopsis + estimator replay
        # the distributed sketch bit-for-bit (mergeability is exact).
        "kg_reach2": f"""
WITH {_KG_TRIP_CTES},
p AS (SELECT DISTINCT subj, obj FROM trip),
r2 AS (SELECT DISTINCT e1.subj AS node, e2.obj AS w
       FROM p e1 JOIN p e2 ON e2.subj = e1.obj),
h AS (SELECT DISTINCT node,
             CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT)
               % 2305843009213693952 AS hv
      FROM r2),
r AS (SELECT node, hv,
             row_number() OVER (PARTITION BY node ORDER BY hv) AS rk,
             count(*) OVER (PARTITION BY node) AS nd
      FROM h)
SELECT node, CAST(least(nd, 64) AS BIGINT) AS n_synopsis,
       CAST(hv AS BIGINT) AS kth_hash,
       CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
            ELSE 63 * 2305843009213693952.0 / hv END AS est_reach2
FROM r WHERE rk = least(nd, 64)
""",
        "kg_node_profiles": f"""
WITH {_KG_TRIP_CTES},
sp AS (SELECT subj, pred, CAST(count(*) AS BIGINT) AS w FROM trip GROUP BY subj, pred),
a AS (SELECT subj, CAST(count(*) AS BIGINT) AS n_preds,
             CAST(sum(w) AS BIGINT) AS out_w
      FROM sp GROUP BY subj),
d AS (SELECT subj, pred AS dom_pred, w AS dom_w,
             row_number() OVER (PARTITION BY subj ORDER BY w DESC, pred) AS rn
      FROM sp)
SELECT a.subj AS node, a.n_preds, a.out_w, d.dom_pred, d.dom_w
FROM a JOIN d ON a.subj = d.subj AND d.rn = 1
""",
        "kg_walks": _walks_sql(),
        "kg_kcore": _kcore_sql(),
        # PMI twin: the engine pins its log to libm math.log because
        # numpy's SIMD log differs from DuckDB's ln by 1 ulp; the
        # arithmetic composition (mul, mul, div, ln, div) is identical
        # on both sides so the doubles compare exactly.
        "kg_edge_pmi": f"""
WITH {_KG_TRIP_CTES},
spo AS (SELECT subj, pred, obj, count(*) AS c FROM trip GROUP BY subj, pred, obj),
e0 AS (SELECT subj, obj, CAST(sum(c) AS BIGINT) AS w FROM spo GROUP BY subj, obj),
ma AS (SELECT subj, CAST(sum(w) AS BIGINT) AS n_subj FROM e0 GROUP BY subj),
mb AS (SELECT obj, CAST(sum(w) AS BIGINT) AS n_obj FROM e0 GROUP BY obj),
tot AS (SELECT CAST(sum(w) AS DOUBLE) AS n FROM e0)
SELECT e0.subj, e0.obj, e0.w, ma.n_subj, mb.n_obj,
       ln((CAST(e0.w AS DOUBLE) * tot.n)
          / (CAST(ma.n_subj AS DOUBLE) * CAST(mb.n_obj AS DOUBLE))) AS pmi,
       CASE WHEN CAST(e0.w AS DOUBLE) = tot.n THEN 1.0
            ELSE ln((CAST(e0.w AS DOUBLE) * tot.n)
                    / (CAST(ma.n_subj AS DOUBLE) * CAST(mb.n_obj AS DOUBLE)))
                 / (-ln(CAST(e0.w AS DOUBLE) / tot.n)) END AS npmi
FROM e0 JOIN ma USING (subj) JOIN mb USING (obj) CROSS JOIN tot
""",
        "kg_edge_delta": f"""
WITH {_KG_TRIP_CTES},
eb AS (SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS w_b
       FROM trip GROUP BY subj, pred, obj),
ea AS (SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS w_a
       FROM trip WHERE doc_id % 2 = 0 GROUP BY subj, pred, obj)
SELECT coalesce(ea.subj, eb.subj) AS subj,
       coalesce(ea.pred, eb.pred) AS pred,
       coalesce(ea.obj, eb.obj) AS obj,
       coalesce(w_a, 0) AS w_a, coalesce(w_b, 0) AS w_b,
       CASE WHEN coalesce(w_a, 0) = 0 THEN 'added'
            WHEN coalesce(w_b, 0) = 0 THEN 'removed'
            ELSE 'changed' END AS status
FROM ea FULL JOIN eb
  ON ea.subj = eb.subj AND ea.pred = eb.pred AND ea.obj = eb.obj
WHERE coalesce(w_a, 0) <> coalesce(w_b, 0)
""",
        # Scaled-integer PageRank twin: every step is HUGEINT floor
        # division, replaying stages/graph.py pagerank() bit-exactly
        # (scale 10^12, damping 850/1000, 3 iterations, dangling mass
        # evaporates).
        "kg_pagerank": f"""
WITH {_KG_TRIP_CTES},
spo AS (SELECT subj, pred, obj, CAST(count(*) AS HUGEINT) AS weight
        FROM trip GROUP BY subj, pred, obj),
e0 AS (SELECT subj, obj, sum(weight) AS w FROM spo GROUP BY subj, obj),
ow AS (SELECT subj, sum(w) AS outw FROM e0 GROUP BY subj),
e AS (SELECT e0.subj, e0.obj, e0.w, ow.outw FROM e0 JOIN ow USING (subj)),
nodes AS (SELECT subj AS node FROM e0 UNION SELECT obj FROM e0),
r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS r FROM nodes),
c1 AS (SELECT e.obj AS node, sum((850 * r.r * e.w) // (1000 * e.outw)) AS c
       FROM e JOIN r0 r ON r.node = e.subj GROUP BY e.obj),
r1 AS (SELECT n.node, 150000000000 + coalesce(c.c, 0) AS r
       FROM nodes n LEFT JOIN c1 c USING (node)),
c2 AS (SELECT e.obj AS node, sum((850 * r.r * e.w) // (1000 * e.outw)) AS c
       FROM e JOIN r1 r ON r.node = e.subj GROUP BY e.obj),
r2 AS (SELECT n.node, 150000000000 + coalesce(c.c, 0) AS r
       FROM nodes n LEFT JOIN c2 c USING (node)),
c3 AS (SELECT e.obj AS node, sum((850 * r.r * e.w) // (1000 * e.outw)) AS c
       FROM e JOIN r2 r ON r.node = e.subj GROUP BY e.obj),
r3 AS (SELECT n.node, 150000000000 + coalesce(c.c, 0) AS r
       FROM nodes n LEFT JOIN c3 c USING (node))
SELECT node, CAST(r AS BIGINT) AS rank FROM r3
""",
        "kg_nodes": f"""
WITH {_TOK_CTE}
SELECT w AS concept_id, w AS surface, CAST(count(*) AS BIGINT) AS "count",
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_urls
FROM tok WHERE w IN {ENTITY_LIST_SQL} GROUP BY w
""",
        "mention_counts": f"""
WITH {_TOK_CTE}
SELECT w AS surface, CAST(count(*) AS BIGINT) AS n_mentions
FROM tok WHERE w IN {ENTITY_LIST_SQL} GROUP BY w
""",
        "source_report": """
WITH t AS (SELECT doc_id, source, md5(text) AS k,
                  list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x <> '') AS toks
           FROM documents),
d AS (SELECT doc_id, source, len(toks) AS n_tokens,
             CASE WHEN len(toks) BETWEEN 20 AND 1000000
                   AND CAST(len(list_distinct(toks)) AS DOUBLE)
                       / greatest(len(toks), 1) >= 0.3
                  THEN 1 ELSE 0 END AS q,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY k)
                  THEN 0 ELSE 1 END AS is_dup
      FROM t)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(q) AS BIGINT) AS n_quality,
       CAST(sum(is_dup) AS BIGINT) AS n_exact_dup
FROM d GROUP BY source
""",
        "entity_centroids": f"""
WITH {_TOK_CTE},
ed AS (SELECT DISTINCT w AS surface, doc_id FROM tok WHERE w IN {ENTITY_LIST_SQL}),
ex AS (SELECT ed.surface, i AS dim,
              CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
       FROM ed JOIN embeddings e ON e.vec_id = ed.doc_id,
            UNNEST(generate_series(1, len(e.embedding))) AS t(i))
SELECT surface, CAST(dim AS BIGINT) AS dim, CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(count(*) AS BIGINT) AS n_docs
FROM ex GROUP BY surface, dim
""",
        "entity_burstiness": f"""
WITH {_TOK_CTE},
m AS (SELECT doc_id, w AS surface, count(*) AS cnt
      FROM tok WHERE w IN {ENTITY_LIST_SQL} GROUP BY doc_id, w)
SELECT surface, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(cnt) AS BIGINT) AS n_mentions,
       CAST(max(cnt) AS BIGINT) AS max_in_doc
FROM m GROUP BY surface
""",
        "ner_eval": f"""
WITH {_TOK_CTE},
c AS (
  SELECT CAST(count(*) FILTER (WHERE w IN {BOTH_LIST_SQL}) AS BIGINT) AS tp,
         CAST(count(*) FILTER (WHERE w IN {PRED_LIST_SQL}) AS BIGINT) AS n_pred,
         CAST(count(*) FILTER (WHERE w IN {ENTITY_LIST_SQL}) AS BIGINT) AS n_gold
  FROM tok
),
pr AS (
  SELECT tp, n_pred, n_gold,
         CASE WHEN n_pred = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / n_pred END AS "precision",
         CASE WHEN n_gold = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / n_gold END AS "recall"
  FROM c
)
SELECT tp, n_pred, n_gold, "precision", "recall",
       "precision" * "recall" * 2 / ("precision" + "recall" + 1e-20) AS f1
FROM pr
""",
        "error_length_stats": f"""
WITH {_TOK_CTE}
SELECT CAST(1 AS INTEGER) AS "length", CAST(count(*) AS BIGINT) AS total,
       CAST(count(*) FILTER (WHERE w NOT IN {PRED_LIST_SQL}) AS BIGINT) AS errors
FROM tok WHERE w IN {ENTITY_LIST_SQL}
""",
        "ensemble_mention_counts": f"""
WITH {_TOK_CTE}
SELECT w AS surface, CAST(count(*) AS BIGINT) AS n_mentions
FROM tok WHERE w IN {BOTH_LIST_SQL} GROUP BY w
""",
        "word_count": f"""
WITH {_TOK_CTE},
c AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY w
      HAVING count(*) >= 10)
SELECT word, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank FROM c
""",
        # Integer micro-nat quantization makes the per-doc sums
        # order-independent (ints), so distributed vs SQL summation
        # can never drift; the one ln per VOCAB entry is libm on both
        # sides and the arithmetic composition is identical.
        "doc_logprob": f"""
WITH {_TOK_CTE},
c AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
tots AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM c),
lp AS (SELECT w,
              CAST(floor(ln((CAST(cnt AS DOUBLE) + 1) / (tots.n + tots.v))
                         * 1000000) AS BIGINT) AS lp
       FROM c CROSS JOIN tots)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(lp.lp) AS BIGINT) AS logprob_micro
FROM tok JOIN lp USING (w) GROUP BY doc_id
""",
        "alias_groups": """
WITH raw AS (
  SELECT doc_id, i AS pos, ws[i] AS w
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents),
       UNNEST(generate_series(1, len(ws))) AS t(i)
  WHERE ws[i] <> ''
),
tr AS (
  SELECT CASE WHEN pos % 4 = 0 THEN upper(w)
              WHEN pos % 4 = 1 THEN w || '7'
              WHEN pos % 4 = 2 THEN w || '.'
              ELSE w END AS t
  FROM raw
),
al AS (
  SELECT lower(regexp_replace(t, '[^a-zA-Z]', '', 'g')) AS alias, t
  FROM tr
),
g AS (SELECT alias, t, count(*) AS cnt FROM al WHERE alias <> '' GROUP BY alias, t)
SELECT alias, CAST(count(*) AS BIGINT) AS n_variants,
       CAST(sum(cnt) AS BIGINT) AS n_occurrences
FROM g GROUP BY alias HAVING count(*) >= 2
""",
        "surface_stats": """
WITH raw AS (
  SELECT doc_id, i AS pos, ws[i] AS w
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents),
       UNNEST(generate_series(1, len(ws))) AS t(i)
  WHERE ws[i] <> ''
),
tr AS (
  SELECT doc_id,
         CASE WHEN pos % 4 = 0 THEN upper(w)
              WHEN pos % 4 = 1 THEN w || '7'
              WHEN pos % 4 = 2 THEN w || '.'
              ELSE w END AS t
  FROM raw
),
f AS (
  SELECT doc_id, t,
         regexp_replace(t, '[^a-zA-Z]', '', 'g') AS L
  FROM tr
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE regexp_matches(L, '^[A-Z]')) AS BIGINT) AS n_upper_start,
       CAST(count(*) FILTER (WHERE L <> '' AND L = upper(L)) AS BIGINT) AS n_all_upper,
       CAST(count(*) FILTER (WHERE regexp_matches(t, '[0-9]|[.]')) AS BIGINT) AS n_incl_numeric,
       CAST(count(*) FILTER (WHERE regexp_matches(t, '[.]$')) AS BIGINT) AS n_ends_punct
FROM f GROUP BY doc_id
""",
        "position_stats": """
WITH s AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(
             regexp_replace(text, '([.!?])(\\s+)', '\\1' || chr(1), 'g'), chr(1)),
           x -> len(regexp_extract_all(x, '\\S+')) > 0) AS sents
  FROM documents),
p AS (SELECT doc_id,
             list_transform(sents, x -> len(regexp_extract_all(x, '\\S+'))) AS lens
      FROM s)
SELECT printf('doc://%08d', doc_id) AS url,
       CAST(len(lens) AS BIGINT) AS n_sentences,
       CAST(coalesce(list_sum(lens), 0) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN len(lens) > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_begin_doc,
       CAST(len(lens) AS BIGINT) AS n_begin_sent,
       CAST(len(lens) AS BIGINT) AS n_end_sent,
       CAST(CASE WHEN len(lens) > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_end_doc
FROM p
""",
        "unknown_words": f"""
WITH {_TOK_CTE},
kp AS (
  SELECT doc_id, pos,
         '#' || regexp_replace(w, '[^\\pL\\pN\\pP\\p{{Sm}}\\p{{Sc}}]', '', 'g') || '#' AS p
  FROM tok),
grams AS (
  SELECT doc_id, pos, substr(p, i, 3) AS g
  FROM kp, UNNEST(generate_series(1, length(p) - 2)) AS t(i)),
vocab AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 10),
u AS (
  SELECT doc_id, pos, max(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS unk
  FROM grams LEFT JOIN vocab v USING (g) GROUP BY doc_id, pos)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(coalesce(sum(u.unk), 0) AS BIGINT) AS n_unknown
FROM tok t LEFT JOIN u ON u.doc_id = t.doc_id AND u.pos = t.pos
GROUP BY t.doc_id
""",
        "bioul_map": f"""
WITH {_TOK_CTE},
seq AS (SELECT doc_id,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS p
        FROM tok),
m AS (SELECT doc_id,
             CASE p % 5 WHEN 0 THEN 'B' WHEN 1 THEN 'I' WHEN 2 THEN 'I'
                        WHEN 3 THEN 'O' ELSE 'B' END AS bio
      FROM seq)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE bio = 'B') AS BIGINT) AS n_b,
       CAST(count(*) FILTER (WHERE bio = 'I') AS BIGINT) AS n_i,
       CAST(count(*) FILTER (WHERE bio = 'O') AS BIGINT) AS n_o
FROM m GROUP BY doc_id
""",
        "doc_split": """
SELECT doc_id,
       CASE WHEN source IN ('src14','src15','src16') THEN 'val'
            WHEN source IN ('src17','src18','src19') THEN 'test'
            ELSE 'train' END AS split
FROM documents
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS sum_disc_price_cents
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "top_orders": """
SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
        "customers_per_nation": """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name
""",
        "revenue_by_segment": """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment
""",
        "events_by_type": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type
""",
        "events_per_day": """
SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1
""",
        "events_rolling_7d": """
WITH d AS (SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
           FROM events GROUP BY 1)
SELECT day, n_events, sum_value_cents,
       CAST(sum(n_events) OVER w AS BIGINT) AS n_events_7d,
       CAST(sum(sum_value_cents) OVER w AS BIGINT) AS sum_value_cents_7d
FROM d
WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
""",
        "events_last_order": """
SELECT e.event_id,
       coalesce((SELECT o.o_orderkey FROM orders o
                 WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1), -1) AS last_o_orderkey
FROM events e
""",
        "dedup_exact": """
SELECT md5(text) AS key, CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
""",
        "dedup_jaccard_pairs": """
WITH w AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
           FROM documents),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS n_common
           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
SELECT a, b, n_common,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
""",
        "dedup_components": """
WITH RECURSIVE
w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
      FROM documents),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS c
           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
pairs AS (SELECT a, b FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
walk(x, label) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM edges)
  UNION
  SELECT e.x, ww.label FROM edges e JOIN walk ww ON ww.x = e.y
)
SELECT x AS node, CAST(min(label) AS BIGINT) AS component FROM walk GROUP BY x
""",
        "dedup_filter": """
WITH RECURSIVE
w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
      FROM documents),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS c
           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
pairs AS (SELECT a, b FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
walk(x, label) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM edges)
  UNION
  SELECT e.x, ww.label FROM edges e JOIN walk ww ON ww.x = e.y
),
comp AS (SELECT x AS node, min(label) AS component FROM walk GROUP BY x)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
""",
        "corpus_clean": """
WITH RECURSIVE
surv AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
    FROM documents WHERE lang = 'en')
  WHERE len(toks) BETWEEN 20 AND 1000000
    AND CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) >= 0.3
),
w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
      FROM surv),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS c
           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
pairs AS (SELECT a, b FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
walk(x, label) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM edges)
  UNION
  SELECT e.x, ww.label FROM edges e JOIN walk ww ON ww.x = e.y
),
comp AS (SELECT x AS node, min(label) AS component FROM walk GROUP BY x)
SELECT doc_id FROM surv
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
""",
        "pubmed_extract": """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0
              THEN text || ' (ABSTRACT TRUNCATED AT 250 WORDS)'
              ELSE text END AS t
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, CAST(length(t) + 1 AS BIGINT) AS n_chars,
       CASE WHEN t LIKE '%(ABSTRACT TRUNCATED AT 250 WORDS)' THEN '250'
            WHEN t LIKE '%(ABSTRACT TRUNCATED AT 400 WORDS)' THEN '400'
            WHEN t LIKE '%(ABSTRACT TRUNCATED)' THEN 'plain'
            ELSE 'none' END AS truncated_kind
FROM m
""",
        "pubtator_conll": f"""
WITH {_TOK_CTE},
c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE w IN {ENTITY_LIST_SQL}) AS BIGINT) AS nb
      FROM tok GROUP BY doc_id)
SELECT d.doc_id,
       CAST(2 + coalesce(c.n, 0) AS BIGINT) AS n_tokens,
       coalesce(c.nb, 0) AS n_b,
       CAST(0 AS BIGINT) AS n_i,
       coalesce(c.nb, 0) AS n_annotations
FROM documents d LEFT JOIN c USING (doc_id)
""",
        "conlleval_export": f"""
WITH {_TOK_CTE},
c AS (SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count(*) FILTER (WHERE w IN {ENTITY_LIST_SQL}) AS BIGINT) AS n_gold_b,
             CAST(count(*) FILTER (WHERE w IN {PRED_LIST_SQL}) AS BIGINT) AS n_pred_b
      FROM tok GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.n_lines, 0) AS n_lines,
       coalesce(c.n_gold_b, 0) AS n_gold_b, coalesce(c.n_pred_b, 0) AS n_pred_b
FROM documents d LEFT JOIN c USING (doc_id)
""",
        "token_stats": f"""
WITH t AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks,
                  length(text) AS nc
           FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
       CAST(nc AS BIGINT) AS n_chars,
       CAST(coalesce(list_max(list_transform(toks, x -> length(x))), 0) AS BIGINT)
         AS max_token_len,
       CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS ttr,
       CAST(len(list_filter(toks, x -> x IN {STOPWORDS_SQL})) AS DOUBLE)
         / greatest(len(toks), 1) AS stopword_frac
FROM t
""",
        "conll_roundtrip": f"""
WITH {_TOK_CTE},
c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.n_tokens, 0) AS n_tokens
FROM documents d LEFT JOIN c USING (doc_id)
""",
        "quality_docs": """
WITH t AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
           FROM documents)
SELECT doc_id FROM t
WHERE len(toks) BETWEEN 20 AND 1000000
  AND CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) >= 0.3
""",
        "fingerprints": """
SELECT doc_id, md5(text) AS md5,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
""",
        "knn_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
      FROM q CROSS JOIN embeddings e),
r AS (SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      FROM s)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank, round(score, 6) AS score_r
FROM r WHERE rank <= 10
""",
        "embedding_dup_pairs": """
WITH s AS (SELECT a.vec_id AS a, b.vec_id AS b,
                  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS c
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT a, b, round(c, 6) AS cosine_r FROM s WHERE c >= 0.45
""",
        "value_percentiles": """
SELECT event_type,
       CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.50) AS BIGINT) AS p50_cents,
       CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.90) AS BIGINT) AS p90_cents,
       CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS BIGINT) AS p99_cents
FROM events GROUP BY event_type
""",
        "distinct_users_per_type": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
        "sessions": """
SELECT event_id, user_id,
       CAST(sum(CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
FROM (SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events)
""",
        "top_orders_per_customer": """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
  FROM orders)
WHERE rk <= 3
""",
        "dup_span_stats": """
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
           FROM documents),
g AS (SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS span
      FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)),
cnt AS (SELECT span, count(*) AS nd FROM g GROUP BY 1),
per AS (SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN cnt.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM g JOIN cnt USING (span) GROUP BY 1)
SELECT doc_id, n_windows, n_dup,
       CAST(n_dup AS DOUBLE) / n_windows AS dup_frac
FROM per
""",
        "token_shards": """
WITH n AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents)
SELECT doc_id, n_tok,
       CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS shard
FROM n
""",
        "stratified_sample": """
SELECT doc_id, lang FROM documents
WHERE (CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296) % 1000
      < CASE WHEN lang = 'en' THEN 500 ELSE 100 END
""",
        "bloom_decontaminate": _bloom_sql(),
        "decontaminate": """
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
           FROM documents),
g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS gm
      FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)),
bad AS (SELECT DISTINCT doc_id FROM g WHERE doc_id % 97 <> 0
        AND gm IN (SELECT gm FROM g WHERE doc_id % 97 = 0))
SELECT doc_id FROM documents
WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
""",
        "repetition_stats": """
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
           FROM documents),
t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
tc AS (SELECT doc_id, max(c) AS top
       FROM (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2) GROUP BY 1),
b AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg
      FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
bc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nb, CAST(count(DISTINCT bg) AS BIGINT) AS db
       FROM b GROUP BY 1)
SELECT w.doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(coalesce(tc.top, 0) AS DOUBLE) / greatest(len(ws), 1) AS top_token_frac,
       CAST(coalesce(bc.nb - bc.db, 0) AS DOUBLE) / greatest(coalesce(bc.nb, 1), 1) AS dup_bigram_frac
FROM w LEFT JOIN tc USING (doc_id) LEFT JOIN bc USING (doc_id)
""",
        "training_shards": """
WITH RECURSIVE
surv AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
    FROM documents WHERE lang = 'en')
  WHERE len(toks) BETWEEN 20 AND 1000000
    AND CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) >= 0.3
),
w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
      FROM surv),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS c
           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
pairs AS (SELECT a, b FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
walk(x, label) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM edges)
  UNION
  SELECT e.x, ww.label FROM edges e JOIN walk ww ON ww.x = e.y
),
comp AS (SELECT x AS node, min(label) AS component FROM walk GROUP BY x),
clean AS (SELECT doc_id, text FROM surv
          WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)),
n AS (SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok
      FROM clean)
SELECT doc_id, n_tok,
       CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS shard
FROM n
""",
    }
    # event-anomaly twin: z = (n*x - S)/sqrt(n*Q - S^2), all integer
    # up to the single sqrt+division (HUGEINT avoids overflow)
    d["event_anomaly"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM events GROUP BY 1, 2),
st AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(total_cents AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(total_cents AS HUGEINT) * CAST(total_cents AS HUGEINT)) AS HUGEINT) AS q
  FROM daily GROUP BY event_type)
SELECT d.event_type, d.day, d.total_cents,
       CASE WHEN st.n * st.q - st.s * st.s <= 0 THEN 0.0
            ELSE CAST(st.n * CAST(d.total_cents AS HUGEINT) - st.s AS DOUBLE)
                 / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE)) END AS z
FROM daily d JOIN st ON st.event_type = d.event_type
"""
    d["user_retention"] = """
WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
SELECT c.cohort_day, ud.day,
       CAST(date_diff('day', c.cohort_day, ud.day) AS BIGINT) AS offset_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud JOIN c ON c.user_id = ud.user_id
GROUP BY 1, 2, 3
"""
    d["funnel"] = """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
SELECT 'view' AS stage, CAST(1 AS BIGINT) AS step_idx,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 'click', CAST(2 AS BIGINT), CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 'purchase', CAST(3 AS BIGINT), CAST((SELECT count(*) FROM s3) AS BIGINT)
"""
    d["jsonl_roundtrip"] = """
SELECT doc_id, text, lang, source FROM documents
"""
    # datexis_mentions: the seeded-numpy net is deterministic across
    # runs and worker counts (verified 2-vs-8-CPU identical by
    # tools/make_datexis_golden.py, which wrote this parquet) but not
    # SQL-re-derivable, so the oracle is a GOLDEN expected-output table;
    # corpus_key (Σ length(text)) picks the current sf's rows — sf0.001
    # and sf0.01 both have 500 docs, so row count alone can't.
    d["datexis_mentions"] = """
SELECT surface, n_mentions
FROM read_parquet('/root/repo/tests/golden/datexis_mentions.parquet')
WHERE corpus_key = (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)
"""
    # encoding_fasttext: same golden-parquet scheme — the .bin vectors
    # depend only on the token string (verified 2-vs-8-CPU identical by
    # tools/make_encoding_golden.py, which wrote this parquet)
    d["encoding_fasttext"] = """
SELECT url, n_vectors, checksum_q
FROM read_parquet('/root/repo/tests/golden/encoding_fasttext.parquet')
WHERE corpus_key = (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)
"""
    # the remaining formerly-rows-only queries, same golden scheme
    # (tools/make_query_golden.py pins 2-vs-8-CPU determinism): the
    # seeded hash/projection math is not SQL-re-derivable, but the
    # expected output is exact and parallelism-independent
    d["encoding_stats"] = """
SELECT url, n_vectors, dim, checksum
FROM read_parquet('/root/repo/tests/golden/encoding_stats.parquet')
WHERE corpus_key = (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)
"""
    d["media_features"] = """
SELECT media_id, feat_norm, decoded_width, decoded_height
FROM read_parquet('/root/repo/tests/golden/media_features.parquet')
WHERE corpus_key = (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)
"""
    d["knn_ivf_topk"] = """
SELECT query_id, vec_id, score, rank
FROM read_parquet('/root/repo/tests/golden/knn_ivf_topk.parquet')
WHERE corpus_key = (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)
"""
    d["csv_roundtrip"] = """
SELECT event_id, user_id, event_type, value FROM events
"""
    # doc_shuffle: the PERMUTATION itself is seeded Ray internals, but
    # the driver compare is order-insensitive, so the twin verifies the
    # set property that matters: the shuffle is lossless and
    # duplication-free (exact multiset of (doc_id, n_chars) rows).
    d["doc_shuffle"] = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents
"""
    # error_samples: the draw is a deterministic md5(url|seed) rank, so
    # the twin replays the exact sample; error docs = any token tagged
    # by exactly one of the two annotators (single-token span sets
    # differ iff token membership differs)
    d["error_samples"] = f"""
WITH {_TOK_CTE},
err AS (SELECT DISTINCT doc_id FROM tok
        WHERE (w IN {ENTITY_LIST_SQL}) <> (w IN {PRED_LIST_SQL})),
r AS (SELECT doc_id FROM err
      ORDER BY md5(printf('doc://%08d', doc_id) || '|42'),
               printf('doc://%08d', doc_id)
      LIMIT 10),
s AS (SELECT doc_id,
             list_filter(
               regexp_split_to_array(
                 regexp_replace(text, '([.!?])(\\s+)', '\\1' || chr(1), 'g'), chr(1)),
               x -> len(regexp_extract_all(x, '\\S+')) > 0) AS sents
      FROM documents)
SELECT printf('doc://%08d', r.doc_id) AS url,
       CAST(len(s.sents) AS INTEGER) AS n_sentences
FROM r JOIN s ON s.doc_id = r.doc_id
"""
    d["doc_entity_density"] = f"""
WITH {_TOK_CTE},
g AS (SELECT doc_id, count(*) AS n_tokens,
             count(*) FILTER (WHERE w IN {ENTITY_LIST_SQL}) AS n_entities
      FROM tok GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_entities AS BIGINT) AS n_entities,
       CAST(n_entities AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS density
FROM g
"""
    # centroid-cosine twin: integer dot products (HUGEINT), float
    # composition pinned to dot/(sqrt(na)*sqrt(nb)) — IEEE sqrt is
    # exactly rounded, so the doubles match bit-for-bit
    d["entity_similarity"] = (
        "WITH c AS ("
        + d["entity_centroids"]
        + """),
p AS (SELECT ca.surface AS a, cb.surface AS b,
             sum(CAST(ca.sum_q AS HUGEINT) * CAST(cb.sum_q AS HUGEINT)) AS dot
      FROM c ca JOIN c cb ON ca.dim = cb.dim AND ca.surface < cb.surface
      GROUP BY ca.surface, cb.surface),
n AS (SELECT surface, sum(CAST(sum_q AS HUGEINT) * CAST(sum_q AS HUGEINT)) AS nn
      FROM c GROUP BY surface)
SELECT p.a, p.b,
       CAST(p.dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
FROM p JOIN n na ON na.surface = p.a JOIN n nb ON nb.surface = p.b"""
    )
    # single-peel k-truss candidate twin (support filter over the
    # shared edge-support text)
    d["kg_truss_edges"] = (
        "SELECT lo, hi, support FROM ("
        + d["kg_edge_support"]
        + ") WHERE support >= 2"
    )
    # structural entity-resolution twin: threshold the WEIGHTED-jaccard
    # edges, then a recursive min-label walk over the candidate pairs
    # (the same walk as dedup_components, on VARCHAR labels)
    d["kg_merge_groups"] = (
        "WITH RECURSIVE base AS ("
        + d["kg_edge_wjaccard"]
        + """),
p2 AS (SELECT lo, hi FROM base WHERE wjaccard >= 0.5),
ed AS (SELECT lo AS x, hi AS y FROM p2 UNION SELECT hi, lo FROM p2),
walk(x, label) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM ed)
  UNION
  SELECT e.x, ww.label FROM ed e JOIN walk ww ON ww.x = e.y
)
SELECT x AS node, min(label) AS rep FROM walk GROUP BY x"""
    )
    # composition twin: prune the PMI-scored edges (same text, one filter)
    d["kg_edges_pruned"] = (
        "SELECT subj, obj, w, npmi FROM ("
        + d["kg_edge_pmi"]
        + ") WHERE npmi >= 0 AND w >= 2"
    )
    # full-DAG twin: pruned edges rewritten through merge-group reps,
    # then re-canonicalized (self-loops drop, weights re-sum)
    d["kg_publish"] = (
        "WITH pruned AS (SELECT subj, obj, w FROM ("
        + d["kg_edge_pmi"]
        + ") WHERE npmi >= 0 AND w >= 2), groups AS ("
        + d["kg_merge_groups"]
        + """)
SELECT coalesce(gs.rep, p.subj) AS subj, coalesce(go.rep, p.obj) AS obj,
       CAST(sum(p.w) AS BIGINT) AS w
FROM pruned p
LEFT JOIN groups gs ON gs.node = p.subj
LEFT JOIN groups go ON go.node = p.obj
WHERE coalesce(gs.rep, p.subj) <> coalesce(go.rep, p.obj)
GROUP BY 1, 2"""
    )
    return d
