"""The flagship KG-construction pipeline (north rule; SURVEY.md §3.1's
Ray version).

pages parquet ──read (pruned columns)──► extract (stateless map)
  ──► segment (stateless map) ──► score (actor pool, broadcast model
  state) ──► mentions + linking (actor pool, broadcast ConceptIndex)
  ──► triple assembly (in-row) ──► canonicalize (two-stage combine +
  groupby) ──► partitioned Parquet node/edge tables.

Every stage is checkpointed (state/checkpoint.py): `resume=True` skips
any stage whose _SUCCESS manifest exists, so a failed run restarts at
the first incomplete stage. All stages stream — nothing materializes
the corpus driver-side; only the bounded nodes table is collected.
"""

from __future__ import annotations

import json
import os

from bioner_ray.sources.parquet_io import read_parquet_clean
from typing import Optional

import pyarrow as pa

from bioner_ray.fixtures import make_concepts
from bioner_ray.stages.extract import extract_stage
from bioner_ray.stages.link import broadcast_concept_index, link_stage
from bioner_ray.stages.mentions import mentions_stage
from bioner_ray.stages.scorer import score_stage
from bioner_ray.stages.segment import segment_stage
from bioner_ray.stages.triples import canonicalize_edges, canonicalize_nodes, triples_stage
from bioner_ray.state import checkpoint as ckpt


def run_kg_streaming(
    pages_path: str,
    out_root: str,
    model_name: str = "gazetteer",
    concepts: Optional[pa.Table] = None,
    vocab=None,
    concurrency: int | tuple[int, int] | None = None,
    override_num_blocks: Optional[int] = None,
    salt_buckets: Optional[int] = None,
) -> dict:
    """The fused 100-TB-shaped run: ONE streaming execution end-to-end
    (read → extract → segment → score → triples → canonicalize →
    write), no intermediate materialization — the streaming executor
    pipelines every stage with backpressure and the only barriers are
    the edge-canonicalization shuffle. ``run_kg_pipeline`` is the
    checkpointed/resumable form; this is the throughput form — pick per
    job, the stages are identical.

    ``override_num_blocks`` splits a file-sparse input into enough
    blocks to feed every core (a real crawl has thousands of shards;
    bench fixtures have few).
    """
    import ray
    import ray.data as rd

    from bioner_ray.stages.link import ConceptIndex
    from bioner_ray.stages.pool import pool_size

    if concurrency is None:
        # FIXED pool at ¾ of the cluster (see stages/pool.py): the
        # autoscaling (1, N) pool measured at half the throughput
        # because it never ramped past ~N/4 actors
        concurrency = pool_size()
    concepts = concepts if concepts is not None else make_concepts()
    index_ref = ray.put(ConceptIndex(concepts))
    surfaces = concepts.column("surface").to_pylist()

    ds = read_parquet_clean(
        pages_path,
        columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=override_num_blocks,
    )
    # throughput form: token offsets (CoNLL provenance) are never read
    # downstream of the fused score+assemble — skip building/shipping them
    ds = segment_stage(extract_stage(ds), with_offsets=False)
    if model_name == "gazetteer":
        cfg = {"surfaces": ray.put(surfaces)}
    elif model_name == "datexis-numpy":
        if vocab is None:
            raise ValueError("datexis-numpy needs a prebuilt vocab in streaming mode")
        cfg = {"vocab": ray.put(vocab)}
    else:
        raise ValueError(f"unknown model {model_name!r}")
    # score + triple assembly FUSED into one actor pool: the nested
    # sentence rows never cross an operator boundary (no re-serialization
    # of the widest intermediate), and one pool means no CPU tug-of-war
    # between two autoscaling pools on the same cores.
    from bioner_ray.stages.scorer import NERScorer
    from bioner_ray.stages.triples import TripleAssembler

    class _ScoreAndAssemble:
        def __init__(self, model_name, model_config, index_ref, relation_lexicon):
            self.scorer = NERScorer(model_name, model_config)
            self.assembler = TripleAssembler(index_ref, relation_lexicon)

        def __call__(self, batch):
            # fused fast path: token lists leave Arrow ONCE, predictions
            # stay numpy — no intermediate tags column is built just to
            # be converted back (profiled at ~1/3 of the assemble cost)
            model = self.scorer.model
            if hasattr(model, "predict_documents_tokens"):
                from bioner_ray.stages.nested import doc_token_lists

                docs_tokens, _ = doc_token_lists(batch)
                all_tags = model.predict_documents_tokens(docs_tokens)
                urls = batch.column("url").to_pylist()
                return self.assembler.assemble_from_tokens(urls, docs_tokens, all_tags)
            return self.assembler(self.scorer(batch))

    from bioner_ray.stages.triples import RELATION_LEXICON

    triples = ds.map_batches(
        _ScoreAndAssemble,
        fn_constructor_kwargs={
            "model_name": model_name,
            "model_config": cfg,
            "index_ref": index_ref,
            "relation_lexicon": RELATION_LEXICON,
        },
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )
    edges = canonicalize_edges(triples, salt_buckets=salt_buckets)

    out_dir = os.path.join(out_root, "edges")
    os.makedirs(out_dir, exist_ok=True)
    edges.write_parquet(out_dir)

    # triple count = sum of edge weights (metadata-cheap read-back; no
    # second pipeline pass over the corpus)
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    scanned = pads.dataset(out_dir, format="parquet").to_table(columns=["weight"])
    n_triples = int(pc.sum(scanned.column("weight")).as_py() or 0)
    summary = {"edges": scanned.num_rows, "triples": n_triples}
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def _pin_http_probe() -> None:
    """Make Ray's per-path fsspec-HTTP probe thread-safe.

    ``path_util._is_http_filesystem`` retries
    ``from fsspec.implementations.http import HTTPFileSystem`` on EVERY
    read/write path resolution and catches only ModuleNotFoundError.
    When aiohttp is absent the import fails and is retried each call,
    and two threads resolving paths concurrently can observe the
    other's partially-initialized module as a plain ImportError
    ("cannot import name 'HTTPFileSystem'"), which escapes the catch.
    Resolve the probe ONCE, sequentially, and pin the result."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        from ray.data.datasource import path_util

        path_util._is_http_filesystem = lambda fs: False


def run_kg_pipeline(
    pages_path: str,
    out_root: str,
    concepts: Optional[pa.Table] = None,
    model_name: str = "gazetteer",
    resume: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    lang_filter: Optional[str] = None,
    salt_buckets: Optional[int] = None,
) -> dict:
    """Run (or resume) the full pipeline; returns the summary manifest."""
    import ray.data as rd

    from bioner_ray.stages.pool import pool_size

    if concurrency is None:
        concurrency = pool_size()
    concepts = concepts if concepts is not None else make_concepts()
    index_ref = broadcast_concept_index(concepts)
    surfaces = concepts.column("surface").to_pylist()

    def build_documents():
        # prune at the read: html is needed for extraction, text/golden is not
        ds = read_parquet_clean(pages_path, columns=["url", "warc_ts", "html", "lang"])
        ds = extract_stage(ds)
        if lang_filter:
            import pyarrow.compute as pc

            ds = ds.map_batches(
                lambda t: t.filter(pc.equal(t["lang"], lang_filter)), batch_format="pyarrow"
            )
        return segment_stage(ds)

    documents = ckpt.run_stage(out_root, "documents", build_documents, resume=resume)

    def build_tagged():
        import ray

        if model_name == "gazetteer":
            cfg = {"surfaces": ray.put(surfaces)}
        elif model_name == "datexis-numpy":
            from bioner_ray.stages.vocab import build_vocab

            vocab = build_vocab(documents, n=3, min_word_frequency=2)
            cfg = {"vocab": ray.put(vocab)}
        else:
            cfg = {}
        return score_stage(documents, model_name=model_name, model_config=cfg, concurrency=concurrency)

    tagged = ckpt.run_stage(out_root, "tagged", build_tagged, resume=resume)

    _pin_http_probe()
    # mentions and triples are independent consumers of the tagged
    # checkpoint — run their stage executions CONCURRENTLY (two
    # datasets, two threads) so their actor pools timeshare the cluster
    # instead of serializing two full passes; wall ≈ max, not sum. Each
    # keeps its own manifest, so resume semantics are unchanged. Halve
    # each pool so the pair fits the same cores a single stage used.
    half = (
        tuple(max(1, c // 2) for c in concurrency)
        if isinstance(concurrency, tuple)
        else max(1, concurrency // 2)
    )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_mentions = pool.submit(
            ckpt.run_stage,
            out_root,
            "mentions",
            lambda: link_stage(mentions_stage(tagged), index_ref, concurrency=half),
            resume=resume,
        )
        f_triples = pool.submit(
            ckpt.run_stage,
            out_root,
            "triples",
            lambda: triples_stage(tagged, index_ref, concurrency=half),
            resume=resume,
        )
        mentions = f_mentions.result()
        triples = f_triples.result()

    edges = ckpt.run_stage(
        out_root,
        "edges",
        lambda: canonicalize_edges(triples, salt_buckets=salt_buckets),
        resume=resume,
    )

    nodes_dir = ckpt.stage_dir(out_root, "nodes")
    if not (resume and ckpt.is_complete(out_root, "nodes")):
        import shutil

        if os.path.exists(nodes_dir):
            shutil.rmtree(nodes_dir)
        os.makedirs(nodes_dir)
        nodes_tbl = canonicalize_nodes(mentions)
        import pyarrow.parquet as pq

        pq.write_table(nodes_tbl, os.path.join(nodes_dir, "nodes-00000.parquet"))
        with open(os.path.join(nodes_dir, ckpt.MANIFEST), "w") as f:
            json.dump({"stage": "nodes", "rows": nodes_tbl.num_rows}, f)

    summary = {
        "documents": ckpt.read_manifest(out_root, "documents")["rows"],
        "tagged": ckpt.read_manifest(out_root, "tagged")["rows"],
        "mentions": ckpt.read_manifest(out_root, "mentions")["rows"],
        "triples": ckpt.read_manifest(out_root, "triples")["rows"],
        "edges": ckpt.read_manifest(out_root, "edges")["rows"],
        "nodes": ckpt.read_manifest(out_root, "nodes")["rows"],
        "stage_walls": {
            s: ckpt.read_manifest(out_root, s).get("wall_seconds")
            for s in ("documents", "tagged", "mentions", "triples", "edges")
        },
    }
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary
