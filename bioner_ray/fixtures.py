"""Deterministic synthetic fixtures (seed 42) per FIXTURES.md.

F1 ``pages``  — Common-Crawl-style page table (BASELINE.json input_hint):
  (url, warc_ts, html, text, lang); ``text`` is the *golden* extractor
  output the engine must reproduce byte-identically per url. Skew knobs:
  1% giant pages (×100 sentences) and a hot-entity surface on ~20% of
  pages, to exercise salted groupby + repartition.

F7 ``concepts`` — entity-linking dictionary: canonical + alias surfaces,
  one hot concept aliased to the F1 hot surface, ambiguous surfaces
  (same surface, two concepts) for deterministic tie-break tests.

Everything is generated from ``numpy.random.default_rng(seed)`` plus
CRC32 hash embeddings — no wall clock, no process-dependent hashing.
"""

from __future__ import annotations

import html as html_mod

import numpy as np
import pyarrow as pa

from bioner_ray.functions.embed import hash_embedding
from bioner_ray.functions.text import (
    ABSTRACT_TRUNCATED,
    ABSTRACT_TRUNCATED_AT_250,
    ABSTRACT_TRUNCATED_AT_400,
    process_abstract_text,
)
from bioner_ray.schemas import CONCEPTS_SCHEMA, EMBEDDING_DIM, PAGES_SCHEMA

SEED = 42

_FILLER = (
    "the patient study results showed that treatment with daily doses of "
    "compound was well tolerated and no adverse events were observed in "
    "clinical trial data from multiple centers over several months"
).split()

_PREFIXES = ["acet", "ibu", "metho", "cispl", "doxo", "genta", "predni", "rifa", "strepto", "tetra"]
_STEMS = ["amin", "profen", "trex", "atin", "rubicin", "micin", "solone", "mpin", "mycin", "cycline"]
_SUFFIXES = ["ol", "ate", "ide", "ine", "one"]

_RELATION_VERBS = ["inhibits", "treats", "causes", "activates", "binds", "reduces", "induces"]
HOT_SURFACE = "aspirin"
HOT_CONCEPT = "C0000001"

_TRUNC_SUFFIXES = [ABSTRACT_TRUNCATED_AT_250, ABSTRACT_TRUNCATED_AT_400, ABSTRACT_TRUNCATED]


def concept_surfaces(n_concepts: int = 64) -> list[tuple[str, str, bool]]:
    """[(concept_id, surface, is_canonical)] — deterministic, no RNG.

    Concept C0000001 is the hot concept with canonical surface
    ``aspirin``; every concept also gets an ``<surface>-x`` alias; the
    surface ``mitomycin`` is ambiguous (alias of both C0000002 and
    C0000003) to exercise the deterministic tie-break.
    """
    rows: list[tuple[str, str, bool]] = [(HOT_CONCEPT, HOT_SURFACE, True)]
    i = 2
    for p in _PREFIXES:
        for s in _STEMS:
            for suf in _SUFFIXES:
                if len(rows) >= n_concepts:
                    break
                surface = p + s + suf
                rows.append((f"C{i:07d}", surface, True))
                i += 1
            if len(rows) >= n_concepts:
                break
        if len(rows) >= n_concepts:
            break
    aliases = [(cid, surf + "x", False) for cid, surf, _ in rows]
    ambiguous = [("C0000002", "mitomycin", False), ("C0000003", "mitomycin", False)]
    return rows + aliases + ambiguous


def make_concepts(n_concepts: int = 64) -> pa.Table:
    """F7 concepts table. Embedding = hash embedding of the surface, so
    the embedding-similarity linking fallback is exactly reproducible."""
    rows = concept_surfaces(n_concepts)
    emb = [hash_embedding(surf, EMBEDDING_DIM).tolist() for _, surf, _ in rows]
    return pa.table(
        {
            "concept_id": [r[0] for r in rows],
            "surface": [r[1] for r in rows],
            "is_canonical": [r[2] for r in rows],
            "embedding": pa.array(emb, type=pa.list_(pa.float32(), EMBEDDING_DIM)),
        },
        schema=CONCEPTS_SCHEMA,
    )


def _make_sentence(rng: np.random.Generator, surfaces: list[str], hot: bool) -> str:
    """One sentence; ~55% carry an entity-pair relation pattern so the
    KG pipeline has real triples to find."""
    words = list(rng.choice(_FILLER, size=int(rng.integers(4, 12))))
    if rng.random() < 0.55:
        a = HOT_SURFACE if hot and rng.random() < 0.5 else str(rng.choice(surfaces))
        b = str(rng.choice(surfaces))
        verb = str(rng.choice(_RELATION_VERBS))
        k = int(rng.integers(0, len(words)))
        words[k:k] = [a.capitalize(), verb, b]
    return " ".join(words) + "."


def make_pages(n_pages: int = 64, seed: int = SEED, n_concepts: int = 64) -> pa.Table:
    """F1 pages table. ``text`` = golden output of the (bug-faithful)
    reference extractor semantics over the page's raw text:
    process_abstract_text leaves a detected truncation marker in place
    and appends exactly one newline (pubmed_parser.py:41-53; see
    functions/text.py for why removal is a no-op in the reference)."""
    rng = np.random.default_rng(seed)
    surfaces = [s for _, s, canon in concept_surfaces(n_concepts) if canon]
    urls, ts, htmls, texts, langs = [], [], [], [], []
    base_us = 1609459200000000  # 2021-01-01T00:00:00Z in µs
    for i in range(n_pages):
        hot = rng.random() < 0.20
        giant = rng.random() < 0.01
        n_sent = int(rng.integers(2, 6)) * (100 if giant else 1)
        raw = " ".join(_make_sentence(rng, surfaces, hot) for _ in range(n_sent))
        r = rng.random()
        if r < 0.06:
            raw = raw + _TRUNC_SUFFIXES[int(rng.integers(0, 3))]
        lang = "en" if rng.random() < 0.95 else ("de" if rng.random() < 0.5 else "fr")
        golden, _kind = process_abstract_text(raw)
        urls.append(f"https://example.org/crawl/{i:08d}")
        ts.append(base_us + i * 60_000_000)
        htmls.append(
            (
                "<html><head><title>doc %d</title></head><body><p>%s</p></body></html>"
                % (i, html_mod.escape(raw))
            ).encode("utf-8")
        )
        texts.append(golden)
        langs.append(lang)
    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": texts,
            "lang": langs,
        },
        schema=PAGES_SCHEMA,
    )


def _write_pages_shard(path: str, shard: int, per: int, seed: int) -> None:
    import os

    import pyarrow.parquet as pq

    tbl = make_pages(per, seed=seed + shard)
    # re-key urls so shards do not collide
    urls = [f"https://example.org/crawl/{shard:04d}/{i:08d}" for i in range(per)]
    tbl = tbl.set_column(0, "url", pa.array(urls))
    pq.write_table(tbl, os.path.join(path, f"pages-{shard:05d}.parquet"))


def write_pages_parquet(
    path: str, n_pages: int = 64, seed: int = SEED, shards: int = 1, parallel: bool = False
) -> None:
    """Materialize the pages fixture as (optionally sharded) Parquet —
    shard i gets a disjoint url/seed range so any scale is reproducible
    shard-by-shard (resumable-generation analog of the output contract).
    ``parallel=True`` fans shards out as Ray tasks (bit-identical
    output: each shard's RNG is seeded independently)."""
    import os

    os.makedirs(path, exist_ok=True)
    per = n_pages // shards
    if parallel:
        import ray

        shard_task = ray.remote(_write_pages_shard)
        ray.get([shard_task.remote(path, s, per, seed) for s in range(shards)])
    else:
        for s in range(shards):
            _write_pages_shard(path, s, per, seed)
