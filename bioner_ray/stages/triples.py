"""Triple assembly + canonicalization (north rule; reference patterns
G9/D2 — the G1 count-shuffle pattern applied to (subj, pred, obj)).

Assembly is IN-ROW: a tagged document row already holds its sentences,
tags and (via the broadcast ConceptIndex) its linked mentions, so
subject/predicate/object extraction never crosses rows — the
partitioning assumption (SURVEY.md §7.3) is that documents are never
split mid-sentence, which segmentation guarantees structurally.

Canonicalization is the classic two-stage combine: a local
``map_batches`` pre-aggregate collapses each block to one row per
distinct (s,p,o) BEFORE the wide ``groupby`` — after that combiner the
shuffle moves at most one row per distinct triple per block, which is
what makes hot entities (20% of fixture pages mention one surface)
survivable at 10^12-document scale; the groupby itself then sums
weights / maxes scores / mins provenance. The wide merge itself is a
``bucketed_aggregate`` (stages/shuffle.py): Ray shuffles on a coarse
fixed-cardinality bucket of hash(s,p,o) and the real per-key merge is
Arrow ``Table.group_by`` at C speed — which also makes hot keys
harmless (a hot triple shares its bucket; it never owns a straggler
partition), so explicit salting is subsumed.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Optional

import pyarrow as pa

from bioner_ray.functions.bio import decode_bio_spans
from bioner_ray.functions.text import keep_only_printable_chars
from bioner_ray.schemas import EDGES_SCHEMA, NIL_CONCEPT, TRIPLES_SCHEMA
from bioner_ray.stages.link import ConceptIndex

RELATION_LEXICON = frozenset(
    ["inhibits", "treats", "causes", "activates", "binds", "reduces", "induces"]
)
DEFAULT_RELATION = "co_occurs_with"


def assemble_sentence_triples(
    tokens: list[str], tags: list[int], index: ConceptIndex, relation_lexicon=RELATION_LEXICON
) -> list[tuple[str, str, str, float]]:
    """(subj, pred, obj, score) for each consecutive pair of linked
    mentions in one sentence. The predicate is the first
    relation-lexicon token strictly between the two mentions, else the
    ``co_occurs_with`` default. NIL-linked mentions never form triples."""
    spans = decode_bio_spans(tags)
    linked = []
    for start, end in spans:
        surface = " ".join(tokens[start : end + 1])
        cid, score = index.link_one(surface)
        if cid != NIL_CONCEPT:
            linked.append((start, end, cid, score))
    triples = []
    for (s1, e1, c1, sc1), (s2, e2, c2, sc2) in zip(linked, linked[1:]):
        pred = DEFAULT_RELATION
        for t in tokens[e1 + 1 : s2]:
            if keep_only_printable_chars(t) in relation_lexicon:
                pred = keep_only_printable_chars(t)
                break
        triples.append((c1, pred, c2, min(sc1, sc2)))
    return triples


class TripleAssembler:
    """Actor-pool callable: tagged document rows → triple rows."""

    def __init__(self, index_ref, relation_lexicon=RELATION_LEXICON):
        import ray

        self.index: ConceptIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )
        self.relation_lexicon = frozenset(relation_lexicon)

    def assemble_from_tokens(
        self,
        urls: list[str],
        docs_tokens: list[list[list[str]]],
        docs_tags: list[list],
    ) -> pa.Table:
        """Fused-path entry: assemble directly from the scorer's
        in-memory token lists and per-sentence tag arrays — the tags
        never round-trip through an Arrow column and the token lists
        are converted from Arrow exactly once per batch (sent_id is the
        within-document sentence index by construction,
        segment.segment_document)."""
        subjs, preds, objs, out_urls, sent_ids, scores = [], [], [], [], [], []
        for url, sents, tags in zip(urls, docs_tokens, docs_tags):
            for si, (toks, t) in enumerate(zip(sents, tags)):
                t = t.tolist() if hasattr(t, "tolist") else t
                for s, p, o, sc in assemble_sentence_triples(
                    toks, t, self.index, self.relation_lexicon
                ):
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
                    out_urls.append(url)
                    sent_ids.append(si)
                    scores.append(sc)
        return pa.table(
            {
                "subj": pa.array(subjs, type=pa.string()),
                "pred": pa.array(preds, type=pa.string()),
                "obj": pa.array(objs, type=pa.string()),
                "url": pa.array(out_urls, type=pa.string()),
                "sent_id": pa.array(sent_ids, type=pa.int32()),
                "score": pa.array(scores, type=pa.float32()),
            },
            schema=TRIPLES_SCHEMA,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bioner_ray.stages.nested import doc_boundaries, flat_struct_fields, flat_tags

        subjs, preds, objs, urls, sent_ids, scores = [], [], [], [], [], []
        url_col = batch.column("url").to_pylist()
        # only the token_text + sent_id child arrays leave Arrow — the
        # offset fields (the widest part of the struct) stay buffered
        sents = batch.column("sentences")
        bounds = doc_boundaries(sents)
        tok_ll, sid_ll = flat_struct_fields(sents, ["token_text", "sent_id"])
        tags_ll = flat_tags(batch)
        for d, url in enumerate(url_col):
            for si in range(bounds[d], bounds[d + 1]):
                for s, p, o, sc in assemble_sentence_triples(
                    tok_ll[si], tags_ll[si], self.index, self.relation_lexicon
                ):
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
                    urls.append(url)
                    sent_ids.append(sid_ll[si])
                    scores.append(sc)
        return pa.table(
            {
                "subj": pa.array(subjs, type=pa.string()),
                "pred": pa.array(preds, type=pa.string()),
                "obj": pa.array(objs, type=pa.string()),
                "url": pa.array(urls, type=pa.string()),
                "sent_id": pa.array(sent_ids, type=pa.int32()),
                "score": pa.array(scores, type=pa.float32()),
            },
            schema=TRIPLES_SCHEMA,
        )


def triples_stage(
    tagged_ds,
    index_ref,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 64,
    relation_lexicon=RELATION_LEXICON,
):
    return tagged_ds.map_batches(
        TripleAssembler,
        fn_constructor_kwargs={"index_ref": index_ref, "relation_lexicon": relation_lexicon},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _edge_partial_batch(batch: pa.Table) -> pa.Table:
    """Local combiner: one partial edge row per distinct (s,p,o) in the
    block — a single Arrow ``group_by`` (C speed), no Python dict loop."""
    import pyarrow.compute as pc

    t = batch.select(["subj", "pred", "obj", "url", "score"])
    out = t.group_by(["subj", "pred", "obj"]).aggregate(
        [("url", "count"), ("score", "max"), ("url", "min")]
    )
    return pa.table(
        {
            "subj": out.column("subj"),
            "pred": out.column("pred"),
            "obj": out.column("obj"),
            "weight": pc.cast(out.column("url_count"), pa.int64()),
            "score": pc.cast(out.column("score_max"), pa.float32()),
            "first_url": out.column("url_min"),
        }
    )


def canonicalize_edges(
    triples_ds,
    batch_size: int = 65536,
    salt_buckets: Optional[int] = None,
    num_buckets: int = 256,
):
    """(s,p,o)-distinct edge table with weight/score/provenance.

    Two-stage combine (see module docstring), with the wide merge run
    through ``bucketed_aggregate``: triple cardinality is unbounded
    (10^8+ distinct edges at web scale), so the final group_by must be
    Arrow-C-speed per coarse bucket, never Ray's per-group Python path.
    Bucketing also subsumes key salting — the shuffle key is the coarse
    bucket (fixed cardinality), so a hot (s,p,o) shares its bucket and
    never owns a straggler partition. ``salt_buckets``, if given,
    overrides the bucket count (kept for API compatibility).
    """
    from bioner_ray.stages.shuffle import bucketed_aggregate

    partial = triples_ds.map_batches(
        _edge_partial_batch, batch_format="pyarrow", batch_size=batch_size
    )
    merged = bucketed_aggregate(
        partial,
        ["subj", "pred", "obj"],
        [("weight", "sum"), ("score", "max"), ("first_url", "min")],
        num_buckets=salt_buckets or num_buckets,
    )

    def cast(t: pa.Table) -> pa.Table:
        return t.select(EDGES_SCHEMA.names).cast(EDGES_SCHEMA)

    return merged.map_batches(cast, batch_format="pyarrow")


def _node_partial_batch(batch: pa.Table) -> pa.Table:
    """Local combiner for nodes: (concept_id, surface) partial counts +
    per-key url sample set is avoided; n_urls is computed exactly via a
    second small groupby in ``canonicalize_nodes``."""
    agg: dict[tuple[str, str], int] = defaultdict(int)
    for cid, surf in zip(
        batch.column("concept_id").to_pylist(), batch.column("surface").to_pylist()
    ):
        if cid != NIL_CONCEPT:
            agg[(cid, surf)] += 1
    keys = list(agg.keys())
    return pa.table(
        {
            "concept_id": pa.array([k[0] for k in keys], type=pa.string()),
            "surface": pa.array([k[1] for k in keys], type=pa.string()),
            "count": pa.array([agg[k] for k in keys], type=pa.int64()),
        }
    )


def canonicalize_nodes(linked_mentions_ds, batch_size: int = 65536):
    """Node table from linked mentions: per concept, total mention count,
    most-frequent surface (ties: lexicographically smallest) and exact
    distinct-url count. Output is bounded by the concept dictionary, so
    the final merge is driver-side over a small table. The two wide
    merges ((concept, surface) counts; (concept, url) distinct) run
    through ``bucketed_aggregate`` — their pre-merge cardinality grows
    with the corpus, not the dictionary."""
    import numpy as np

    from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones

    surface_counts = bucketed_aggregate(
        linked_mentions_ds.map_batches(
            _node_partial_batch, batch_format="pyarrow", batch_size=batch_size
        ),
        ["concept_id", "surface"],
        [("count", "sum")],
    )

    def url_partial(batch: pa.Table) -> pa.Table:
        pairs = {
            (c, u)
            for c, u in zip(
                batch.column("concept_id").to_pylist(), batch.column("url").to_pylist()
            )
            if c != NIL_CONCEPT
        }
        keys = list(pairs)
        return pa.table(
            {
                "concept_id": pa.array([k[0] for k in keys], type=pa.string()),
                "url": pa.array([k[1] for k in keys], type=pa.string()),
            }
        )

    distinct_cu = bucketed_aggregate(
        with_ones(
            linked_mentions_ds.map_batches(
                url_partial, batch_format="pyarrow", batch_size=batch_size
            ),
            "n",
        ),
        ["concept_id", "url"],
        [("n", "sum")],
    )

    def ones_per_concept(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "concept_id": t.column("concept_id"),
                "n_urls": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    url_counts = bucketed_aggregate(
        distinct_cu.map_batches(ones_per_concept, batch_format="pyarrow"),
        ["concept_id"],
        [("n_urls", "sum")],
    )

    sc = surface_counts.to_pandas()  # bounded by |concepts| × surface variants
    uc = url_counts.to_pandas()
    sc = sc.sort_values(["concept_id", "count", "surface"], ascending=[True, False, True])
    total = sc.groupby("concept_id", as_index=False)["count"].sum()
    best = sc.drop_duplicates("concept_id")[["concept_id", "surface"]]
    out = total.merge(best, on="concept_id").merge(uc, on="concept_id", how="left")
    out["n_urls"] = out["n_urls"].fillna(0).astype("int64")
    tbl = pa.table(
        {
            "concept_id": pa.array(out["concept_id"], type=pa.string()),
            "surface": pa.array(out["surface"], type=pa.string()),
            "count": pa.array(out["count"], type=pa.int64()),
            "n_urls": pa.array(out["n_urls"], type=pa.int64()),
        }
    )
    return tbl
