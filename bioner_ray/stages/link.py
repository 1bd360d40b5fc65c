"""Entity linking (reference J7/A6 — the north-rule extension).

The closest reference analog is the broadcast vocab lookup cache
(ngram_encoder.py:110-121): a small dictionary shipped once and read by
every task. Here the ``ConceptIndex`` (surface dict + embedding matrix)
is built driver-side from the tiny concepts table, put in the object
store ONCE via ``ray.put``, and resolved inside each actor/task at
construction — never re-shipped per batch.

Linking rule (deterministic):
1. exact match on the normalized surface → that concept, score 1.0;
   ambiguous surfaces resolve to the lexicographically smallest
   concept_id (pinned total order, cf. the G3 tie-break policy);
2. else cosine similarity of the surface's hash embedding against the
   canonical-concept embedding matrix; best concept wins if the score
   clears ``threshold`` (ties again by smallest concept_id);
3. else the NIL sentinel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bioner_ray.functions.embed import hash_embedding
from bioner_ray.functions.text import normalize_surface as _normalize_surface
from bioner_ray.schemas import EMBEDDING_DIM, NIL_CONCEPT


class ConceptIndex:
    """Broadcastable linking state: exact-surface dict + embedding matrix."""

    #: memo cap — linking is pure, so results are cached per distinct
    #: surface; web-scale surface diversity is bounded per actor block
    #: stream, but cap anyway so a pathological corpus can't OOM an actor
    MEMO_MAX = 1_000_000

    def __init__(self, concepts: pa.Table, threshold: float = 0.70):
        self.threshold = threshold
        self._memo: dict[str, tuple[str, float]] = {}
        self.surface_map: dict[str, str] = {}
        by_surface: dict[str, list[str]] = {}
        for cid, surf in zip(
            concepts.column("concept_id").to_pylist(), concepts.column("surface").to_pylist()
        ):
            by_surface.setdefault(_normalize_surface(surf), []).append(cid)
        for surf, cids in by_surface.items():
            self.surface_map[surf] = min(cids)  # deterministic ambiguity tie-break
        canon = concepts.filter(concepts.column("is_canonical"))
        self.canon_ids = canon.column("concept_id").to_pylist()
        emb = np.asarray(canon.column("embedding").to_pylist(), dtype=np.float32)
        if emb.size:
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            emb = emb / norms
        self.emb_matrix = emb  # (C, D), rows unit-norm

    def link_one(self, surface: str) -> tuple[str, float]:
        cached = self._memo.get(surface)
        if cached is not None:
            return cached
        norm = _normalize_surface(surface)
        hit = self.surface_map.get(norm)
        if hit is not None:
            res = (hit, 1.0)
        elif len(self.canon_ids) == 0:
            res = (NIL_CONCEPT, 0.0)
        else:
            # embedding fallback — the expensive path; memoized below
            q = hash_embedding(norm, EMBEDDING_DIM)
            sims = self.emb_matrix @ q
            best = float(sims.max())
            if best >= self.threshold:
                # ties by smallest concept_id for determinism
                winners = [self.canon_ids[i] for i in np.flatnonzero(sims >= best - 1e-9)]
                res = (min(winners), best)
            else:
                res = (NIL_CONCEPT, best)
        if len(self._memo) < self.MEMO_MAX:
            self._memo[surface] = res
        return res

    def link_many(self, surfaces: list[str]) -> tuple[list[str], list[float]]:
        """Vectorized over the batch: each distinct surface linked once."""
        arr = np.asarray(surfaces, dtype=object)
        uniq, inverse = np.unique(arr, return_inverse=True)
        ids = np.empty(len(uniq), dtype=object)
        scores = np.empty(len(uniq), dtype=np.float32)
        for i, s in enumerate(uniq):
            ids[i], scores[i] = self.link_one(s)
        return list(ids[inverse]), [float(x) for x in scores[inverse]]


def broadcast_concept_index(concepts: pa.Table, threshold: float = 0.70):
    """Build once on the driver, ship once via ray.put."""
    import ray

    return ray.put(ConceptIndex(concepts, threshold=threshold))


class MentionLinker:
    """Actor-pool callable: adds (concept_id, link_score) to mention rows."""

    def __init__(self, index_ref):
        import ray

        self.index: ConceptIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, scores = self.index.link_many(batch.column("surface").to_pylist())
        return batch.append_column(
            "concept_id", pa.array(ids, type=pa.string())
        ).append_column("link_score", pa.array(scores, type=pa.float32()))


def link_stage(mentions_ds, index_ref, concurrency: int | tuple[int, int] = 4, batch_size: int = 4096):
    out = mentions_ds.map_batches(
        MentionLinker,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return out
