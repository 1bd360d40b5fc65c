"""Benchmark decontamination: drop training documents that share any
word n-gram with a (small) evaluation set.

The standard LLM-training hygiene step (n-gram overlap decontamination
à la GPT-3 appendix C / Dolma): the eval side is benchmark-sized —
megabytes against a 100-TB train side — so this is the canonical
broadcast-semi-join shape, never a shuffle join:

1. one streaming pass over the eval docs builds the DISTINCT n-gram
   set (driver-collected — bounded by the benchmark, not the corpus —
   then ``ray.put`` ONCE as an Arrow string array);
2. one streaming pass over the train docs generates each doc's grams
   and probes the broadcast set with a single C++ ``pc.is_in`` per
   batch; a doc with ≥1 hit is contaminated.

Grams are exact joined-token strings (no hashing), so the result is
replayable in SQL and collision-free. Token contract matches
textstats: whitespace tokens of lower(text).

No reference analog (scale extension, SURVEY.md §2.8); cf. the same
broadcast pattern in pipelines/analytics.py doc_split (J1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.stages.textstats import _split_lower


def _batch_grams(batch: pa.Table, n: int, text_col: str) -> tuple[list[str], np.ndarray]:
    """All n-grams in the batch plus each gram's row index."""
    toks = _split_lower(batch, text_col)
    grams: list[str] = []
    rows: list[int] = []
    for i, t in enumerate(toks):
        m = len(t) - n + 1
        if m <= 0:
            continue
        grams.extend(" ".join(t[j : j + n]) for j in range(m))
        rows.extend([i] * m)
    return grams, np.asarray(rows, dtype=np.int64)


def eval_gram_set(ds_eval, n: int = 8, text_col: str = "text"):
    """Collect the eval set's distinct n-grams into one broadcast ref.

    Per-batch dedup happens distributedly (python set per batch); the
    driver unions only the per-batch distinct sets — bounded by the
    benchmark's vocabulary, not its token count.
    """
    import ray

    def distinct(batch: pa.Table) -> pa.Table:
        grams, _ = _batch_grams(batch, n, text_col)
        return pa.table({"gram": pa.array(sorted(set(grams)), type=pa.string())})

    seen: set[str] = set()
    for row in ds_eval.map_batches(distinct, batch_format="pyarrow").take_all():
        seen.add(row["gram"])
    return ray.put(pa.array(sorted(seen), type=pa.string()))


def decontaminate_stage(
    ds_train,
    eval_grams_ref,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Keep only train docs with zero n-gram overlap with the eval set.

    Output: the input columns, filtered. One ``pc.is_in`` probe per
    batch; the broadcast array is read zero-copy from the object store
    in every task.
    """
    import ray

    def keep(batch: pa.Table) -> pa.Table:
        grams, rows = _batch_grams(batch, n, text_col)
        bad = np.zeros(batch.num_rows, dtype=bool)
        if grams:
            hit = pc.is_in(
                pa.array(grams, type=pa.string()), value_set=ray.get(eval_grams_ref)
            ).to_numpy(zero_copy_only=False)
            np.logical_or.at(bad, rows[hit], True)
        return batch.filter(pa.array(~bad))

    return ds_train.map_batches(keep, batch_format="pyarrow")
