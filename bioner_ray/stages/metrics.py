"""Distributed entity-level evaluation (reference G4-G6, J4-J6, G7, M11).

The reference accumulates streaming counters inside ignite metric
objects (EntityLevelPrecision/Recall.update,
entity_level_precision_recall.py:26-103): per batch it decodes gold and
prediction spans, intersects them (J4, :167-168), and adds to
``_true_positives`` / ``_positives``. That is exactly a
partial+final aggregate: here each ``map_batches`` block emits one
(tp, n_pred, n_gold) partial row and the driver sums three integers —
no shuffle, any corpus size.

Gold and predicted tags are sibling columns of the same nested row, so
the span intersection is in-row (no join); padding semantics (-100 →
PAD, positional truncation) follow filtered_labels (:171-182).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from bioner_ray.functions.bio import (
    decode_bio_spans,
    f1_from_counts,
    sentence_prf_counts,
    strip_padding,
    truncate_predictions,
)


def _prf_partial_batch(batch: pa.Table, gold_key: str, pred_key: str) -> pa.Table:
    from bioner_ray.stages.nested import flat_struct_fields

    tp = n_pred = n_gold = 0
    gold_ll, pred_ll = flat_struct_fields(batch.column("sentences"), [gold_key, pred_key])
    for gold, pred in zip(gold_ll, pred_ll):
        t, p, g = sentence_prf_counts(gold, pred)
        tp += t
        n_pred += p
        n_gold += g
    return pa.table(
        {
            "tp": pa.array([tp], type=pa.int64()),
            "n_pred": pa.array([n_pred], type=pa.int64()),
            "n_gold": pa.array([n_gold], type=pa.int64()),
        }
    )


def entity_level_prf(docs_ds, gold_key: str = "gold_tags", pred_key: str = "pred_tags") -> dict:
    """Corpus-level entity precision/recall/F1 (G4-G6)."""
    partials = docs_ds.map_batches(
        lambda b: _prf_partial_batch(b, gold_key, pred_key), batch_format="pyarrow"
    )
    tp = partials.sum("tp")
    n_pred = partials.sum("n_pred")
    n_gold = partials.sum("n_gold")
    p, r, f1 = f1_from_counts(tp or 0, n_pred or 0, n_gold or 0)
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "true_positives": int(tp or 0),
        "predicted_spans": int(n_pred or 0),
        "gold_spans": int(n_gold or 0),
    }


def _error_stats_partial(batch: pa.Table, gold_key: str, pred_key: str) -> pa.Table:
    """G7: per gold-span length, (total, errors) — a gold span is an
    error when absent from the predicted span set
    (misc/error_analysis/analysis.py:188-203)."""
    from bioner_ray.stages.nested import flat_struct_fields

    totals: dict[int, int] = defaultdict(int)
    errors: dict[int, int] = defaultdict(int)
    gold_ll, pred_ll = flat_struct_fields(batch.column("sentences"), [gold_key, pred_key])
    for gold, pred in zip(gold_ll, pred_ll):
        gold_clean = strip_padding(gold)
        pred_clean = truncate_predictions(pred, len(gold_clean))
        pred_spans = set(decode_bio_spans(pred_clean))
        for span in decode_bio_spans(gold_clean):
            length = span[1] - span[0] + 1  # Annotation.__len__ (:117-118)
            totals[length] += 1
            if span not in pred_spans:
                errors[length] += 1
    lengths = sorted(totals)
    return pa.table(
        {
            "length": pa.array(lengths, type=pa.int32()),
            "total": pa.array([totals[l] for l in lengths], type=pa.int64()),
            "errors": pa.array([errors[l] for l in lengths], type=pa.int64()),
        }
    )


def error_stats_by_length(docs_ds, gold_key: str = "gold_tags", pred_key: str = "pred_tags"):
    """Grouped error ratios per entity length (G7) as a small Dataset."""
    from bioner_ray.stages.shuffle import bucketed_aggregate

    partials = docs_ds.map_batches(
        lambda b: _error_stats_partial(b, gold_key, pred_key), batch_format="pyarrow"
    )
    return bucketed_aggregate(partials, ["length"], [("total", "sum"), ("errors", "sum")])


def _span_sets_batch(batch: pa.Table, key_a: str, key_b: str) -> pa.Table:
    """J5/J6 partials: per-sentence TP/FP/FN between two tag columns
    (set intersection / differences over span identity,
    analysis.py:140-149,160-170)."""
    tp = fp = fn = 0
    for doc_sents in batch.column("sentences").to_pylist():
        for sent in doc_sents:
            a = set(decode_bio_spans(strip_padding(sent[key_a])))
            b = set(decode_bio_spans(strip_padding(sent[key_b])))
            tp += len(a & b)
            fn += len(a - b)
            fp += len(b - a)
    return pa.table(
        {
            "tp": pa.array([tp], type=pa.int64()),
            "fp": pa.array([fp], type=pa.int64()),
            "fn": pa.array([fn], type=pa.int64()),
        }
    )


def span_confusion(docs_ds, gold_key: str = "gold_tags", pred_key: str = "pred_tags") -> dict:
    """Corpus TP/FP/FN (J4/J6) between two in-row tag columns."""
    partials = docs_ds.map_batches(
        lambda b: _span_sets_batch(b, gold_key, pred_key), batch_format="pyarrow"
    )
    return {
        "tp": int(partials.sum("tp") or 0),
        "fp": int(partials.sum("fp") or 0),
        "fn": int(partials.sum("fn") or 0),
    }


def shuffle_documents(docs_ds, seed: int = 1632737901):
    """O2: document-level shuffle (conll_dataloader.py:9-13 shuffles
    ``dataset.documents`` before flattening). Rows ARE documents in our
    model, so ``random_shuffle`` has exactly the reference semantics;
    the seed default is the reference's global training seed
    (train_bioner.py:71)."""
    return docs_ds.random_shuffle(seed=seed)


def sample_error_documents(docs_ds, n: int = 10, seed: int = 42,
                           gold_key: str = "gold_tags", pred_key: str = "pred_tags"):
    """O3: seeded sample of documents containing at least one span error
    (select_errors, misc/error_analysis/analysis.py:206-215 draws error
    sentences with random.choice under a fixed seed). Distributed form:
    filter(has_error) → seeded random_shuffle → limit(n) — same
    contract (n error-carrying rows, deterministic per seed), without
    reproducing the driver-side RNG draw order (SURVEY.md §2.6 O3)."""

    def has_error(batch: pa.Table) -> pa.Table:
        from bioner_ray.stages.nested import doc_boundaries, flat_struct_fields

        sents = batch.column("sentences")
        bounds = doc_boundaries(sents)
        gold_ll, pred_ll = flat_struct_fields(sents, [gold_key, pred_key])
        keep = []
        for d in range(len(bounds) - 1):
            err = False
            for si in range(bounds[d], bounds[d + 1]):
                gold_clean = strip_padding(gold_ll[si])
                pred_clean = truncate_predictions(pred_ll[si], len(gold_clean))
                if set(decode_bio_spans(gold_clean)) != set(decode_bio_spans(pred_clean)):
                    err = True
                    break
            keep.append(err)
        return batch.filter(pa.array(keep))

    # Deterministic hash-rank draw (md5(url|seed) ascending) instead of
    # Ray's random_shuffle: same contract — n error-carrying documents,
    # fixed per seed — but machine/partitioning-independent and
    # SQL-replayable, and the global smallest-n runs combiner-pruned
    # (≤ n candidate rows leave each block; per-group top-k with a
    # constant key IS a distributed global top-n).
    import hashlib

    from bioner_ray.stages.rank import top_k_per_group

    def add_rank_key(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        hk = [
            hashlib.md5(f"{u}|{seed}".encode()).hexdigest()
            for u in t.column("url").to_pylist()
        ]
        t = t.append_column("_hk", pa.array(hk, type=pa.string()))
        import numpy as np

        return t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    picked = top_k_per_group(
        docs_ds.map_batches(has_error, batch_format="pyarrow").map_batches(
            add_rank_key, batch_format="pyarrow"
        ),
        key_col="_g",
        order_by=[("_hk", "ascending"), ("url", "ascending")],
        k=n,
    )
    return picked.map_batches(
        lambda t: t.drop_columns(["_g", "_hk", "rk"]) if t.num_columns else t,
        batch_format="pyarrow",
    )


def ensemble_tags_batch(batch: pa.Table, key_a: str, key_b: str, out_key: str = "ensemble_tags") -> pa.Table:
    """J5: per-sentence span-set intersection of two annotators,
    re-encoded as BIO tags (Ensemble.create_overlapping_annotations,
    analysis.py:106-114). In-row — both tag columns are co-located."""
    import pyarrow.compute as pc

    from bioner_ray.functions.bio import B, I, O
    from bioner_ray.stages.nested import doc_boundaries, flat_struct_fields

    sents = batch.column("sentences")
    if isinstance(sents, pa.ChunkedArray):
        sents = sents.combine_chunks()
    a_ll, b_ll = flat_struct_fields(sents, [key_a, key_b])
    flat = pc.list_flatten(sents)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n_tok = pc.list_value_length(pc.struct_field(flat, "token_text")).to_pylist()
    ens = []
    for ta, tb, n in zip(a_ll, b_ll, n_tok):
        spans = set(decode_bio_spans(ta)) & set(decode_bio_spans(tb))
        tags = [O] * n
        for start, end in spans:
            tags[start] = B
            for i in range(start + 1, end + 1):
                tags[i] = I
        ens.append(tags)
    vals = pa.array(ens, type=pa.list_(pa.uint8()))
    names = [f.name for f in flat.type] + [out_key]
    children = [flat.field(i) for i in range(flat.type.num_fields)] + [vals]
    new_flat = pa.StructArray.from_arrays(children, names=names)
    bounds = doc_boundaries(sents)
    new_sents = pa.ListArray.from_arrays(pa.array(bounds.astype("int32")), new_flat)
    idx = batch.schema.get_field_index("sentences")
    return batch.set_column(idx, "sentences", new_sents)
