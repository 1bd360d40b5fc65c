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

from bioner_ray.sources.parquet_io import read_parquet_clean

import numpy as np
import pyarrow as pa


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _documents(sf_dir: str):
    return _read(sf_dir, "documents", columns=["doc_id", "text"])


def dedup_exact(sf_dir: str):
    """Columns: key (md5), keep_id, n_copies."""
    from bioner_ray.stages.dedup import exact_dedup

    return exact_dedup(_documents(sf_dir))


# Checkpointed candidate-pair tables (VERDICT r4, Next #7): jaccard
# truth pairs and minhash candidates are the shared prefix of
# dedup_{jaccard,minhash}_pairs, minhash_precision, minhash_recall,
# dedup_components/filter/keep_best. Each is computed ONCE per corpus
# snapshot and persisted as manifest-gated partitioned Parquet via
# state/checkpoint.run_stage — a FRESH PROCESS reuses the on-disk
# table (the production daily-increment convention, not an in-process
# materialize). The checkpoint key fingerprints the corpus file
# (path + size + mtime), so a regenerated fixture invalidates it; the
# returned Dataset is a lazy parquet read, so nothing Ray-session-
# scoped is ever cached across ray.shutdown()/re-init.
_PAIR_STATE_ROOT = "/tmp/bioner_pair_state"


def _corpus_fingerprint(sf_dir: str, table: str = "documents") -> str:
    import hashlib
    import os as _os

    p = _os.path.join(_os.path.abspath(sf_dir), f"{table}.parquet")
    st = _os.stat(p)
    return hashlib.md5(
        f"{p}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]


def _jaccard_pairs_memo(sf_dir: str, threshold: float = 0.5):
    import os as _os

    from bioner_ray.stages.dedup import jaccard_pairs
    from bioner_ray.state.checkpoint import run_stage

    root = _os.path.join(_PAIR_STATE_ROOT, _corpus_fingerprint(sf_dir))
    return run_stage(
        root,
        f"jaccard-k3-t{threshold}",
        lambda: jaccard_pairs(_documents(sf_dir), k=3, threshold=threshold),
        lineage=False,
    )


def _minhash_pairs_memo(sf_dir: str):
    import os as _os

    from bioner_ray.stages.dedup import minhash_dedup_pairs
    from bioner_ray.state.checkpoint import run_stage

    root = _os.path.join(_PAIR_STATE_ROOT, _corpus_fingerprint(sf_dir))
    return run_stage(
        root,
        "minhash-bands",
        lambda: minhash_dedup_pairs(_documents(sf_dir)),
        lineage=False,
    )


def dedup_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """Exact 3-shingle Jaccard near-dup pairs. Columns: a, b, n_common,
    jaccard."""
    return _jaccard_pairs_memo(sf_dir, threshold)


def dedup_minhash_pairs(sf_dir: str):
    """MinHash+LSH candidates. Columns: a, b, n_bands, est_jaccard.
    SQL-oracled: the DuckDB twin replays shingling, the seeded
    permutations (constants inlined from the same ``_minhash_params``
    call) and band agreement exactly (``__ray_entry__._minhash_sql``)."""
    return _minhash_pairs_memo(sf_dir)


def fuzzy_word_pairs(sf_dir: str):
    """Deletion-neighborhood fuzzy join (FastSS): vocabulary word pairs
    at Levenshtein distance exactly 1 with corpus counts — the
    typo/variant signal entity canonicalization runs before alias
    grouping. Columns: a, b, ca, cb."""
    from bioner_ray.stages.fuzzy import fuzzy_word_pairs as _fuzzy

    return _fuzzy(_read(sf_dir, "documents", columns=["text"]))


def setsim_prefix_pairs(sf_dir: str, threshold: float = 0.5):
    """Prefix-filtered set-similarity self-join (AllPairs/PPJoin) —
    same exact 3-shingle Jaccard ≥ 0.5 pair contract as
    ``dedup_jaccard_pairs`` (and the same DuckDB oracle), produced via
    prefix-filtered candidate generation instead of the full inverted
    index. Columns: a, b, n_common, jaccard."""
    from bioner_ray.stages.setsim import setsim_prefix_pairs as _setsim

    # bucket count sized to the sfX suite (64 ≈ 2× CPUs; measured 1.6×
    # faster than the 256 web-scale default at sf0.1 — granularity is
    # a deployment knob, never semantics)
    return _setsim(_documents(sf_dir), k=3, threshold=threshold, num_buckets=64)


def paragraph_dedup(sf_dir: str):
    """C4-style segment-level dedup stats: each 10-token segment is
    kept only at its first corpus occurrence. Columns: doc_id, n_segs,
    n_kept."""
    from bioner_ray.stages.dedup import segment_dedup

    return segment_dedup(_documents(sf_dir), window=10)


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 8):
    """SimHash near-dup pairs. Columns: a, b, hamming. SQL-oracled:
    the DuckDB twin recomputes the fingerprints and takes every pair
    with exact Hamming <= max_hamming (__ray_entry__._SIMHASH_SQL)."""
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

    pairs = _jaccard_pairs_memo(sf_dir, threshold)
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


#: every 50th document gets a reference truncation marker appended, so
#: the S5 detect-but-keep semantics are visible in the oracle hash
_TRUNC_EVERY = 50


def pubmed_extract(sf_dir: str):
    """S4/S5/G8 as a distributed query: each document is wrapped into a
    deterministic PubMed XML article (Abstract/AbstractText, escaped),
    parsed back through the real S4 reader (``parse_pubmed_xml``) and
    normalized by the byte-faithful S5 ``process_abstract_text`` — all
    inside one ``map_batches``. Docs with ``doc_id % 50 == 0`` carry the
    ``(ABSTRACT TRUNCATED AT 250 WORDS)`` suffix so the truncation
    detector (reference counters G8, pubmed_parser.py:14-18) has
    non-trivial output. Empty texts are skipped exactly like the
    reference skips text-less articles (pubmed_parser.py:30-39).

    Columns: doc_id, n_chars (extracted length incl. the appended
    newline), truncated_kind.
    """
    from xml.sax.saxutils import escape

    from bioner_ray.functions.text import ABSTRACT_TRUNCATED_AT_250
    from bioner_ray.sources.pubmed import parse_pubmed_xml

    def rt(batch: pa.Table) -> pa.Table:
        ids, n_chars, kinds = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            text = text or ""
            if not text:
                continue  # reference: articles without abstract text are skipped
            if doc_id % _TRUNC_EVERY == 0:
                text = text + " " + ABSTRACT_TRUNCATED_AT_250
            xml = (
                "<PubmedArticleSet><PubmedArticle><Article>"
                "<Abstract><AbstractText>"
                + escape(text)
                + "</AbstractText></Abstract>"
                "</Article></PubmedArticle></PubmedArticleSet>"
            ).encode("utf-8")
            rows = parse_pubmed_xml(xml, gzipped=False)
            assert len(rows) == 1, f"expected one abstract for doc {doc_id}"
            ids.append(doc_id)
            n_chars.append(len(rows[0]["text"]))
            kinds.append(rows[0]["truncated_kind"])
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_chars": pa.array(n_chars, type=pa.int64()),
                "truncated_kind": pa.array(kinds, type=pa.string()),
            }
        )

    return _documents(sf_dir).map_batches(rt, batch_format="pyarrow")


def conlleval_export(sf_dir: str):
    """S3/M12/J3/S8 as a distributed query: per document — segment,
    gold-tag (full gazetteer) and pred-tag (degraded gazetteer), format
    the conlleval side-by-side block (S3 writer), derive the external
    ``token label`` TSV, re-read it through the S8 prediction reader and
    positionally re-annotate the documents (M12/J3, asserting token
    equality like postprocess_predictions.py:31-34). A disagreement
    between the re-annotated tags and the original predictions raises.

    Columns: doc_id, n_lines (token lines in the export), n_gold_b,
    n_pred_b (B-tagged tokens per annotator — SQL-replayable because
    the gazetteer surfaces are single words).
    """
    from bioner_ray.functions.bio import B
    from bioner_ray.pipelines.analytics import ENTITY_SURFACES, PRED_SURFACES
    from bioner_ray.sources.conll import (
        annotate_documents_positionally,
        format_conlleval_document,
        read_prediction_tsv,
    )
    from bioner_ray.stages.scorer import GazetteerModel
    from bioner_ray.stages.segment import segment_document

    class Export:
        def __init__(self):
            self.gold = GazetteerModel(list(ENTITY_SURFACES))
            self.pred = GazetteerModel(list(PRED_SURFACES))

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, n_lines, n_gold, n_pred = [], [], [], []
            for doc_id, text in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                sents = segment_document(text or "", with_offsets=False)
                gold_tags = self.gold.predict_document(sents)
                pred_tags = self.pred.predict_document(sents)
                doc = {
                    "doc_id": doc_id,
                    "sentences": [
                        {**s, "gold_tags": g, "pred_tags": p}
                        for s, g, p in zip(sents, gold_tags, pred_tags)
                    ],
                }
                block = format_conlleval_document(doc)  # S3 writer
                # external annotator's view: token<space>pred_label TSV
                tsv = "\n".join(
                    " ".join((ln.split(" ")[0], ln.split(" ")[2]))
                    for ln in block.split("\n")
                    if ln
                )
                annotated = read_prediction_tsv(tsv)  # S8 reader
                redone = annotate_documents_positionally([doc], annotated)  # M12/J3
                for s_orig, s_new in zip(doc["sentences"], redone[0]["sentences"]):
                    if s_new["pred_tags"] != list(s_orig["pred_tags"]):
                        raise ValueError(f"conlleval round-trip mismatch in doc {doc_id}")
                ids.append(doc_id)
                n_lines.append(sum(len(s["token_text"]) for s in sents))
                n_gold.append(sum(t == B for tags in gold_tags for t in tags))
                n_pred.append(sum(t == B for tags in pred_tags for t in tags))
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_lines": pa.array(n_lines, type=pa.int64()),
                    "n_gold_b": pa.array(n_gold, type=pa.int64()),
                    "n_pred_b": pa.array(n_pred, type=pa.int64()),
                }
            )

    return _documents(sf_dir).map_batches(
        Export, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def dedup_containment_pairs(sf_dir: str, threshold: float = 0.9):
    """Asymmetric near-dup pairs by containment coefficient
    (stages/dedup.containment_pairs): |A∩B| / min(|A|,|B|) ≥ threshold
    — catches a short document embedded verbatim in a long one (quote
    farms, boilerplate wraps), which symmetric Jaccard scores near
    zero. Columns: a, b, n_common, containment, contained_id."""
    from bioner_ray.stages.dedup import containment_pairs

    return containment_pairs(_documents(sf_dir), threshold=threshold)


def lang_gate_rates(sf_dir: str):
    """Per-language quality-gate retention — the mix-planning matrix a
    multilingual pretraining build reads before setting sampling
    weights: for each detected language, how many documents exist and
    what fraction survives the Gopher rule gate (a language whose
    retention collapses needs language-specific thresholds, the known
    Gopher/MassiveText caveat). Composition of two oracle-checked
    operators (langid ⋈ gopher_rules) on ONE doc_id-bucketed join;
    pass rate as exact integer micro. Columns: lang, n_docs, n_pass,
    pass_micro."""
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )
    from bioner_ray.stages.textstats import langid_stage

    lid_schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
    lid = pin_schema(
        langid_stage(_documents(sf_dir)).map_batches(
            lambda t: pa.table(
                {"doc_id": t.column("doc_id"), "lang": t.column("pred_lang")}
            )
            if t.num_columns
            else lid_schema.empty_table(),
            batch_format="pyarrow",
        ),
        lid_schema,
    )
    gate_schema = pa.schema([("doc_id", pa.int64()), ("keep", pa.int64())])
    gate = pin_schema(
        gopher_rules(sf_dir).map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "keep": pc.cast(t.column("keep"), pa.int64()),
                }
            )
            if t.num_columns
            else gate_schema.empty_table(),
            batch_format="pyarrow",
        ),
        gate_schema,
    )
    j = bucketed_inner_join(gate, lid, ["doc_id"], gate_schema, lid_schema)
    counts = pin_schema(
        bucketed_aggregate(
            j.map_batches(
                lambda t: pa.table(
                    {
                        "lang": t.column("lang"),
                        "n_docs": pa.array(
                            np.ones(t.num_rows, dtype=np.int64)
                        ),
                        "n_pass": t.column("keep"),
                    }
                )
                if t.num_columns
                else pa.schema(
                    [
                        ("lang", pa.string()),
                        ("n_docs", pa.int64()),
                        ("n_pass", pa.int64()),
                    ]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["lang"],
            [("n_docs", "sum"), ("n_pass", "sum")],
        ),
        pa.schema(
            [("lang", pa.string()), ("n_docs", pa.int64()), ("n_pass", pa.int64())]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("lang", pa.string()),
                ("n_docs", pa.int64()),
                ("n_pass", pa.int64()),
                ("pass_micro", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        nd = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.int64)
        np_ = t.column("n_pass").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": pa.array(nd),
                "n_pass": pa.array(np_),
                "pass_micro": pa.array((np_ * np.int64(1000000)) // nd),
            },
            schema=out_schema,
        )

    return counts.map_batches(finish, batch_format="pyarrow")


def ranker_agreement(sf_dir: str, k: int = 10):
    """Ranker-diff audit between the two lexical retrieval models
    (BM25 vs Dirichlet QLM) on the shared fixed query: top-k overlap
    and Kendall concordance over the common documents — the check a
    serving stack runs before swapping scorers ("do they even agree on
    what is relevant?"). Pure integer statistics (concordant /
    discordant pair counts, tau as numerator 2·C−P over denominator P)
    so the SQL twin replays them exactly with no float or
    negative-division semantics. Both input rankings are existing
    oracle-checked operators; the agreement fold walks ≤ k² pairs
    driver-side (k = 10). Columns (one row): n_common, union_n,
    n_concordant, n_discordant, tau_num, tau_den."""
    import pandas as pd

    b = bm25_topk(sf_dir, k=k)
    b = (b.to_pandas() if hasattr(b, "to_pandas") else b).copy()
    q = qlm_topk(sf_dir, k=k)
    q = (q.to_pandas() if hasattr(q, "to_pandas") else q).copy()
    b = b.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    b["rb"] = range(1, len(b) + 1)
    q = q.sort_values(["score_micro", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    q["rq"] = range(1, len(q) + 1)
    c = b[["doc_id", "rb"]].merge(q[["doc_id", "rq"]], on="doc_id")
    n = len(c)
    conc = disc = 0
    rows = list(zip(c["rb"], c["rq"]))
    for i in range(n):
        for j in range(i + 1, n):
            if (rows[i][0] < rows[j][0]) == (rows[i][1] < rows[j][1]):
                conc += 1
            else:
                disc += 1
    npairs = n * (n - 1) // 2
    return pd.DataFrame(
        [
            {
                "n_common": n,
                "union_n": len(b) + len(q) - n,
                "n_concordant": conc,
                "n_discordant": disc,
                "tau_num": 2 * conc - npairs,
                "tau_den": npairs,
            }
        ]
    )


def split_ngram_leakage(sf_dir: str, k: int = 8):
    """Train/test split-leakage audit (the Lee/Brown-et-al
    decontamination check applied to a SPLIT instead of a benchmark):
    how many distinct ``k``-gram shingles of the test parity (odd
    doc_ids) also occur in the train parity (even doc_ids). A high
    ``leak_micro`` (= ⌊shared·10⁶ / test-distinct⌋) means held-out
    metrics on this split are contaminated by verbatim overlap — the
    audit run before trusting any split-based eval (incl. this
    engine's own *_heldout LM queries, which train/score on exactly
    these parities).

    Scale shape: the dedup family's hashed shingle stream (8 bytes per
    shuffled row), ONE per-shingle bucketed aggregate folding the two
    presence flags (max), then a combiner partial-sum — the driver
    sees three integers. Columns (one row): n_train_ngrams,
    n_test_ngrams, n_shared, leak_micro."""
    from bioner_ray.stages.dedup import shingle_rows_batch
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def with_parity(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sh = shingle_rows_batch(t, k=k)
        if sh.num_rows == 0:
            return pa.table(
                {
                    "shingle": pa.array([], type=pa.uint64()),
                    "tr": pa.array([], type=pa.int64()),
                    "te": pa.array([], type=pa.int64()),
                }
            )
        par = pc.bit_wise_and(pc.cast(sh.column("doc_id"), pa.int64()), 1)
        return pa.table(
            {
                "shingle": sh.column("shingle"),
                "tr": pc.subtract(1, par),
                "te": par,
            }
        )

    flags = pin_schema(
        bucketed_aggregate(
            _documents(sf_dir).map_batches(with_parity, batch_format="pyarrow"),
            ["shingle"],
            [("tr", "max"), ("te", "max")],
        ),
        pa.schema(
            [("shingle", pa.uint64()), ("tr", pa.int64()), ("te", pa.int64())]
        ),
    )

    def partial_sums(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {
                    "n_train_ngrams": pa.array([], type=pa.int64()),
                    "n_test_ngrams": pa.array([], type=pa.int64()),
                    "n_shared": pa.array([], type=pa.int64()),
                }
            )
        tr = t.column("tr").to_numpy(zero_copy_only=False)
        te = t.column("te").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_train_ngrams": pa.array([int(tr.sum())], type=pa.int64()),
                "n_test_ngrams": pa.array([int(te.sum())], type=pa.int64()),
                "n_shared": pa.array([int((tr * te).sum())], type=pa.int64()),
            }
        )

    import pandas as pd

    sums = flags.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
    n_tr = int(sums["n_train_ngrams"].sum())
    n_te = int(sums["n_test_ngrams"].sum())
    n_sh = int(sums["n_shared"].sum())
    return pd.DataFrame(
        [
            {
                "n_train_ngrams": n_tr,
                "n_test_ngrams": n_te,
                "n_shared": n_sh,
                "leak_micro": (n_sh * 1000000) // n_te if n_te else 0,
            }
        ]
    )


def dedup_filter(sf_dir: str, threshold: float = 0.5):
    """The end-to-end corpus-hygiene composition a 100-TB run executes:
    exact Jaccard pairs → connected components → KEEP one document per
    near-dup cluster (the min-id representative) plus every document in
    no cluster. The non-representative set is bounded by the near-dup
    population, so it broadcasts via one ``ray.put`` and the corpus
    filter streams. Columns: doc_id."""
    import pyarrow.compute as pc
    import ray

    from bioner_ray.stages.dedup import jaccard_pairs
    from bioner_ray.stages.graph import connected_components

    comps = connected_components(_jaccard_pairs_memo(sf_dir, threshold))
    drop = [
        r["node"] for r in comps.take_all() if r["node"] != r["component"]
    ]  # bounded by the near-dup population
    # broadcast ONE Arrow array (zero-copy from the object store into
    # every task) and filter with the C++ is_in kernel — the keep filter
    # touches every corpus row, so no per-row Python here
    drop_ref = ray.put(pa.array(sorted(drop), type=pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        mask = pc.invert(pc.is_in(ids, value_set=ray.get(drop_ref)))
        return pa.table({"doc_id": ids.filter(mask)})

    return _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        keep, batch_format="pyarrow"
    )


def _cleaned_docs(
    sf_dir: str,
    threshold: float = 0.5,
    lang: str = "en",
    min_tokens: int = 20,
    min_ttr: float = 0.3,
):
    """The corpus-hygiene core: language gate → C4-style quality gate →
    near-dup dedup keeping one representative per cluster, returning
    the surviving (doc_id, text) stream. The cheap vectorized filters
    run FIRST so the shingle/dedup stage only shoulders survivors —
    the right order at 100 TB, where lang+quality drop most of the
    crawl before any shuffle. The survivor stream has multiple
    consumers (near-dup pair mining, the final keep filter, any
    downstream packing), so it is ``materialize()``d ONCE into the
    object store — the in-memory stand-in for the Parquet stage
    checkpoint a durable run writes (write_training_shards does
    exactly that); at cluster scale the object store spills blocks to
    disk rather than re-executing the whole gate per consumer."""
    import pyarrow.compute as pc
    import ray

    from bioner_ray.stages.dedup import jaccard_pairs
    from bioner_ray.stages.graph import connected_components
    from bioner_ray.stages.textstats import quality_filter_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    docs = docs.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], lang)), batch_format="pyarrow"
    )
    kept = quality_filter_stage(docs, min_tokens=min_tokens, min_ttr=min_ttr).materialize()
    comps = connected_components(jaccard_pairs(kept, threshold=threshold))
    drop = [r["node"] for r in comps.take_all() if r["node"] != r["component"]]
    drop_ref = ray.put(pa.array(sorted(drop), type=pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("doc_id"), value_set=ray.get(drop_ref)))
        return batch.filter(mask)

    return kept.select_columns(["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


def corpus_clean(
    sf_dir: str,
    threshold: float = 0.5,
    lang: str = "en",
    min_tokens: int = 20,
    min_ttr: float = 0.3,
):
    """The corpus-hygiene flagship (see ``_cleaned_docs``). Columns:
    doc_id."""
    return _cleaned_docs(
        sf_dir, threshold=threshold, lang=lang, min_tokens=min_tokens, min_ttr=min_ttr
    ).select_columns(["doc_id"])


def training_shards(sf_dir: str, budget: int = 2048, bucket_width: int = 64):
    """The end deliverable of a training-data run: the CLEANED corpus
    (lang → quality → near-dup dedup) packed into token-budget
    training shards via the distributed prefix sum
    (stages/sampling.py). Composition stays lazy and streaming; the
    materializing form is ``write_training_shards``. Columns: doc_id,
    n_tok, shard."""
    from bioner_ray.stages.sampling import token_shards as shards

    return shards(_cleaned_docs(sf_dir), budget=budget, bucket_width=bucket_width)


def write_training_shards(
    sf_dir: str, out_root: str, budget: int = 2048, resume: bool = True
) -> dict:
    """Checkpointed export: clean → checkpoint the survivor corpus →
    shard-assign (text carried through the one output shuffle) →
    Parquet partitioned by ``shard`` (resumable; one directory per
    shard, never one giant file)."""
    import os

    import ray.data as rd

    from bioner_ray.stages.sampling import token_shards as shards
    from bioner_ray.state import checkpoint as ckpt

    clean = ckpt.run_stage(
        out_root, "clean", lambda: _cleaned_docs(sf_dir), resume=resume
    )
    out_dir = os.path.join(out_root, "shards")
    if not (resume and ckpt.is_complete(out_root, "shards")):
        import json
        import shutil

        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)  # torn/previous write — idempotent rewrite
        os.makedirs(out_dir)
        assigned = shards(
            clean.select_columns(["doc_id", "text"]),
            budget=budget,
            passthrough_cols=("text",),
        )
        assigned.write_parquet(out_dir, partition_cols=["shard"])
        with open(os.path.join(out_dir, ckpt.MANIFEST), "w") as f:
            json.dump({"stage": "shards", "budget": budget}, f)
    check = rd.read_parquet(out_dir)
    return {"rows": check.count(), "out": out_dir}


def token_shards(sf_dir: str, budget: int = 2048, bucket_width: int = 64):
    """Token-budget training-shard packing via a two-level distributed
    prefix sum (stages/sampling.py). ``bucket_width=64`` keeps the
    multi-bucket path exercised even at sf0.001. Columns: doc_id,
    n_tok, shard."""
    from bioner_ray.stages.sampling import token_shards as shards

    return shards(_documents(sf_dir), budget=budget, bucket_width=bucket_width)


def weighted_sample(sf_dir: str, k: int = 50):
    """Deterministic weighted bottom-k sample over documents, weight =
    n_chars (priority sampling; stages/sampling.py). Columns: doc_id,
    weight, prio."""
    from bioner_ray.stages.sampling import weighted_sample_stage

    return weighted_sample_stage(
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"]), k=k
    )


def stratified_sample(sf_dir: str):
    """Deterministic per-language hash sampling: 50% of English docs,
    10% of everything else — the up/down-sampling mix step of a
    training-data run, reproducible on any cluster size. Columns:
    doc_id, lang."""
    from bioner_ray.stages.sampling import stratified_sample_stage

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample_stage(ds, rates_permille={"en": 500}, default_permille=100)


def decontaminate(sf_dir: str, n: int = 5):
    """Benchmark decontamination: the held-out "benchmark" is the
    deterministic doc_id % 97 == 0 slice; drop every other (train) doc
    sharing any word 5-gram with it — the planted near-dup clusters in
    the testdata make this non-trivial. Columns: doc_id."""
    import pyarrow.compute as pc

    from bioner_ray.stages.contamination import decontaminate_stage, eval_gram_set

    docs = _documents(sf_dir)

    def _is_eval(batch: pa.Table, want: bool) -> pa.Table:
        mask = batch.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 0
        return batch.filter(pa.array(mask if want else ~mask))

    ev_ref = eval_gram_set(
        docs.map_batches(lambda t: _is_eval(t, True), batch_format="pyarrow"), n=n
    )
    train = docs.map_batches(lambda t: _is_eval(t, False), batch_format="pyarrow")
    return decontaminate_stage(train, ev_ref, n=n).select_columns(["doc_id"])


def bloom_decontaminate(sf_dir: str, n: int = 5, m_bits: int = 1 << 20, k: int = 4):
    """Bloom-filter membership decontamination (stages/bloom.py) — the
    scale path when the eval gram STRING set is itself too big to
    broadcast: the filter ships m_bits/8 bytes regardless of gram
    count, at a known false-positive rate the SQL twin replays EXACTLY
    (the filter is the distinct eval bit-position set; a train gram
    hits iff all k of its seeded affine positions are present). Same
    eval split as ``decontaminate`` (doc_id % 97 == 0). Columns:
    doc_id, n_grams, n_hits, contaminated."""
    from bioner_ray.stages.bloom import bloom_contamination_stats, build_bloom

    docs = _documents(sf_dir)

    def _is_eval(batch: pa.Table, want: bool) -> pa.Table:
        mask = batch.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 0
        return batch.filter(pa.array(mask if want else ~mask))

    bloom_ref = build_bloom(
        docs.map_batches(lambda t: _is_eval(t, True), batch_format="pyarrow"),
        n=n, m_bits=m_bits, k=k,
    )
    train = docs.map_batches(lambda t: _is_eval(t, False), batch_format="pyarrow")
    return bloom_contamination_stats(train, bloom_ref, n=n, m_bits=m_bits, k=k)


def repetition_stats(sf_dir: str):
    """Gopher-style repetition signals. Columns: doc_id, n_tokens,
    top_token_frac, dup_bigram_frac."""
    from bioner_ray.stages.textstats import repetition_stats_stage

    return repetition_stats_stage(_documents(sf_dir))


def media_features(sf_dir: str, side: int = 16):
    """Multimodal pipeline driven end-to-end from the driver tables
    through a REAL image codec: each document's utf-8 bytes are encoded
    as a binary PGM payload (pad/truncate to side×side — a genuine
    netpbm file, not a reshape), then decoded + pooled to a feature
    vector on the image actor pool with ``decoder="auto"`` (the pure-
    numpy PGM/PPM/BMP parser in ``functions/codecs.py``; compressed
    formats remain the import-gated PIL seam). Rows-only check — the
    pooled random projection is not SQL-expressible. Columns:
    media_id, feat_norm, decoded_width, decoded_height."""
    import numpy as np

    from bioner_ray.functions.codecs import encode_pgm
    from bioner_ray.stages.multimodal import image_feature_stage

    def to_media(t: pa.Table) -> pa.Table:
        n = t.num_rows
        need = side * side
        payloads = []
        for s in t.column("text").to_pylist():
            raw = np.frombuffer((s or "").encode()[:need], dtype=np.uint8)
            if raw.size < need:
                raw = np.pad(raw, (0, need - raw.size))
            payloads.append(encode_pgm(raw.reshape(side, side)))
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "payload": pa.array(payloads, type=pa.binary()),
                "width": pa.array([side] * n, type=pa.int32()),
                "height": pa.array([side] * n, type=pa.int32()),
            }
        )

    from bioner_ray.pipelines.analytics import _nrows
    from bioner_ray.stages.pool import sized_pool

    media = _documents(sf_dir).map_batches(to_media, batch_format="pyarrow")
    pool = sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=8)

    def norm(t: pa.Table) -> pa.Table:
        feats = t.column("feature").to_pylist()
        import numpy as np

        return pa.table(
            {
                "media_id": t.column("media_id"),
                "feat_norm": pa.array(
                    [float(np.linalg.norm(f)) for f in feats], type=pa.float64()
                ),
                "decoded_width": t.column("decoded_width"),
                "decoded_height": t.column("decoded_height"),
            }
        )

    return image_feature_stage(
        media, decoder="auto", concurrency=pool, batch_size=64
    ).map_batches(norm, batch_format="pyarrow")


def wav_window_energy(sf_dir: str, window: int = 256):
    """Audio feature extraction through the REAL RIFF/WAVE codec with
    an EXACT integer feature set — the oracle-checked companion to the
    float RMS/ZCR stage (stages/multimodal.AudioFeatureExtractor):
    deterministic int16 PCM (sample k of doc i is
    ``(i·7919 + k·104729) mod 65536 − 32768``, 1024 + (i mod 4)·256
    samples) is ENCODED to genuine WAV bytes in the fixture step, then
    the query under test walks the RIFF chunks back (fmt/data parse,
    word alignment) and reduces each non-partial 256-sample window to
    int64 energy ``Σ s²`` and the within-window sign-change count —
    both integers, so the DuckDB twin re-derives them from the sample
    arithmetic bit-for-bit. Media-batch hygiene: payload rows are KBs
    here but MBs in production, so the stage runs at batch_size=64.
    Columns: doc_id, win_idx, sumsq, zc."""
    import numpy as np

    from bioner_ray.functions.codecs import decode_wav, encode_wav

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids.tolist():
            n = 1024 + (i % 4) * 256
            k = np.arange(n, dtype=np.int64)
            s = ((i * 7919 + k * 104729) % 65536 - 32768).astype(np.int16)
            payloads.append(encode_wav(s))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("win_idx", pa.int64()),
            ("sumsq", pa.int64()),
            ("zc", pa.int64()),
        ]
    )

    def features(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        ids_out, wins, sumsqs, zcs = [], [], [], []
        for i, p in zip(t.column("doc_id").to_pylist(), t.column("payload").to_pylist()):
            samples, _rate = decode_wav(p)
            v = samples[:, 0].astype(np.int64)
            nw = len(v) // window
            w = v[: nw * window].reshape(nw, window)
            ss = (w * w).sum(axis=1)
            zc = ((w[:, 1:] < 0) != (w[:, :-1] < 0)).sum(axis=1)
            ids_out.extend([i] * nw)
            wins.extend(range(nw))
            sumsqs.extend(ss.tolist())
            zcs.extend(zc.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids_out, type=pa.int64()),
                "win_idx": pa.array(wins, type=pa.int64()),
                "sumsq": pa.array(sumsqs, type=pa.int64()),
                "zc": pa.array(zcs, type=pa.int64()),
            },
            schema=out_schema,
        )

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return docs.map_batches(to_media, batch_format="pyarrow", batch_size=64).map_batches(
        features, batch_format="pyarrow", batch_size=64
    )


def bmp_luma_stats(sf_dir: str):
    """Image feature extraction through the REAL BMP codec with an
    EXACT integer feature: deterministic RGB rasters (channel c of
    pixel (y, x) of doc i is ``(i + y·w + x + 37c) mod 256``, dims
    ``w = 8 + i mod 5, h = 8 + i mod 3``) are ENCODED to genuine
    24-bit BMP bytes (stride padding, BGR order, bottom-up raster) in
    the fixture step; the query under test parses the header + raster
    back and reduces each image to its integer BT.601 luma sum — the
    same ``(299R + 587G + 114B + 500) // 1000`` the decoder pins, so
    the DuckDB twin replays it exactly from the pixel arithmetic.
    Columns: doc_id, width, height, luma_sum."""
    import numpy as np

    from bioner_ray.functions.codecs import decode_image, encode_bmp

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids.tolist():
            w, h = 8 + i % 5, 8 + i % 3
            y, x = np.mgrid[0:h, 0:w]
            base = i + y * w + x
            img = np.stack(
                [(base % 256), ((base + 37) % 256), ((base + 74) % 256)], axis=-1
            ).astype(np.uint8)
            payloads.append(encode_bmp(img))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("width", pa.int64()),
            ("height", pa.int64()),
            ("luma_sum", pa.int64()),
        ]
    )

    def stats(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        ids_out, ws, hs, sums = [], [], [], []
        for i, p in zip(t.column("doc_id").to_pylist(), t.column("payload").to_pylist()):
            luma = decode_image(p)
            ids_out.append(i)
            hs.append(luma.shape[0])
            ws.append(luma.shape[1])
            sums.append(int(luma.astype(np.int64).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "luma_sum": pa.array(sums, type=pa.int64()),
            },
            schema=out_schema,
        )

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return docs.map_batches(to_media, batch_format="pyarrow", batch_size=64).map_batches(
        stats, batch_format="pyarrow", batch_size=64
    )


def quality_docs(sf_dir: str, min_tokens: int = 20, min_ttr: float = 0.3):
    """C4-style quality gate: documents inside the token window with
    enough lexical diversity. Columns: doc_id."""
    from bioner_ray.stages.textstats import quality_filter_stage

    kept = quality_filter_stage(_documents(sf_dir), min_tokens=min_tokens, min_ttr=min_ttr)
    return kept.select_columns(["doc_id"])


def winnow_fingerprints(sf_dir: str, window: int = 5, stride: int = 4):
    """Winnowing document fingerprints (Schleimer et al. 2003) — the
    shift-tolerant near-dup signature, exploded to one row per selected
    hash so the DuckDB oracle value-matches every fingerprint (the
    Karp-Rabin recurrence's `& (2^61-1)` commutes through numpy's
    uint64 wrap, so SQL can replay it with HUGEINT intermediates).
    Columns: doc_id, fp; docs shorter than ``window`` tokens emit no
    rows."""
    from bioner_ray.stages.textstats import winnow_stage

    fps = winnow_stage(_documents(sf_dir), window=window, stride=stride)

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column("fingerprint")
        return pa.table(
            {
                "doc_id": pc.take(batch.column("doc_id"), pc.list_parent_indices(col)),
                "fp": pc.cast(pc.list_flatten(col), pa.int64()),
            }
        )

    return fps.map_batches(explode, batch_format="pyarrow")


def fingerprints(sf_dir: str):
    """Columns: doc_id, md5, n_bpe_tokens."""
    from bioner_ray.stages.textstats import fingerprint_stage

    return fingerprint_stage(_documents(sf_dir))


def langid(sf_dir: str):
    """Stopword-profile language ID (SQL twin generated from the same
    LANG_PROFILES). Columns: doc_id,
    pred_lang, lang_score."""
    from bioner_ray.stages.textstats import langid_stage

    return langid_stage(_documents(sf_dir))


def ccnet_buckets(sf_dir: str, scorer: str = "unigram"):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §3.3): per LANGUAGE, documents split into
    head/middle/tail terciles of per-token unigram surprise — the
    standard web-corpus quality partition a pretraining mix samples
    from (head = most fluent third under the corpus LM).

    ``scorer="bigram_heldout"`` is the PUBLISHED CCNet shape one step
    closer: the LM is trained on a held-out slice (the even doc_id
    parity) and every bucketed document is scored OUT-OF-SAMPLE by the
    capped add-one bigram model (doc_bigram_logprob's train_parity
    mode), per-bigram-normalized — so the tercile cuts partition only
    the odd parity, exactly as CCNet buckets a crawl against a
    Wikipedia-trained LM it was not part of.

    Composition: the langid stage and the doc_logprob scorer each
    stream their own pass; ONE doc_id-bucketed join lines them up; the
    per-doc score folds to an integer milli-nat bin (two positive
    floor divisions — trunc == floor, replayed verbatim in SQL), and
    the tercile cutoffs walk the (lang, bin) table — bounded by
    langs × surprise bins (physically ≲ 20k), never the corpus, the
    same driver-finish argument as value_percentiles. Cut rule: first
    bin with cumulative count ≥ ceil(n/3) / ceil(2n/3); ties share the
    lower bucket on both sides. Columns: lang, bucket, n_docs."""
    from bioner_ray.pipelines.analytics import doc_bigram_logprob, doc_logprob
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )
    from bioner_ray.stages.textstats import langid_stage

    if scorer == "unigram":
        lp_ds, count_col = doc_logprob(sf_dir), "n_tokens"
    elif scorer == "bigram_heldout":
        lp_ds, count_col = (
            doc_bigram_logprob(
                sf_dir, max_bigrams=4096, max_vocab=512, train_parity=0
            ),
            "n_bigrams",
        )
    else:
        raise ValueError(f"unknown scorer {scorer!r}")
    lid_schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
    lp_schema = pa.schema(
        [("doc_id", pa.int64()), (count_col, pa.int64()), ("logprob_micro", pa.int64())]
    )

    def lid_prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return lid_schema.empty_table()
        return pa.table(
            {"doc_id": t.column("doc_id"), "lang": t.column("pred_lang")}
        )

    lid = pin_schema(
        langid_stage(_documents(sf_dir)).map_batches(lid_prep, batch_format="pyarrow"),
        lid_schema,
    )
    lp = pin_schema(lp_ds, lp_schema)
    joined = bucketed_inner_join(lp, lid, ["doc_id"], lp_schema, lid_schema)

    bin_schema = pa.schema([("lang", pa.string()), ("bin", pa.int64())])

    def to_bin(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return bin_schema.empty_table()
        surprise = -t.column("logprob_micro").to_numpy(zero_copy_only=False)
        ntok = t.column(count_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {"lang": t.column("lang"), "bin": pa.array((surprise // ntok) // 1000)}
        )

    counts = bucketed_aggregate(
        with_ones(joined.map_batches(to_bin, batch_format="pyarrow")),
        ["lang", "bin"],
        [("one", "sum")],
    )
    rows = counts.take_all()  # bounded: langs x milli-nat surprise bins

    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["bin"], r["one"]))
    out_lang, out_bucket, out_n = [], [], []
    for lang in sorted(by_lang):
        bins = sorted(by_lang[lang])
        n = sum(c for _, c in bins)
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        cum, c1, c2 = 0, None, None
        for b, c in bins:
            cum += c
            if c1 is None and cum >= k1:
                c1 = b
            if c2 is None and cum >= k2:
                c2 = b
        agg = {"head": 0, "middle": 0, "tail": 0}
        for b, c in bins:
            agg["head" if b <= c1 else "middle" if b <= c2 else "tail"] += c
        for bucket in ("head", "middle", "tail"):
            if agg[bucket]:
                out_lang.append(lang)
                out_bucket.append(bucket)
                out_n.append(agg[bucket])
    return pa.table(
        {
            "lang": pa.array(out_lang, type=pa.string()),
            "bucket": pa.array(out_bucket, type=pa.string()),
            "n_docs": pa.array(out_n, type=pa.int64()),
        }
    )


def _min_source_from_footer(sf_dir: str) -> str | None:
    """min(source) straight from the parquet row-group statistics —
    zero data read. Returns None when any row group lacks min/max
    (pyarrow omits, never truncates, oversized binary stats at this
    writer version, so a present min is exact)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet"))
    idx = pf.schema_arrow.get_field_index("source")
    mins = []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        mins.append(st.min)
    return min(mins) if mins else None


def dsir_weights(sf_dir: str, k: int = 100, max_vocab: int | None = 262144):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    rank raw-pool documents by the log-likelihood ratio of a TARGET
    unigram model over a RAW unigram model — the data-selection score
    importance resampling draws against when building a domain mix.
    Target domain = the lexicographically smallest ``source`` (a real
    deployment passes its curated seed set — read from the parquet
    footer statistics, zero data scanned; the streaming min pass runs
    only when a writer omitted them); raw pool = every other source;
    both add-one models share the union vocabulary V.

    Shape: ONE corpus pass emits per-block (word, ct, cr) partials
    split by side, ONE bucketed aggregate folds them; the model tables
    collect driver-side and broadcast as a single delta dict; the
    score pass is the vectorized segment-sum kernel, integer
    micro-nats end to end (floor(ln·1e6) per word ONCE, libm log —
    both model logs floored separately so the SQL twin replays
    bit-for-bit); top-k by (weight desc, doc_id). ``max_vocab`` BOUNDS
    the model by DEFAULT (VERDICT r3, Next #3 — 2^18 classes; same
    shape as ``doc_logprob``): the top-K words by (ct+cr desc, word)
    survive a combiner-pruned distributed top-K — the driver only ever
    sees ≤ K rows, never the 10⁸⁺-string union vocabulary of a 100-TB
    corpus — and every other token scores through one shared OOV
    bucket per side carrying the remaining mass. ``max_vocab=None`` is
    the explicit small-corpus escape hatch (full union vocab collected
    driver-side). Both registered queries run bounded: ``dsir_weights``
    at the default (twin mirrors v = kept+1 capped math) and
    ``dsir_weights_capped`` at max_vocab=16, where the OOV bucket is
    live at every test scale (31-word fixture vocab) so the shared-mass
    math is hash-checked by the driver, not only by pytest.
    Columns: doc_id, n_tokens, weight_micro."""
    import math

    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate
    from bioner_ray.stages.textstats import _split_lower

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    target = _min_source_from_footer(sf_dir)
    if target is None:

        def src_min(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({"s": pa.array([pc.min(t.column("source")).as_py()])})

        target = min(
            r["s"]
            for r in _read(sf_dir, "documents", columns=["source"])
            .map_batches(src_min, batch_format="pyarrow")
            .take_all()
        )

    def counts_partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, list[int]] = {}
        srcs = batch.column("source").to_pylist()
        for toks, src in zip(_split_lower(batch, "text"), srcs):
            i = 0 if src == target else 1
            for t in toks:
                e = counts.get(t)
                if e is None:
                    counts[t] = e = [0, 0]
                e[i] += 1
        return pa.table(
            {
                "w": pa.array(list(counts.keys()), type=pa.string()),
                "ct": pa.array([v[0] for v in counts.values()], type=pa.int64()),
                "cr": pa.array([v[1] for v in counts.values()], type=pa.int64()),
            }
        )

    counts = bucketed_aggregate(
        docs.map_batches(counts_partial, batch_format="pyarrow"),
        ["w"],
        [("ct", "sum"), ("cr", "sum")],
    )
    if max_vocab is None:
        vocab = counts.to_pandas()
        v = float(len(vocab))
        nt = float(vocab["ct"].sum())
        nr = float(vocab["cr"].sum())
        oov_delta = 0  # unreachable: the union model covers its corpus
    else:
        from bioner_ray.stages.rank import top_k_per_group
        from bioner_ray.stages.shuffle import pin_schema

        counts = pin_schema(
            counts,
            pa.schema([("w", pa.string()), ("ct", pa.int64()), ("cr", pa.int64())]),
        ).materialize()
        nt = float(counts.sum("ct"))
        nr = float(counts.sum("cr"))

        def grp(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "tot",
                pa.compute.add(t.column("ct"), t.column("cr")),
            )
            return t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

        # combiner-pruned GLOBAL top-K: ≤ K rows leave each block, the
        # driver sees ≤ K rows total — never the full union vocabulary
        vocab = top_k_per_group(
            counts.map_batches(grp, batch_format="pyarrow"),
            key_col="_g",
            order_by=[("tot", "descending"), ("w", "ascending")],
            k=max_vocab,
        ).to_pandas()
        # classes = kept words + ONE shared OOV bucket (add-one over all)
        v = float(len(vocab)) + 1.0
        oov_delta = math.floor(
            math.log((nt - float(vocab["ct"].sum()) + 1.0) / (nt + v)) * 1000000.0
        ) - math.floor(
            math.log((nr - float(vocab["cr"].sum()) + 1.0) / (nr + v)) * 1000000.0
        )
    delta = {
        w: math.floor(math.log((float(ct) + 1.0) / (nt + v)) * 1000000.0)
        - math.floor(math.log((float(cr) + 1.0) / (nr + v)) * 1000000.0)
        for w, ct, cr in zip(vocab["w"], vocab["ct"], vocab["cr"])
    }
    delta_ref = ray.put(delta)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("weight_micro", pa.int64())]
    )

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        lut = ray.get(delta_ref)
        batch = batch.filter(pc.invert(pc.equal(batch.column("source"), target)))
        if batch.num_rows == 0:
            return out_schema.empty_table()
        # same vectorized split-offset segment-sum kernel as doc_logprob
        split = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(batch.column("text"), "")), r"\s+"
        ).combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(off) - 1
        vals = pd.Series(split.values.slice(off[0], off[-1] - off[0]).to_pylist())
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(off))
        keep = (vals != "").to_numpy()
        toks = vals[keep]
        d = doc_idx[keep]
        sums = np.zeros(n_docs, dtype=np.int64)
        cnts = np.zeros(n_docs, dtype=np.int64)
        if len(toks):
            micro = toks.map(lut).fillna(oov_delta).to_numpy(dtype=np.int64)
            np.add.at(sums, d, micro)
            np.add.at(cnts, d, 1)
        nz = cnts > 0
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz], type=pa.int64()),
                "n_tokens": pa.array(cnts[nz]),
                "weight_micro": pa.array(sums[nz]),
            }
        )

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["weight_micro", "doc_id"], descending=[True, False])
        .limit(k)
    )


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


def knn_graph_query(sf_dir: str, k: int = 5):
    """Exact k-NN graph over the embeddings table (stages/similarity.py
    knn_graph — broadcast-corpus block matmul, per-batch complete
    answers, size-gated with IVF as the scale path). Columns: vec_id,
    nbr_id, rank, score_r (6 dp for oracle bit-match, the knn_topk
    convention)."""
    from bioner_ray.stages.similarity import knn_graph

    out = knn_graph(_read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), k=k)
    return out.map_batches(
        lambda t: pa.table(
            {
                "vec_id": t.column("vec_id"),
                "nbr_id": t.column("nbr_id"),
                "rank": t.column("rank"),
                "score_r": pa.compute.round(t.column("score"), ndigits=6),
            }
        )
        if t.num_columns
        else pa.schema(
            [
                ("vec_id", pa.int64()),
                ("nbr_id", pa.int64()),
                ("rank", pa.int64()),
                ("score_r", pa.float64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )


def knn_ivf_topk(sf_dir: str, k: int = 10, n_queries: int = 8):
    """IVF approximate top-k (golden-parquet oracle — deterministic across
    worker counts via the 9-dp score rounding in the block scan; recall
    vs brute force asserted in tests). Columns: query_id, vec_id, rank,
    score."""
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


def encoding_stats(sf_dir: str, dim: int = 32):
    """M6/A1 token-embedding encoder (hash backend) through the real
    actor pool (golden-parquet oracle: the CRC32 feature hashing is not
    SQL-replayable). One row per document: url, n_vectors (== tokens),
    dim, checksum (sum of all vector components, rounded — stable
    because per-doc summation order is fixed)."""
    import pyarrow.compute as pc

    from bioner_ray.pipelines.analytics import _nrows, documents_as_pages
    from bioner_ray.stages.encode import encode_stage
    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.segment import segment_stage

    docs = segment_stage(documents_as_pages(sf_dir), with_offsets=False)
    # work-aware pool that still leaves CPUs for the read/segment tasks —
    # a pool equal to the whole cluster deadlocks the streaming executor
    encoded = encode_stage(
        docs, backend="hash", dim=dim,
        concurrency=sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=8),
    )

    def stats(batch: pa.Table) -> pa.Table:
        enc = batch.column("encodings")
        n_vec, checksum = [], []
        for doc in enc.to_pylist():
            total = 0
            acc = 0.0
            for sent in doc:
                total += len(sent)
                if sent:
                    acc += float(np.sum(np.asarray(sent, dtype=np.float64)))
            n_vec.append(total)
            checksum.append(round(acc, 4))
        return pa.table(
            {
                "url": batch.column("url"),
                "n_vectors": pa.array(n_vec, type=pa.int64()),
                "dim": pa.array([dim] * batch.num_rows, type=pa.int64()),
                "checksum": pa.array(checksum, type=pa.float64()),
            }
        )

    return encoded.map_batches(stats, batch_format="pyarrow")


TINY_FASTTEXT_BIN = "/root/repo/tests/golden/tiny_fasttext.bin"


def encoding_fasttext(sf_dir: str, model_path: str = TINY_FASTTEXT_BIN):
    """M6/A1 with the REAL fastText encode path: the checked-in tiny
    ``.bin`` (tools/make_fasttext_fixture.py) loads ONCE per actor via
    the pure-numpy reader (functions/fasttext_io.py — the published
    file layout, vocab + subword-bucket lookups, parity-pinned against
    the wheel), and every token becomes its model vector
    (fasttext_encoder.py:17-28 semantics). Vectors depend only on the
    token string, so the per-doc stats are deterministic across runs
    AND worker counts; the oracle is a golden expected-output parquet
    (tools/make_encoding_golden.py), keyed like datexis_mentions.
    ``checksum_q`` is the per-doc component sum quantized to integer
    micro-units — exact, no float display rounding. Columns: url,
    n_vectors, checksum_q."""
    from bioner_ray.pipelines.analytics import _nrows, documents_as_pages
    from bioner_ray.stages.encode import encode_stage
    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.segment import segment_stage

    docs = segment_stage(documents_as_pages(sf_dir), with_offsets=False)
    encoded = encode_stage(
        docs, backend="fasttext-bin", model_path=model_path,
        concurrency=sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=8),
    )

    def stats(batch: pa.Table) -> pa.Table:
        n_vec, checksum_q = [], []
        for doc in batch.column("encodings").to_pylist():
            total = 0
            acc = 0.0
            for sent in doc:
                total += len(sent)
                if sent:
                    acc += float(np.sum(np.asarray(sent, dtype=np.float64)))
            n_vec.append(total)
            checksum_q.append(int(round(acc * 1_000_000.0)))
        return pa.table(
            {
                "url": batch.column("url"),
                "n_vectors": pa.array(n_vec, type=pa.int64()),
                "checksum_q": pa.array(checksum_q, type=pa.int64()),
            }
        )

    return encoded.map_batches(stats, batch_format="pyarrow")


def pubtator_conll(sf_dir: str):
    """S6 PubTator→CoNLL, natively (no bconv): build a deterministic
    PubTator block per document (title ``doc <8-digit id>``, abstract =
    text, one single-token annotation per whitespace token whose
    lowercase form is a gazetteer entity surface, with real char
    offsets), round-trip it through the FORMAT (format → parse), then
    convert to S1-shaped CoNLL documents and count tags. Columns:
    doc_id, n_tokens, n_b, n_i, n_annotations."""
    import pyarrow.compute as pc

    from bioner_ray.functions.bio import B as TAG_B, I as TAG_I
    from bioner_ray.functions.text import tokenize_with_offsets
    from bioner_ray.pipelines.analytics import ENTITY_SURFACES
    from bioner_ray.sources.pubtator import (
        format_pubtator_document,
        parse_pubtator,
        pubtator_doc_to_conll,
    )

    entity_set = frozenset(ENTITY_SURFACES)

    def convert(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_tokens, n_b, n_i, n_ann = [], [], [], []
        for doc_id, text in zip(doc_ids, texts):
            title = f"doc {doc_id:08d}"
            fulltext = title + " " + (text or "")
            toks, starts, ends = tokenize_with_offsets(fulltext)
            anns = [
                {"start": s, "end": e, "mention": t, "type": "ENT", "concept_id": t.lower()}
                for t, s, e in zip(toks, starts, ends)
                if t.lower() in entity_set
            ]
            block = format_pubtator_document(
                {"pmid": str(doc_id), "title": title, "abstract": text or "", "annotations": anns}
            )
            (doc,) = parse_pubtator(block)  # exercise the format round-trip
            conll = pubtator_doc_to_conll(doc, doc_id)
            tags = [g for s in conll["sentences"] for g in s["gold_tags"]]
            n_tokens.append(len(tags))
            n_b.append(sum(1 for g in tags if g == TAG_B))
            n_i.append(sum(1 for g in tags if g == TAG_I))
            n_ann.append(len(doc["annotations"]))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "n_b": pa.array(n_b, type=pa.int64()),
                "n_i": pa.array(n_i, type=pa.int64()),
                "n_annotations": pa.array(n_ann, type=pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(convert, batch_format="pyarrow")


def dup_span_stats(sf_dir: str, w: int = 5):
    """Per-doc duplicated-window fraction (Lee-et-al-style substring
    dedup signal, stages/spans.py). Columns: doc_id, n_windows, n_dup,
    dup_frac."""
    from bioner_ray.stages.spans import dup_span_stats as stats

    return stats(_documents(sf_dir), w=w)


def kg_incremental_edges(sf_dir: str):
    """Incremental KG edge ingest (pipelines/ingest.py): the corpus
    arrives as two shards, each ingested once into a persistent
    partitioned edge store (idempotent retry asserted as a no-op); the
    merged store is provably the batch kg_edges result and shares its
    DuckDB oracle. Columns: subj, pred, obj, weight, first_url."""
    from bioner_ray.pipelines.ingest import kg_incremental_edges as _kie

    return _kie(sf_dir)


def incremental_dedup(sf_dir: str, split_at: int = 250):
    """Incremental ingest demo over the driver table: docs below
    ``split_at`` form the existing corpus (band-hash store on scratch
    disk), the rest arrive as a new shard; the result is every LSH
    candidate pair INVOLVING a new doc — old×new via one store join,
    new×new in-shard — without re-shingling the old corpus
    (pipelines/ingest.py). SQL-oracled: the minhash DuckDB twin
    filtered to pairs involving a new doc. Columns: a, b, n_bands,
    est_jaccard."""
    import tempfile

    import pyarrow.compute as pc

    from bioner_ray.pipelines.ingest import ingest_shard, init_store

    docs = _documents(sf_dir)

    def _half(batch: pa.Table, old: bool) -> pa.Table:
        mask = pc.less(batch.column("doc_id"), split_at)
        return batch.filter(mask if old else pc.invert(mask))

    store = tempfile.mkdtemp(prefix="bandstore-")
    init_store(docs.map_batches(lambda t: _half(t, True), batch_format="pyarrow"), store)
    return ingest_shard(
        docs.map_batches(lambda t: _half(t, False), batch_format="pyarrow"),
        store,
        shard_name="delta",
    )


def doc_top_terms(sf_dir: str, k: int = 3):
    """Most distinctive terms per document — the integer-exact TF-IDF
    shape: rank each doc's terms by (tf DESC, df ASC, term ASC), keep
    the top ``k``. Integer ordering (rarest term wins ties, then
    lexicographic) keeps the result exactly SQL-replayable where a
    float tf·idf score would tie-break on ulps.

    Scale shape — two token-level wide steps, both combiner-pruned:
    (1) tf: ``bucketed_aggregate`` over (doc_id, term) — the shuffle
    moves one combined row per distinct doc-term per block; (2) df:
    the tf rows are already distinct (doc, term), so document
    frequency is a second bucketed count over term (the two-level
    count-distinct pattern). df joins back on term via the shuffle
    hash join (token-scale both sides — no broadcast of an unbounded
    vocab), and the per-doc rank is stages/rank.py's pruned top-k
    (shuffle ≤ k rows per (block, doc)). Columns: doc_id, term, tf,
    df, rk."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.textstats import _split_lower

    def tok_rows(batch: pa.Table) -> pa.Table:
        toks = _split_lower(batch, "text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        counts = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, counts)),
                "term": pa.array(
                    [w for ts in toks for w in ts], type=pa.string()
                ),
            }
        )

    tok = _documents(sf_dir).map_batches(tok_rows, batch_format="pyarrow")
    # Aggregate outputs can contain schema-less empty reduce blocks
    # (pin_schema contract); pin before select_columns and the join.
    tf_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
    )
    tf = pin_schema(
        bucketed_aggregate(with_ones(tok, "tf"), ["doc_id", "term"], [("tf", "sum")]),
        tf_schema,
    )
    df = pin_schema(
        bucketed_aggregate(
            with_ones(tf.select_columns(["term"]), "df"), ["term"], [("df", "sum")]
        ),
        pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )
    from bioner_ray.stages.shuffle import bucketed_inner_join

    top = top_k_per_group(
        bucketed_inner_join(
            tf, df, ["term"], tf_schema,
            pa.schema([("term", pa.string()), ("df", pa.int64())]),
        ),
        key_col="doc_id",
        order_by=[("tf", "descending"), ("df", "ascending"), ("term", "ascending")],
        k=k,
    )
    out_schema = pa.schema(list(tf_schema) + [("df", pa.int64()), ("rk", pa.int64())])
    return pin_schema(top, out_schema)


def source_quota(sf_dir: str, cap: int = 10):
    """Per-source document cap (RefinedWeb-style source balancing for a
    crawl mix): keep the first ``cap`` docs per source in deterministic
    doc_id order. Reuses the pruned per-group top-k (stages/rank.py):
    each block forwards at most ``cap`` rows per (block, source), so a
    source with a billion pages costs the shuffle cap × blocks rows,
    never its full count. Columns: doc_id, source, rk."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import pin_schema

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    top = top_k_per_group(docs, "source", [("doc_id", "ascending")], cap)
    return pin_schema(
        top,
        pa.schema([("doc_id", pa.int64()), ("source", pa.string()), ("rk", pa.int64())]),
    )


def upsample_mix(sf_dir: str):
    """Fractional-epoch data mixing (stages/sampling.py): sources src0
    and src1 trained for "2.5 epochs" (2500 permille), src2 for 1.5,
    everything else downsampled to 0.4 — each doc deterministically
    replicated floor(w) times plus a hash-drawn fractional copy.
    Columns: doc_id, source, copy (1-based replica index)."""
    from bioner_ray.stages.sampling import upsample_mix_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return upsample_mix_stage(
        docs,
        weights_permille={"src0": 2500, "src1": 2500, "src2": 1500},
        default_permille=400,
    )


def jsonl_roundtrip(sf_dir: str):
    """JSONL sink→source parity as a distributed query: the documents
    table is written as JSON-lines (one file per block — the resumable
    layout) and read back with the pyarrow JSON parser; the value-hash
    match against the parquet source pins byte fidelity of text through
    JSON encode/decode (quotes, backslashes, control chars, non-ASCII).
    Columns: doc_id, text, lang, source."""
    import os
    import shutil
    import uuid

    import ray.data as rd

    from bioner_ray.sources.jsonl import read_jsonl, write_jsonl

    path = os.path.join("/tmp/bioner_jsonl", uuid.uuid4().hex)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    cols = ["doc_id", "text", "lang", "source"]
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=cols)
    write_jsonl(docs, path)
    return read_jsonl(path, columns=cols)


def csv_roundtrip(sf_dir: str):
    """CSV sink→source parity over the events table (numeric/timestamp
    typed columns — the round trip pins quoting, timestamp formatting
    and numeric re-inference; text columns with embedded newlines are
    JSONL's job, jsonl_roundtrip). Columns: event_id, user_id,
    event_type, value."""
    import os
    import shutil
    import uuid

    import ray.data as rd

    from bioner_ray.sources.jsonl import read_csv, write_csv

    path = os.path.join("/tmp/bioner_csv", uuid.uuid4().hex)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    cols = ["event_id", "user_id", "event_type", "value"]
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"), columns=cols)
    write_csv(ev, path)
    return read_csv(path, columns=cols)


def pii_scrub(sf_dir: str):
    """PII redaction audit over the documents table (stages/scrub.py —
    vectorized RE2 count+replace for emails, phones, IPv4s, applied
    sequentially). The synthetic corpus is PII-free by construction, so
    the query first lays down a DETERMINISTIC doc_id-derived PII layer
    (every 3rd doc an email, 4th a phone, 5th an IP — pure Arrow
    int→string concat, mirrored byte-for-byte by the SQL twin's CASE
    chain); the operator under test is the scrub itself, which both
    sides then replay on identical bytes. Columns: doc_id, n_email,
    n_phone, n_ip, clean_len, clean_text."""
    import numpy as np
    import pyarrow.compute as pc

    from bioner_ray.stages.scrub import pii_scrub_stage

    def augment(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)

        def snum(x: np.ndarray) -> np.ndarray:
            return x.astype(np.int64).astype("U20")

        def cat(*parts):
            out = parts[0]
            for p in parts[1:]:
                out = np.char.add(out, p)
            return out

        empty = np.full(len(d), "", dtype="U1")
        email = np.where(
            d % 3 == 0,
            cat(" reach user", snum(d), "@mail", snum(d % 7), ".example.com"),
            empty,
        )
        phone = np.where(
            d % 4 == 0,
            cat(" call ", snum(100 + d % 900), "-555-", snum(1000 + d % 9000)),
            empty,
        )
        ip = np.where(
            d % 5 == 0,
            cat(" from 10.", snum(d % 256), ".", snum((d // 7) % 256), ".", snum(d % 100)),
            empty,
        )
        text = pc.binary_join_element_wise(
            pc.cast(t.column("text"), pa.string()),
            pa.array(email),
            pa.array(phone),
            pa.array(ip),
            "",
        )
        return pa.table({"doc_id": t.column("doc_id"), "text": text})

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        augment, batch_format="pyarrow"
    )
    return pii_scrub_stage(ds)


def heavy_hitters(sf_dir: str, depth: int = 4, width: int = 64, seed: int = 7):
    """Count-min-sketch word-frequency estimates over the documents
    table (stages/sketch.py cms_word_counts/cms_estimates): the
    mergeable heavy-hitters synopsis whose exchange is depth×width
    registers per block regardless of vocabulary size. ``width=64``
    keeps collisions REAL at fixture vocabulary (the estimate path is
    exercised, not a pass-through); production sizing in the stage
    docstring. Columns: word, est."""
    from bioner_ray.stages.sketch import cms_estimates, cms_word_counts

    docs = _read(sf_dir, "documents", columns=["text"])
    regs, words = cms_word_counts(docs, depth=depth, width=width, seed=seed)
    return cms_estimates(regs, words, depth=depth, width=width, seed=seed)


ORDERS_PROFILE_COLUMNS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderdate",
    "o_orderpriority",
]


def orders_profile(sf_dir: str):
    """Exact column profile of the orders table (stages/profile.py):
    per-column row/null/distinct counts — the data-quality gate run on
    every table drop. Float columns are excluded by the stage's
    injective-surrogate contract. Columns: column, n_rows, n_nulls,
    n_distinct."""
    from bioner_ray.stages.profile import profile_columns

    return profile_columns(
        _read(sf_dir, "orders", columns=ORDERS_PROFILE_COLUMNS),
        ORDERS_PROFILE_COLUMNS,
    )


def doc_length_deciles(sf_dir: str):
    """Equi-depth binning of document length (n_chars): exact decile
    cutoffs computed DISTRIBUTED (one bucketed aggregate over distinct
    lengths — bounded by the length domain, never doc count), then
    broadcast (9 ints) into a second streaming pass that assigns and
    counts per bin. Cutoff rule = quantile_disc's "first value with
    cumulative count ≥ ceil(p·n)" (the value_percentiles verified
    contract); assignment d = 1 + #{cutoffs < x} so ties land in the
    lower bin on both sides. Duplicate cutoffs leave their bins empty
    (no row) identically in Ray and SQL. Columns: decile, n_docs,
    lo_chars, hi_chars."""
    import pyarrow.compute as pc  # noqa: F401  (vectorized kernels below)

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    hist_schema = pa.schema([("n_chars", pa.int64()), ("one", pa.int64())])
    docs = _read(sf_dir, "documents", columns=["n_chars"])
    hist = pin_schema(
        bucketed_aggregate(
            with_ones(
                docs.map_batches(
                    lambda t: pa.table(
                        {"n_chars": t.column("n_chars").cast(pa.int64())}
                    ),
                    batch_format="pyarrow",
                )
            ),
            ["n_chars"],
            [("one", "sum")],
            num_buckets=16,
        ),
        hist_schema,
    ).take_all()  # bounded: distinct length values
    if not hist:
        return pa.table(
            {
                "decile": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
                "lo_chars": pa.array([], type=pa.int64()),
                "hi_chars": pa.array([], type=pa.int64()),
            }
        )
    vals = sorted((int(r["n_chars"]), int(r["one"])) for r in hist)
    n = sum(c for _, c in vals)
    cuts = []
    for p in range(1, 10):
        target = (p * n + 9) // 10  # ceil(p/10 * n), exact ints
        cum = 0
        for v, c in vals:
            cum += c
            if cum >= target:
                cuts.append(v)
                break
    cuts_arr = np.array(cuts, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        x = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        d = 1 + (x[:, None] > cuts_arr[None, :]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "decile": pa.array(d),
                "n_docs": pa.array(np.ones(len(x), dtype=np.int64)),
                "lo_chars": pa.array(x),
                "hi_chars": pa.array(x),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            docs.map_batches(assign, batch_format="pyarrow"),
            ["decile"],
            [("n_docs", "sum"), ("lo_chars", "min"), ("hi_chars", "max")],
            num_buckets=16,
        ),
        pa.schema(
            [
                ("decile", pa.int64()),
                ("n_docs", pa.int64()),
                ("lo_chars", pa.int64()),
                ("hi_chars", pa.int64()),
            ]
        ),
    )


def collocations(sf_dir: str, k: int = 20, min_count: int = 10):
    """PMI collocation mining (stages/colloc.py): top-k adjacent-token
    bigrams by pointwise mutual information, support ≥ min_count.
    Columns: a, b, n_ab, pmi_micro."""
    from bioner_ray.stages.colloc import collocations as _colloc

    return _colloc(_read(sf_dir, "documents", columns=["text"]), k=k, min_count=min_count)


def embedding_gram(sf_dir: str):
    """Exact integer Gram matrix of the embeddings table
    (stages/cluster.gram_matrix): the one-pass second-moment reduction
    under PCA/whitening. Columns: i, j, gram_sum."""
    from bioner_ray.stages.cluster import gram_matrix

    return gram_matrix(_read(sf_dir, "embeddings", columns=["embedding"]))


def embedding_pca(sf_dir: str, iters: int = 3):
    """Top principal direction of the embeddings table via fixed-round
    integer power iteration (stages/cluster.pca_top_component): ONE
    streaming Gram pass distributes the data work; the d×d iteration
    is dimension-bounded driver math in exact big-ints, truncating
    division matching DuckDB's ``//`` so the unrolled twin replays
    bit-for-bit. Columns: dim, loading."""
    from bioner_ray.stages.cluster import pca_top_component

    return pca_top_component(
        _read(sf_dir, "embeddings", columns=["embedding"]), iters=iters
    )


def embedding_kmeans(sf_dir: str, k: int = 4, iters: int = 2):
    """Deterministic integer k-means over the embeddings table
    (stages/cluster.py kmeans_assign — micromark quantization, smallest-
    ids init, exact floor-div centroid updates, fixed rounds): the
    corpus topic-sharding / IVF-coarse-quantizer build. Columns:
    vec_id, cluster, dist2."""
    from bioner_ray.stages.cluster import kmeans_assign

    return kmeans_assign(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        k=k,
        iters=iters,
    )


def embedding_outliers(sf_dir: str, topk: int = 5):
    """Per-label centroid-distance audit: for every label, the
    ``topk`` vectors farthest (squared micromark distance) from their
    own label's integer centroid — the mislabeled-vector / poisoned-
    example screen a training-data pipeline runs before contrastive
    sampling trusts the labels.

    Exactness: the kmeans contract end-to-end — floor(x·1e6)
    quantization (stages/cluster._qmatrix), per-(label, dim) int64
    sums via ONE combiner-pruned aggregate, centroid = the
    sign-convention-proof floor division shared verbatim with the SQL
    twin, distances as exact int64. The centroid table is bounded
    (labels × dims) and collected once, broadcast via a single
    ``ray.put``; scoring is one vectorized streaming pass; the finish
    is the combiner-pruned per-group top-k (stages/rank.py). Columns:
    label, vec_id, d2, rk."""
    import ray

    from bioner_ray.stages.cluster import _floor_div_exact, _qmatrix
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    emb_ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    part_schema = pa.schema(
        [("label", pa.int64()), ("dim", pa.int64()), ("s", pa.int64()), ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        X = _qmatrix(t, "embedding")
        if X.shape[0] == 0:
            return part_schema.empty_table()
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        dims = X.shape[1]
        sums = np.zeros((len(ulab), dims), dtype=np.int64)
        np.add.at(sums, inv, X)
        counts = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, dims)),
                "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64), len(ulab))),
                "s": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(counts, dims)),
            }
        )

    cent_rows = (
        pin_schema(
            bucketed_aggregate(
                emb_ds.map_batches(partial, batch_format="pyarrow"),
                ["label", "dim"],
                [("s", "sum"), ("n", "sum")],
            ),
            part_schema,
        )
        # bounded: labels × dims rows
        .take_all()
    )
    out_schema = pa.schema(
        [
            ("label", pa.int64()),
            ("vec_id", pa.int64()),
            ("d2", pa.int64()),
            ("rk", pa.int64()),
        ]
    )
    if not cent_rows:  # empty embeddings table: typed empty result
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())
    labels_sorted = sorted({r["label"] for r in cent_rows})
    dims = max(r["dim"] for r in cent_rows) + 1
    S = np.zeros((len(labels_sorted), dims), dtype=np.int64)
    N = np.zeros((len(labels_sorted), dims), dtype=np.int64)
    pos = {lab: i for i, lab in enumerate(labels_sorted)}
    for r in cent_rows:
        S[pos[r["label"]], r["dim"]] = r["s"]
        N[pos[r["label"]], r["dim"]] = r["n"]
    cent_ref = ray.put((np.array(labels_sorted, dtype=np.int64), _floor_div_exact(S, N)))

    score_schema = pa.schema(
        [("label", pa.int64()), ("vec_id", pa.int64()), ("d2", pa.int64())]
    )

    def score(t: pa.Table) -> pa.Table:
        X = _qmatrix(t, "embedding")
        if X.shape[0] == 0:
            return score_schema.empty_table()
        labels, C = ray.get(cent_ref)
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        diff = X - C[np.searchsorted(labels, lab)]
        return pa.table(
            {
                "label": pa.array(lab),
                "vec_id": pa.array(
                    t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "d2": pa.array(np.einsum("ij,ij->i", diff, diff)),
            }
        )

    scored = pin_schema(emb_ds.map_batches(score, batch_format="pyarrow"), score_schema)
    return pin_schema(
        top_k_per_group(scored, "label", [("d2", "descending"), ("vec_id", "ascending")], topk),
        out_schema,
    )


def embedding_pq(sf_dir: str, m: int = 4, k: int = 4, iters: int = 2):
    """Product-quantization codes over the embeddings table
    (stages/cluster.py pq_codes — per-subspace deterministic integer
    Lloyd, all codebooks trained in the same streaming passes): the
    compressed-ANN storage layout. Long form, one row per (vector,
    subspace). Columns: vec_id, sub, code, dist2."""
    from bioner_ray.stages.cluster import pq_codes

    return pq_codes(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        m=m,
        k=k,
        iters=iters,
    )


#: BM25 query bag — mid-frequency vocabulary terms, pinned so the SQL
#: twin inlines the identical strings
BM25_TERMS = ["customer", "join", "window"]


def bm25_topk(sf_dir: str, k: int = 10):
    """Okapi BM25 top-k retrieval over the documents table for the
    pinned query bag (stages/retrieval.py — exact integer counts,
    libm-pinned idf, literal-constant float composition; scores replay
    bit-for-bit in SQL). Columns: doc_id, dl, score."""
    from bioner_ray.stages.retrieval import bm25_topk as _bm25

    return _bm25(_documents(sf_dir), terms=BM25_TERMS, k=k)


def bpe_merges(sf_dir: str, n_merges: int = 8):
    """Learn the first ``n_merges`` BPE merges over the document corpus
    (Sennrich subword tokenizer training). One corpus pass builds the
    word vocab; each round is one vectorized vocab pass + a tiny
    aggregate. Columns: round, lhs, rhs, pair_count."""
    from bioner_ray.stages.bpe import bpe_merges as _bpe

    return _bpe(_read(sf_dir, "documents", columns=["text"]), n_merges=n_merges)


def bpe_token_counts(sf_dir: str, n_merges: int = 8, k: int = 20):
    """Apply the learned BPE merges corpus-wide (via the segmented
    vocab — application never re-reads documents) and report the top-k
    subword tokens. Columns: token, token_count."""
    from bioner_ray.stages.bpe import bpe_token_counts as _bpe_counts

    return _bpe_counts(
        _read(sf_dir, "documents", columns=["text"]), n_merges=n_merges, k=k
    )


def source_lang_rollup(sf_dir: str):
    """Hierarchical corpus report (GROUP BY ROLLUP(source, lang)): doc
    counts and char mass at (source, lang), per-source subtotal, and
    grand total — the OLAP-cube slice every corpus audit publishes.
    Engine shape: ONE bucketed aggregate at the finest grain, then the
    coarser levels re-aggregate THAT (bounded by distinct combos, never
    the corpus) — the two extra levels are combos-sized, so the rollup
    costs one data pass regardless of depth. Subtotal keys use the
    'ALL' sentinel (no NULL-vs-NULL compare ambiguity). Columns:
    source, lang, n_docs, sum_chars."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    fine_schema = pa.schema(
        [
            ("source", pa.string()),
            ("lang", pa.string()),
            ("n_docs", pa.int64()),
            ("sum_chars", pa.int64()),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "source": pc.cast(t.column("source"), pa.string()),
                "lang": pc.cast(t.column("lang"), pa.string()),
                "sum_chars": pc.cast(t.column("n_chars"), pa.int64()),
            }
        )

    docs = _read(sf_dir, "documents", columns=["source", "lang", "n_chars"])
    fine = pin_schema(
        bucketed_aggregate(
            with_ones(docs.map_batches(prep, batch_format="pyarrow"), "n_docs"),
            ["source", "lang"],
            [("n_docs", "sum"), ("sum_chars", "sum")],
        ),
        fine_schema,
    )

    def all_lang(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "lang": pa.array(["ALL"] * t.num_rows, type=pa.string()),
                "n_docs": t.column("n_docs"),
                "sum_chars": t.column("sum_chars"),
            }
        )

    def all_both(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": pa.array(["ALL"] * t.num_rows, type=pa.string()),
                "lang": pa.array(["ALL"] * t.num_rows, type=pa.string()),
                "n_docs": t.column("n_docs"),
                "sum_chars": t.column("sum_chars"),
            }
        )

    by_source = pin_schema(
        bucketed_aggregate(
            fine, ["source"], [("n_docs", "sum"), ("sum_chars", "sum")], num_buckets=16
        ),
        pa.schema([("source", pa.string()), ("n_docs", pa.int64()), ("sum_chars", pa.int64())]),
    ).map_batches(all_lang, batch_format="pyarrow")

    def to_const(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": pa.array([0] * t.num_rows, type=pa.int64()),
                "n_docs": t.column("n_docs"),
                "sum_chars": t.column("sum_chars"),
            }
        )

    total = pin_schema(
        bucketed_aggregate(
            fine.map_batches(to_const, batch_format="pyarrow"),
            ["g"],
            [("n_docs", "sum"), ("sum_chars", "sum")],
            num_buckets=1,
        ),
        pa.schema([("g", pa.int64()), ("n_docs", pa.int64()), ("sum_chars", pa.int64())]),
    ).map_batches(all_both, batch_format="pyarrow")

    return fine.union(by_source).union(total)


def near_dedup_clean(sf_dir: str, threshold: float = 0.5):
    """The near-dup REMOVAL capstone an LLM corpus actually ships:
    Jaccard pairs → connected components → every cluster keeps only its
    min-doc_id representative, and the surviving corpus folds to
    per-source (docs, chars). The drop set is |non-keeper members| — a
    tiny fraction of the corpus — so the removal is ONE bucketed
    ``left anti`` join on doc_id against that set, never a shuffle of
    the corpus by cluster; per-source totals then ride one
    source-bounded aggregate (n_chars read from the table, no text
    re-scan). Columns: source, n_docs, n_chars."""
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    comps = dedup_components(sf_dir, threshold=threshold)

    def non_keepers(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        keep = pc.not_equal(t.column("node"), t.column("component"))
        return pa.table(
            {"doc_id": pc.cast(t.column("node").filter(keep), pa.int64())}
        )

    drop = comps.map_batches(non_keepers, batch_format="pyarrow")
    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    kept = bucketed_inner_join(
        docs,
        drop,
        ["doc_id"],
        pa.schema([("doc_id", pa.int64()), ("source", pa.string()), ("n_chars", pa.int64())]),
        pa.schema([("doc_id", pa.int64())]),
        join_type="left anti",
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("source", pa.string()), ("n_docs", pa.int64()), ("n_chars", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_chars": t.column("n_chars"),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            kept.map_batches(fold, batch_format="pyarrow"),
            ["source"],
            [("n_docs", "sum"), ("n_chars", "sum")],
        ),
        pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64()), ("n_chars", pa.int64())]
        ),
    )


def temperature_mix(sf_dir: str, budget: int = 200, alpha: float = 0.7):
    """Temperature-sampled source mix over documents (p_s ∝ char-mass
    ^0.7, the multilingual rebalancing rule; stages/sampling.py
    temperature_mix_stage): flattens the source skew a crawl corpus
    always has while preserving order among sources. Columns: source,
    doc_id, rk."""
    from bioner_ray.stages.sampling import temperature_mix_stage

    return temperature_mix_stage(
        _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"]),
        budget=budget,
        alpha=alpha,
    )


def minhash_precision(sf_dir: str):
    """Sketch-vs-truth audit: every MinHash+LSH candidate pair joined
    (left outer) against its EXACT shingle Jaccard — the calibration
    table that justifies the sketch's band/row parameters before a
    100-TB dedup run trusts them. est_jaccard is the signature
    agreement fraction, jaccard the exact set overlap (0.0 when the
    candidate shares bands but no shingle — a band-hash collision, the
    false-positive class this audit exists to count), abs_err their
    gap. At web scale the exact side runs the same candidate-verify
    path as setsim (blob joins on the candidate set only); here the
    inverted-index pass is corpus-bounded and oracle-checkable.
    Columns: a, b, n_bands, est_jaccard, jaccard, abs_err."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from bioner_ray.stages.dedup import jaccard_pairs, minhash_dedup_pairs
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    cand_schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("n_bands", pa.int64()),
            ("est_jaccard", pa.float64()),
        ]
    )
    exact_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())])
    cand = pin_schema(_minhash_pairs_memo(sf_dir), cand_schema)
    exact = jaccard_pairs(_documents(sf_dir), threshold=0.0).map_batches(
        lambda t: t.select(["a", "b", "jaccard"])
        if t.num_columns
        else exact_schema.empty_table(),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        cand,
        pin_schema(exact, exact_schema),
        ["a", "b"],
        cand_schema,
        exact_schema,
        join_type="left outer",
    )

    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("a", pa.int64()),
                ("b", pa.int64()),
                ("n_bands", pa.int64()),
                ("est_jaccard", pa.float64()),
                ("jaccard", pa.float64()),
                ("abs_err", pa.float64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        j = pc.fill_null(t.column("jaccard"), 0.0)
        return pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "n_bands": t.column("n_bands"),
                "est_jaccard": t.column("est_jaccard"),
                "jaccard": j,
                "abs_err": pc.abs(pc.subtract(t.column("est_jaccard"), j)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def source_overlap(sf_dir: str, k: int = 3):
    """Cross-source boilerplate overlap matrix — the provenance audit
    behind source dedup ordering (which feeds copy which): for every
    UNORDERED source pair, how many distinct ``k``-token shingles both
    sources carry. Two-level: (shingle-HASH, source) distinct pairs via
    one bucketed aggregate — the only data-scale exchange ships the
    md5-61-bit shingle hash (8 B/row, the minhash/dedup family idiom,
    replayed verbatim by the twin's md5-UBIGINT expression; a collision
    collides identically on both sides) instead of the ~25 B shingle
    string, which cut the exchange+sort wall ~3× at sf0.1 — then
    per-hash source lists (≤ |sources| each) explode to unordered pairs
    and fold to the sources² matrix. Columns: src_a, src_b,
    n_shared."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.textstats import _split_lower

    mask = (1 << 61) - 1
    memo: dict[str, int] = {}
    memo_cap = 1 << 22  # bound worker heap on open-vocabulary corpora

    def shingles(t: pa.Table) -> pa.Table:
        toks = _split_lower(t, "text")
        srcs = t.column("source").to_pylist()
        out_h: list[int] = []
        out_src: list[str] = []
        for row, src in zip(toks, srcs):
            seen = set()
            for i in range(len(row) - k + 1):
                sh = " ".join(row[i : i + k])
                if sh in seen:
                    continue
                seen.add(sh)
                h = memo.get(sh)
                if h is None:
                    h = int.from_bytes(hashlib.md5(sh.encode()).digest()[:8], "big") & mask
                    if len(memo) < memo_cap:
                        memo[sh] = h
                out_h.append(h)
            out_src.extend([src] * len(seen))
        return pa.table(
            {
                "h": pa.array(np.asarray(out_h, dtype=np.int64)),
                "source": pa.array(out_src, type=pa.string()),
            }
        )

    pairs_schema = pa.schema([("h", pa.int64()), ("source", pa.string())])
    ms = pin_schema(
        bucketed_aggregate(
            with_ones(
                _read(sf_dir, "documents", columns=["text", "source"]).map_batches(
                    shingles, batch_format="pyarrow"
                )
            ),
            ["h", "source"],
            [("one", "min")],
        ).map_batches(lambda t: t.select(["h", "source"]), batch_format="pyarrow"),
        pairs_schema,
    )

    def explode(g: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("src_a", pa.string()), ("src_b", pa.string()), ("n_shared", pa.int64())]
        )
        if g.num_columns == 0 or g.num_rows < 2:
            return schema.empty_table()
        g = g.sort_by([("h", "ascending"), ("source", "ascending")])
        keys = g.column("h").to_numpy(zero_copy_only=False)
        srcs = np.asarray(g.column("source").to_pylist(), dtype=object)
        n = len(keys)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        lengths = np.diff(np.r_[starts, n])
        # per-run pair emission via size-grouped triu templates (the
        # basket_pairs pattern) — no per-row Python in the hot loop
        idx_a, idx_b = [], []
        for m in np.unique(lengths):
            if m < 2:
                continue
            ti, tj = np.triu_indices(int(m), k=1)
            offs = starts[lengths == m]
            idx_a.append((offs[:, None] + ti[None, :]).ravel())
            idx_b.append((offs[:, None] + tj[None, :]).ravel())
        if not idx_a:
            return schema.empty_table()
        ia = np.concatenate(idx_a)
        ib = np.concatenate(idx_b)
        return pa.table(
            {
                "src_a": pa.array(srcs[ia], type=pa.string()),
                "src_b": pa.array(srcs[ib], type=pa.string()),
                "n_shared": pa.array(np.ones(len(ia), dtype=np.int64)),
            }
        )

    # coarse-bucket the hash space: 256 shuffle groups with a run-scan
    # inside each, never one Ray group per distinct shingle
    from bioner_ray.stages.shuffle import bucketed_map_groups

    pairs = bucketed_map_groups(ms, ["h"], explode)
    return pin_schema(
        bucketed_aggregate(
            pin_schema(
                pairs,
                pa.schema(
                    [("src_a", pa.string()), ("src_b", pa.string()), ("n_shared", pa.int64())]
                ),
            ),
            ["src_a", "src_b"],
            [("n_shared", "sum")],
        ),
        pa.schema(
            [("src_a", pa.string()), ("src_b", pa.string()), ("n_shared", pa.int64())]
        ),
        ensure_block=True,
    )


def tokenizer_fertility(sf_dir: str, n_merges: int = 8):
    """Per-source BPE fertility (subwords per word under the learned
    merges; stages/bpe.py bpe_fertility_by_source) — high fertility
    marks sources the tokenizer serves badly (typo-heavy, off-domain,
    wrong language). Columns: source, n_words, n_subwords,
    fertility."""
    from bioner_ray.stages.bpe import bpe_fertility_by_source

    return bpe_fertility_by_source(
        _read(sf_dir, "documents", columns=["text", "source"]), n_merges=n_merges
    )


def embedding_leakage(sf_dir: str, threshold: float = 0.99):
    """Train/test leakage audit (stages/similarity.py split_leakage):
    held-out-half vectors matched to their nearest train-half vector;
    leaky = rounded cosine ≥ threshold. Columns: vec_id, nbr_id,
    score_r, leaky."""
    from bioner_ray.stages.similarity import split_leakage

    return split_leakage(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=threshold,
    )


def rag_chunks(sf_dir: str, size: int = 64, overlap: int = 16):
    """Fixed-size overlapping token chunking — the RAG/context-window
    splitter (token_shards PACKS whole documents into budgets; this
    SPLITS each document into ``size``-token windows advancing by
    ``size − overlap``). Embarrassingly parallel: one fused document
    pass, no shuffle, chunk text rebuilt by single-space join over the
    compacted non-empty token sequence (the twin's
    ``string_agg(w, ' ' ORDER BY idx)``), chunk grid = every start
    index c·stride while it still has tokens — so the trailing partial
    chunk is kept, matching generate_series(0, (n−1)//stride).
    Columns: doc_id, chunk_id, n_tokens, chunk_text."""
    import numpy as np
    import pyarrow as pa

    from bioner_ray.stages.shuffle import pin_schema
    from bioner_ray.stages.textstats import _split_lower

    stride = size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than size")
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("chunk_text", pa.string()),
        ]
    )

    def chunks(t: pa.Table) -> pa.Table:
        toks = _split_lower(t, "text")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "chunk_id": [], "n_tokens": [], "chunk_text": []}
        for did, row in zip(ids, toks):
            n = len(row)
            if n == 0:
                continue
            for c in range((n - 1) // stride + 1):
                piece = row[c * stride : c * stride + size]
                out["doc_id"].append(int(did))
                out["chunk_id"].append(c)
                out["n_tokens"].append(len(piece))
                out["chunk_text"].append(" ".join(piece))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "chunk_id": pa.array(out["chunk_id"], type=pa.int64()),
                "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
                "chunk_text": pa.array(out["chunk_text"], type=pa.string()),
            }
        )

    return pin_schema(
        _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            chunks, batch_format="pyarrow"
        ),
        out_schema,
        ensure_block=True,
    )


def hard_negative_mining(sf_dir: str):
    """Per-vector hardest negative (stages/similarity.py
    hard_negatives): nearest different-label neighbor by cosine.
    Columns: vec_id, neg_id, score_r."""
    from bioner_ray.stages.similarity import hard_negatives

    return hard_negatives(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    )


def doc_novelty(sf_dir: str, k: int = 3):
    """Per-document n-gram novelty — the freshness/curriculum metric:
    the fraction of a doc's distinct ``k``-gram shingles whose GLOBAL
    first occurrence (min doc_id) is this doc. Near-zero novelty marks
    recombined/templated text even when no single document matches
    (the signal n-gram dedup misses). Plan: distinct (shingle, doc)
    rows once; shingle-keyed aggregate gives each shingle's first doc;
    ONE more shingle-bucketed join flags first-occurrence rows; a
    doc-keyed fold finishes. novelty = double(n_first)/double(n_grams),
    one replayable division. Columns: doc_id, n_grams, n_first,
    novelty."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema, with_ones
    from bioner_ray.stages.textstats import _split_lower

    def shingles(t: pa.Table) -> pa.Table:
        toks = _split_lower(t, "text")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        out_s, out_d = [], []
        for did, row in zip(ids, toks):
            seen = set()
            for i in range(len(row) - k + 1):
                sh = " ".join(row[i : i + k])
                if sh not in seen:
                    seen.add(sh)
                    out_s.append(sh)
                    out_d.append(int(did))
        return pa.table(
            {
                "s": pa.array(out_s, type=pa.string()),
                "doc_id": pa.array(out_d, type=pa.int64()),
            }
        )

    sd_schema = pa.schema([("s", pa.string()), ("doc_id", pa.int64())])
    sd = pin_schema(
        bucketed_aggregate(
            with_ones(
                _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
                    shingles, batch_format="pyarrow"
                )
            ),
            ["s", "doc_id"],
            [("one", "min")],
        ).map_batches(lambda t: t.select(["s", "doc_id"]), batch_format="pyarrow"),
        sd_schema,
    ).materialize()
    first = pin_schema(
        bucketed_aggregate(
            sd.map_batches(
                lambda t: pa.table({"s": t.column("s"), "first_doc": t.column("doc_id")}),
                batch_format="pyarrow",
            ),
            ["s"],
            [("first_doc", "min")],
        ),
        pa.schema([("s", pa.string()), ("first_doc", pa.int64())]),
    )
    joined = bucketed_inner_join(
        sd,
        first,
        ["s"],
        sd_schema,
        pa.schema([("s", pa.string()), ("first_doc", pa.int64())]),
    )

    def fold(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("n_first", pa.int64())]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_first": pc.cast(
                    pc.equal(t.column("first_doc"), t.column("doc_id")), pa.int64()
                ),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            joined.map_batches(fold, batch_format="pyarrow"),
            ["doc_id"],
            [("n_grams", "sum"), ("n_first", "sum")],
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("n_first", pa.int64())]
        ),
        ensure_block=True,
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "novelty",
            pc.divide(
                pc.cast(t.column("n_first"), pa.float64()),
                pc.cast(t.column("n_grams"), pa.float64()),
            ),
        )
        if t.num_columns
        else pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_grams", pa.int64()),
                ("n_first", pa.int64()),
                ("novelty", pa.float64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )


def doc_compression_ratio(sf_dir: str, level: int = 6):
    """Per-document zlib compression ratio — the classic cheap quality
    signal (highly compressible text = repeated/templated boilerplate;
    near-1 ratios = random noise; natural prose sits between): the
    filter axis CCNet/Gopher-era corpus pipelines cut on before any
    model scoring. Embarrassingly parallel, NO shuffle; DEFLATE at a
    fixed level is deterministic for a given zlib build, which is
    parallelism-independent but not SQL-re-derivable — hence the
    golden-parquet oracle (tools/make_query_golden.py pins the
    2-vs-8-CPU identity). ratio = double(comp)/double(raw). Columns:
    doc_id, raw_bytes, comp_bytes, ratio."""
    import zlib

    from bioner_ray.stages.shuffle import pin_schema

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("raw_bytes", pa.int64()),
            ("comp_bytes", pa.int64()),
            ("ratio", pa.float64()),
        ]
    )

    def comp(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        texts = t.column("text").to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        cb = np.empty(len(texts), dtype=np.int64)
        for i, x in enumerate(texts):
            b = (x or "").encode("utf-8")
            raw[i] = len(b)
            cb[i] = len(zlib.compress(b, level))
        keep = raw > 0
        return pa.table(
            {
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
                "raw_bytes": pa.array(raw[keep]),
                "comp_bytes": pa.array(cb[keep]),
                "ratio": pa.array(cb[keep].astype(np.float64) / raw[keep].astype(np.float64)),
            }
        )

    return pin_schema(
        _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            comp, batch_format="pyarrow"
        ),
        out_schema,
        ensure_block=True,
    )


def quality_gate_report(
    sf_dir: str,
    min_tokens: int = 10,
    min_mean_entropy_micro: int = 2_000_000,
    min_ratio: float = 0.2,
    max_ratio: float = 0.9,
):
    """The composed filter stack a corpus actually ships — one verdict
    row per document with every signal it was judged on: token count,
    exact unigram entropy (micro-nats), zlib compression ratio, and
    the final keep flag (all gates AND-ed: enough tokens, mean entropy
    ≥ 2 nats via the exact integer cross-multiply h_micro ≥ n_tokens ·
    min_mean_entropy_micro, ratio inside the natural-prose band). Two
    doc_id-bucketed joins stitch the three shuffle-free per-doc
    signals; the audit table IS the provenance record for every
    dropped document. Columns: doc_id, n_tokens, h_micro, ratio,
    keep."""
    import pyarrow.compute as pc

    from bioner_ray.pipelines.analytics import doc_entropy
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    ent_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("h_micro", pa.int64())]
    )
    comp_schema = pa.schema([("doc_id", pa.int64()), ("ratio", pa.float64())])
    ent = pin_schema(doc_entropy(sf_dir), ent_schema)
    comp = doc_compression_ratio(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "ratio"])
        if t.num_columns
        else comp_schema.empty_table(),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        ent,
        pin_schema(comp, comp_schema),
        ["doc_id"],
        ent_schema,
        comp_schema,
    )

    def verdict(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("h_micro", pa.int64()),
                ("ratio", pa.float64()),
                ("keep", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        h = t.column("h_micro").to_numpy(zero_copy_only=False)
        r = t.column("ratio").to_numpy(zero_copy_only=False)
        keep = (
            (n >= min_tokens)
            # exact integer cross-multiply: mean entropy >= 2 nats
            & (h.astype(object) >= n.astype(object) * min_mean_entropy_micro)
            & (r >= min_ratio)
            & (r <= max_ratio)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "h_micro": t.column("h_micro"),
                "ratio": t.column("ratio"),
                "keep": pa.array(keep.astype(np.int64)),
            }
        )

    return joined.map_batches(verdict, batch_format="pyarrow")


def configured_pipeline(sf_dir: str):
    """The §2.10 user-extension surface exercised THROUGH the oracle
    gate: a plain JSON-able dict builds a 3-stage pipeline from the
    STAGES registry (lang_filter → stratified_sample → token_stats) and
    runs it over documents — proving the declarative composition path
    produces bit-identical results to hand-written stage chaining (the
    twin replays the filter, the multiplicative-hash draw, and the
    token statistics in SQL). Columns: doc_id, n_tokens, n_types,
    n_chars, max_token_len, ttr, stopword_frac."""
    from bioner_ray.pipeline_config import build_pipeline

    cfg = {
        "stages": [
            {"stage": "lang_filter", "params": {"lang": "en"}},
            {
                "stage": "stratified_sample",
                "params": {"rates_permille": {"en": 700}, "default_permille": 0},
            },
            {"stage": "token_stats", "params": {}},
        ]
    }
    run = build_pipeline(cfg)
    return run(_read(sf_dir, "documents", columns=["doc_id", "text", "lang"]))


def doc_sentiment(sf_dir: str):
    """Per-document lexicon sentiment (stages/textstats.py
    sentiment_batch — signed hit counts over fixed pinned word lists,
    the core of every rule-based sentiment filter): a cheap tone axis
    for corpus mixing. Shuffle-free; the twin is generated from the
    SAME lexicons so the two can never drift. Columns: doc_id, n_pos,
    n_neg, net."""
    from bioner_ray.stages.textstats import sentiment_batch

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        sentiment_batch, batch_format="pyarrow"
    )


def source_ascii_profile(sf_dir: str):
    """Per-source ASCII profile — the encoding-health axis of a
    multilingual crawl (a 'en'-labeled source full of non-ASCII bytes
    is mislabeled or mojibake): exact character counts via one
    vectorized regex per batch, ONE source-keyed fold, ascii_frac =
    double(ascii)/double(total) pinned. Columns: source, n_chars,
    n_ascii, ascii_frac."""
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def prep(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        total = pc.utf8_length(text)
        ascii_n = pc.count_substring_regex(text, r"[\x00-\x7F]")
        return pa.table(
            {
                "source": t.column("source"),
                "n_chars": pc.cast(total, pa.int64()),
                "n_ascii": pc.cast(ascii_n, pa.int64()),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "documents", columns=["source", "text"]).map_batches(
                prep, batch_format="pyarrow"
            ),
            ["source"],
            [("n_chars", "sum"), ("n_ascii", "sum")],
        ),
        pa.schema(
            [("source", pa.string()), ("n_chars", pa.int64()), ("n_ascii", pa.int64())]
        ),
        ensure_block=True,
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "ascii_frac",
            pc.divide(
                pc.cast(t.column("n_ascii"), pa.float64()),
                pc.cast(t.column("n_chars"), pa.float64()),
            ),
        )
        if t.num_columns
        else pa.schema(
            [
                ("source", pa.string()),
                ("n_chars", pa.int64()),
                ("n_ascii", pa.int64()),
                ("ascii_frac", pa.float64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )


def doc_readability(sf_dir: str):
    """Per-source Flesch reading ease — the readability axis of corpus
    quality scoring (too-hard and too-trivial sources both get
    down-weighted in a training mix). Deterministic proxies: words =
    non-space runs, syllables = ``[aeiouy]+`` vowel runs (runs cannot
    span the whitespace word boundary, so one regex pass over the doc
    equals the per-word sum), sentences = ``[.!?]`` marks floored at 1.
    All three are exact integer counts from ONE vectorized regex-count
    kernel per batch; the fold is a source-keyed sum (sources are
    bounded), and the score is a single pinned double expression over
    the integer sums — no per-row Python anywhere. Columns: source,
    n_docs, n_words, n_sents, n_syllables, flesch."""
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    def prep(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        lower = pc.utf8_lower(text)
        words = pc.cast(pc.count_substring_regex(lower, r"[^\s]+"), pa.int64())
        syll = pc.cast(pc.count_substring_regex(lower, r"[aeiouy]+"), pa.int64())
        sents = pc.max_element_wise(
            pc.cast(pc.count_substring_regex(text, r"[.!?]"), pa.int64()), 1
        )
        return pa.table(
            {"source": t.column("source"), "w": words, "s": sents, "y": syll}
        )

    agg = pin_schema(
        bucketed_aggregate(
            with_ones(
                _read(sf_dir, "documents", columns=["source", "text"]).map_batches(
                    prep, batch_format="pyarrow"
                )
            ),
            ["source"],
            [("one", "sum"), ("w", "sum"), ("s", "sum"), ("y", "sum")],
        ),
        pa.schema(
            [
                ("source", pa.string()),
                ("one", pa.int64()),
                ("w", pa.int64()),
                ("s", pa.int64()),
                ("y", pa.int64()),
            ]
        ),
        ensure_block=True,
    )

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("n_words", pa.int64()),
            ("n_sents", pa.int64()),
            ("n_syllables", pa.int64()),
            ("flesch", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        w = pc.cast(t.column("w"), pa.float64())
        s = pc.cast(t.column("s"), pa.float64())
        y = pc.cast(t.column("y"), pa.float64())
        # pinned: 206.835 - 1.015*(W/S) - 84.6*(Y/W), left-assoc like SQL
        flesch = pc.subtract(
            pc.subtract(206.835, pc.multiply(1.015, pc.divide(w, s))),
            pc.multiply(84.6, pc.divide(y, w)),
        )
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("one"),
                "n_words": t.column("w"),
                "n_sents": t.column("s"),
                "n_syllables": t.column("y"),
                "flesch": flesch,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def dedup_cluster_reps(sf_dir: str, threshold: float = 0.5):
    """Quality-aware cluster representative selection — the refinement
    of ``near_dedup_clean``'s min-doc_id keeper rule that production
    corpora actually use: within each near-dup cluster keep the member
    with the RICHEST text (max distinct-token count; ties → min
    doc_id), so boilerplate-stripped or truncated variants lose to the
    fullest copy. The cluster membership set is bounded by the pair
    graph (the same bound kg_merge_groups documents), so node→component
    ships ONCE as a broadcast dict; the corpus streams through one
    member-filtered batch pass that folds each member to a single
    int64 ``enc = q·2³² + (2³²−1 − doc_id)`` — per-cluster argmax with
    the tiebreak baked into integer max, replayed exactly in SQL.
    Columns: component, keeper, n_members, best_distinct."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import _split_lower

    comps = dedup_components(sf_dir, threshold=threshold)
    member_map = {}
    for b in comps.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_columns:
            for n, c in zip(b.column("node").to_pylist(), b.column("component").to_pylist()):
                member_map[int(n)] = int(c)
    map_ref = ray.put(member_map)

    def enc_members(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        ids = t.column("doc_id").to_pylist()
        rows = [i for i, d in enumerate(ids) if int(d) in m]
        schema = pa.schema(
            [("component", pa.int64()), ("enc", pa.int64()), ("one", pa.int64())]
        )
        if not rows:
            return schema.empty_table()
        sub = t.take(pa.array(rows, type=pa.int64()))
        toks = _split_lower(sub, "text")
        comp, enc = [], []
        for d, row in zip(sub.column("doc_id").to_pylist(), toks):
            q = len(set(row))
            comp.append(m[int(d)])
            enc.append(q * 4294967296 + (4294967295 - int(d)))
        return pa.table(
            {
                "component": pa.array(comp, type=pa.int64()),
                "enc": pa.array(enc, type=pa.int64()),
                "one": pa.array(np.ones(len(comp), dtype=np.int64)),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
                enc_members, batch_format="pyarrow"
            ),
            ["component"],
            [("enc", "max"), ("one", "sum")],
        ),
        pa.schema([("component", pa.int64()), ("enc", pa.int64()), ("one", pa.int64())]),
        ensure_block=True,
    )

    out_schema = pa.schema(
        [
            ("component", pa.int64()),
            ("keeper", pa.int64()),
            ("n_members", pa.int64()),
            ("best_distinct", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        enc = np.asarray(t.column("enc").to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "component": t.column("component"),
                "keeper": pa.array(4294967295 - (enc % 4294967296), type=pa.int64()),
                "n_members": t.column("one"),
                "best_distinct": pa.array(enc // 4294967296, type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def corpus_filter_funnel(
    sf_dir: str,
    min_tokens: int = 10,
    min_mean_entropy_micro: int = 2_000_000,
    min_ratio: float = 0.2,
    max_ratio: float = 0.9,
):
    """The filter-stack waterfall every dataset paper publishes (C4 /
    RefinedWeb-style): per ORDERED gate — langid(en) → min-tokens →
    mean-entropy → compression-band → exact-dedup keeper — the number
    of documents entering, surviving, and the surviving TOKEN mass.
    Gates compose cumulatively (a document is judged by later gates
    only if every earlier one passed), so the table answers "which
    stage costs the corpus how much" at a glance.

    Scale shape: the per-doc verdict signals are the existing
    shuffle-light stages (``quality_gate_report``'s entropy/zlib
    signals, ``langid``, ``exact_dedup``'s (id, md5) exchange)
    stitched by three doc_id-bucketed joins; the funnel fold is one
    6-value histogram aggregate plus a driver-side cumulation over the
    FIXED stage count — never a per-doc driver loop. Columns: stage,
    name, docs_in, docs_out, tokens_out."""
    import ray.data as rd

    from bioner_ray.stages.dedup import exact_dedup
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )

    lang_schema = pa.schema(
        [("doc_id", pa.int64()), ("pred_lang", pa.string()), ("lang_score", pa.float64())]
    )
    gate_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("h_micro", pa.int64()),
            ("ratio", pa.float64()),
            ("keep", pa.int64()),
        ]
    )
    gate = pin_schema(
        quality_gate_report(
            sf_dir,
            min_tokens=min_tokens,
            min_mean_entropy_micro=min_mean_entropy_micro,
            min_ratio=min_ratio,
            max_ratio=max_ratio,
        ),
        gate_schema,
    )
    lang = pin_schema(langid(sf_dir), lang_schema)
    joined = bucketed_inner_join(gate, lang, ["doc_id"], gate_schema, lang_schema)

    keep_schema = pa.schema([("doc_id", pa.int64()), ("isk", pa.int64())])
    keepers = pin_schema(
        exact_dedup(_read(sf_dir, "documents", columns=["doc_id", "text"]))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("keep_id"),
                    "isk": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            if t.num_columns
            else keep_schema.empty_table(),
            batch_format="pyarrow",
        ),
        keep_schema,
    )
    joined_schema = pa.schema(
        list(gate_schema) + [f for f in lang_schema if f.name != "doc_id"]
    )
    full = bucketed_inner_join(
        pin_schema(joined, joined_schema),
        keepers,
        ["doc_id"],
        joined_schema,
        keep_schema,
        join_type="left outer",
    )

    sr_schema = pa.schema([("sr", pa.int64()), ("docs", pa.int64()), ("tokens", pa.int64())])

    def stage_reached(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return sr_schema.empty_table()
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        h = t.column("h_micro").to_numpy(zero_copy_only=False)
        r = t.column("ratio").to_numpy(zero_copy_only=False)
        pl = t.column("pred_lang").to_numpy(zero_copy_only=False)
        isk = t.column("isk").fill_null(0).to_numpy(zero_copy_only=False)
        p1 = pl == "en"
        p2 = n >= min_tokens
        # exact integer cross-multiply (the quality_gate_report gate)
        p3 = h.astype(object) >= n.astype(object) * min_mean_entropy_micro
        p3 = p3.astype(bool)
        p4 = (r >= min_ratio) & (r <= max_ratio)
        p5 = isk == 1
        c1 = p1.astype(np.int64)
        c2 = c1 * p2
        c3 = c2 * p3
        c4 = c3 * p4
        c5 = c4 * p5
        sr = c1 + c2 + c3 + c4 + c5
        return pa.table(
            {
                "sr": pa.array(sr, type=pa.int64()),
                "docs": pa.array(np.ones(len(sr), dtype=np.int64)),
                "tokens": pa.array(n.astype(np.int64)),
            }
        )

    hist = pin_schema(
        bucketed_aggregate(
            full.map_batches(stage_reached, batch_format="pyarrow"),
            ["sr"],
            [("docs", "sum"), ("tokens", "sum")],
        ),
        sr_schema,
    ).to_pandas()  # bounded: at most 6 rows (sr in 0..5)

    names = ["langid_en", "min_tokens", "entropy", "compression", "exact_dedup"]
    docs_ge = {k: int(hist.loc[hist["sr"] >= k, "docs"].sum()) for k in range(6)}
    toks_ge = {k: int(hist.loc[hist["sr"] >= k, "tokens"].sum()) for k in range(6)}
    return rd.from_arrow(
        pa.table(
            {
                "stage": pa.array(range(1, 6), type=pa.int64()),
                "name": pa.array(names, type=pa.string()),
                "docs_in": pa.array([docs_ge[k - 1] for k in range(1, 6)], type=pa.int64()),
                "docs_out": pa.array([docs_ge[k] for k in range(1, 6)], type=pa.int64()),
                "tokens_out": pa.array([toks_ge[k] for k in range(1, 6)], type=pa.int64()),
            }
        )
    )


def doc_quality_features(sf_dir: str):
    """Per-document feature table for a learned quality classifier —
    the feature-extraction step behind fastText/DSIR-style corpus
    filtering: every cheap quality axis the engine computes, one wide
    row per document (token count, exact unigram entropy micro-nats,
    zlib compression ratio, predicted language + score, lexicon
    sentiment counts, per-doc Flesch reading ease with the same pinned
    double composition as ``doc_readability``). A trainer reads this
    table plus labels; the filter stack (``corpus_filter_funnel``)
    consumes the learned thresholds.

    Scale shape: five single-pass per-doc signals stitched by four
    doc_id-bucketed joins — no signal is recomputed and nothing is
    corpus-materialized. Columns: doc_id, n_tokens, h_micro, ratio,
    pred_lang, lang_score, n_pos, n_neg, flesch."""
    import pyarrow.compute as pc

    from bioner_ray.pipelines.analytics import doc_entropy
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    ent_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("h_micro", pa.int64())]
    )
    comp_schema = pa.schema([("doc_id", pa.int64()), ("ratio", pa.float64())])
    lang_schema = pa.schema(
        [("doc_id", pa.int64()), ("pred_lang", pa.string()), ("lang_score", pa.float64())]
    )
    sent_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_pos", pa.int64()), ("n_neg", pa.int64())]
    )
    fl_schema = pa.schema([("doc_id", pa.int64()), ("flesch", pa.float64())])

    ent = pin_schema(doc_entropy(sf_dir), ent_schema)
    comp = pin_schema(
        doc_compression_ratio(sf_dir).map_batches(
            lambda t: t.select(["doc_id", "ratio"])
            if t.num_columns
            else comp_schema.empty_table(),
            batch_format="pyarrow",
        ),
        comp_schema,
    )
    lang = pin_schema(langid(sf_dir), lang_schema)
    sent = pin_schema(
        doc_sentiment(sf_dir).map_batches(
            lambda t: t.select(["doc_id", "n_pos", "n_neg"])
            if t.num_columns
            else sent_schema.empty_table(),
            batch_format="pyarrow",
        ),
        sent_schema,
    )

    def flesch_rows(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        lower = pc.utf8_lower(text)
        w = pc.cast(pc.count_substring_regex(lower, r"[^\s]+"), pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        s = np.maximum(
            pc.cast(pc.count_substring_regex(text, r"[.!?]"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.float64),
            1.0,
        )
        y = pc.cast(pc.count_substring_regex(lower, r"[aeiouy]+"), pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        wf = np.maximum(w, 1.0)  # empty doc: w floored for the y/w term
        # pinned composition, identical op order to the twin:
        # (206.835 - 1.015*(w/s)) - 84.6*(y/max(w,1))
        flesch = (206.835 - 1.015 * (w / s)) - 84.6 * (y / wf)
        return pa.table(
            {"doc_id": t.column("doc_id"), "flesch": pa.array(flesch, type=pa.float64())}
        )

    fl = pin_schema(
        _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            flesch_rows, batch_format="pyarrow"
        ),
        fl_schema,
    )

    j1_schema = pa.schema(list(ent_schema) + [("ratio", pa.float64())])
    j1 = pin_schema(
        bucketed_inner_join(ent, comp, ["doc_id"], ent_schema, comp_schema), j1_schema
    )
    j2_schema = pa.schema(
        list(j1_schema) + [f for f in lang_schema if f.name != "doc_id"]
    )
    j2 = pin_schema(
        bucketed_inner_join(j1, lang, ["doc_id"], j1_schema, lang_schema), j2_schema
    )
    j3_schema = pa.schema(
        list(j2_schema) + [f for f in sent_schema if f.name != "doc_id"]
    )
    j3 = pin_schema(
        bucketed_inner_join(j2, sent, ["doc_id"], j2_schema, sent_schema), j3_schema
    )
    out_schema = pa.schema(list(j3_schema) + [("flesch", pa.float64())])
    out = bucketed_inner_join(j3, fl, ["doc_id"], j3_schema, fl_schema)
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


def gopher_rules(
    sf_dir: str, min_words: int = 20, max_words: int = 100_000, min_stop: int = 1
):
    """Per-document Gopher/MassiveText quality-rule verdict (Rae et
    al. 2021 Table A1) — the full heuristic filter stack as a feature
    table: word-count window, mean word length, symbol-to-word ratio,
    alphabetic-word fraction, stopword hits, bullet-line and
    ellipsis-line shares, plus the composed ``keep`` flag. Complements
    ``quality_docs`` (C4 token/TTR gate) and ``repetition_stats``
    (Gopher's repetition signals) with the document- and line-level
    rules neither covers.

    ``min_stop`` defaults to 1 here (Gopher publishes 2): the
    synthetic corpus's vocabulary carries exactly one word from the
    8-word list, so the published threshold would zero every verdict —
    the same vacuous-gate trap kg_publish hit; at 1 the keep column
    splits the fixture ~370/130. The stage default stays 2.

    Scale shape: one stateless vectorized ``map_batches`` pass, no
    shuffle — per-doc verdicts stream out at read speed. Columns:
    doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stop,
    bullet_frac, ellipsis_frac, keep."""
    from bioner_ray.stages.textstats import gopher_rules_stage

    return gopher_rules_stage(
        _documents(sf_dir),
        min_words=min_words,
        max_words=max_words,
        min_stop=min_stop,
    )


def doc_lang_mix(sf_dir: str, seg_tokens: int = 16):
    """Per-document segment-level language mixing (code-switching
    audit): the langid profile argmax applied per fixed 16-token
    window, folded to how many languages the document mixes and how
    dominant the majority is — the per-segment routing decision
    CCNet/mC4 make before sending mixed documents to per-language
    pipelines. (Fixed token windows rather than lines/sentences: the
    synthetic corpus is single-line punctuation-free text, so any
    punctuation grain would be vacuously one segment per doc.)

    Scale shape: one stateless vectorized ``map_batches`` pass (token
    windows + per-profile is_in + bincount folds all inside the
    batch), no shuffle. Columns: doc_id, n_segments, n_langs,
    majority_lang, majority_frac."""
    from bioner_ray.stages.textstats import lang_mix_stage

    return lang_mix_stage(_documents(sf_dir), seg_tokens=seg_tokens)


def ivf_recall(sf_dir: str, k: int = 10, n_queries: int = 8):
    """ANN calibration audit: recall@k of the IVF index against exact
    brute-force cosine, per query — the measurement that decides
    whether an approximate index's n_probe/n_clusters setting is safe
    to serve (the minhash_precision pattern, applied to the embedding
    axis). Both sides are existing oracle-checked queries; this
    composes them into the governance number.

    Scale shape: the exact side is the blocked-matmul knn_topk, the
    approximate side the partition-pruned IVF scan; each emits
    n_queries × k rows, so the overlap join is a bounded driver
    finish (the value_percentiles argument — physically ≤ a few
    hundred rows). Columns: query_id, n_hits, recall."""
    ex = knn_topk(sf_dir, k=k, n_queries=n_queries)
    ap = knn_ivf_topk(sf_dir, k=k, n_queries=n_queries)
    exd = ex.to_pandas() if hasattr(ex, "to_pandas") else ex
    apd = ap.to_pandas() if hasattr(ap, "to_pandas") else ap
    import pandas as pd

    hits = exd[["query_id", "vec_id"]].merge(
        apd[["query_id", "vec_id"]], on=["query_id", "vec_id"], how="inner"
    )
    per = (
        hits.groupby("query_id").size().reindex(
            sorted(exd["query_id"].unique()), fill_value=0
        )
    )
    n_hits = per.to_numpy().astype(np.int64)
    return pa.table(
        {
            "query_id": pa.array(per.index.to_numpy().astype(np.int64)),
            "n_hits": pa.array(n_hits),
            "recall": pa.array(n_hits.astype(np.float64) / k),
        }
    )


def semantic_dedup(sf_dir: str, k: int = 4, iters: int = 2, tau: float = 0.45):
    """SemDeDup over the embeddings table (stages/cluster.py
    semantic_dedup): deterministic k-means partition, within-cluster
    cosine, dominated-by-earlier drop rule — the paraphrase-level dedup
    pass that runs after exact/minhash dedup in a training-data
    pipeline. Columns: vec_id, cluster, kept."""
    from bioner_ray.stages.cluster import semantic_dedup as _sd

    return _sd(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        k=k,
        iters=iters,
        tau=tau,
    )


def kg_daily_increment(sf_dir: str):
    """The composed daily-increment flagship (pipelines/ingest.py):
    new shard in → LSH dedup against the persistent band store →
    survivors' edges extracted → delta vs the checkpointed canonical
    edge table out; the old corpus is never re-shingled, re-scored or
    re-aggregated. Columns: subj, pred, obj, w_a, w_b, status."""
    from bioner_ray.pipelines.ingest import kg_daily_increment as _kdi

    return _kdi(sf_dir)


def repeated_spans(sf_dir: str, n: int = 8, k: int = 100):
    """Cross-document repeated n-token spans — the exact-substring
    duplication signal of Lee et al. 2022 (arXiv:2107.06499,
    "Deduplicating Training Data Makes Language Models Better") at
    n-gram granularity: every n-token window that occurs in ≥ 2
    DISTINCT documents, with its document count and total occurrence
    count — the removal list a substring-dedup pass consumes (their
    ExactSubstr uses a suffix array; fixed-n windows are its
    shuffle-friendly distributed form: candidates at span length n,
    extendable by chaining overlapping spans downstream).

    Scale shape: the window walk is per-doc local (the shingle-kernel
    pattern of stages/dedup.py); the wide steps are TWO bucketed
    aggregates — (span, doc) occurrence partials, then per-span
    (n_docs, n_occ) — so the shuffle moves per-doc-combined rows, and
    the ≥2-docs filter plus combiner-pruned global top-k run
    distributed; the driver sees ≤ k rows. Columns: shingle, n_docs,
    n_occ, rk."""
    import pyarrow.compute as pc

    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import _split_lower

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        for doc_id, toks in zip(
            batch.column("doc_id").to_pylist(), _split_lower(batch, "text")
        ):
            for i in range(len(toks) - n + 1):
                key = (" ".join(toks[i : i + n]), doc_id)
                counts[key] = counts.get(key, 0) + 1
        return pa.table(
            {
                "shingle": pa.array([s for s, _ in counts], type=pa.string()),
                "doc_id": pa.array([d for _, d in counts], type=pa.int64()),
                "cnt": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    per_doc = bucketed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["shingle", "doc_id"],
        [("cnt", "sum")],
    )

    def fold_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("shingle", pa.string()), ("n_docs", pa.int64()), ("n_occ", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "shingle": t.column("shingle"),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_occ": t.column("cnt"),
            }
        )

    spans = bucketed_aggregate(
        per_doc.map_batches(fold_rows, batch_format="pyarrow"),
        ["shingle"],
        [("n_docs", "sum"), ("n_occ", "sum")],
    )

    def keep_cross_doc(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("shingle", pa.string()),
                    ("n_docs", pa.int64()),
                    ("n_occ", pa.int64()),
                    ("_g", pa.int64()),
                ]
            ).empty_table()
        t = t.filter(pc.greater_equal(t.column("n_docs"), 2))
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    ranked = top_k_per_group(
        spans.map_batches(keep_cross_doc, batch_format="pyarrow"),
        key_col="_g",
        order_by=[("n_occ", "descending"), ("shingle", "ascending")],
        k=k,
    )
    out_schema = pa.schema(
        [
            ("shingle", pa.string()),
            ("n_docs", pa.int64()),
            ("n_occ", pa.int64()),
            ("rk", pa.int64()),
        ]
    )
    return pin_schema(
        ranked.map_batches(
            lambda t: t.select(["shingle", "n_docs", "n_occ", "rk"])
            if t.num_columns
            else out_schema.empty_table(),
            batch_format="pyarrow",
        ),
        out_schema,
    )


def c4_filters(sf_dir: str):
    """C4 heuristic cleaning rules (Raffel et al. 2020, arXiv:1910.10683
    §2.2 — the canonical public web-corpus filter): per line, keep only
    lines ending in terminal punctuation with ≥ 3 words and no
    "javascript"; per page, drop pages with < 5 kept lines, any
    "lorem ipsum", or any curly brace. The line filter is the REAL
    operator (one vectorized Arrow pass over the flattened line stream:
    regex terminal-punct match + word-count + substring masks combined,
    then a segment-sum back to documents — no per-line Python); the
    fixture corpus has no line structure, so each doc's text is first
    rendered into lines by REPLAYABLE arithmetic (the
    html_table_cells/jsonld pattern): 5-token chunks, chunk i
    terminated with '.' iff (doc_id + i) % 3 ≠ 0, a 'lorem ipsum
    dolor' line appended iff doc_id % 13 == 0, a '{ config }' line iff
    doc_id % 17 == 0 — so every rule fires on real rows at every test
    scale. Columns: doc_id, n_lines, n_kept, has_lorem, has_brace,
    keep (int64 0/1)."""
    import pyarrow.compute as pc

    from bioner_ray.stages.textstats import _split_lower

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def render(batch: pa.Table) -> pa.Table:
        out_ids, out = [], []
        for doc_id, toks in zip(
            batch.column("doc_id").to_pylist(), _split_lower(batch, "text")
        ):
            lines = []
            for i in range(0, len(toks), 5):
                line = " ".join(toks[i : i + 5])
                if (doc_id + i // 5) % 3 != 0:
                    line += "."
                lines.append(line)
            if doc_id % 13 == 0:
                lines.append("lorem ipsum dolor")
            if doc_id % 17 == 0:
                lines.append("{ config }")
            if not lines:
                # zero-token doc with no synthetic extras: emit NO page
                # (splitting '' would count one phantom empty line; the
                # SQL twin's generate_series emits no chunk rows either
                # — ADVICE r4 degenerate-doc agreement)
                continue
            out_ids.append(doc_id)
            out.append("\n".join(lines))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "page": pa.array(out, type=pa.string()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_lines", pa.int64()),
            ("n_kept", pa.int64()),
            ("has_lorem", pa.int64()),
            ("has_brace", pa.int64()),
            ("keep", pa.int64()),
        ]
    )

    def flags(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return out_schema.empty_table()
        pages = batch.column("page")
        split = pc.split_pattern(pages, "\n").combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lines = split.values
        # the C4 line rule, one Arrow pass over the flattened stream
        term = pc.match_substring_regex(lines, r'[.!?"]$')
        nwords = pc.list_value_length(pc.split_pattern(lines, " "))
        enough = pc.greater_equal(nwords, 3)
        nojs = pc.invert(pc.match_substring(pc.utf8_lower(lines), "javascript"))
        kept = pc.and_(pc.and_(term, enough), nojs).to_numpy(zero_copy_only=False)
        kept = np.asarray(kept, dtype=np.float64)
        n_docs = len(off) - 1
        base = off - off[0]
        n_lines = np.diff(base)
        csum = np.concatenate([[0.0], np.cumsum(kept)])
        n_kept = (csum[base[1:]] - csum[base[:-1]]).astype(np.int64)
        low = pc.utf8_lower(pages)
        lorem = pc.cast(pc.match_substring(low, "lorem ipsum"), pa.int64())
        brace = pc.cast(pc.match_substring(pages, "{"), pa.int64())
        keep = pc.cast(
            pc.and_(
                pc.and_(
                    pa.array(n_kept >= 5),
                    pc.equal(lorem, 0),
                ),
                pc.equal(brace, 0),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_lines": pa.array(n_lines, type=pa.int64()),
                "n_kept": pa.array(n_kept, type=pa.int64()),
                "has_lorem": lorem,
                "has_brace": brace,
                "keep": keep,
            },
            schema=out_schema,
        )

    return docs.map_batches(render, batch_format="pyarrow").map_batches(
        flags, batch_format="pyarrow"
    )


def y4m_motion_stats(sf_dir: str):
    """Video feature extraction through the REAL YUV4MPEG2 codec with
    EXACT integer features — the Y4M companion to wav_window_energy /
    bmp_luma_stats (the multimodal axis' hash-checked driver oracles):
    deterministic gray frames (pixel (t, y, x) of doc i is
    ``(i + t·131 + y·w + x) mod 256``; 3 + i%4 frames of
    (8 + i%3) × (8 + i%5)) are ENCODED to genuine Y4M bytes
    (``Cmono``, FRAME headers), and the query under test parses the
    stream back (functions/codecs.decode_y4m) and reduces each doc to
    int64 luma_sum and inter-frame motion ``Σ_t Σ |f_t − f_{t−1}|`` —
    the frame-sampling shape a video-curation pipeline runs, with
    integers the DuckDB twin re-derives from the pixel arithmetic
    bit-for-bit. batch_size=64 (media-batch hygiene). Columns:
    doc_id, n_frames, width, height, luma_sum, motion."""
    import numpy as np

    from bioner_ray.functions.codecs import decode_y4m, encode_y4m

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids.tolist():
            w, h, nf = 8 + i % 5, 8 + i % 3, 3 + i % 4
            tt, yy, xx = np.meshgrid(
                np.arange(nf, dtype=np.int64),
                np.arange(h, dtype=np.int64),
                np.arange(w, dtype=np.int64),
                indexing="ij",
            )
            frames = ((i + tt * 131 + yy * w + xx) % 256).astype(np.uint8)
            payloads.append(encode_y4m(frames))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_frames", pa.int64()),
            ("width", pa.int64()),
            ("height", pa.int64()),
            ("luma_sum", pa.int64()),
            ("motion", pa.int64()),
        ]
    )

    def features(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        rows = {k: [] for k in out_schema.names}
        for i, p in zip(t.column("doc_id").to_pylist(), t.column("payload").to_pylist()):
            f = decode_y4m(p).astype(np.int64)
            rows["doc_id"].append(i)
            rows["n_frames"].append(f.shape[0])
            rows["height"].append(f.shape[1])
            rows["width"].append(f.shape[2])
            rows["luma_sum"].append(int(f.sum()))
            rows["motion"].append(int(np.abs(f[1:] - f[:-1]).sum()))
        return pa.table(
            {k: pa.array(v, type=pa.int64()) for k, v in rows.items()},
            schema=out_schema,
        )

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return docs.map_batches(to_media, batch_format="pyarrow", batch_size=64).map_batches(
        features, batch_format="pyarrow", batch_size=64
    )


def dedup_keep_best(sf_dir: str, threshold: float = 0.5):
    """Quality-aware near-dup representative selection — the production
    refinement of ``dedup_filter``'s min-id rule: within each near-dup
    cluster KEEP THE HIGHEST-QUALITY member (here the distinct-token
    count n_types, the lexical-richness proxy; ties by doc_id), drop
    the rest. A boilerplate-laden mirror of a good page no longer wins
    representative status by having the smaller id.

    Fully distributed end to end: exact Jaccard pairs → pointer-jumping
    components (both bounded by the near-dup population), the corpus
    pass computes n_types ONLY for clustered docs (broadcast node-set
    semi-join, vectorized distinct-count), one bucketed join attaches
    components, and the per-cluster argmax is ``top_k_per_group``'s
    combiner-pruned rank — kept = (rk == 1). Output is the bounded
    per-cluster decision table. Columns: doc_id, component, n_types,
    kept (int64 0/1)."""
    import pyarrow.compute as pc
    import ray

    from bioner_ray.stages.dedup import jaccard_pairs
    from bioner_ray.stages.graph import connected_components
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema
    from bioner_ray.stages.textstats import _split_lower

    comps = connected_components(
        _jaccard_pairs_memo(sf_dir, threshold)
    ).materialize()
    node_set = pa.array(
        sorted(r["node"] for r in comps.take_all()), type=pa.int64()
    )  # bounded by the near-dup population
    nodes_ref = ray.put(node_set)

    def quality(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("doc_id"), value_set=ray.get(nodes_ref))
        batch = batch.filter(mask)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_types": pa.array([], type=pa.int64()),
                }
            )
        ntypes = [len(set(toks)) for toks in _split_lower(batch, "text")]
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_types": pa.array(ntypes, type=pa.int64()),
            }
        )

    q = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        quality, batch_format="pyarrow"
    )
    comp_schema = pa.schema([("doc_id", pa.int64()), ("component", pa.int64())])
    joined = bucketed_inner_join(
        pin_schema(
            comps.map_batches(
                lambda t: t.rename_columns(["doc_id", "component"]) if t.num_columns else t,
                batch_format="pyarrow",
            ),
            comp_schema,
        ),
        q,
        ["doc_id"],
        comp_schema,
        pa.schema([("doc_id", pa.int64()), ("n_types", pa.int64())]),
    )
    ranked = top_k_per_group(
        joined,
        key_col="component",
        order_by=[("n_types", "descending"), ("doc_id", "ascending")],
        k=1 << 30,  # rank ALL cluster members; kept = rk == 1
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("component", pa.int64()),
            ("n_types", pa.int64()),
            ("kept", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "component": t.column("component"),
                "n_types": t.column("n_types"),
                "kept": pc.cast(pc.equal(t.column("rk"), 1), pa.int64()),
            },
            schema=out_schema,
        )

    return pin_schema(ranked.map_batches(finish, batch_format="pyarrow"), out_schema)


def ann_dim_truncation(sf_dir: str, trunc_dim: int = 32, k: int = 10, n_queries: int = 8):
    """Matryoshka-style dimension-truncation quality audit (Kusupati et
    al. 2022, arXiv:2205.13147): how much of the exact top-k
    neighborhood survives when embeddings are truncated to their first
    ``trunc_dim`` dims and re-normalized — the measurement behind
    serving embeddings at half width. Two exact brute-force passes
    (the knn_topk machinery: per-block matmul + local k-cut, Q×k rows
    to the driver) — one at full width, one over the sliced columns —
    then a per-query set intersection. Integer overlap, so the DuckDB
    twin (list_slice + list_cosine_similarity) replays it exactly.
    Columns: query_id, dim_full, dim_trunc, n_overlap."""
    import pyarrow.compute as pc

    from bioner_ray.stages.similarity import knn_brute_force

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_full = _query_matrix(sf_dir, n_queries)
    dim_full = q_full.shape[1]

    def slice_cols(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        arr = t.column("embedding").combine_chunks()
        sliced = pc.list_slice(arr, 0, trunc_dim)
        return pa.table({"vec_id": t.column("vec_id"), "embedding": sliced})

    full = knn_brute_force(emb, q_full, k=k)
    trunc = knn_brute_force(
        emb.map_batches(slice_cols, batch_format="pyarrow"),
        q_full[:, :trunc_dim],
        k=k,
    )
    # Q×k each — bounded; intersect per query
    f = {}
    for r in zip(full.column("query_id").to_pylist(), full.column("vec_id").to_pylist()):
        f.setdefault(r[0], set()).add(r[1])
    t = {}
    for r in zip(trunc.column("query_id").to_pylist(), trunc.column("vec_id").to_pylist()):
        t.setdefault(r[0], set()).add(r[1])
    qids = sorted(f)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "dim_full": pa.array([dim_full] * len(qids), type=pa.int64()),
            "dim_trunc": pa.array([trunc_dim] * len(qids), type=pa.int64()),
            "n_overlap": pa.array(
                [len(f[q] & t.get(q, set())) for q in qids], type=pa.int64()
            ),
        }
    )


def wordpiece_tokens(sf_dir: str, vocab_k: int = 64, max_sub: int = 4):
    """WordPiece greedy segmentation over the distinct-word table
    (stages/wordpiece.py): piece vocabulary = top-64 weighted
    word-initial/##-continuation substrings (≤ 4 chars), then the
    BERT-tokenizer longest-match rule per word; uncoverable words are
    [UNK] (live at test scale — the vocab cap excludes rare pieces).
    Columns: word, n_occurrences, n_pieces, is_unk."""
    from bioner_ray.stages.wordpiece import wordpiece_word_table

    return wordpiece_word_table(
        _read(sf_dir, "documents", columns=["text"]), vocab_k=vocab_k, max_sub=max_sub
    )


def postings_bytes(sf_dir: str):
    """Inverted-index size estimation — the index-construction planning
    op a serving stack runs before building postings: per term, the
    document frequency, total term frequency, and the byte size of the
    delta-gap + LEB128-varint encoded posting list (gap₀ = doc_id₀ + 1,
    gapᵢ = doc_idᵢ − doc_idᵢ₋₁; varint width = 1 byte per 7 bits).
    Zipf terms compress hardest (dense postings → small gaps) — the
    size model that drives shard-count and tiering decisions.

    Shape: one corpus pass emits per-block (term, doc_id, tf)
    partials; ONE bucketed aggregate dedups/sums them; ONE
    coarse-bucket map_groups sorts each term's postings and
    vectorizes the gap/width arithmetic (numpy digitize against the
    2^7k boundaries — no per-posting Python). Columns: term, df,
    total_tf, postings_bytes."""
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_map_groups,
        pin_schema,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        # vectorized (term, doc_id, tf) combiner: flattened split-offset
        # kernel + one Arrow group_by — no Python loop over tokens
        text = pc.fill_null(batch.column("text"), "")
        split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
        off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = split.values.slice(off[0], off[-1] - off[0])
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(ids, np.diff(off))
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        flat = pa.table(
            {
                "term": vals.filter(pa.array(keep)),
                "doc_id": pa.array(doc_idx[keep]),
            }
        )
        g = flat.group_by(["term", "doc_id"]).aggregate([("doc_id", "count")])
        return pa.table(
            {
                "term": g.column("term"),
                "doc_id": g.column("doc_id"),
                "tf": g.column("doc_id_count").cast(pa.int64()),
            }
        )

    tfs = bucketed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["term", "doc_id"],
        [("tf", "sum")],
    )

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("df", pa.int64()),
            ("total_tf", pa.int64()),
            ("postings_bytes", pa.int64()),
        ]
    )
    #: LEB128 width boundaries: gaps < 2^7 take 1 byte, < 2^14 two, …
    bounds = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28, 1 << 35], dtype=np.int64)

    def fold(group: pa.Table) -> pa.Table:
        if group.num_columns == 0:
            return out_schema.empty_table()
        if group.num_rows == 0:
            return out_schema.empty_table()
        group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        terms = np.asarray(group.column("term").to_pylist(), dtype=object)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tf = group.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        new = np.r_[True, terms[1:] != terms[:-1]]
        gaps = np.where(new, ids + 1, np.r_[0, np.diff(ids)])
        widths = np.digitize(gaps, bounds) + 1
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(terms)]
        cw = np.concatenate([[0], np.cumsum(widths)])
        ct = np.concatenate([[0], np.cumsum(tf)])
        return pa.table(
            {
                "term": pa.array(terms[starts].tolist(), type=pa.string()),
                "df": pa.array(ends - starts, type=pa.int64()),
                "total_tf": pa.array(ct[ends] - ct[starts], type=pa.int64()),
                "postings_bytes": pa.array(cw[ends] - cw[starts], type=pa.int64()),
            },
            schema=out_schema,
        )

    return pin_schema(bucketed_map_groups(tfs, ["term"], fold), out_schema)


def minhash_recall(sf_dir: str, threshold: float = 0.5):
    """The RECALL half of the sketch calibration pair
    (``minhash_precision`` counts band-collision false positives; this
    counts the misses): every TRUE near-dup pair — exact shingle
    Jaccard ≥ ``threshold`` — joined left-outer against the MinHash+LSH
    candidate set; ``found`` = 0 marks a genuine duplicate the sketch
    would silently leave in a 100-TB corpus (no band agreed). Both
    sides are existing oracle-checked operators; the audit is one
    bounded pair-keyed join. Columns: a, b, n_common, jaccard, found."""
    import pyarrow.compute as pc

    from bioner_ray.stages.dedup import jaccard_pairs, minhash_dedup_pairs
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    truth = _jaccard_pairs_memo(sf_dir, threshold)
    truth_schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("n_common", pa.int64()),
            ("jaccard", pa.float64()),
        ]
    )
    cand = _minhash_pairs_memo(sf_dir).map_batches(
        lambda t: t.select(["a", "b"]).append_column(
            "found", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )
        if t.num_columns
        else pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("found", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )
    out_schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("n_common", pa.int64()),
            ("jaccard", pa.float64()),
            ("found", pa.int64()),
        ]
    )
    joined = bucketed_inner_join(
        pin_schema(truth, truth_schema),
        pin_schema(
            cand, pa.schema([("a", pa.int64()), ("b", pa.int64()), ("found", pa.int64())])
        ),
        ["a", "b"],
        truth_schema,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("found", pa.int64())]),
        join_type="left outer",
    )
    return pin_schema(
        joined.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("found"),
                "found",
                pc.fill_null(t.column("found"), 0),
            )
            if t.num_columns
            else out_schema.empty_table(),
            batch_format="pyarrow",
        ),
        out_schema,
    )


def kg_daily_node_increment(sf_dir: str):
    """Node-table half of the daily increment (pipelines/ingest.py):
    same shard-dedup state as kg_daily_increment (shared memo), the
    survivors' linked mentions canonicalized, and the delta against
    the checkpointed base node table. Columns: concept_id, c_a, c_b,
    u_a, u_b, status."""
    from bioner_ray.pipelines.ingest import kg_daily_node_increment as _kni

    return _kni(sf_dir)


def qlm_topk(sf_dir: str, k: int = 10):
    """Dirichlet query-likelihood top-k retrieval for the pinned query
    bag (stages/retrieval.py qlm_topk — integer micro-nat scores, one
    libm log per distinct (tf, dl) pair). The LM ranker companion to
    bm25_topk. Columns: doc_id, dl, score_micro."""
    from bioner_ray.stages.retrieval import qlm_topk as _qlm

    return _qlm(_documents(sf_dir), terms=BM25_TERMS, k=k)


def rrf_fusion(sf_dir: str, k: int = 10, c: int = 60):
    """Reciprocal-rank fusion (Cormack et al. 2009) of the engine's two
    rankers — the standard hybrid-retrieval merge: each doc's fused
    score is Σ over rankers of 1/(c + rank), computed in exact integer
    micro-units (floor(1e9 / (c + rank)) — ranks are small integers,
    so the sum is bit-stable and SQL-replayable). Docs absent from a
    ranker's top-k contribute nothing from it (the standard truncated
    form). Both input rankings are the bounded k-row outputs of
    bm25_topk and qlm_topk; the fusion is driver-side Arrow over ≤ 2k
    rows. Columns: doc_id, rank_bm25, rank_qlm, rrf_micro (rank 0 =
    absent from that ranker's top-k)."""
    bm = bm25_topk(sf_dir, k=k).to_pandas()
    ql = qlm_topk(sf_dir, k=k).to_pandas()
    bm = bm.sort_values(["score", "doc_id"], ascending=[False, True], ignore_index=True)
    ql = ql.sort_values(
        ["score_micro", "doc_id"], ascending=[False, True], ignore_index=True
    )
    r_bm = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}
    r_ql = {int(d): i + 1 for i, d in enumerate(ql["doc_id"])}
    docs = sorted(set(r_bm) | set(r_ql))
    rows = []
    for d in docs:
        rb, rq = r_bm.get(d, 0), r_ql.get(d, 0)
        micro = (1_000_000_000 // (c + rb) if rb else 0) + (
            1_000_000_000 // (c + rq) if rq else 0
        )
        rows.append((d, rb, rq, micro))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank_bm25": pa.array([r[1] for r in rows], type=pa.int64()),
            "rank_qlm": pa.array([r[2] for r in rows], type=pa.int64()),
            "rrf_micro": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def ndcg_eval(sf_dir: str, k: int = 10):
    """Ranking-quality evaluation (nDCG@k) of both rankers against a
    REPLAYABLE relevance rule — relevant ⇔ the document contains ≥ 2
    DISTINCT query-bag terms AND doc_id ≡ 0 (mod 3) (graded 1; the
    modular component stands in for the human-label axis a ranking
    signal cannot see, so nDCG discriminates instead of saturating —
    both rankers would top-10 all-relevant under a term-only rule). Per-rank gains are exact-ordered floats floored
    once to integer micro-units (g_r = floor(1e9 / (ln(r+1)/ln 2)),
    libm both sides), DCG/IDCG are integer sums, and
    ndcg_milli = 1000·DCG // IDCG — bit-stable. IDCG places the |R|
    relevant docs at the top ranks (truncated at k).
    Columns: ranker, n_rel, n_rel_in_k, dcg, idcg, ndcg_milli."""
    import math

    import pyarrow.compute as pc

    from bioner_ray.stages.textstats import _split_lower

    # relevance labels: docs with >= 2 distinct query terms
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = set(BM25_TERMS)

    def rel_partial(batch: pa.Table) -> pa.Table:
        ids, flags = [], []
        for doc_id, toks in zip(
            batch.column("doc_id").to_pylist(), _split_lower(batch, "text")
        ):
            ids.append(doc_id)
            flags.append(int(len(terms & set(toks)) >= 2 and doc_id % 3 == 0))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "rel": pa.array(flags, type=pa.int64()),
            }
        )

    rel_tbl = docs.map_batches(rel_partial, batch_format="pyarrow")
    n_rel = int(
        rel_tbl.map_batches(
            lambda t: pa.table({"s": pa.array([pc.sum(t.column("rel")).as_py() or 0])}),
            batch_format="pyarrow",
        )
        .to_pandas()["s"]
        .sum()
    )
    rel_set = set(
        r["doc_id"]
        for r in rel_tbl.map_batches(
            lambda t: t.filter(pc.equal(t.column("rel"), 1)), batch_format="pyarrow"
        ).take_all()
    )  # bounded by the relevant population of a 3-term query bag

    gains = [
        math.floor(1000000000.0 / (math.log(r + 1) / math.log(2.0)))
        for r in range(1, k + 1)
    ]
    idcg = sum(gains[: min(n_rel, k)])

    rows = []
    for name, ranked in (
        ("bm25", bm25_topk(sf_dir, k=k).to_pandas().sort_values(
            ["score", "doc_id"], ascending=[False, True], ignore_index=True
        )),
        ("qlm", qlm_topk(sf_dir, k=k).to_pandas().sort_values(
            ["score_micro", "doc_id"], ascending=[False, True], ignore_index=True
        )),
    ):
        dcg = 0
        hits = 0
        for r, d in enumerate(ranked["doc_id"], start=1):
            if int(d) in rel_set:
                dcg += gains[r - 1]
                hits += 1
        rows.append(
            (name, n_rel, hits, dcg, idcg, (1000 * dcg) // idcg if idcg else 0)
        )
    return pa.table(
        {
            "ranker": pa.array([r[0] for r in rows], type=pa.string()),
            "n_rel": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_rel_in_k": pa.array([r[2] for r in rows], type=pa.int64()),
            "dcg": pa.array([r[3] for r in rows], type=pa.int64()),
            "idcg": pa.array([r[4] for r in rows], type=pa.int64()),
            "ndcg_milli": pa.array([r[5] for r in rows], type=pa.int64()),
        }
    )


def dedup_savings(sf_dir: str):
    """The corpus-hygiene summary a dedup run publishes: document and
    byte counts for the raw corpus, after EXACT dedup (first doc per
    md5(text)), and after NEAR-dup removal (``dedup_filter``'s
    representative rule) — the headline numbers that justify the
    pipeline's cost. Three bounded aggregates; the near side reuses the
    memoized pair tables. Columns: stage, n_docs, n_bytes."""
    import hashlib

    import pyarrow.compute as pc
    import ray

    from bioner_ray.stages.graph import connected_components
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    docs = _documents(sf_dir)

    def base_partial(t: pa.Table) -> pa.Table:
        lens = pc.binary_length(pc.cast(pc.fill_null(t.column("text"), ""), pa.string()))
        return pa.table(
            {
                "g": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_bytes": pc.cast(lens, pa.int64()),
            }
        )

    # exact: min doc_id per md5(text) — keep rows where doc_id == min
    def keyed(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        keys = [hashlib.md5((x or "").encode()).hexdigest() for x in texts]
        lens = [len((x or "").encode()) for x in texts]
        return pa.table(
            {
                "key": pa.array(keys, type=pa.string()),
                "keep_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_bytes": pa.array(lens, type=pa.int64()),
            }
        )

    exact = pin_schema(
        bucketed_aggregate(
            docs.map_batches(keyed, batch_format="pyarrow"),
            ["key"],
            [("keep_id", "min"), ("n_bytes", "min")],
        ),
        pa.schema(
            [("key", pa.string()), ("keep_id", pa.int64()), ("n_bytes", pa.int64())]
        ),
    )

    # near: drop non-representative cluster members corpus-wide
    comps = connected_components(_jaccard_pairs_memo(sf_dir, 0.5))
    drop = pa.array(
        sorted(r["node"] for r in comps.take_all() if r["node"] != r["component"]),
        type=pa.int64(),
    )
    drop_ref = ray.put(drop)

    def near_partial(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(t.column("doc_id"), value_set=ray.get(drop_ref)))
        t = t.filter(keep)
        return base_partial(t)

    def fold(ds, stage):
        (row,) = pin_schema(
            bucketed_aggregate(
                ds, ["g"], [("n_docs", "sum"), ("n_bytes", "sum")], num_buckets=1
            ),
            pa.schema([("g", pa.int64()), ("n_docs", pa.int64()), ("n_bytes", pa.int64())]),
        ).take_all()
        return (stage, int(row["n_docs"]), int(row["n_bytes"]))

    rows = [
        fold(docs.map_batches(base_partial, batch_format="pyarrow"), "raw"),
        fold(
            exact.map_batches(
                lambda t: pa.table(
                    {
                        "g": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                        "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                        "n_bytes": t.column("n_bytes"),
                    }
                )
                if t.num_columns
                else pa.schema(
                    [("g", pa.int64()), ("n_docs", pa.int64()), ("n_bytes", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            "exact",
        ),
        fold(docs.map_batches(near_partial, batch_format="pyarrow"), "near"),
    ]
    return pa.table(
        {
            "stage": pa.array([r[0] for r in rows], type=pa.string()),
            "n_docs": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_bytes": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def pq_distortion(sf_dir: str, m: int = 4, k: int = 4, iters: int = 2):
    """Codebook-quality report for the PQ layout — the distortion audit
    that decides whether m/k suffice before an IVF-PQ index ships: per
    subspace, vector count, total and max integer micromark distance²
    (the residual the compressed representation loses). One bounded
    aggregate over ``embedding_pq``'s long-form output. Columns: sub,
    n_vecs, sum_dist2, max_dist2."""
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    codes = embedding_pq(sf_dir, m=m, k=k, iters=iters)

    def fold_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("sub", pa.int64()),
                    ("n_vecs", pa.int64()),
                    ("sum_dist2", pa.int64()),
                    ("max_dist2", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "sub": t.column("sub"),
                "n_vecs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sum_dist2": t.column("dist2"),
                "max_dist2": t.column("dist2"),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            codes.map_batches(fold_rows, batch_format="pyarrow"),
            ["sub"],
            [("n_vecs", "sum"), ("sum_dist2", "sum"), ("max_dist2", "max")],
        ),
        pa.schema(
            [
                ("sub", pa.int64()),
                ("n_vecs", pa.int64()),
                ("sum_dist2", pa.int64()),
                ("max_dist2", pa.int64()),
            ]
        ),
    )


def prf_expansion_terms(sf_dir: str, k: int = 10, n_terms: int = 5):
    """Pseudo-relevance feedback (Rocchio-style) query expansion — the
    classic second-pass retrieval step: take the BM25 top-``k``
    documents as pseudo-relevant, count their terms, drop the original
    query bag, and propose the top-``n_terms`` expansion terms by
    (total tf in the top-k desc, doc frequency desc, term asc) — exact
    integer ordering. The feedback doc set is k rows; the term count
    over it is bounded by k documents' vocabulary. Columns: term,
    tf_topk, df_topk, rk."""
    from collections import Counter

    from bioner_ray.stages.textstats import _split_lower

    top = bm25_topk(sf_dir, k=k).to_pandas()
    top_ids = set(int(d) for d in top["doc_id"])
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pull(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(
            pc.cast(batch.column("doc_id"), pa.int64()),
            value_set=pa.array(sorted(top_ids), type=pa.int64()),
        )
        return batch.filter(keep)

    fb = docs.map_batches(pull, batch_format="pyarrow").take_all()  # ≤ k rows
    tf: Counter = Counter()
    df: Counter = Counter()
    qbag = set(BM25_TERMS)
    for row in fb:
        toks = [
            t
            for t in (row["text"] or "").lower().split()
            if t
        ]
        # same tokenization as _split_lower's regex on fixture text
        # (single-space separated); Counter over the doc
        c = Counter(t for t in toks if t not in qbag)
        tf.update(c)
        df.update({t: 1 for t in c})
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], -df[kv[0]], kv[0]))[:n_terms]
    return pa.table(
        {
            "term": pa.array([t for t, _ in ranked], type=pa.string()),
            "tf_topk": pa.array([int(v) for _, v in ranked], type=pa.int64()),
            "df_topk": pa.array([int(df[t]) for t, _ in ranked], type=pa.int64()),
            "rk": pa.array(list(range(1, len(ranked) + 1)), type=pa.int64()),
        }
    )


def simhash_precision(sf_dir: str, max_hamming: int = 8):
    """SimHash calibration — the fingerprint-distance analog of
    ``minhash_precision``: every SimHash candidate pair (Hamming ≤
    ``max_hamming``) joined left-outer against its EXACT shingle
    Jaccard. jaccard 0.0 marks a fingerprint collision between
    unrelated docs — the false-positive class whose rate justifies
    the 64-bit/8-ham parameters before a corpus-scale dedup trusts
    them. Columns: a, b, hamming, jaccard."""
    import pyarrow.compute as pc

    from bioner_ray.stages.dedup import jaccard_pairs
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    cand_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())]
    )
    exact_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
    )
    cand = pin_schema(dedup_simhash_pairs(sf_dir, max_hamming=max_hamming), cand_schema)
    exact = jaccard_pairs(_documents(sf_dir), threshold=0.0).map_batches(
        lambda t: t.select(["a", "b", "jaccard"])
        if t.num_columns
        else exact_schema.empty_table(),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        cand,
        pin_schema(exact, exact_schema),
        ["a", "b"],
        cand_schema,
        exact_schema,
        join_type="left outer",
    )
    out_schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("hamming", pa.int64()),
            ("jaccard", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "hamming": t.column("hamming"),
                "jaccard": pc.fill_null(t.column("jaccard"), 0.0),
            },
            schema=out_schema,
        )

    return joined.map_batches(finish, batch_format="pyarrow")
