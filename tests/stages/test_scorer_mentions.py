"""Scorer actor-pool, mention explode, linking, triples, metrics tests."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from bioner_ray.fixtures import make_concepts
from bioner_ray.functions.bio import B, I, O
from bioner_ray.schemas import MENTIONS_SCHEMA, NIL_CONCEPT, SENTENCE_TYPE, TAGS_TYPE, validate
from bioner_ray.stages.link import ConceptIndex, broadcast_concept_index, link_stage
from bioner_ray.stages.mentions import mentions_batch, mentions_stage
from bioner_ray.stages.metrics import entity_level_prf, error_stats_by_length, span_confusion
from bioner_ray.stages.scorer import DatexisNumpyModel, GazetteerModel, load_model, score_stage
from bioner_ray.stages.triples import assemble_sentence_triples, canonicalize_edges, triples_stage
from bioner_ray.stages.vocab import vocab_from_counter


def _doc_row(url, sentence_tokens):
    return {
        "url": url,
        "sentences": [
            {
                "sent_id": i,
                "token_text": toks,
                "token_start": list(range(len(toks))),
                "token_end": list(range(1, len(toks) + 1)),
            }
            for i, toks in enumerate(sentence_tokens)
        ],
    }


def _docs_table(rows):
    return pa.table(
        {
            "url": [r["url"] for r in rows],
            "sentences": pa.array([r["sentences"] for r in rows], type=pa.list_(SENTENCE_TYPE)),
        }
    )


class TestGazetteer:
    def test_single_word_match(self):
        m = GazetteerModel(["aspirin"])
        tags = m.predict_document(
            _doc_row("u", [["Aspirin", "treats", "pain."]])["sentences"]
        )
        assert tags == [[B, O, O]]

    def test_multi_word_longest_match(self):
        m = GazetteerModel(["vitamin b", "vitamin b complex"])
        tags = m.predict_document(
            _doc_row("u", [["vitamin", "B", "complex", "works"]])["sentences"]
        )
        assert tags == [[B, I, I, O]]

    def test_normalization_insensitive(self):
        m = GazetteerModel(["aspirin"])
        tags = m.predict_document(_doc_row("u", [["ASPIRIN,", "yes"]])["sentences"])
        assert tags == [[B, O]]


class TestDatexisNumpy:
    def test_deterministic_across_instances(self):
        vocab = vocab_from_counter({"#as": 3, "asp": 2, "spi": 1}, n=3)
        m1 = DatexisNumpyModel(vocab, seed=7)
        m2 = DatexisNumpyModel(vocab, seed=7)
        sents = _doc_row("u", [["Aspirin", "works"], ["no"]])["sentences"]
        assert m1.predict_document(sents) == m2.predict_document(sents)

    def test_output_shape_and_range(self):
        vocab = vocab_from_counter({"#as": 1}, n=3)
        m = load_model("datexis-numpy", vocab=vocab)
        sents = _doc_row("u", [["a", "b", "c"], []])["sentences"]
        tags = m.predict_document(sents)
        assert [len(t) for t in tags] == [3, 0]
        assert all(t in (0, 1, 2) for row in tags for t in row)

    def test_unknown_model_raises(self):
        import pytest

        with pytest.raises(ValueError, match="unknown model"):
            load_model("nope")


class TestScoreStage:
    def test_gazetteer_actor_pool(self):
        rows = [
            _doc_row("u1", [["Aspirin", "treats", "pain."]]),
            _doc_row("u2", [["nothing", "here."]]),
        ]
        ds = rd.from_arrow(_docs_table(rows))
        out = score_stage(
            ds,
            model_name="gazetteer",
            model_config={"surfaces": ray.put(["aspirin"])},
            concurrency=2,
            batch_size=1,
        ).take_all()
        by_url = {r["url"]: r["tags"] for r in out}
        assert by_url["u1"] == [[B, O, O]]
        assert by_url["u2"] == [[O, O]]


class TestMentions:
    def test_explode(self):
        rows = [_doc_row("u1", [["Aspirin", "treats", "migraine", "fast."]])]
        tbl = _docs_table(rows).append_column(
            "tags", pa.array([[[B, O, B, O]]], type=TAGS_TYPE)
        )
        out = mentions_batch(tbl)
        validate(out, MENTIONS_SCHEMA)
        rows = out.to_pylist()
        assert len(rows) == 2
        assert rows[0]["surface"] == "Aspirin"
        assert rows[1] == {
            "url": "u1", "sent_id": 0, "start_token": 2, "end_token": 2,
            "surface": "migraine",
        }

    def test_multi_token_surface(self):
        rows = [_doc_row("u1", [["vitamin", "B", "complex"]])]
        tbl = _docs_table(rows).append_column("tags", pa.array([[[B, I, I]]], type=TAGS_TYPE))
        out = mentions_batch(tbl).to_pylist()
        assert out[0]["surface"] == "vitamin B complex"
        assert (out[0]["start_token"], out[0]["end_token"]) == (0, 2)


class TestLinking:
    def test_exact_match(self, concepts_table):
        idx = ConceptIndex(concepts_table)
        cid, score = idx.link_one("Aspirin")
        assert cid == "C0000001" and score == 1.0

    def test_alias_match(self, concepts_table):
        idx = ConceptIndex(concepts_table)
        cid, _ = idx.link_one("aspirinx")
        assert cid == "C0000001"

    def test_ambiguous_tie_break(self, concepts_table):
        idx = ConceptIndex(concepts_table)
        cid, _ = idx.link_one("mitomycin")
        assert cid == "C0000002"  # smallest concept_id wins

    def test_nil_for_garbage(self, concepts_table):
        idx = ConceptIndex(concepts_table, threshold=0.99)
        cid, _ = idx.link_one("qwxzk")
        assert cid == NIL_CONCEPT

    def test_embedding_fallback_near_surface(self, concepts_table):
        # typo variant shares most trigrams with the canonical surface
        idx = ConceptIndex(concepts_table, threshold=0.5)
        cid, score = idx.link_one("aspirina")
        assert cid == "C0000001"
        assert 0.5 <= score < 1.0

    def test_link_stage_dataset(self, concepts_table):
        mentions = pa.table(
            {
                "url": ["u"], "sent_id": pa.array([0], type=pa.int32()),
                "start_token": pa.array([0], type=pa.int32()),
                "end_token": pa.array([0], type=pa.int32()),
                "surface": ["Aspirin"],
            },
            schema=MENTIONS_SCHEMA,
        )
        ref = broadcast_concept_index(concepts_table)
        out = link_stage(rd.from_arrow(mentions), ref, concurrency=1).take_all()
        assert out[0]["concept_id"] == "C0000001"


class TestTriples:
    def test_assembly_with_relation_verb(self, concepts_table):
        idx = ConceptIndex(concepts_table)
        tokens = ["Aspirin", "treats", "mitomycin", "quickly."]
        triples = assemble_sentence_triples(tokens, [B, O, B, O], idx)
        assert triples == [("C0000001", "treats", "C0000002", 1.0)]

    def test_default_relation(self, concepts_table):
        idx = ConceptIndex(concepts_table)
        tokens = ["Aspirin", "and", "mitomycin"]
        triples = assemble_sentence_triples(tokens, [B, O, B], idx)
        assert triples[0][1] == "co_occurs_with"

    def test_nil_mentions_excluded(self, concepts_table):
        idx = ConceptIndex(concepts_table, threshold=0.99)
        tokens = ["qwxzk", "treats", "mitomycin"]
        triples = assemble_sentence_triples(tokens, [B, O, B], idx)
        assert triples == []

    def test_canonicalize_edges(self, concepts_table):
        ref = broadcast_concept_index(concepts_table)
        rows = [
            _doc_row("u1", [["Aspirin", "treats", "mitomycin"]]),
            _doc_row("u2", [["Aspirin", "treats", "mitomycin"]]),
        ]
        tbl = _docs_table(rows).append_column(
            "tags", pa.array([[[B, O, B]], [[B, O, B]]], type=TAGS_TYPE)
        )
        triples = triples_stage(rd.from_arrow(tbl), ref, concurrency=1)
        edges = canonicalize_edges(triples).take_all()
        assert len(edges) == 1
        e = edges[0]
        assert e["weight"] == 2
        assert e["first_url"] == "u1"

    def test_salted_path_equals_unsalted(self, concepts_table):
        ref = broadcast_concept_index(concepts_table)
        rows = [_doc_row(f"u{i}", [["Aspirin", "treats", "mitomycin"]]) for i in range(10)]
        tbl = _docs_table(rows).append_column(
            "tags", pa.array([[[B, O, B]]] * 10, type=TAGS_TYPE)
        )
        triples = triples_stage(rd.from_arrow(tbl), ref, concurrency=1)
        plain = canonicalize_edges(triples).take_all()
        triples2 = triples_stage(rd.from_arrow(tbl), ref, concurrency=1)
        salted = canonicalize_edges(triples2, salt_buckets=4).take_all()
        key = lambda e: (e["subj"], e["pred"], e["obj"])
        assert sorted(map(key, plain)) == sorted(map(key, salted))
        assert {key(e): e["weight"] for e in plain} == {key(e): e["weight"] for e in salted}


def _eval_ds(gold_pred_pairs):
    sents = [
        [
            {
                "sent_id": i,
                "token_text": [f"t{j}" for j in range(len(g))],
                "token_start": list(range(len(g))),
                "token_end": list(range(len(g))),
                "gold_tags": g,
                "pred_tags": p,
            }
            for i, (g, p) in enumerate(gold_pred_pairs)
        ]
    ]
    sent_type = pa.struct(
        [
            ("sent_id", pa.int32()),
            ("token_text", pa.list_(pa.string())),
            ("token_start", pa.list_(pa.int32())),
            ("token_end", pa.list_(pa.int32())),
            ("gold_tags", pa.list_(pa.uint8())),
            ("pred_tags", pa.list_(pa.uint8())),
        ]
    )
    tbl = pa.table({"url": ["d0"], "sentences": pa.array(sents, type=pa.list_(sent_type))})
    return rd.from_arrow(tbl)


class TestMetrics:
    def test_perfect_prediction(self):
        ds = _eval_ds([([B, I, O], [B, I, O]), ([O, B, O], [O, B, O])])
        m = entity_level_prf(ds)
        assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["f1"] == 1.0

    def test_mixed(self):
        # gold spans: (0,1); pred spans: (0,0) mismatch + (2,2) spurious
        ds = _eval_ds([([B, I, O], [B, O, B])])
        m = entity_level_prf(ds)
        assert m["true_positives"] == 0
        assert m["predicted_spans"] == 2
        assert m["gold_spans"] == 1

    def test_span_confusion(self):
        ds = _eval_ds([([B, I, O], [B, I, B])])
        c = span_confusion(ds)
        assert c == {"tp": 1, "fp": 1, "fn": 0}

    def test_error_stats_by_length(self):
        ds = _eval_ds([([B, I, O, B], [B, I, O, O])])
        rows = {r["length"]: r for r in error_stats_by_length(ds).take_all()}
        assert rows[2]["total"] == 1 and rows[2]["errors"] == 0
        assert rows[1]["total"] == 1 and rows[1]["errors"] == 1
