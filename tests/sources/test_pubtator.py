"""PubTator format + PubTator→CoNLL converter (S6 native
re-implementation; reference medmentions_conll_converter.py:16-29
delegates the same conversion to bconv)."""

from __future__ import annotations

import pytest

from bioner_ray.functions.bio import B, I, O
from bioner_ray.functions.text import split_sentences, split_sentences_with_offsets
from bioner_ray.sources.conll import format_conll_document, parse_conll
from bioner_ray.sources.pubtator import (
    format_pubtator_document,
    full_text,
    parse_pubtator,
    pubtator_doc_to_conll,
)

BLOCK = (
    "123|t|Aspirin therapy today.\n"
    "123|a|Low dose aspirin helps. It is cheap.\n"
    "123\t0\t7\tAspirin\tChemical\tMESH:D001241\n"
    "123\t32\t39\taspirin\tChemical\tMESH:D001241\n"
    "\n"
    "456|t|Second doc | with pipe.\n"
    "456|a|Body text here.\n"
    "\n"
)


class TestParseFormat:
    def test_parse_two_docs(self):
        docs = parse_pubtator(BLOCK)
        assert [d["pmid"] for d in docs] == ["123", "456"]
        assert docs[0]["title"] == "Aspirin therapy today."
        assert docs[0]["annotations"][1]["start"] == 32
        assert docs[1]["title"] == "Second doc | with pipe."  # pipes survive
        assert docs[1]["annotations"] == []

    def test_roundtrip_bytes(self):
        docs = parse_pubtator(BLOCK)
        assert "".join(format_pubtator_document(d) for d in docs) == BLOCK

    def test_offsets_index_title_space_abstract(self):
        doc = parse_pubtator(BLOCK)[0]
        text = full_text(doc)
        a = doc["annotations"][1]
        assert text[a["start"] : a["end"]] == "aspirin"


class TestConvert:
    def test_single_token_annotations(self):
        doc = parse_pubtator(BLOCK)[0]
        conll = pubtator_doc_to_conll(doc, 0)
        # sentence split follows the engine splitter over the full text
        sents = [s for s, _ in split_sentences_with_offsets(full_text(doc))]
        assert sents == split_sentences(full_text(doc))
        flat = [
            (t, g)
            for s in conll["sentences"]
            for t, g in zip(s["token_text"], s["gold_tags"])
        ]
        assert ("Aspirin", B) in flat
        assert ("aspirin", B) in flat
        assert all(g == O for t, g in flat if t not in ("Aspirin", "aspirin"))

    def test_multi_token_annotation_gets_b_then_i(self):
        doc = {
            "pmid": "1",
            "title": "X.",
            "abstract": "acute lymphoblastic leukemia is bad.",
            "annotations": [
                {"start": 3, "end": 31, "mention": "acute lymphoblastic leukemia",
                 "type": "Disease", "concept_id": "C1"},
            ],
        }
        conll = pubtator_doc_to_conll(doc, 0)
        tags = [g for s in conll["sentences"] for g in s["gold_tags"]]
        toks = [t for s in conll["sentences"] for t in s["token_text"]]
        assert toks == ["X.", "acute", "lymphoblastic", "leukemia", "is", "bad."]
        assert tags == [O, B, I, I, O, O]

    def test_offset_mismatch_raises(self):
        doc = {
            "pmid": "1", "title": "T.", "abstract": "aspirin works.",
            "annotations": [{"start": 3, "end": 10, "mention": "WRONG",
                             "type": "Chemical", "concept_id": "C"}],
        }
        with pytest.raises(ValueError, match="mismatch"):
            pubtator_doc_to_conll(doc, 0)

    def test_overlap_resolves_to_earliest_longest(self):
        doc = {
            "pmid": "1", "title": "T.",
            "abstract": "alpha beta gamma end.",
            "annotations": [
                {"start": 3, "end": 13, "mention": "alpha beta", "type": "A", "concept_id": "1"},
                {"start": 9, "end": 19, "mention": "beta gamma", "type": "B", "concept_id": "2"},
            ],
        }
        conll = pubtator_doc_to_conll(doc, 0)
        tags = [g for s in conll["sentences"] for g in s["gold_tags"]]
        # T. alpha beta gamma end.  -> earliest ann wins alpha+beta;
        # gamma still overlaps the second ann and starts it (B)
        assert tags == [O, B, I, B, O]

    def test_feeds_conll_writer_and_reader(self):
        doc = parse_pubtator(BLOCK)[0]
        conll = pubtator_doc_to_conll(doc, 0)
        text = format_conll_document(conll)
        parsed = parse_conll(text)
        assert len(parsed) == 1
        got = parsed[0]["sentences"]
        assert [s["token_text"] for s in got] == [s["token_text"] for s in conll["sentences"]]
        assert [s["gold_tags"] for s in got] == [list(s["gold_tags"]) for s in conll["sentences"]]
        # offsets round-trip verbatim (string convention of the S1 reader)
        assert [s["token_start"] for s in got] == [s["token_start"] for s in conll["sentences"]]


class TestSentenceOffsets:
    def test_segments_match_plain_splitter(self):
        for text in (
            "", "   ", "One. Two!  Three? Four", "no punctuation at all",
            "end with period.", ". . leading", "a.b c! ", "x?  \n y.",
        ):
            with_off = split_sentences_with_offsets(text)
            assert [s for s, _ in with_off] == split_sentences(text)
            for s, base in with_off:
                assert text[base : base + len(s)] == s


class TestDistributed:
    def test_read_and_convert_stage(self, tmp_path):
        from bioner_ray.sources.pubtator import pubtator_to_conll_stage, read_pubtator

        p = tmp_path / "corpus.pubtator"
        p.write_text(BLOCK, encoding="utf8")
        docs = read_pubtator(str(p))
        rows = docs.take_all()
        assert [r["pmid"] for r in rows] == ["123", "456"]
        conll = pubtator_to_conll_stage(read_pubtator(str(p))).take_all()
        assert len(conll) == 2
        by_pmid = {r["pmid"]: r for r in conll}
        tags = [g for s in by_pmid["123"]["sentences"] for g in s["gold_tags"]]
        assert tags.count(B) == 2
