"""CoNLL reader/writer round-trip and parsing-quirk tests.

The fixture corpus mirrors the reference's inline lorem-ipsum corpus
(tests/model/test_CoNLLDataset.py:64-108): 2 docs × 2 sentences, a
multi-type tag row (first-char rule), and the trailing-blank-lines
variant.
"""

import pytest

from bioner_ray.functions.bio import B, I, O
from bioner_ray.sources.conll import (
    annotate_documents_positionally,
    format_conlleval_document,
    parse_conll,
    read_prediction_tsv,
    write_conll_file,
)

CORPUS = (
    "-DOCSTART-\t0\t0\tO\n"
    "\n"
    "Lorem\t0\t5\tB-T116,T123\n"
    "ipsum\t6\t10\tI-T047\n"
    "dolor\t11\t16\tO\n"
    "\n"
    "Eirmod\t0\t5\tB-T116,T123\n"
    "tempor\t6\t8\tO\n"
    ".\t9\t10\tO\n"
    "\n"
    "-DOCSTART-\t0\t0\tO\n"
    "\n"
    "ut\t0\t5\tB-UnknownType\n"
    "labore\t6\t8\tO\n"
    "et\t9\t10\tO\n"
    "\n"
    "dolore\t0\t5\tO\n"
    "magna\t6\t8\tO\n"
    "aliquyam\t9\t10\tO\n"
)

NORMALIZED = (
    "-DOCSTART-\t0\t0\tO\n"
    "\n"
    "Lorem\t0\t5\tB\n"
    "ipsum\t6\t10\tI\n"
    "dolor\t11\t16\tO\n"
    "\n"
    "Eirmod\t0\t5\tB\n"
    "tempor\t6\t8\tO\n"
    ".\t9\t10\tO\n"
    "\n"
    "-DOCSTART-\t0\t0\tO\n"
    "\n"
    "ut\t0\t5\tB\n"
    "labore\t6\t8\tO\n"
    "et\t9\t10\tO\n"
    "\n"
    "dolore\t0\t5\tO\n"
    "magna\t6\t8\tO\n"
    "aliquyam\t9\t10\tO\n"
    "\n"
)


class TestParse:
    def test_two_documents(self):
        docs = parse_conll(CORPUS)
        assert len(docs) == 2
        assert [d["doc_id"] for d in docs] == [0, 1]

    def test_first_char_tag_rule(self):
        docs = parse_conll(CORPUS)
        s0 = docs[0]["sentences"][0]
        assert s0["token_text"] == ["Lorem", "ipsum", "dolor"]
        assert s0["gold_tags"] == [B, I, O]
        assert s0["token_start"] == ["0", "6", "11"]  # verbatim strings
        assert s0["token_end"] == ["5", "10", "16"]

    def test_sentence_count(self):
        docs = parse_conll(CORPUS)
        assert [len(d["sentences"]) for d in docs] == [2, 2]
        assert docs[1]["sentences"][1]["token_text"] == ["dolore", "magna", "aliquyam"]

    def test_trailing_blank_lines(self):
        # reference test_read_documents_empty_lines_at_the_end: + "\n\n"
        docs = parse_conll(CORPUS + "\n\n")
        assert len(docs) == 2
        assert docs == parse_conll(CORPUS)

    def test_trailing_docstart_yields_empty_doc(self):
        # the reference appends the final document unconditionally
        # (conll_dataset.py:61-63)
        docs = parse_conll(CORPUS + "-DOCSTART-\t0\t0\tO\n")
        assert len(docs) == 3
        assert docs[2]["sentences"] == []

    def test_file_without_docstart(self):
        docs = parse_conll("a\t0\t1\tB\nb\t2\t3\tI\n")
        assert len(docs) == 1
        assert docs[0]["doc_id"] == 0
        assert docs[0]["sentences"][0]["gold_tags"] == [B, I]


class TestWriter:
    def test_round_trip_byte_identity(self, tmp_path):
        """Parse → write → bytes equal the tag-normalized rendering
        (reference round-trip test uses filecmp, test_CoNLLDataset.py:51-60)."""
        docs = parse_conll(CORPUS)
        out = tmp_path / "out.txt"
        write_conll_file(docs, str(out))
        assert out.read_text(encoding="utf8") == NORMALIZED

    def test_round_trip_is_fixpoint(self, tmp_path):
        out = tmp_path / "out.txt"
        write_conll_file(parse_conll(NORMALIZED), str(out))
        assert out.read_text(encoding="utf8") == NORMALIZED


class TestConllEval:
    def test_side_by_side_format(self):
        docs = parse_conll(CORPUS)
        doc = docs[0]
        doc["sentences"] = [
            {**s, "pred_tags": [O] * len(s["token_text"])} for s in doc["sentences"]
        ]
        text = format_conlleval_document(doc)
        assert text == (
            "\nLorem B O\nipsum I O\ndolor O O\n"
            "\nEirmod B O\ntempor O O\n. O O\n"
        )


class TestPredictionTsv:
    def test_parse_skips_malformed(self):
        text = "tok1 B\nmalformed\ntok2 O\nthree fields here\n"
        assert read_prediction_tsv(text) == [("tok1", "B"), ("tok2", "O")]

    def test_annotate_positionally(self):
        docs = parse_conll(CORPUS)
        preds = [
            ("Lorem", "O"), ("ipsum", "O"), ("dolor", "B"),
            ("Eirmod", "O"), ("tempor", "B"), (".", "I"),
            ("ut", "O"), ("labore", "O"), ("et", "O"),
            ("dolore", "B"), ("magna", "I"), ("aliquyam", "O"),
        ]
        out = annotate_documents_positionally(docs, preds)
        assert out[0]["sentences"][0]["pred_tags"] == [O, O, B]
        assert out[1]["sentences"][1]["pred_tags"] == [B, I, O]
        # gold untouched
        assert out[0]["sentences"][0]["gold_tags"] == [B, I, O]

    def test_annotate_text_mismatch_raises(self):
        docs = parse_conll(CORPUS)
        preds = [("WRONG", "O")] + [("x", "O")] * 11
        with pytest.raises(ValueError, match="Expected Token"):
            annotate_documents_positionally(docs, preds)


class TestRayReader:
    def test_read_conll_dataset(self, tmp_path):
        from bioner_ray.sources.conll import read_conll

        p = tmp_path / "corpus.txt"
        p.write_text(CORPUS, encoding="utf8")
        rows = read_conll(str(p)).take_all()
        assert len(rows) == 2
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[0]["sentences"][0]["token_text"] == ["Lorem", "ipsum", "dolor"]
        assert by_id[0]["path"].endswith("corpus.txt")
