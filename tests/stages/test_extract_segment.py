"""Stage tests: extraction byte-identity and segmentation over Ray Data."""

import pyarrow as pa
import ray.data as rd

from bioner_ray.fixtures import make_pages
from bioner_ray.schemas import DOCUMENTS_SCHEMA, EXTRACTED_SCHEMA, validate
from bioner_ray.stages.extract import extract_batch, extract_stage, extract_text_from_html
from bioner_ray.stages.segment import segment_batch, segment_stage


class TestExtract:
    def test_byte_identity_against_golden_column(self, pages_table):
        """The F1 invariant: extracted text per url is byte-identical to
        the golden ``text`` column (BASELINE.json input_hint)."""
        out = extract_batch(pages_table)
        assert out.column("text").to_pylist() == pages_table.column("text").to_pylist()

    def test_schema(self, pages_table):
        out = extract_batch(pages_table)
        validate(out, EXTRACTED_SCHEMA)

    def test_entities_unescaped(self):
        html = b"<html><body><p>a &amp; b &lt;c&gt;</p></body></html>"
        text, kind = extract_text_from_html(html)
        assert text == "a & b <c>\n"
        assert kind == "none"

    def test_truncation_marker_detected_and_kept(self):
        html = b"<html><body><p>x (ABSTRACT TRUNCATED AT 250 WORDS)</p></body></html>"
        text, kind = extract_text_from_html(html)
        assert text == "x (ABSTRACT TRUNCATED AT 250 WORDS)\n"
        assert kind == "250"

    def test_multiple_paragraphs_one_line_each(self):
        html = b"<p>first</p><p>second</p>"
        text, _ = extract_text_from_html(html)
        assert text == "first\nsecond\n"

    def test_no_paragraph(self):
        assert extract_text_from_html(b"<html></html>") == ("", "none")

    def test_via_ray_dataset(self, pages_table):
        ds = rd.from_arrow(pages_table)
        out = extract_stage(ds).take_all()
        golden = pages_table.column("text").to_pylist()
        by_url = {r["url"]: r["text"] for r in out}
        for url, expected in zip(pages_table.column("url").to_pylist(), golden):
            assert by_url[url] == expected


class TestSegment:
    def test_nested_structure(self):
        batch = pa.table(
            {
                "url": ["u1"],
                "text": ["Alpha beta. Gamma?"],
                "lang": ["en"],
            }
        )
        out = segment_batch(batch)
        validate(out, DOCUMENTS_SCHEMA)
        row = out.to_pylist()[0]
        assert row["n_sentences"] == 2
        assert row["n_tokens"] == 3
        s0, s1 = row["sentences"]
        assert s0["token_text"] == ["Alpha", "beta."]
        assert s0["token_start"] == [0, 6]
        assert s0["token_end"] == [5, 11]
        assert s1["token_text"] == ["Gamma?"]
        assert s1["sent_id"] == 1

    def test_empty_text(self):
        batch = pa.table({"url": ["u"], "text": [""], "lang": ["en"]})
        row = segment_batch(batch).to_pylist()[0]
        assert row["n_sentences"] == 0 and row["sentences"] == []

    def test_end_to_end_pages_to_documents(self, pages_table):
        ds = rd.from_arrow(pages_table)
        docs = segment_stage(extract_stage(ds)).take_all()
        assert len(docs) == pages_table.num_rows
        assert all(d["n_sentences"] >= 1 for d in docs)


class TestSentenceLengthCap:
    def test_giant_sentence_split_at_token_boundaries(self):
        from bioner_ray.stages.segment import segment_document

        text = " ".join(f"w{i}" for i in range(1300))  # no punctuation: one sentence
        sents = segment_document(text, max_sentence_tokens=512)
        assert [len(s["token_text"]) for s in sents] == [512, 512, 276]
        assert [s["sent_id"] for s in sents] == [0, 1, 2]
        # offsets stay relative to the ORIGINAL sentence (provenance)
        assert sents[1]["token_start"][0] > sents[0]["token_end"][-1]
        flat = [t for s in sents for t in s["token_text"]]
        assert flat == text.split()

    def test_short_sentences_unaffected(self):
        from bioner_ray.stages.segment import segment_document

        sents = segment_document("One two. Three four five.", max_sentence_tokens=512)
        assert [s["token_text"] for s in sents] == [["One", "two."], ["Three", "four", "five."]]
        assert [s["sent_id"] for s in sents] == [0, 1]
