"""PubMed XML source tests, including byte-parity against the real
reference fixture file (tests/ressources/pubmed21n0001-small.xml.gz) —
the same oracle the reference's own golden test uses
(tests/test_pubmed_parser.py:8-21)."""

import gzip
import sys

from bioner_ray.sources.pubmed import parse_pubmed_xml, read_pubmed, truncation_counters

REF_FIXTURE = "/root/reference/tests/ressources/pubmed21n0001-small.xml.gz"

XML = b"""<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle><Article>
    <Abstract><AbstractText>First abstract.</AbstractText></Abstract>
  </Article></PubmedArticle>
  <PubmedArticle><Article>
    <ArticleTitle>No abstract here</ArticleTitle>
  </Article></PubmedArticle>
  <PubmedArticle><Article>
    <OtherAbstract><AbstractText>Other abstract. (ABSTRACT TRUNCATED)</AbstractText></OtherAbstract>
  </Article></PubmedArticle>
  <PubmedArticle><Article>
    <Abstract></Abstract>
  </Article></PubmedArticle>
</PubmedArticleSet>
"""


class TestParse:
    def test_extraction_and_skips(self):
        rows = parse_pubmed_xml(XML, gzipped=False)
        assert len(rows) == 2
        assert rows[0]["text"] == "First abstract.\n"
        assert rows[0]["truncated_kind"] == "none"
        # marker detected but KEPT (reference no-op sub) + newline
        assert rows[1]["text"] == "Other abstract. (ABSTRACT TRUNCATED)\n"
        assert rows[1]["truncated_kind"] == "plain"

    def test_byte_parity_with_reference_on_real_fixture(self):
        """Concatenated abstracts must equal what the reference parser
        writes for the same file."""
        sys.path.insert(0, "/root/reference")
        try:
            from bioner.preprocessing.pubmed_parser import PubMedParser
        finally:
            sys.path.remove("/root/reference")
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            out = os.path.join(d, "ref.txt")
            PubMedParser().parse_pubmed_from(REF_FIXTURE, out)
            with open(out) as f:
                expected = f.read()
        with open(REF_FIXTURE, "rb") as f:
            rows = parse_pubmed_xml(f.read(), gzipped=True)
        ours = "".join(r["text"] for r in rows)
        assert ours == expected

    def test_ray_reader_and_counters(self, tmp_path):
        p = tmp_path / "x.xml.gz"
        p.write_bytes(gzip.compress(XML))
        ds = read_pubmed(str(p))
        counts = truncation_counters(ds)
        assert counts["total_abstracts"] == 2
        assert counts["total_truncated"] == 1
        assert counts["truncated_plain"] == 1
