"""Web-crawl axis: anchor extraction, URL resolution, canonicalization
(stages/weblinks.py) and the four pipeline queries (pipelines/web.py).
No reference analog (BioNER has no hyperlink stage); the contract under
test is the module docstring's generator arithmetic plus standard URL
semantics (RFC 3986 subset: absolute / protocol-relative /
root-relative references, default-port and fragment rules)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from bioner_ray.stages.weblinks import (
    canonicalize_urls_batch,
    extract_links_batch,
    resolve_links_batch,
    synthesize_pages_batch,
)


def _links(url: str, html: bytes) -> pa.Table:
    return extract_links_batch(
        pa.table({"url": [url], "html": pa.array([html], type=pa.binary())})
    )


class TestExtract:
    def test_basic(self):
        t = _links(
            "https://a.com/x",
            b'<p>hi</p><a href="https://b.com/y">one</a><a href="/z">two</a>',
        )
        assert t.column("href").to_pylist() == ["https://b.com/y", "/z"]
        assert t.column("anchor").to_pylist() == ["one", "two"]
        assert t.column("src_url").to_pylist() == ["https://a.com/x"] * 2

    def test_no_links_and_bad_utf8(self):
        assert _links("https://a.com", b"<p>none</p>").num_rows == 0
        # invalid bytes must not crash extraction (errors="replace")
        assert _links("https://a.com", b'\xff\xfe<a href="/q">r</a>').num_rows == 1

    def test_empty_block_passthrough(self):
        out = extract_links_batch(pa.table({}))
        assert out.num_rows == 0 and "href" in out.schema.names


class TestResolve:
    def _resolve(self, src: str, href: str) -> tuple[str, str]:
        t = resolve_links_batch(
            pa.table({"src_url": [src], "href": [href], "anchor": ["a"]})
        )
        return t.column("src_host")[0].as_py(), t.column("dst_host")[0].as_py()

    def test_absolute(self):
        assert self._resolve("https://a.com/x", "http://B.com:8080/y") == ("a.com", "b.com")

    def test_protocol_relative(self):
        assert self._resolve("https://a.com/x", "//c.com/y")[1] == "c.com"

    def test_root_relative(self):
        assert self._resolve("https://A.com:443/x", "/y") == ("a.com", "a.com")

    def test_port_and_query_never_in_host(self):
        assert self._resolve("https://a.com/x", "https://d.com?q=1")[1] == "d.com"

    def test_dst_url_granularity(self):
        from bioner_ray.stages.weblinks import resolve_dst_urls_batch

        t = resolve_dst_urls_batch(
            pa.table(
                {
                    "src_url": ["https://a.com/dir/x"] * 4,
                    "href": ["https://b.com/y", "//c.com/z", "/w", "rel.html"],
                    "anchor": ["1", "2", "3", "4"],
                }
            )
        )
        # path-relative dropped; others resolve to full URLs (not hosts)
        assert t.column("dst_url").to_pylist() == [
            "https://b.com/y",
            "https://c.com/z",
            "https://a.com/w",
        ]
        assert t.column("src_url").to_pylist() == ["https://a.com/dir/x"] * 3

    def test_unresolvable_refs_dropped_not_fabricated(self):
        t = resolve_links_batch(
            pa.table(
                {
                    "src_url": ["https://a.com/dir/x"] * 4,
                    "href": ["page.html", "../up.html", "mailto:bob@x.com", "/ok"],
                    "anchor": ["p", "u", "m", "o"],
                }
            )
        )
        # only the root-relative survives; no 'a.compage.html'-style hosts
        assert t.column("dst_host").to_pylist() == ["a.com"]
        assert t.column("anchor").to_pylist() == ["o"]


class TestCanonicalize:
    def _canon(self, url: str) -> str:
        t = canonicalize_urls_batch(pa.table({"url": [url]}))
        return t.column("canonical_url")[0].as_py()

    def test_fragment_and_case_and_port(self):
        assert self._canon("HTTPS://Site.COM:443/Path?Q=1#frag") == "https://site.com/Path?Q=1"
        assert self._canon("http://a.com:80/") == "http://a.com/"
        # non-default port survives
        assert self._canon("http://a.com:8080/x") == "http://a.com:8080/x"

    def test_utm_rules(self):
        base = "https://a.com/p"
        assert self._canon(base + "?utm_source=x") == base
        assert self._canon(base + "?utm_source=x&utm_medium=y") == base
        assert self._canon(base + "?utm_source=x&id=2") == base + "?id=2"
        assert self._canon(base + "?id=2&utm_source=x") == base + "?id=2"
        assert self._canon(base + "?a=1&utm_x=2&b=3") == base + "?a=1&b=3"

    def test_path_case_preserved(self):
        assert self._canon("https://a.com/CaseY?U=v") == "https://a.com/CaseY?U=v"


class TestSynthesisContract:
    def test_matches_arithmetic(self):
        n = 40
        pages = synthesize_pages_batch(pa.table({"doc_id": list(range(n))}), n)
        links = resolve_links_batch(extract_links_batch(pages))
        # total fan-out: sum over i of 1 + i%4
        assert links.num_rows == sum(1 + i % 4 for i in range(n))
        # spot-check page 5 (odd → host 5%16=5; k=2 links)
        t5 = extract_links_batch(pages.filter(pa.array([i == 5 for i in range(n)])))
        hrefs = t5.column("href").to_pylist()
        # j=0: tgt=(35+1)%40=36 even → host 0, form (5+0)%3=2 root-relative
        # j=1: tgt=(35+13+1)%40=9 odd → host 9, form 0 absolute
        assert hrefs == ["/doc/36", "https://site9.example.com/doc/9"]


@pytest.mark.usefixtures("ray_session")
class TestQueries:
    SF = "/root/testdata/sf0.001"

    def test_web_link_graph_totals(self):
        from bioner_ray.pipelines.web import web_link_graph

        df = web_link_graph(self.SF).to_pandas()
        assert df["n_links"].sum() == sum(1 + i % 4 for i in range(500))
        assert set(df.columns) == {"src_host", "dst_host", "n_links"}

    def test_host_pagerank_mass(self):
        from bioner_ray.pipelines.web import host_pagerank

        df = host_pagerank(self.SF).to_pandas()
        # 10 reachable hosts at n=500 (even ids → {0,2}; odd → odd % 16)
        assert len(df) == 10
        assert (df["rank"] > 0).all()

    def test_anchor_topk(self):
        from bioner_ray.pipelines.web import anchor_text_index

        df = anchor_text_index(self.SF).to_pandas()
        assert df.groupby("dst_host")["rk"].max().le(3).all()
        # within a host, rank order follows count order
        for _, g in df.groupby("dst_host"):
            g = g.sort_values("rk")
            assert g["n"].is_monotonic_decreasing or g["n"].nunique() < len(g)

    def test_host_quality_report_rates(self):
        from bioner_ray.pipelines.web import host_quality_report

        df = host_quality_report(self.SF).to_pandas()
        assert df["n_docs"].sum() == 500
        assert (df["n_kept"] <= df["n_docs"]).all()
        assert ((df["keep_rate"] >= 0) & (df["keep_rate"] <= 1)).all()

    def test_host_reciprocity_bounds(self):
        from bioner_ray.pipelines.web import host_reciprocity

        df = host_reciprocity(self.SF).to_pandas()
        assert (df["n_recip"] <= df["out_deg"]).all()
        assert ((df["reciprocity"] >= 0) & (df["reciprocity"] <= 1)).all()

    def test_web_link_delta_consistency(self):
        from bioner_ray.pipelines.web import web_link_delta, web_link_graph

        delta = web_link_delta(self.SF).to_pandas()
        assert set(delta["status"]) <= {"added", "changed"}  # B ⊇ A: never removed
        assert (delta["n_a"] != delta["n_b"]).all()
        # spot-check one 'changed' pair against the two graphs
        full = web_link_graph(self.SF).to_pandas()
        snap = web_link_graph(self.SF, snapshot_mod=3).to_pandas()
        row = delta[delta["status"] == "changed"].iloc[0]
        k = (row["src_host"], row["dst_host"])
        assert full.set_index(["src_host", "dst_host"]).loc[k, "n_links"] == row["n_b"]
        assert snap.set_index(["src_host", "dst_host"]).loc[k, "n_links"] == row["n_a"]

    def test_host_outlink_profile_folds_the_graph(self):
        from bioner_ray.pipelines.web import host_outlink_profile, web_link_graph

        df = host_outlink_profile(self.SF).to_pandas()
        g = web_link_graph(self.SF).to_pandas()
        assert df["out_links"].sum() == g["n_links"].sum()
        assert (df["n_internal"] <= df["out_links"]).all()
        assert ((df["external_frac"] >= 0) & (df["external_frac"] <= 1)).all()
        # n_dst_hosts counts distinct host pairs, so it matches the graph
        assert df.set_index("host")["n_dst_hosts"].sort_index().equals(
            g.groupby("src_host").size().sort_index().rename("n_dst_hosts")
        )

    def test_orphan_pages_matches_generator_arithmetic(self):
        from bioner_ray.pipelines.web import orphan_pages

        df = orphan_pages(self.SF).to_pandas()
        n = 500

        def host(i: int) -> int:
            return i % 4 if i % 2 == 0 else i % 16

        inbound = set()
        for i in range(n):
            for j in range(1 + i % 4):
                tgt = (7 * i + 13 * j + 1) % n
                # form 2 (root-relative) resolves on the SOURCE host
                h = host(i) if (i + j) % 3 == 2 else host(tgt)
                inbound.add((h, tgt))
        expected = {}
        for i in range(n):
            h = host(i)
            p, o = expected.get(h, (0, 0))
            expected[h] = (p + 1, o + ((h, i) not in inbound))
        got = {r.host: (r.n_pages, r.n_orphans) for r in df.itertuples()}
        assert got == {
            f"site{h}.example.com": v for h, v in expected.items()
        }
        assert df["n_pages"].sum() == n

    def test_crawl_frontier_is_uncrawled_and_ranked(self):
        from bioner_ray.pipelines.web import crawl_frontier

        df = crawl_frontier(self.SF).to_pandas()
        n = 500

        def host(i: int) -> int:
            return i % 4 if i % 2 == 0 else i % 16

        pages = {f"https://site{host(i)}.example.com/doc/{i}" for i in range(n)}
        # every frontier URL was discovered but never crawled
        assert not (set(df["url"]) & pages)
        assert df["rk"].tolist() == list(range(1, len(df) + 1))
        # rank order follows (n_inlinks desc, url asc)
        s = df.sort_values(["n_inlinks", "url"], ascending=[False, True])
        assert s["url"].tolist() == df.sort_values("rk")["url"].tolist()
        # frontier URLs only arise from cross-host root-relative refs,
        # so each sits on a host that differs from its doc's canonical
        for u in df["url"]:
            doc = int(u.rsplit("/", 1)[1])
            assert u != f"https://site{host(doc)}.example.com/doc/{doc}"

    def test_url_dedup_folds_every_variant(self):
        from bioner_ray.pipelines.web import url_canonical_dedup

        df = url_canonical_dedup(self.SF).to_pandas()
        assert len(df) == 500
        assert (df["n_dups"] == 2).all()
        assert df["canonical_url"].str.contains(r"[#?]|:443|HTTPS").sum() == 0


class TestUrlTemplates:
    def test_wildcard_rule_and_example(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.weblinks import url_templates

        # host a: 8 distinct product ids at pos 2 (>= threshold -> *);
        # host b: only 3 ids (stays literal); query strings must not
        # leak into segments
        urls = [f"https://a.com/item/{i}/view?ref=x" for i in range(8)]
        urls += [f"https://b.com/item/{i}/view" for i in range(3)]
        out = (
            url_templates(rd.from_arrow(pa.table({"url": urls})), min_distinct=8)
            .to_pandas()
            .sort_values(["host", "template"])
            .reset_index(drop=True)
        )
        a = out[out.host == "a.com"]
        assert list(a.template) == ["/item/*/view"]
        assert int(a.n_urls.iloc[0]) == 8
        assert a.example_url.iloc[0] == "https://a.com/item/0/view?ref=x"
        b = out[out.host == "b.com"]
        assert sorted(b.template) == [f"/item/{i}/view" for i in range(3)]
        assert (b.n_urls == 1).all()

    def test_sections_partition_decisions(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.weblinks import url_templates

        # same depth, different first segment: the high-cardinality
        # /p/{id} section folds while /docs/{v} (2 values) stays put
        urls = [f"https://h.com/p/{i}" for i in range(10)]
        urls += ["https://h.com/docs/v1", "https://h.com/docs/v2"]
        out = url_templates(
            rd.from_arrow(pa.table({"url": urls})), min_distinct=8
        ).to_pandas()
        tpls = set(out.template)
        assert "/p/*" in tpls and "/docs/v1" in tpls and "/docs/v2" in tpls


class TestRobotsGate:
    def test_longest_match_allow_tie_and_no_match(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.weblinks import robots_gate

        urls = [
            "https://a.example.com/private/x",       # blocked by /private/
            "https://a.example.com/private/pub/x",   # allowed: longer Allow
            "https://a.example.com/open/x",          # no rule -> allowed
            "https://b.example.com/private/x",       # other host, no rules
            "https://a.example.com/dup/x",           # equal-length tie -> Allow wins
        ]
        rules = {
            "a.example.com": [
                ("/private/", False),
                ("/private/pub/", True),
                ("/dup/", False),
                ("/dup/", True),
            ]
        }
        out = (
            robots_gate(rd.from_arrow(pa.table({"url": urls})), rules)
            .to_pandas()
            .set_index("url")
        )
        assert out.loc[urls[0], "allowed"] == 0 and out.loc[urls[0], "rule"] == "/private/"
        assert out.loc[urls[1], "allowed"] == 1 and out.loc[urls[1], "rule"] == "/private/pub/"
        assert out.loc[urls[2], "allowed"] == 1 and out.loc[urls[2], "rule"] == ""
        assert out.loc[urls[3], "allowed"] == 1
        assert out.loc[urls[4], "allowed"] == 1 and out.loc[urls[4], "rule"] == "/dup/"
