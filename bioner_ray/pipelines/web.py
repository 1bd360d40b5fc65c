"""Web-crawl analytics over Common-Crawl-style pages: host→host link
graph, domain PageRank, anchor-text index, and crawl-frontier URL
canonicalization — the stages that turn the north-star input table
(url, warc_ts, html, text, lang) into the link-side artifacts a
web-scale KG build consumes (domain authority priors, anchor-text
entity-linking priors, canonical-URL dedup of the frontier).

The synthetic crawl derives deterministically from ``documents.doc_id``
(contract in stages/weblinks.py's docstring) so every query here has an
exact DuckDB twin; the engine side does the real work — regex anchor
extraction over raw HTML bytes, vectorized relative-URL resolution and
canonicalization — and only the *expected answer* is re-derived
arithmetically by the twin.

Scale shape shared by all four: pages stream through stateless
``map_batches`` extraction (zero-copy Arrow in/out), and the only
exchanges are bounded bucketed aggregates — host-pair counts are
O(hosts²), canonical-URL groups are O(urls) but combiner-compressed
per block before the shuffle. Nothing materializes the crawl.
"""

from __future__ import annotations

import os

from bioner_ray.sources.parquet_io import read_parquet_clean

import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.stages.weblinks import (
    _host_idx,
    canonicalize_urls_batch,
    extract_links_batch,
    resolve_links_batch,
    synthesize_pages_batch,
)


def _nrows(sf_dir: str, name: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")).metadata.num_rows


def _synthetic_pages(sf_dir: str, snapshot_mod: int | None = None):
    """(url, html) crawl pages, one per document row (fixture input —
    on a real crawl this is ``read_parquet(pages, columns=["url",
    "html"])`` and everything downstream is unchanged).
    ``snapshot_mod`` keeps only doc_id % snapshot_mod == 0 — the
    crawl-snapshot stand-in (mod 3 cuts across BOTH host classes of the
    generator, unlike a parity split, so snapshot and full crawl share
    host pairs); the link-target modulus stays the FULL corpus count so
    snapshot pages link identically to their full-crawl twins."""
    import ray.data as rd

    n = _nrows(sf_dir, "documents")
    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    if snapshot_mod is not None:
        m = snapshot_mod

        def keep_mod(t: pa.Table) -> pa.Table:
            import numpy as np

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % m == 0))

        docs = docs.map_batches(keep_mod, batch_format="pyarrow")
    return docs.map_batches(
        lambda t: synthesize_pages_batch(t, n), batch_format="pyarrow"
    )


def _resolved_links(sf_dir: str, snapshot_mod: int | None = None):
    return (
        _synthetic_pages(sf_dir, snapshot_mod=snapshot_mod)
        .map_batches(extract_links_batch, batch_format="pyarrow")
        .map_batches(resolve_links_batch, batch_format="pyarrow")
    )


_URL_SCHEMA = pa.schema([("url", pa.string())])


def _page_urls(sf_dir: str):
    """One streaming pass projecting the crawl to its fetched URLs —
    the shared "what did we crawl" side of orphan_pages (crawled but
    unlinked) and crawl_frontier (linked but uncrawled)."""
    from bioner_ray.stages.shuffle import pin_schema

    return pin_schema(
        _synthetic_pages(sf_dir).map_batches(
            lambda t: t.select(["url"]) if t.num_columns else _URL_SCHEMA.empty_table(),
            batch_format="pyarrow",
        ),
        _URL_SCHEMA,
    )


def _inbound_urls(sf_dir: str):
    """Every resolved outbound link target as a bare ``url`` column
    (duplicates preserved — callers aggregate). The single definition
    of "discovered URL" the crawl audits share; a change to the
    URL-resolution contract lands in both automatically."""
    from bioner_ray.stages.weblinks import resolve_dst_urls_batch

    return (
        _synthetic_pages(sf_dir)
        .map_batches(extract_links_batch, batch_format="pyarrow")
        .map_batches(resolve_dst_urls_batch, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(["dst_url"]).rename_columns(["url"])
            if t.num_columns
            else _URL_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
    )


def web_link_graph(sf_dir: str, snapshot_mod: int | None = None):
    """Host→host link graph from raw HTML: anchor extraction → URL
    resolution (absolute / protocol-relative / root-relative) → host
    projection → ONE combiner-compressed aggregate. The output is the
    domain graph a crawl scheduler and a domain-authority ranker both
    read; at crawl scale it is O(hosts²) ≪ O(links). ``snapshot_mod``
    restricts to the crawl snapshot (web_link_delta's A side).
    Columns: src_host, dst_host, n_links."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    out = pa.schema(
        [("src_host", pa.string()), ("dst_host", pa.string()), ("n_links", pa.int64())]
    )
    return pin_schema(
        bucketed_aggregate(
            with_ones(_resolved_links(sf_dir, snapshot_mod=snapshot_mod), "n_links"),
            ["src_host", "dst_host"],
            [("n_links", "sum")],
        ),
        out,
    )


def host_pagerank_delta(sf_dir: str):
    """Authority shift between crawl snapshots: the scaled-integer
    PageRank of snapshot A (every third doc_id — web_link_delta's
    convention) vs the full crawl B, LEFT-joined on host (A's pages
    are a subset of B's, so A's host set is too). ``rank_delta`` in
    exact scaled-integer units ranks the hosts GAINING authority as
    the crawl grows — the recrawl-priority / trending-domain signal.
    Both PageRank runs are the engine's deterministic fixed-iteration
    kernel (scale 10^12, damping 850/1000, 3 rounds), so the deltas
    are exact integer subtractions the twin replays bit-for-bit; the
    join is ONE host-bucketed exchange over node-sized tables.
    Columns: node, rank_a, rank_b, rank_delta, status (new/shared)."""
    from bioner_ray.stages.graph import pagerank
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    def pr(snapshot_mod):
        return pagerank(
            web_link_graph(sf_dir, snapshot_mod=snapshot_mod),
            subj_col="src_host",
            obj_col="dst_host",
            weight_col="n_links",
        )

    a_schema = pa.schema([("node", pa.string()), ("rank_a", pa.int64())])
    b_schema = pa.schema([("node", pa.string()), ("rank_b", pa.int64())])
    pra = pr(3).map_batches(
        lambda t: pa.table({"node": t.column("node"), "rank_a": t.column("rank")})
        if t.num_columns
        else a_schema.empty_table(),
        batch_format="pyarrow",
    )
    prb = pr(None).map_batches(
        lambda t: pa.table({"node": t.column("node"), "rank_b": t.column("rank")})
        if t.num_columns
        else b_schema.empty_table(),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        prb, pra, ["node"], b_schema, a_schema, join_type="left outer"
    )

    out_schema = pa.schema(
        [
            ("node", pa.string()),
            ("rank_a", pa.int64()),
            ("rank_b", pa.int64()),
            ("rank_delta", pa.int64()),
            ("status", pa.string()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        new = pc.is_null(t.column("rank_a"))
        ra = pc.fill_null(t.column("rank_a"), 0)
        return pa.table(
            {
                "node": t.column("node"),
                "rank_a": ra,
                "rank_b": t.column("rank_b"),
                "rank_delta": pc.subtract(t.column("rank_b"), ra),
                "status": pc.if_else(new, "new", "shared"),
            },
            schema=out_schema,
        )

    return pin_schema(joined.map_batches(finish, batch_format="pyarrow"), out_schema)


def host_inlink_entropy(sf_dir: str):
    """Inlink-source diversity per destination host — the link-farm /
    paid-network screen a crawl-quality auditor runs: a host whose
    inlinks come from ONE source host (H ≈ 0) is boosted artificially;
    a genuinely popular host draws links from many sources (high H).
    H(src | dst) over the host link graph, in the engine's exact
    integer entropy convention (each term c·⌊10⁶·ln(n/c)⌋, libm log —
    bit-replayed by the twin).

    Scale shape: the link graph is hosts²-bounded (web_link_graph's
    combiner-compressed aggregate); ONE dst-bucketed map_groups folds
    each host's inlink distribution with run-scan segment arithmetic —
    no driver walk, no join. Columns: dst_host, n_inlinks,
    n_src_hosts, h_micro."""
    import math

    from bioner_ray.stages.shuffle import bucketed_map_groups, pin_schema

    out_schema = pa.schema(
        [
            ("dst_host", pa.string()),
            ("n_inlinks", pa.int64()),
            ("n_src_hosts", pa.int64()),
            ("h_micro", pa.int64()),
        ]
    )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return out_schema.empty_table()
        g = g.sort_by([("dst_host", "ascending"), ("src_host", "ascending")])
        import numpy as np

        dst = np.asarray(g.column("dst_host").to_pylist(), dtype=object)
        c = g.column("n_links").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
        ends = np.r_[starts[1:], len(dst)]
        cs = np.concatenate([[0], np.cumsum(c)])
        n_run = cs[ends] - cs[starts]
        d_out, h_out = [], []
        for s_, e_, n in zip(starts, ends, n_run):
            # per-term libm log keeps the micro floors bit-identical to
            # DuckDB's ln (numpy's SIMD log drifts 1 ulp on this box)
            h = sum(
                int(x) * math.floor(math.log(int(n) / int(x)) * 1_000_000)
                for x in c[s_:e_]
            )
            d_out.append(dst[s_])
            h_out.append(h)
        return pa.table(
            {
                "dst_host": pa.array(d_out, type=pa.string()),
                "n_inlinks": pa.array(n_run.astype(np.int64)),
                "n_src_hosts": pa.array((ends - starts).astype(np.int64)),
                "h_micro": pa.array(np.array(h_out, dtype=np.int64)),
            },
            schema=out_schema,
        )

    return pin_schema(
        bucketed_map_groups(web_link_graph(sf_dir), ["dst_host"], fold), out_schema
    )


def web_link_delta(sf_dir: str):
    """Crawl-to-crawl host-graph diff: snapshot A (every third
    doc_id) vs the full crawl B, FULL OUTER joined on the host pair via
    the engine's empty-partition-proof bucketed join — the link-rot /
    link-velocity monitor between crawls. Both sides fold to bounded
    host-pair aggregates BEFORE the join (the exchange moves host
    pairs, never links); status follows kg_edge_delta's convention.
    Columns: src_host, dst_host, n_a, n_b, status."""
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    key = [("src_host", pa.string()), ("dst_host", pa.string())]
    a_schema = pa.schema(key + [("n_a", pa.int64())])
    b_schema = pa.schema(key + [("n_b", pa.int64())])

    def rn(name):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return (a_schema if name == "n_a" else b_schema).empty_table()
            return t.rename_columns(
                [name if c == "n_links" else c for c in t.schema.names]
            )

        return fn

    joined = bucketed_inner_join(
        web_link_graph(sf_dir, snapshot_mod=3).map_batches(rn("n_a"), batch_format="pyarrow"),
        web_link_graph(sf_dir).map_batches(rn("n_b"), batch_format="pyarrow"),
        ["src_host", "dst_host"],
        a_schema,
        b_schema,
        join_type="full outer",
    )

    out_schema = pa.schema(
        key + [("n_a", pa.int64()), ("n_b", pa.int64()), ("status", pa.string())]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        import numpy as np

        na = pc.fill_null(t.column("n_a"), 0).to_numpy(zero_copy_only=False)
        nb = pc.fill_null(t.column("n_b"), 0).to_numpy(zero_copy_only=False)
        status = np.where(na == 0, "added", np.where(nb == 0, "removed", "changed"))
        keep = na != nb
        return pa.table(
            {
                "src_host": t.column("src_host").filter(pa.array(keep)),
                "dst_host": t.column("dst_host").filter(pa.array(keep)),
                "n_a": pa.array(na[keep]),
                "n_b": pa.array(nb[keep]),
                "status": pa.array(status[keep].tolist(), type=pa.string()),
            }
        )

    return pin_schema(joined.map_batches(finish, batch_format="pyarrow"), out_schema)


def host_outlink_profile(sf_dir: str):
    """Per-host outlink profile — the crawl spam/SEO screen: total
    outbound links, distinct destination hosts, internal-link count and
    the external-link fraction (link farms show huge out_links with
    tiny n_dst_hosts; boilerplate navs show external_frac ≈ 0). Folds
    the ALREADY-bounded host-pair graph (O(hosts²) rows) once more, so
    the only exchange beyond web_link_graph's is host-sized.
    Columns: host, out_links, n_dst_hosts, n_internal, external_frac."""
    import numpy as np

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    mid = pa.schema(
        [
            ("host", pa.string()),
            ("out_links", pa.int64()),
            ("n_dst_hosts", pa.int64()),
            ("n_internal", pa.int64()),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return mid.empty_table()
        n = t.column("n_links").to_numpy(zero_copy_only=False)
        internal = pc.equal(t.column("src_host"), t.column("dst_host")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "host": t.column("src_host"),
                "out_links": t.column("n_links"),
                "n_dst_hosts": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_internal": pa.array(np.where(internal, n, 0).astype(np.int64)),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            web_link_graph(sf_dir).map_batches(prep, batch_format="pyarrow"),
            ["host"],
            [("out_links", "sum"), ("n_dst_hosts", "sum"), ("n_internal", "sum")],
        ),
        mid,
    )

    def finish(t: pa.Table) -> pa.Table:
        ol = t.column("out_links").to_numpy(zero_copy_only=False)
        ni = t.column("n_internal").to_numpy(zero_copy_only=False)
        import numpy as np

        return t.append_column(
            "external_frac",
            pa.array((ol - ni).astype(np.float64) / ol.astype(np.float64)),
        )

    return pin_schema(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema(list(mid) + [("external_frac", pa.float64())]),
    )


def orphan_pages(sf_dir: str):
    """Crawl-completeness audit at URL granularity: pages NO anchor on
    any crawled page resolves to — the orphan set a sitemap audit or a
    re-crawl scheduler consumes, folded per host into (n_pages,
    n_orphans, orphan_frac). Root-relative hrefs resolve against the
    SOURCE host (a cross-host "/doc/k" reference does NOT de-orphan the
    canonical page on another host), so this exercises resolution
    fidelity beyond the host projection.

    Shape: extraction streams; inbound URLs distinct via ONE
    combiner-compressed aggregate (O(distinct urls) exchange); the
    orphan set is the engine's empty-partition-proof left-anti bucketed
    join of page urls against inbound urls (never a driver-side set);
    the final per-host fold is host-sized. Columns: host, n_pages,
    n_orphans, orphan_frac."""
    import numpy as np

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )
    from bioner_ray.stages.weblinks import host_of

    url_schema = _URL_SCHEMA
    # two independent streaming passes over the (column-pruned) input —
    # never materialize the crawl to share it between consumers
    page_urls = _page_urls(sf_dir)
    inbound = _inbound_urls(sf_dir)
    inbound_distinct = pin_schema(
        bucketed_aggregate(with_ones(inbound), ["url"], [("one", "min")]).map_batches(
            lambda t: t.select(["url"]), batch_format="pyarrow"
        ),
        url_schema,
    )
    orphans = pin_schema(
        bucketed_inner_join(
            page_urls,
            inbound_distinct,
            ["url"],
            url_schema,
            url_schema,
            join_type="left anti",
        ),
        url_schema,
    )

    tagged = pa.schema(
        [("host", pa.string()), ("n_pages", pa.int64()), ("n_orphans", pa.int64())]
    )

    def tag(orphan: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return tagged.empty_table()
            host = host_of(t.column("url"))
            n = t.num_rows
            return pa.table(
                {
                    "host": host,
                    "n_pages": pa.array(np.full(n, 1 - orphan, dtype=np.int64)),
                    "n_orphans": pa.array(np.full(n, orphan, dtype=np.int64)),
                }
            )

        return fn

    # orphans are a subset of pages: page rows carry (1, 0), orphan
    # rows carry (0, 1), ONE bounded aggregate over the union.
    unioned = page_urls.map_batches(tag(0), batch_format="pyarrow").union(
        orphans.map_batches(tag(1), batch_format="pyarrow")
    )
    agg = pin_schema(
        bucketed_aggregate(
            unioned, ["host"], [("n_pages", "sum"), ("n_orphans", "sum")]
        ),
        tagged,
    )

    def finish(t: pa.Table) -> pa.Table:
        np_ = t.column("n_pages").to_numpy(zero_copy_only=False)
        no = t.column("n_orphans").to_numpy(zero_copy_only=False)
        return t.append_column(
            "orphan_frac", pa.array(no.astype(np.float64) / np_.astype(np.float64))
        )

    return pin_schema(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema(list(tagged) + [("orphan_frac", pa.float64())]),
    )


def crawl_frontier(sf_dir: str, k: int = 50):
    """Crawl-scheduler feed: the top-k DISCOVERED-BUT-UNCRAWLED URLs
    ranked by inbound-link count — exactly the queue a breadth-first
    recrawl pops next (cross-host root-relative references mint URLs on
    the wrong host, so the synthetic crawl has a real frontier). The
    dual of ``orphan_pages``: orphans are crawled pages nothing links
    to; the frontier is linked URLs the crawl never fetched.

    Shape: inbound URLs fold through ONE combiner-compressed aggregate
    (O(distinct urls) exchange), the uncrawled set is a left-anti
    bucketed join against page urls, and the top-k rides the rank
    stage's block-local prune (shuffle moves ≤ k rows per block, never
    the frontier). Columns: url, host, n_inlinks, rk."""
    import numpy as np

    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )
    from bioner_ray.stages.weblinks import host_of

    url_schema = _URL_SCHEMA
    cnt_schema = pa.schema([("url", pa.string()), ("n_inlinks", pa.int64())])
    page_urls = _page_urls(sf_dir)
    inbound = _inbound_urls(sf_dir)
    counts = pin_schema(
        bucketed_aggregate(
            with_ones(inbound, "n_inlinks"), ["url"], [("n_inlinks", "sum")]
        ),
        cnt_schema,
    )
    frontier = pin_schema(
        bucketed_inner_join(
            counts, page_urls, ["url"], cnt_schema, url_schema, join_type="left anti"
        ),
        cnt_schema,
    )

    g_schema = pa.schema(list(cnt_schema) + [("g", pa.int32())])

    def add_g(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return g_schema.empty_table()
        return t.append_column("g", pa.array(np.zeros(t.num_rows, dtype=np.int32)))

    top = top_k_per_group(
        frontier.map_batches(add_g, batch_format="pyarrow"),
        key_col="g",
        order_by=[("n_inlinks", "descending"), ("url", "ascending")],
        k=k,
    )

    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("host", pa.string()),
            ("n_inlinks", pa.int64()),
            ("rk", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        host = host_of(t.column("url"))
        return pa.table(
            {
                "url": t.column("url"),
                "host": host,
                "n_inlinks": t.column("n_inlinks"),
                "rk": t.column("rk"),
            }
        )

    return pin_schema(top.map_batches(finish, batch_format="pyarrow"), out_schema)


def host_boilerplate_ratio(sf_dir: str):
    """Per-host C4-segment duplication rate: the share of each host's
    10-token segments that are corpus-level repeats (first occurrence
    keeps, later copies count as boilerplate) — the audit that tells a
    crawl which domains are template farms before a line-level dedup
    pass is tuned. Composes the segment dedup stage with the crawl's
    host projection; beyond segment_dedup's one segment-text exchange
    the only shuffle is the host-sized fold. Columns: host, n_segs,
    n_dropped, dup_frac."""
    import numpy as np

    from bioner_ray.pipelines.corpus import paragraph_dedup
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    # the per-doc segment stats ARE paragraph_dedup's output (and the
    # SQL twin composes on d["paragraph_dedup"]) — reuse it so the
    # window constant / column contract can never silently diverge
    segs = paragraph_dedup(sf_dir)

    mid = pa.schema(
        [("host", pa.string()), ("n_segs", pa.int64()), ("n_dropped", pa.int64())]
    )

    def to_host(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return mid.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        n_segs = t.column("n_segs").to_numpy(zero_copy_only=False)
        n_kept = t.column("n_kept").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "host": pa.array(
                    [f"site{h}.example.com" for h in hosts.tolist()], type=pa.string()
                ),
                "n_segs": pa.array(n_segs),
                "n_dropped": pa.array(n_segs - n_kept),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            segs.map_batches(to_host, batch_format="pyarrow"),
            ["host"],
            [("n_segs", "sum"), ("n_dropped", "sum")],
        ),
        mid,
    )

    def finish(t: pa.Table) -> pa.Table:
        ns = t.column("n_segs").to_numpy(zero_copy_only=False)
        nd = t.column("n_dropped").to_numpy(zero_copy_only=False)
        return t.append_column(
            "dup_frac", pa.array(nd.astype(np.float64) / ns.astype(np.float64))
        )

    return pin_schema(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema(list(mid) + [("dup_frac", pa.float64())]),
    )


def host_split(sf_dir: str):
    """Leakage-safe host-disjoint train/val/test split audit: every
    document is assigned to the split of its CRAWL HOST (md5-hash of
    the host mod 4 → <2 train, =2 val, =3 test — mod 4 because the
    synthetic crawl has 10 distinct hosts and this is the split rule
    that leaves no split empty), so templated /
    near-duplicate pages from one domain can never straddle the
    boundary — the contamination mode a random per-document split
    invites and ``embedding_leakage``/``decontaminate`` then have to
    detect after the fact. Host of a document = the host that served
    it (the synthetic corpus pins host = site{host_idx(doc_id)}
    .example.com — stages/weblinks.py module contract, same derivation
    as ``host_boilerplate_ratio``).

    Scale shape: ONE pass computes (host, tokens) per document
    vectorized; a (split, host)-keyed bucketed aggregate bounds the
    exchange by the host vocabulary, and the final fold is 3 rows.
    The md5 split hash replays in SQL exactly (the error_samples /
    hash_walks md5-prefix convention). Columns: split, n_hosts,
    n_docs, n_tokens."""
    import numpy as np

    from bioner_ray.stages.graph import _node_hash_column
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.weblinks import _host_idx

    mid = pa.schema(
        [
            ("split", pa.string()),
            ("host", pa.string()),
            ("n_docs", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )

    def per_doc(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return mid.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = pa.array(
            [f"site{h}.example.com" for h in _host_idx(ids).tolist()],
            type=pa.string(),
        )
        memo: dict = {}
        hm = _node_hash_column(hosts, memo) % np.uint64(4)
        split = np.where(hm < 2, "train", np.where(hm == 2, "val", "test"))
        # same non-empty \s+ token count as the logprob/dsir kernels
        sp = pc.split_pattern_regex(
            pc.fill_null(t.column("text"), ""), r"\s+"
        ).combine_chunks()
        off = sp.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = sp.values.slice(off[0], off[-1] - off[0])
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        cs = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        starts, ends = off[:-1] - off[0], off[1:] - off[0]
        return pa.table(
            {
                "split": pa.array(split, type=pa.string()),
                "host": hosts,
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_tokens": pa.array(cs[ends] - cs[starts]),
            }
        )

    import ray.data as rd

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    per_host = pin_schema(
        bucketed_aggregate(
            docs.map_batches(per_doc, batch_format="pyarrow"),
            ["split", "host"],
            [("n_docs", "sum"), ("n_tokens", "sum")],
        ),
        mid,
    )
    out_schema = pa.schema(
        [
            ("split", pa.string()),
            ("n_hosts", pa.int64()),
            ("n_docs", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )

    def host_row(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "split": t.column("split"),
                "n_hosts": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_docs": t.column("n_docs"),
                "n_tokens": t.column("n_tokens"),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            per_host.map_batches(host_row, batch_format="pyarrow"),
            ["split"],
            [("n_hosts", "sum"), ("n_docs", "sum"), ("n_tokens", "sum")],
        ),
        out_schema,
    )


def host_pagerank(sf_dir: str):
    """Domain authority: the engine's scaled-integer fixed-iteration
    PageRank (stages/graph.py — ONE bucketed join + ONE bucketed
    aggregate per round, materialize-per-round lineage cut) over the
    host link graph. Same arithmetic contract as kg_pagerank (scale
    10^12, damping 850/1000, 3 iterations, dangling mass evaporates),
    so the twin is the same unrolled HUGEINT CTE over the link-graph
    edges. Columns: node, rank."""
    from bioner_ray.stages.graph import pagerank

    return pagerank(
        web_link_graph(sf_dir),
        subj_col="src_host",
        obj_col="dst_host",
        weight_col="n_links",
    )


def anchor_text_index(sf_dir: str):
    """Anchor-text priors: per target host, the top-3 anchor strings by
    frequency (ties → anchor ascending) — the classic web-corpus signal
    an entity linker consumes as surface-form priors. Combiner-pruned
    per-group top-k (stages/rank.py) over ONE bounded aggregate.
    Columns: dst_host, anchor, n, rk."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    counts = pin_schema(
        bucketed_aggregate(
            with_ones(_resolved_links(sf_dir), "n"),
            ["dst_host", "anchor"],
            [("n", "sum")],
        ),
        pa.schema(
            [("dst_host", pa.string()), ("anchor", pa.string()), ("n", pa.int64())]
        ),
    )
    return pin_schema(
        top_k_per_group(counts, "dst_host", [("n", "descending"), ("anchor", "ascending")], 3),
        pa.schema(
            [
                ("dst_host", pa.string()),
                ("anchor", pa.string()),
                ("n", pa.int64()),
                ("rk", pa.int64()),
            ]
        ),
    )


def host_quality_report(sf_dir: str, min_tokens: int = 20, min_ttr: float = 0.3):
    """Per-host quality keep-rate — the crawl blocklist feed: every
    page scored by the corpus C4-style gate (token window + lexical
    diversity, the exact quality_docs predicate), folded per host into
    (n_docs, n_kept, keep_rate). A host whose keep_rate collapses gets
    throttled in the next crawl. ONE streaming flag pass + ONE bounded
    per-host aggregate; keep_rate is a single float division, identical
    in the twin. Columns: host, n_docs, n_kept, keep_rate."""
    import numpy as np
    import ray.data as rd

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import _split_lower

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def flag(t: pa.Table) -> pa.Table:
        toks = _split_lower(t, "text")
        kept = np.array(
            [
                (min_tokens <= len(x) <= 1_000_000)
                and (len(set(x)) / max(len(x), 1) >= min_ttr)
                for x in toks
            ],
            dtype=np.int64,
        )
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = [f"site{h}.example.com" for h in _host_idx(ids).tolist()]
        return pa.table(
            {
                "host": pa.array(hosts, type=pa.string()),
                "n_docs": pa.array(np.ones(len(kept), dtype=np.int64)),
                "n_kept": pa.array(kept),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            docs.map_batches(flag, batch_format="pyarrow"),
            ["host"],
            [("n_docs", "sum"), ("n_kept", "sum")],
        ),
        pa.schema([("host", pa.string()), ("n_docs", pa.int64()), ("n_kept", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        nd = t.column("n_docs").to_numpy(zero_copy_only=False)
        nk = t.column("n_kept").to_numpy(zero_copy_only=False)
        return t.append_column(
            "keep_rate", pa.array(nk.astype(np.float64) / nd.astype(np.float64))
        )

    return pin_schema(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema(
            [
                ("host", pa.string()),
                ("n_docs", pa.int64()),
                ("n_kept", pa.int64()),
                ("keep_rate", pa.float64()),
            ]
        ),
    )


def host_reciprocity(sf_dir: str):
    """Link-graph reciprocity per host: of a host's distinct outbound
    host edges (self-loops excluded), the fraction whose reverse edge
    also exists — the mutual-linking signal that separates organic
    hubs from link farms. One left-semi bucketed join of the host edge
    table against its own reversal, then ONE bounded per-host fold (the
    out-degree and reciprocal counts union into a single aggregate).
    Columns: host, out_deg, n_recip, reciprocity."""
    import numpy as np

    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, pin_schema

    es = pa.schema([("src_host", pa.string()), ("dst_host", pa.string())])
    edges = pin_schema(
        web_link_graph(sf_dir).map_batches(
            lambda t: t.select(["src_host", "dst_host"]).filter(
                pc.not_equal(t.column("src_host"), t.column("dst_host"))
            )
            if t.num_columns
            else es.empty_table(),
            batch_format="pyarrow",
        ),
        es,
    ).materialize()
    rev = edges.map_batches(
        lambda t: pa.table(
            {"src_host": t.column("dst_host"), "dst_host": t.column("src_host")}
        ),
        batch_format="pyarrow",
    )
    recip = bucketed_inner_join(
        edges, rev, ["src_host", "dst_host"], es, es, join_type="left semi"
    )

    def tag(rec: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.schema(
                    [("host", pa.string()), ("out_deg", pa.int64()), ("n_recip", pa.int64())]
                ).empty_table()
            n = t.num_rows
            return pa.table(
                {
                    "host": t.column("src_host"),
                    "out_deg": pa.array(np.full(n, 1 - rec, dtype=np.int64)),
                    "n_recip": pa.array(np.full(n, rec, dtype=np.int64)),
                }
            )

        return fn

    unioned = edges.map_batches(tag(0), batch_format="pyarrow").union(
        recip.map_batches(tag(1), batch_format="pyarrow")
    )
    agg = bucketed_aggregate(unioned, ["host"], [("out_deg", "sum"), ("n_recip", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        od = t.column("out_deg").to_numpy(zero_copy_only=False)
        nr = t.column("n_recip").to_numpy(zero_copy_only=False)
        return t.append_column(
            "reciprocity", pa.array(nr.astype(np.float64) / od.astype(np.float64))
        )

    return pin_schema(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema(
            [
                ("host", pa.string()),
                ("out_deg", pa.int64()),
                ("n_recip", pa.int64()),
                ("reciprocity", pa.float64()),
            ]
        ),
    )


def web_mirror_candidates(
    sf_dir: str, prefix_tokens: int = 8, max_block_docs: int = 1024
):
    """Cross-host mirror detection, candidate-generation stage: host
    pairs whose pages share a content blocking key (the first
    ``prefix_tokens`` whitespace tokens, lowercased) — the cheap
    prefix-fingerprint block that feeds a full near-dup compare on a
    real crawl. Counts CROSS-host doc pairs per (host_a < host_b).

    Shape: one tokenizing scan (the RE2 ``_split_lower`` contract the
    twin replays), in-key pair emission via the dedup family's bucketed
    run-scan (stages/dedup._bucketed_pairs — coarse key buckets, local
    sort + vectorized run pairing), then hosts recovered from doc_id
    arithmetic vectorized and ONE bounded host-pair aggregate. Never an
    all-pairs product: blocks over ``max_block_docs`` members are
    stop-keys, skipped (boilerplate prefixes on a real crawl) — raise
    the cap for oracle-checked corpora, exactly the jaccard_pairs
    ``max_shingle_docs`` convention, since the SQL twin's self-join has
    no cap. Columns: host_a, host_b, n_candidates."""
    import numpy as np
    import ray.data as rd

    from bioner_ray.stages.dedup import _bucketed_pairs
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.textstats import _split_lower

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def key_rows(t: pa.Table) -> pa.Table:
        keys = [" ".join(toks[:prefix_tokens]) for toks in _split_lower(t, "text")]
        return pa.table(
            {"k": pa.array(keys, type=pa.string()), "doc_id": t.column("doc_id")}
        )

    pairs = _bucketed_pairs(
        docs.map_batches(key_rows, batch_format="pyarrow"),
        "k",
        "doc_id",
        max_group=max_block_docs,
    )

    def to_hosts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("host_a", pa.string()), ("host_b", pa.string())]
            ).empty_table()
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        ha, hb = _host_idx(a), _host_idx(b)
        keep = ha != hb
        lo = np.minimum(ha[keep], hb[keep])
        hi = np.maximum(ha[keep], hb[keep])
        return pa.table(
            {
                "host_a": pa.array([f"site{h}.example.com" for h in lo.tolist()]),
                "host_b": pa.array([f"site{h}.example.com" for h in hi.tolist()]),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            with_ones(pairs.map_batches(to_hosts, batch_format="pyarrow"), "n_candidates"),
            ["host_a", "host_b"],
            [("n_candidates", "sum")],
        ),
        pa.schema(
            [("host_a", pa.string()), ("host_b", pa.string()), ("n_candidates", pa.int64())]
        ),
    )


def _url_variants_batch(batch: pa.Table) -> pa.Table:
    """Two crawl sightings per page: the clean URL plus one messy
    variant cycling through case, default port, utm params, fragment —
    the four rewrites canonicalize_urls_batch must fold."""
    import numpy as np

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = _host_idx(ids)
    urls = []
    for i, h in zip(ids.tolist(), hosts.tolist()):
        base = f"https://site{h}.example.com/doc/{i}"
        urls.append(base)
        m = i % 4
        if m == 0:
            urls.append(f"HTTPS://SITE{h}.EXAMPLE.COM/doc/{i}")
        elif m == 1:
            urls.append(f"https://site{h}.example.com:443/doc/{i}")
        elif m == 2:
            urls.append(base + "?utm_source=feed&utm_campaign=x")
        else:
            urls.append(base + "#section-2")
    return pa.table({"url": pa.array(urls, type=pa.string())})


def url_canonical_dedup(sf_dir: str):
    """Crawl-frontier dedup: canonicalize every sighted URL (fragment /
    utm / case / default-port rules, all vectorized RE2 passes) and
    collapse to one row per canonical with the sighting count and the
    lexicographically first raw form (the crawl's provenance pick).
    The aggregate is combiner-compressed per block, so the shuffle
    carries one row per distinct canonical URL per block — the same
    (id, hash)-style exchange as exact dedup. Columns: canonical_url,
    n_dups, first_url."""
    import ray.data as rd

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    sighted = docs.map_batches(_url_variants_batch, batch_format="pyarrow").map_batches(
        canonicalize_urls_batch, batch_format="pyarrow"
    )
    agg = bucketed_aggregate(
        with_ones(sighted, "n_dups"),
        ["canonical_url"],
        [("n_dups", "sum"), ("url", "min")],
    )

    def rename(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.rename_columns(
            ["first_url" if c == "url" else c for c in t.schema.names]
        )

    return pin_schema(
        agg.map_batches(rename, batch_format="pyarrow"),
        pa.schema(
            [
                ("canonical_url", pa.string()),
                ("n_dups", pa.int64()),
                ("first_url", pa.string()),
            ]
        ),
    )


def web_host_components(sf_dir: str, min_candidates: int = 2):
    """Site-family detection: connected components over the cross-host
    MIRROR-candidate graph (``web_mirror_candidates``), keeping only
    host pairs with ≥ ``min_candidates`` shared-prefix page pairs —
    the crawl-ops step that folds mirror farms / CDN aliases of one
    logical site into a single family so crawl budgets, dedup scopes
    and domain-authority scores apply per FAMILY, not per alias (the
    raw link graph is useless for this: any healthy crawl's host graph
    is one giant weakly-connected component, so components are only
    meaningful over the high-precision mirror evidence).

    Scale shape: the pair population is bounded by O(hosts²) mirror
    candidates — never page-sized — and the components run on the
    shared ``stages/graph.string_components`` machinery (driver
    union-find under the cap, md5-id label propagation above it).
    Columns: host, family (family = lexicographic-min member host)."""
    from bioner_ray.stages.graph import string_components

    pair_schema = pa.schema([("host_a", pa.string()), ("host_b", pa.string())])
    pairs = web_mirror_candidates(sf_dir).map_batches(
        lambda t: t.select(["host_a", "host_b"]).filter(
            pc.greater_equal(t.column("n_candidates"), min_candidates)
        )
        if t.num_columns
        else pair_schema.empty_table(),
        batch_format="pyarrow",
    )
    out = string_components(pairs, lo_col="host_a", hi_col="host_b")
    return out.map_batches(
        lambda t: t.rename_columns(["host", "family"])
        if t.num_columns
        else pa.schema([("host", pa.string()), ("family", pa.string())]).empty_table(),
        batch_format="pyarrow",
    )


def host_family_rollup(sf_dir: str):
    """Crawl-budget rollup at site-FAMILY granularity: page and host
    counts per ``web_host_components`` family (singleton hosts — no
    mirror evidence — are their own family), the table a crawl
    scheduler reads to cap fetch budget per logical site instead of
    per alias, so a 50-host mirror farm can't claim 50 budgets.

    Scale shape: the family map is bounded by the host vocabulary
    (never page-sized), so it ships once via ``ray.put`` and the
    rewrite is a stateless vectorized map over ONE host-keyed page
    aggregate; the family fold is a second host-vocabulary-sized
    aggregate. Columns: family, n_hosts, n_pages."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.weblinks import _host_idx

    fam_df = web_host_components(sf_dir).to_pandas()  # bounded: O(hosts)
    fam_ref = ray.put(dict(zip(fam_df["host"], fam_df["family"])))

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def to_host(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = [f"site{h}.example.com" for h in _host_idx(ids).tolist()]
        return pa.table({"host": pa.array(hosts, type=pa.string())})

    per_host = pin_schema(
        bucketed_aggregate(
            with_ones(docs.map_batches(to_host, batch_format="pyarrow"), "n_pages"),
            ["host"],
            [("n_pages", "sum")],
        ),
        pa.schema([("host", pa.string()), ("n_pages", pa.int64())]),
    )

    def to_family(t: pa.Table) -> pa.Table:
        fam = ray.get(fam_ref)
        hosts = t.column("host").to_pylist()
        return pa.table(
            {
                "family": pa.array([fam.get(h, h) for h in hosts], type=pa.string()),
                "n_hosts": pa.array([1] * len(hosts), type=pa.int64()),
                "n_pages": t.column("n_pages"),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            per_host.map_batches(to_family, batch_format="pyarrow"),
            ["family"],
            [("n_hosts", "sum"), ("n_pages", "sum")],
        ),
        pa.schema(
            [("family", pa.string()), ("n_hosts", pa.int64()), ("n_pages", pa.int64())]
        ),
    )


def host_crawl_priority(sf_dir: str):
    """The crawl scheduler's per-host priority feed — the three
    crawl-ops signals this module already computes, composed the way a
    scheduler actually consumes them: domain authority
    (``host_pagerank``'s scaled-integer rank), quality keep-rate
    (``host_quality_report``), and the mirror family
    (``web_host_components``; singleton hosts are their own family, and
    a scheduler splits one budget across a family). ``priority`` is the
    exact integer ``rank * n_kept // n_docs`` — authority discounted by
    the fraction of a host's pages that survive the quality gate —
    computed on Python ints (no int64 overflow at any rank × page
    count) and replayed by the twin's HUGEINT floor division.

    Scale shape: every table here is host-vocabulary-bounded, so the
    two bucketed joins and the final map are O(hosts), never
    page-scale. Columns: host, family, rank, priority."""
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    pr_schema = pa.schema([("host", pa.string()), ("rank", pa.int64())])
    qr_schema = pa.schema(
        [
            ("host", pa.string()),
            ("n_docs", pa.int64()),
            ("n_kept", pa.int64()),
            ("keep_rate", pa.float64()),
        ]
    )
    pr = pin_schema(
        host_pagerank(sf_dir).map_batches(
            lambda t: t.rename_columns(["host", "rank"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        pr_schema,
    )
    qr = pin_schema(host_quality_report(sf_dir), qr_schema)
    joined_schema = pa.schema(
        [
            ("host", pa.string()),
            ("rank", pa.int64()),
            ("n_docs", pa.int64()),
            ("n_kept", pa.int64()),
            ("keep_rate", pa.float64()),
        ]
    )
    joined = pin_schema(
        bucketed_inner_join(pr, qr, ["host"], pr_schema, qr_schema), joined_schema
    )
    fam_schema = pa.schema([("host", pa.string()), ("family", pa.string())])
    fam = pin_schema(web_host_components(sf_dir), fam_schema)
    full = bucketed_inner_join(
        joined, fam, ["host"], joined_schema, fam_schema, join_type="left outer"
    )

    out_schema = pa.schema(
        [
            ("host", pa.string()),
            ("family", pa.string()),
            ("rank", pa.int64()),
            ("priority", pa.int64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        hosts = t.column("host")
        fams = pa.array(
            [
                f if f is not None else h
                for h, f in zip(hosts.to_pylist(), t.column("family").to_pylist())
            ],
            type=pa.string(),
        )
        rank = t.column("rank").to_numpy(zero_copy_only=False)
        kept = t.column("n_kept").to_numpy(zero_copy_only=False)
        docs = t.column("n_docs").to_numpy(zero_copy_only=False)
        prio = [int(r) * int(k) // int(d) for r, k, d in zip(rank, kept, docs)]
        return pa.table(
            {
                "host": hosts,
                "family": fams,
                "rank": t.column("rank"),
                "priority": pa.array(prio, type=pa.int64()),
            }
        )

    return pin_schema(full.map_batches(score, batch_format="pyarrow"), out_schema)


def crawl_depth(sf_dir: str, n_seeds: int = 3, max_hops: int = 4):
    """Crawl-depth distribution: a DIRECTED BFS over the resolved
    URL→URL link graph from the ``n_seeds`` lexicographically-smallest
    source URLs (the seed list of a fresh crawl), folded to how many
    URLs first become reachable at each hop — the frontier-growth
    curve a crawl scheduler provisions against (how deep must the
    crawler go before the reachable set saturates).

    Scale shape: anchor extraction + resolution stream per page;
    stages/graph.py bfs_distances in directed mode does one left-semi
    bucketed join + one anti join per hop against node-sized tables;
    the final fold is a bounded (≤ max_hops+1 row) aggregate.
    Columns: dist, n_urls."""
    from bioner_ray.stages.graph import bfs_distances
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.weblinks import resolve_dst_urls_batch

    url_links = (
        _synthetic_pages(sf_dir)
        .map_batches(extract_links_batch, batch_format="pyarrow")
        .map_batches(resolve_dst_urls_batch, batch_format="pyarrow")
    )
    dist = bfs_distances(
        url_links,
        n_seeds=n_seeds,
        max_hops=max_hops,
        subj_col="src_url",
        obj_col="dst_url",
        directed=True,
    )
    out_schema = pa.schema([("dist", pa.int64()), ("n_urls", pa.int64())])
    agg = bucketed_aggregate(
        with_ones(
            dist.map_batches(
                lambda t: t.select(["dist"])
                if t.num_columns
                else pa.schema([("dist", pa.int64())]).empty_table(),
                batch_format="pyarrow",
            ),
            "n_urls",
        ),
        ["dist"],
        [("n_urls", "sum")],
    )
    return pin_schema(agg, out_schema, ensure_block=True)


def host_lang_profile(sf_dir: str):
    """Per-host language routing table: how a host's pages distribute
    over predicted languages — the signal a crawler uses to route
    hosts to per-language pipelines (and to flag hosts whose declared
    and detected languages diverge at the site level, the host-grain
    companion to lang_confusion). Page→host follows the synthetic
    crawl's generator contract (stages/weblinks._host_idx — on a real
    crawl this is host_of(url)); language is the shared langid stage.

    Scale shape: one stateless pass (langid + host tag), one
    (host, lang)-keyed bucketed aggregate of block-combined partials,
    and a single-block share fold over the physically bounded
    hosts × languages result (≤ |hosts| · |profiles + und| rows — the
    value_percentiles driver-finish argument). Columns: host,
    pred_lang, n_docs, share."""
    import ray.data as rd

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones
    from bioner_ray.stages.textstats import langid_batch

    part_schema = pa.schema([("host", pa.string()), ("pred_lang", pa.string())])

    def tag(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return part_schema.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype("int64")
        import numpy as np

        hosts = [f"site{h}.example.com" for h in _host_idx(ids).tolist()]
        preds = langid_batch(t).column("pred_lang")
        return pa.table(
            {"host": pa.array(hosts, type=pa.string()), "pred_lang": preds}
        )

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    agg_schema = pa.schema(
        [("host", pa.string()), ("pred_lang", pa.string()), ("n_docs", pa.int64())]
    )
    agg = pin_schema(
        bucketed_aggregate(
            with_ones(docs.map_batches(tag, batch_format="pyarrow"), "n_docs"),
            ["host", "pred_lang"],
            [("n_docs", "sum")],
        ),
        agg_schema,
    )
    out_schema = pa.schema(list(agg_schema) + [("share", pa.float64())])

    def share(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        import numpy as np

        t = t.sort_by([("host", "ascending"), ("pred_lang", "ascending")])
        hosts = t.column("host").to_numpy(zero_copy_only=False)
        n = t.column("n_docs").to_numpy(zero_copy_only=False).astype("int64")
        starts = np.flatnonzero(np.r_[True, hosts[1:] != hosts[:-1]])
        seg = np.repeat(np.arange(starts.size), np.diff(np.r_[starts, hosts.size]))
        totals = np.bincount(seg, weights=n)[seg]
        return t.append_column("share", pa.array(n / totals, type=pa.float64()))

    return pin_schema(
        agg.repartition(1).map_batches(share, batch_format="pyarrow"),
        out_schema,
        ensure_block=True,
    )


def _url_paths_batch(batch: pa.Table) -> pa.Table:
    """Synthetic crawl URL set with real path STRUCTURE (fixture
    construction, not under test — on a real crawl the pages table's
    url column is the input): per doc one of four sections, mixing
    high-cardinality positions (ids), mid (months), and low (years,
    version tags, literals)."""
    import numpy as np

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = _host_idx(ids)
    urls = []
    for i, h in zip(ids.tolist(), hosts.tolist()):
        m = i % 4
        if m == 0:
            p = f"/news/{2020 + i % 3}/{i % 12 + 1}/{i}"
        elif m == 1:
            p = f"/products/{i}/reviews"
        elif m == 2:
            p = f"/docs/v{i % 2 + 1}/intro"
        else:
            p = f"/blog/{i}"
        urls.append(f"https://site{h}.example.com{p}")
    return pa.table({"url": pa.array(urls, type=pa.string())})


def url_templates(sf_dir: str):
    """Per-host URL path-template mining over the synthetic crawl's
    frontier (stages/weblinks.py url_templates): positions with ≥ 8
    distinct values within (host, section, depth) fold to ``*`` —
    ``/products/{id}/reviews`` becomes one ``/products/*/reviews`` row
    per host. The frontier-compression / spider-trap audit a crawl
    scheduler runs before budgeting. Columns: host, template, n_urls,
    example_url."""
    import ray.data as rd

    from bioner_ray.stages import weblinks

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return weblinks.url_templates(
        docs.map_batches(_url_paths_batch, batch_format="pyarrow")
    )


def _table_pages_batch(batch: pa.Table) -> pa.Table:
    """Synthetic structured pages (fixture construction, not under
    test): docs ending in 4 mod 5 carry no table; the rest carry one
    spec table of (doc_id % 3 + 1) property rows with attribute noise
    on every tag and an entity escape in each value cell — exactly the
    shapes extract_table_cells_batch must tolerate."""
    import numpy as np

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = _host_idx(ids)
    props = ("color", "size", "weight")
    urls, htmls = [], []
    for i, h in zip(ids.tolist(), hosts.tolist()):
        parts = [f"<html><body><p>spec page {i}</p>"]
        if i % 5 != 4:
            parts.append('<table class="specs" border="1">')
            for r in range(i % 3 + 1):
                parts.append(
                    f'<tr valign="top"><td align="left"><b>{props[r]}</b></td>'
                    f'<td>v&amp;{(i * 7 + r) % 10}</td></tr>'
                )
            parts.append("</table>")
        parts.append("</body></html>")
        urls.append(f"https://site{h}.example.com/doc/{i}")
        htmls.append("".join(parts).encode("utf-8"))
    return pa.table(
        {"url": pa.array(urls, type=pa.string()), "html": pa.array(htmls, type=pa.binary())}
    )


def html_table_cells(sf_dir: str):
    """Web-table harvesting over the synthetic structured crawl
    (stages/extract.py extract_table_cells_batch): every ``<td>/<th>``
    cell with its (table, row, col) coordinates — the WebTables-style
    fact-extraction feed (col 0 = property surface, col 1 = value)
    that a KG build joins into candidate triples. Columns: url,
    table_idx, row_idx, col_idx, cell."""
    import ray.data as rd

    from bioner_ray.stages.extract import extract_table_cells_batch

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return docs.map_batches(_table_pages_batch, batch_format="pyarrow").map_batches(
        extract_table_cells_batch, batch_format="pyarrow"
    )


def table_triples(sf_dir: str):
    """Candidate KG facts from the harvested web tables: within each
    (url, table, row), col 0 is the property surface and col 1 the
    value — pivoted IN-BATCH (extraction is per-page, so a row's cells
    never straddle blocks; zero extra shuffle) and folded to (pred,
    obj) with distinct-page support. The WebTables fact-candidate
    generator that feeds kg-edge confidence scoring. Columns: pred,
    obj, n_pages."""
    import ray.data as rd

    from bioner_ray.stages.extract import extract_table_cells_batch
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    cells = docs.map_batches(_table_pages_batch, batch_format="pyarrow").map_batches(
        extract_table_cells_batch, batch_format="pyarrow"
    )

    def pivot(t: pa.Table) -> pa.Table:
        empty = pa.schema([("pred", pa.string()), ("obj", pa.string())])
        if t.num_columns == 0 or t.num_rows == 0:
            return empty.empty_table()
        k = t.filter(pc.equal(t.column("col_idx"), 0))
        v = t.filter(pc.equal(t.column("col_idx"), 1))
        kt = pa.table(
            {
                "url": k.column("url"),
                "table_idx": k.column("table_idx"),
                "row_idx": k.column("row_idx"),
                "pred": k.column("cell"),
            }
        )
        vt = pa.table(
            {
                "url": v.column("url"),
                "table_idx": v.column("table_idx"),
                "row_idx": v.column("row_idx"),
                "obj": v.column("cell"),
            }
        )
        j = kt.join(vt, keys=["url", "table_idx", "row_idx"], join_type="inner")
        return j.select(["pred", "obj"])

    agg = bucketed_aggregate(
        with_ones(cells.map_batches(pivot, batch_format="pyarrow"), "n_pages"),
        ["pred", "obj"],
        [("n_pages", "sum")],
    )
    return pin_schema(
        agg,
        pa.schema([("pred", pa.string()), ("obj", pa.string()), ("n_pages", pa.int64())]),
    )


def recrawl_change_rate(sf_dir: str):
    """Per-host recrawl change audit — the scheduling signal that tells
    a crawler which sites churn: the same url set fetched in two
    snapshots (fixture: snapshot B's body changes iff doc_id % 5 == 0),
    each fetch content-hashed DISTRIBUTEDLY with exact-dedup's md5
    content key, the two hash streams joined on url by the engine's
    bucketed join (never the page bodies — only (url, hash) pairs move)
    and folded per host. Columns: host, n_urls, n_changed,
    change_rate."""
    import numpy as np
    import ray.data as rd

    from bioner_ray.stages.dedup import content_key_batch
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def with_url(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        urls = [
            f"https://site{h}.example.com/doc/{i}"
            for i, h in zip(ids.tolist(), hosts.tolist())
        ]
        return batch.append_column("url", pa.array(urls, type=pa.string()))

    def refetch(batch: pa.Table) -> pa.Table:
        # snapshot B (fixture construction): every fifth page updated
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch.column("text").to_pylist()
        texts = [
            (t or "") + "\nupdated" if i % 5 == 0 else (t or "")
            for i, t in zip(ids.tolist(), texts)
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(texts, type=pa.string()),
                "url": batch.column("url"),
            }
        )

    pages = docs.map_batches(with_url, batch_format="pyarrow")

    def keyed(ds, key_name):
        k = ds.map_batches(
            content_key_batch,
            fn_kwargs={"text_col": "text", "id_col": "url"},
            batch_format="pyarrow",
        )
        return k.map_batches(
            lambda t, kn=key_name: t.rename_columns(
                [kn if c == "key" else c for c in t.schema.names]
            ),
            batch_format="pyarrow",
        )

    a = keyed(pages, "key_a")
    b = keyed(pages.map_batches(refetch, batch_format="pyarrow"), "key_b")
    side = lambda kn: pa.schema([("url", pa.string()), (kn, pa.string())])
    j = pin_schema(
        bucketed_inner_join(a, b, ["url"], side("key_a"), side("key_b")),
        pa.schema([("url", pa.string()), ("key_a", pa.string()), ("key_b", pa.string())]),
    )

    def per_url(t: pa.Table) -> pa.Table:
        host = pc.utf8_lower(
            pc.struct_field(
                pc.extract_regex(t.column("url"), r"^https://(?P<h>[^/]+)/"), "h"
            )
        )
        changed = pc.cast(
            pc.not_equal(t.column("key_a"), t.column("key_b")), pa.int64()
        )
        return pa.table({"host": host, "n_changed": changed})

    agg = bucketed_aggregate(
        with_ones(j.map_batches(per_url, batch_format="pyarrow"), "n_urls"),
        ["host"],
        [("n_changed", "sum"), ("n_urls", "sum")],
    )
    out_schema = pa.schema(
        [
            ("host", pa.string()),
            ("n_urls", pa.int64()),
            ("n_changed", pa.int64()),
            ("change_rate", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        rate = pc.divide(
            pc.cast(t.column("n_changed"), pa.float64()),
            pc.cast(t.column("n_urls"), pa.float64()),
        )
        return pa.table(
            {
                "host": t.column("host"),
                "n_urls": t.column("n_urls"),
                "n_changed": t.column("n_changed"),
                "change_rate": rate,
            },
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _schedule_urls(urls_ds, gap: int = 10):
    """The politeness-scheduling fold shared by fetch_schedule and
    crawl_plan: per host, lexicographic url order with ``gap`` slots
    between same-host hits and an md5-61-bit host stagger. Input needs
    (url, host); one coarse host-bucketed shuffle, vectorized run-scan
    per bucket. Columns: url, host, rk, slot."""
    import hashlib

    import numpy as np

    from bioner_ray.stages.shuffle import bucketed_map_groups, pin_schema

    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("host", pa.string()),
            ("rk", pa.int64()),
            ("slot", pa.int64()),
        ]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        t = t.sort_by([("host", "ascending"), ("url", "ascending")])
        host = t.column("host").to_numpy(zero_copy_only=False)
        url = t.column("url").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, host[1:] != host[:-1]])
        nseg = np.diff(np.r_[starts, len(host)])
        rk = np.arange(len(host), dtype=np.int64) - np.repeat(starts, nseg) + 1
        offs = np.array(
            [
                (int.from_bytes(hashlib.md5(h.encode()).digest()[:8], "big") % (1 << 61)) % gap
                for h in host[starts]
            ],
            dtype=np.int64,
        )
        slot = (rk - 1) * gap + np.repeat(offs, nseg)
        return pa.table(
            {
                "url": pa.array(url, type=pa.string()),
                "host": pa.array(host, type=pa.string()),
                "rk": pa.array(rk),
                "slot": pa.array(slot),
            },
            schema=out_schema,
        )

    return pin_schema(bucketed_map_groups(urls_ds, ["host"], per_bucket), out_schema)


def fetch_schedule(sf_dir: str, gap: int = 10):
    """Politeness-scheduled fetch plan over the crawl frontier: per
    host, URLs are fetched in deterministic lexicographic order with
    ``gap`` time slots between consecutive hits to the same host, and
    hosts staggered by an md5-derived offset (the engine's 61-bit
    md5-UBIGINT idiom, replayed verbatim in SQL) so slot 0 is not a
    thundering herd — slot = (rank_in_host − 1)·gap + md5_61(host) mod
    gap. The scheduler output a fetch fleet consumes directly; one
    coarse host-bucketed shuffle with a vectorized run-scan per bucket,
    host count never bounds parallelism. Columns: url, host, rk,
    slot."""
    import ray.data as rd

    from bioner_ray.stages.weblinks import host_of

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    urls = docs.map_batches(_url_paths_batch, batch_format="pyarrow").map_batches(
        lambda t: t.append_column("host", host_of(t.column("url").combine_chunks())),
        batch_format="pyarrow",
    )
    return _schedule_urls(urls, gap=gap)


def host_dup_rate(sf_dir: str):
    """Per-host exact-duplicate rate — the crawl-quality signal that
    separates template/mirror farms (every page the same bytes) from
    content sites, read before spending recrawl budget. The engine
    content-hashes each page (exact-dedup's md5 key), collapses
    (host, key) with ONE bucketed aggregate — the only corpus-scale
    exchange, one row per distinct content per host — then folds to
    host grain. dup_rate = 1 − distinct/docs as a replayable division.
    Columns: host, n_docs, n_distinct, dup_rate."""
    import numpy as np
    import ray.data as rd

    from bioner_ray.stages.dedup import content_key_batch
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def with_host(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        return batch.append_column(
            "host",
            pa.array(
                [f"site{h}.example.com" for h in hosts.tolist()], type=pa.string()
            ),
        )

    keyed = docs.map_batches(with_host, batch_format="pyarrow").map_batches(
        content_key_batch,
        fn_kwargs={"text_col": "text", "id_col": "host"},
        batch_format="pyarrow",
    )
    # level 1: (host, key) collapse with per-key copy counts
    lvl1 = pin_schema(
        bucketed_aggregate(
            with_ones(keyed, "n_docs"), ["host", "key"], [("n_docs", "sum")]
        ),
        pa.schema([("host", pa.string()), ("key", pa.string()), ("n_docs", pa.int64())]),
    )
    # level 2: host grain — docs = Σ copies, distinct = row count
    lvl2 = pin_schema(
        bucketed_aggregate(
            with_ones(
                lvl1.map_batches(
                    lambda t: t.select(["host", "n_docs"]), batch_format="pyarrow"
                ),
                "n_distinct",
            ),
            ["host"],
            [("n_docs", "sum"), ("n_distinct", "sum")],
        ),
        pa.schema(
            [("host", pa.string()), ("n_docs", pa.int64()), ("n_distinct", pa.int64())]
        ),
    )
    out_schema = pa.schema(
        [
            ("host", pa.string()),
            ("n_docs", pa.int64()),
            ("n_distinct", pa.int64()),
            ("dup_rate", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        rate = pc.subtract(
            pa.scalar(1.0),
            pc.divide(
                pc.cast(t.column("n_distinct"), pa.float64()),
                pc.cast(t.column("n_docs"), pa.float64()),
            ),
        )
        return pa.table(
            {
                "host": t.column("host"),
                "n_docs": t.column("n_docs"),
                "n_distinct": t.column("n_distinct"),
                "dup_rate": rate,
            },
            schema=out_schema,
        )

    return lvl2.map_batches(finish, batch_format="pyarrow")


def _jsonld_pages_batch(batch: pa.Table) -> pa.Table:
    """Synthetic structured-data pages (fixture construction, not
    under test): docs ≡ 3 (mod 7) carry no JSON-LD block, docs ≡ 5
    (mod 7) carry a MALFORMED one (truncated JSON — the wild-crawl
    case the extractor must skip), and the rest carry one well-formed
    schema.org object cycling Product (nested brand object) / Person
    (scalar array) / Article (numeric scalar) by doc_id % 3 — exactly
    the value shapes _flatten_jsonld must handle."""
    import json

    import numpy as np

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = _host_idx(ids)
    urls, htmls = [], []
    for i, h in zip(ids.tolist(), hosts.tolist()):
        parts = ["<html><head>"]
        m = i % 7
        if m == 5:
            parts.append(
                '<script type="application/ld+json">{"@type": "Product", "name": </script>'
            )
        elif m != 3:
            t = i % 3
            if t == 0:
                obj = {
                    "@context": "https://schema.org",
                    "@type": "Product",
                    "name": f"entity {i % 50}",
                    "brand": {"@type": "Brand", "name": f"brand {i % 11}"},
                }
            elif t == 1:
                obj = {
                    "@context": "https://schema.org",
                    "@type": "Person",
                    "name": f"entity {i % 50}",
                    "knowsAbout": [f"topic {i % 5}", f"topic {(i + 1) % 5}"],
                }
            else:
                obj = {
                    "@context": "https://schema.org",
                    "@type": "Article",
                    "name": f"entity {i % 50}",
                    "wordCount": i % 900 + 100,
                }
            parts.append(
                '<script type="application/ld+json">' + json.dumps(obj) + "</script>"
            )
        parts.append(f"</head><body><p>page {i}</p></body></html>")
        urls.append(f"https://site{h}.example.com/doc/{i}")
        htmls.append("".join(parts).encode("utf-8"))
    return pa.table(
        {"url": pa.array(urls, type=pa.string()), "html": pa.array(htmls, type=pa.binary())}
    )


def jsonld_triples(sf_dir: str):
    """Schema.org JSON-LD harvest over the synthetic structured crawl
    (stages/extract.py extract_jsonld_batch) — the Web Data Commons
    extraction that on a real crawl yields the highest-precision KG
    facts (explicit publisher-asserted types and properties, no NER
    needed). Stateless map_batches end-to-end: pages stream through
    the regex+json.loads scan, fan-out tracks structured bytes, and
    nothing shuffles — per-page triples are already the answer.
    Columns: url, subj, pred, obj."""
    import ray.data as rd

    from bioner_ray.stages.extract import extract_jsonld_batch

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return docs.map_batches(_jsonld_pages_batch, batch_format="pyarrow").map_batches(
        extract_jsonld_batch, batch_format="pyarrow"
    )


def robots_fetch_gate(sf_dir: str):
    """Robots.txt admission control over the synthetic frontier
    (stages/weblinks.py robots_gate — real longest-prefix-match with
    Allow-beats-Disallow ties): the pre-fetch politeness gate a crawl
    scheduler composes with fetch_schedule. Fixture robots rules
    (arithmetic in the host index, so the twin re-derives verdicts):
    hosts ≡ 0 (mod 3) disallow ``/blog/``, hosts ≡ 2 (mod 4) disallow
    ``/docs/``, hosts ≡ 0 (mod 5) disallow ``/news/`` but ALLOW
    ``/news/2021`` — the longest-match override case (moduli chosen so
    every rule kind intersects the hosts its path form actually lands
    on: the generator routes even-id forms to hosts 0/2). Columns: url,
    host, allowed (0/1), rule (winning prefix or '')."""
    import ray.data as rd

    from bioner_ray.stages.weblinks import robots_gate

    rules: dict = {}
    for h in range(16):
        r = []
        if h % 3 == 0:
            r.append(("/blog/", False))
        if h % 4 == 2:
            r.append(("/docs/", False))
        if h % 5 == 0:
            r.append(("/news/", False))
            r.append(("/news/2021", True))
        if r:
            rules[f"site{h}.example.com"] = r

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return robots_gate(
        docs.map_batches(_url_paths_batch, batch_format="pyarrow"), rules
    )


def sitemap_gap(sf_dir: str, phantom_every: int = 3):
    """Sitemap-vs-crawl coverage audit — the crawl-ops complement of
    orphan_pages (crawled-but-unlinked): URLs a host DECLARES in its
    sitemap that the crawl never fetched. Fixture sitemap (arithmetic,
    twin-replayable): every host declares each of its crawled pages
    PLUS one phantom ``/doc/{i}p`` entry per page with
    doc_id ≡ 0 (mod ``phantom_every``) — stale sitemap entries, the
    wild-crawl norm. Engine shape: declared minus fetched is ONE
    url-keyed bucketed LEFT ANTI join (the engine's own
    empty-partition-proof join, never Ray's native anti), then one
    host-bounded fold. Columns: host, n_declared, n_missing,
    miss_rate."""
    import numpy as np
    import ray.data as rd

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def declared(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        us, hs = [], []
        for i, h in zip(ids.tolist(), hosts.tolist()):
            host = f"site{h}.example.com"
            us.append(f"https://{host}/doc/{i}")
            hs.append(host)
            if i % phantom_every == 0:
                us.append(f"https://{host}/doc/{i}p")
                hs.append(host)
        return pa.table(
            {
                "url": pa.array(us, type=pa.string()),
                "host": pa.array(hs, type=pa.string()),
            }
        )

    def fetched(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        return pa.table(
            {
                "url": pa.array(
                    [
                        f"https://site{h}.example.com/doc/{i}"
                        for i, h in zip(ids.tolist(), hosts.tolist())
                    ],
                    type=pa.string(),
                )
            }
        )

    dec_schema = pa.schema([("url", pa.string()), ("host", pa.string())])
    fetch_schema = pa.schema([("url", pa.string())])
    missing = pin_schema(
        bucketed_inner_join(
            docs.map_batches(declared, batch_format="pyarrow"),
            docs.map_batches(fetched, batch_format="pyarrow"),
            ["url"],
            dec_schema,
            fetch_schema,
            join_type="left anti",
        ),
        dec_schema,
    )

    n_declared = pin_schema(
        bucketed_aggregate(
            with_ones(
                docs.map_batches(declared, batch_format="pyarrow").map_batches(
                    lambda t: t.select(["host"]) if t.num_columns else t,
                    batch_format="pyarrow",
                ),
                "n_declared",
            ),
            ["host"],
            [("n_declared", "sum")],
        ),
        pa.schema([("host", pa.string()), ("n_declared", pa.int64())]),
    )
    n_missing = pin_schema(
        bucketed_aggregate(
            with_ones(
                missing.map_batches(
                    lambda t: t.select(["host"]) if t.num_columns else t,
                    batch_format="pyarrow",
                ),
                "n_missing",
            ),
            ["host"],
            [("n_missing", "sum")],
        ),
        pa.schema([("host", pa.string()), ("n_missing", pa.int64())]),
    )
    # LEFT OUTER from n_declared (ADVICE r3): hosts whose sitemap is
    # fully covered must appear with n_missing = 0 — an audit that
    # silently drops its cleanest hosts reads as if they were never
    # audited. Null from the unmatched side fills to 0 below.
    out = pin_schema(
        bucketed_inner_join(
            n_declared,
            n_missing,
            ["host"],
            pa.schema([("host", pa.string()), ("n_declared", pa.int64())]),
            pa.schema([("host", pa.string()), ("n_missing", pa.int64())]),
            join_type="left outer",
        ),
        pa.schema(
            [
                ("host", pa.string()),
                ("n_declared", pa.int64()),
                ("n_missing", pa.int64()),
            ]
        ),
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("n_missing"),
            "n_missing",
            pc.fill_null(t.column("n_missing"), 0),
        )
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )

    def rate(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    ("host", pa.string()),
                    ("n_declared", pa.int64()),
                    ("n_missing", pa.int64()),
                    ("miss_rate", pa.float64()),
                ]
            ).empty_table()
        return t.append_column(
            "miss_rate",
            pc.divide(
                pc.cast(t.column("n_missing"), pa.float64()),
                pc.cast(t.column("n_declared"), pa.float64()),
            ),
        )

    return out.map_batches(rate, batch_format="pyarrow")


def wet_shards(sf_dir: str, num_shards: int = 16):
    """WET-style conversion-export audit — the format sink of a crawl
    pipeline, verified by content digest instead of by re-reading the
    files: every page is rendered to a deterministic WARC-conversion
    record (``WARC/1.0`` + Target-URI + byte Content-Length + body),
    sharded by the engine's replayable md5-61-bit url hash, and each
    shard folds to (record count, byte total, md5 digest of the
    url-ordered record stream) — the manifest row a resumable export
    writes next to the shard (state/checkpoint.py contract). Engine
    shape: record rendering is a stateless map; the ONLY exchange is
    one shard-keyed bucketed map_groups whose per-shard sort is the
    writer's required output order anyway. The DuckDB twin rebuilds
    records with the same byte grammar and replays the digests via
    ``md5(string_agg(.. ORDER BY url))``. Columns: shard, n_records,
    n_bytes, digest."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from bioner_ray.stages.shuffle import bucketed_map_groups, pin_schema

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    m61 = (1 << 61)

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        texts = batch.column("text").to_pylist()
        urls, recs, shards = [], [], []
        for i, h, t in zip(ids.tolist(), hosts.tolist(), texts):
            u = f"https://site{h}.example.com/doc/{i}"
            body = t or ""
            n = len(body.encode("utf-8"))
            recs.append(
                f"WARC/1.0\nWARC-Target-URI: {u}\nContent-Length: {n}\n\n{body}\n\n"
            )
            urls.append(u)
            shards.append(
                int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
                % m61
                % num_shards
            )
        return pa.table(
            {
                "shard": pa.array(shards, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
                "rec": pa.array(recs, type=pa.string()),
            }
        )

    out_schema = pa.schema(
        [
            ("shard", pa.int64()),
            ("n_records", pa.int64()),
            ("n_bytes", pa.int64()),
            ("digest", pa.string()),
        ]
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        t = t.sort_by([("shard", "ascending"), ("url", "ascending")])
        sh = t.column("shard").to_numpy(zero_copy_only=False)
        recs = t.column("rec").to_pylist()
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        ends = np.r_[starts[1:], len(sh)]
        out_s, out_n, out_b, out_d = [], [], [], []
        for a, b in zip(starts.tolist(), ends.tolist()):
            blob = "".join(recs[a:b]).encode("utf-8")
            out_s.append(int(sh[a]))
            out_n.append(b - a)
            out_b.append(len(blob))
            out_d.append(hashlib.md5(blob).hexdigest())
        return pa.table(
            {
                "shard": pa.array(out_s, type=pa.int64()),
                "n_records": pa.array(out_n, type=pa.int64()),
                "n_bytes": pa.array(out_b, type=pa.int64()),
                "digest": pa.array(out_d, type=pa.string()),
            },
            schema=out_schema,
        )

    return pin_schema(
        bucketed_map_groups(
            docs.map_batches(render, batch_format="pyarrow"), ["shard"], fold
        ),
        out_schema,
    )


def web_host_scc(sf_dir: str, max_outer: int = 32, max_inner: int = 64):
    """Strongly-connected components of the DIRECTED host link graph —
    the crawl-ops condensation audit: link-farm rings and one-way
    link tiers are invisible to the undirected family/component
    queries (web_host_components), but split cleanly into SCCs.

    Distributed FW-BW coloring (VERDICT r3, Next #2 — replaces the
    r3 path-doubling transitive closure whose reach-pair table is
    O(|SCC|²) on the real web's giant SCC). State is NODE-SIZED
    everywhere — no reachability-pair table exists in any plan:

    * per outer round, TWO min-label fixpoints run simultaneously on
      one (host, f, b) table: f(v) = min label forward-reachable from
      v, b(v) = min label backward-reachable (each inner step = one
      bucketed join per direction against the current edge set + one
      bucketed aggregate, O(E) work, converging in ≤ graph diameter
      steps);
    * f(v) == b(v) == m ⟺ m is mutually reachable with v ⟺
      scc_id(v) = m = min member of SCC(v) — those rows settle;
    * SCCs never span (f, b) classes (mutual reachability ⇒ equal
      forward/backward reachable sets ⇒ equal minima), so the next
      round keeps only edges whose endpoints share a class — every
      round settles at least the class-min nodes, and on web-shaped
      graphs the giant SCC settles in round one.

    The twin stays the recursive-CTE closure (converged, so it pins
    the same fixpoint). Columns: host, scc_id."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

    def to_pairs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pair_schema.empty_table()
        keep = pc.not_equal(t.column("src_host"), t.column("dst_host"))
        f = t.filter(keep)
        return pa.table({"a": f.column("src_host"), "b": f.column("dst_host")})

    edges = pin_schema(
        bucketed_aggregate(
            with_ones(
                web_link_graph(sf_dir).map_batches(to_pairs, batch_format="pyarrow"),
                "one",
            ),
            ["a", "b"],
            [("one", "min")],
        ),
        pair_schema,
    ).materialize()
    return scc_min_label(edges, max_outer=max_outer, max_inner=max_inner)


def scc_min_label(edges, max_outer: int = 32, max_inner: int = 64):
    """FW-BW coloring SCC over a deduped directed edge Dataset
    (columns a, b; no self-loops required) → (host, scc_id = min
    member of the SCC, every endpoint covered). Node-sized state;
    see web_host_scc for the algorithm argument."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    lab_schema = pa.schema([("host", pa.string()), ("f", pa.string()), ("b", pa.string())])
    out_schema = pa.schema([("host", pa.string()), ("scc_id", pa.string())])

    def nodes_of(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("host", pa.string())]).empty_table()
        allv = pa.chunked_array(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
        ).combine_chunks()
        return pa.table({"host": allv})

    cur_nodes = pin_schema(
        bucketed_aggregate(
            with_ones(edges.map_batches(nodes_of, batch_format="pyarrow"), "one"),
            ["host"],
            [("one", "min")],
        ),
        pa.schema([("host", pa.string())]),
    ).materialize()
    cur_edges = edges

    def init_labels(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return lab_schema.empty_table()
        h = t.column("host")
        return pa.table({"host": h, "f": h, "b": h}, schema=lab_schema)

    settled_parts = []
    for _ in range(max_outer):
        if cur_nodes.count() == 0:
            break
        # ---- simultaneous forward/backward min-label fixpoint ----
        lab = cur_nodes.map_batches(init_labels, batch_format="pyarrow").materialize()
        for inner in range(max_inner):
            # forward candidates: edge v→w contributes f(w) to v
            fcand = bucketed_inner_join(
                cur_edges.map_batches(
                    lambda t: t.rename_columns(["host", "k"]) if t.num_columns else t,
                    batch_format="pyarrow",
                ),
                lab.map_batches(
                    lambda t: pa.table({"k": t.column("host"), "fv": t.column("f")})
                    if t.num_columns
                    else pa.schema([("k", pa.string()), ("fv", pa.string())]).empty_table(),
                    batch_format="pyarrow",
                ),
                ["k"],
                pa.schema([("host", pa.string()), ("k", pa.string())]),
                pa.schema([("k", pa.string()), ("fv", pa.string())]),
            )
            # backward candidates: edge v→w contributes b(v) to w
            bcand = bucketed_inner_join(
                cur_edges.map_batches(
                    lambda t: pa.table({"host": t.column("b"), "k": t.column("a")})
                    if t.num_columns
                    else pa.schema([("host", pa.string()), ("k", pa.string())]).empty_table(),
                    batch_format="pyarrow",
                ),
                lab.map_batches(
                    lambda t: pa.table({"k": t.column("host"), "bv": t.column("b")})
                    if t.num_columns
                    else pa.schema([("k", pa.string()), ("bv", pa.string())]).empty_table(),
                    batch_format="pyarrow",
                ),
                ["k"],
                pa.schema([("host", pa.string()), ("k", pa.string())]),
                pa.schema([("k", pa.string()), ("bv", pa.string())]),
            )
            # one union of typed candidate rows; '' ranks below every
            # real host so min() ignores the absent side and max(old*)
            # recovers each node's previous label from its self row
            # U+10FFFF (UTF-8 F4 8F BF BF) is the maximum code point:
            # under Arrow's UTF-8 byte comparison it sorts ≥ every
            # valid character — including non-ASCII/IDN labels, which a
            # '\\x7f' sentinel would NOT dominate (ADVICE r4). Doubled
            # so only a label of repeated U+10FFFF could ever tie.
            hi = "\U0010ffff\U0010ffff"

            def self_rows(t: pa.Table) -> pa.Table:
                if t.num_columns == 0:
                    return _cand_schema.empty_table()
                return pa.table(
                    {
                        "host": t.column("host"),
                        "f": t.column("f"),
                        "b": t.column("b"),
                        "oldf": t.column("f"),
                        "oldb": t.column("b"),
                    },
                    schema=_cand_schema,
                )

            def f_rows(t: pa.Table) -> pa.Table:
                if t.num_columns == 0 or t.num_rows == 0:
                    return _cand_schema.empty_table()
                n = t.num_rows
                return pa.table(
                    {
                        "host": t.column("host"),
                        "f": t.column("fv"),
                        "b": pa.array([hi] * n, type=pa.string()),
                        "oldf": pa.array([""] * n, type=pa.string()),
                        "oldb": pa.array([""] * n, type=pa.string()),
                    },
                    schema=_cand_schema,
                )

            def b_rows(t: pa.Table) -> pa.Table:
                if t.num_columns == 0 or t.num_rows == 0:
                    return _cand_schema.empty_table()
                n = t.num_rows
                return pa.table(
                    {
                        "host": t.column("host"),
                        "f": pa.array([hi] * n, type=pa.string()),
                        "b": t.column("bv"),
                        "oldf": pa.array([""] * n, type=pa.string()),
                        "oldb": pa.array([""] * n, type=pa.string()),
                    },
                    schema=_cand_schema,
                )

            _cand_schema = pa.schema(
                [
                    ("host", pa.string()),
                    ("f", pa.string()),
                    ("b", pa.string()),
                    ("oldf", pa.string()),
                    ("oldb", pa.string()),
                ]
            )
            cand = (
                lab.map_batches(self_rows, batch_format="pyarrow")
                .union(fcand.map_batches(f_rows, batch_format="pyarrow"))
                .union(bcand.map_batches(b_rows, batch_format="pyarrow"))
            )
            agg = pin_schema(
                bucketed_aggregate(
                    cand,
                    ["host"],
                    [("f", "min"), ("b", "min"), ("oldf", "max"), ("oldb", "max")],
                ),
                _cand_schema,
            ).materialize()
            changed = agg.map_batches(
                lambda t: t.filter(
                    pc.or_(
                        pc.not_equal(t.column("f"), t.column("oldf")),
                        pc.not_equal(t.column("b"), t.column("oldb")),
                    )
                )
                if t.num_columns
                else t,
                batch_format="pyarrow",
            ).count()
            lab = pin_schema(
                agg.map_batches(
                    lambda t: t.select(["host", "f", "b"]) if t.num_columns else t,
                    batch_format="pyarrow",
                ),
                lab_schema,
            ).materialize()
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"web_host_scc: min-label fixpoint not converged in {max_inner} steps"
            )
        # ---- settle f==b; recurse on within-class edges ----
        settled_parts.append(
            pin_schema(
                lab.map_batches(
                    lambda t: pa.table(
                        {
                            "host": (
                                ft := t.filter(pc.equal(t.column("f"), t.column("b")))
                            ).column("host"),
                            "scc_id": ft.column("f"),
                        },
                        schema=out_schema,
                    )
                    if t.num_columns
                    else out_schema.empty_table(),
                    batch_format="pyarrow",
                ),
                out_schema,
            ).materialize()
        )
        unsettled = pin_schema(
            lab.map_batches(
                lambda t: t.filter(pc.not_equal(t.column("f"), t.column("b")))
                if t.num_columns
                else t,
                batch_format="pyarrow",
            ),
            lab_schema,
        ).materialize()
        if unsettled.count() == 0:
            cur_nodes = pin_schema(
                unsettled.map_batches(
                    lambda t: t.select(["host"]) if t.num_columns else t,
                    batch_format="pyarrow",
                ),
                pa.schema([("host", pa.string())]),
            )
            break
        cls_schema = pa.schema([("host", pa.string()), ("cls", pa.string())])
        cls = unsettled.map_batches(
            lambda t: pa.table(
                {
                    "host": t.column("host"),
                    "cls": pc.binary_join_element_wise(
                        t.column("f"), t.column("b"), "\x1f"
                    ),
                },
                schema=cls_schema,
            )
            if t.num_columns
            else cls_schema.empty_table(),
            batch_format="pyarrow",
        ).materialize()
        e1_schema = pa.schema([("a", pa.string()), ("b", pa.string()), ("cls", pa.string())])
        e1 = bucketed_inner_join(
            cur_edges,
            cls.map_batches(
                lambda t: t.rename_columns(["a", "cls"]) if t.num_columns else t,
                batch_format="pyarrow",
            ),
            ["a"],
            pair_schema,
            pa.schema([("a", pa.string()), ("cls", pa.string())]),
        )
        e2 = bucketed_inner_join(
            pin_schema(e1, e1_schema),
            cls.map_batches(
                lambda t: t.rename_columns(["b", "cls2"]) if t.num_columns else t,
                batch_format="pyarrow",
            ),
            ["b"],
            e1_schema,
            pa.schema([("b", pa.string()), ("cls2", pa.string())]),
        )
        cur_edges = pin_schema(
            e2.map_batches(
                lambda t: t.filter(pc.equal(t.column("cls"), t.column("cls2"))).select(
                    ["a", "b"]
                )
                if t.num_columns
                else pair_schema.empty_table(),
                batch_format="pyarrow",
            ),
            pair_schema,
        ).materialize()
        cur_nodes = pin_schema(
            cls.map_batches(
                lambda t: t.select(["host"]) if t.num_columns else t,
                batch_format="pyarrow",
            ),
            pa.schema([("host", pa.string())]),
        ).materialize()
    else:
        raise RuntimeError(f"web_host_scc: not converged in {max_outer} outer rounds")

    out = settled_parts[0] if settled_parts else pin_schema(
        cur_nodes, pa.schema([("host", pa.string())])
    ).map_batches(lambda t: out_schema.empty_table(), batch_format="pyarrow")
    for part in settled_parts[1:]:
        out = out.union(part)
    return pin_schema(out, out_schema, ensure_block=True)


def crawl_plan(sf_dir: str, gap: int = 10):
    """The composed crawl plan a fetch fleet actually executes:
    robots admission (robots_fetch_gate's longest-prefix-match rules)
    FIRST, then politeness scheduling (_schedule_urls) over the
    admitted URLs only — per-host ranks and slots are recomputed on
    the allowed subset, so a host whose /docs/ tree is disallowed
    compresses its fetch timeline instead of leaving slot holes. Pure
    operator composition: the gate's output is the scheduler's input,
    no extra exchange beyond each stage's own. Columns: url, host,
    rk, slot."""
    import ray.data as rd

    from bioner_ray.stages.weblinks import robots_gate

    rules: dict = {}
    for h in range(16):
        r = []
        if h % 3 == 0:
            r.append(("/blog/", False))
        if h % 4 == 2:
            r.append(("/docs/", False))
        if h % 5 == 0:
            r.append(("/news/", False))
            r.append(("/news/2021", True))
        if r:
            rules[f"site{h}.example.com"] = r

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    gated = robots_gate(
        docs.map_batches(_url_paths_batch, batch_format="pyarrow"), rules
    )

    def allowed(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("url", pa.string()), ("host", pa.string())]
            ).empty_table()
        f = t.filter(pc.equal(t.column("allowed"), 1))
        return f.select(["url", "host"])

    return _schedule_urls(gated.map_batches(allowed, batch_format="pyarrow"), gap=gap)


def anchor_linking_prior(sf_dir: str):
    """Anchor→target linking prior P(dst_host | anchor) — the
    probability table an entity linker consults when an anchor string
    is the only evidence (the web-corpus analog of a surface-form →
    concept prior; complements anchor_text_index's per-target view
    with the per-SURFACE conditional). Engine shape: ONE
    (anchor, dst_host) bounded aggregate over the resolved link
    stream, ONE anchor-bounded re-fold for the denominators, ONE
    anchor-keyed bucketed join, and a replayable float division.
    Columns: anchor, dst_host, n, n_anchor, share."""
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    c_schema = pa.schema(
        [("anchor", pa.string()), ("dst_host", pa.string()), ("n", pa.int64())]
    )
    c = pin_schema(
        bucketed_aggregate(
            with_ones(
                _resolved_links(sf_dir).map_batches(
                    lambda t: pa.table(
                        {
                            "anchor": t.column("anchor"),
                            "dst_host": t.column("dst_host"),
                        }
                    )
                    if t.num_columns
                    else pa.schema(
                        [("anchor", pa.string()), ("dst_host", pa.string())]
                    ).empty_table(),
                    batch_format="pyarrow",
                ),
                "n",
            ),
            ["anchor", "dst_host"],
            [("n", "sum")],
        ),
        c_schema,
    ).materialize()
    totals = pin_schema(
        bucketed_aggregate(
            c.map_batches(
                lambda t: pa.table({"anchor": t.column("anchor"), "n_anchor": t.column("n")})
                if t.num_columns
                else pa.schema([("anchor", pa.string()), ("n_anchor", pa.int64())]).empty_table(),
                batch_format="pyarrow",
            ),
            ["anchor"],
            [("n_anchor", "sum")],
        ),
        pa.schema([("anchor", pa.string()), ("n_anchor", pa.int64())]),
    )
    out_schema = pa.schema(
        [
            ("anchor", pa.string()),
            ("dst_host", pa.string()),
            ("n", pa.int64()),
            ("n_anchor", pa.int64()),
            ("share", pa.float64()),
        ]
    )

    def share(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "anchor": t.column("anchor"),
                "dst_host": t.column("dst_host"),
                "n": t.column("n"),
                "n_anchor": t.column("n_anchor"),
                "share": pc.divide(
                    pc.cast(t.column("n"), pa.float64()),
                    pc.cast(t.column("n_anchor"), pa.float64()),
                ),
            },
            schema=out_schema,
        )

    joined = bucketed_inner_join(
        c,
        totals,
        ["anchor"],
        c_schema,
        pa.schema([("anchor", pa.string()), ("n_anchor", pa.int64())]),
    )
    return pin_schema(joined.map_batches(share, batch_format="pyarrow"), out_schema)


def warc_roundtrip(sf_dir: str, num_shards: int = 16):
    """WARC conversion-record sink→source parity (sources/warc.py) —
    the ntriples_roundtrip contract applied to the crawl format: the
    corpus is rendered to sharded WARC files (Content-Length-framed
    records, md5-61-bit url sharding), read back with the distributed
    whole-file parser, and returned; the driver's hash match against
    the plain documents twin pins serialize∘parse = identity on real
    text (including bodies containing blank lines and header
    look-alikes, which a separator-split reader would corrupt). The
    manifest record count is asserted against the input so a dropped
    shard can never pass as a smaller corpus. Columns: url, text."""
    import shutil
    import uuid

    import numpy as np
    import ray.data as rd

    from bioner_ray.sources.warc import read_warc, write_warc

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        return pa.table(
            {
                "url": pa.array(
                    [
                        f"https://site{h}.example.com/doc/{i}"
                        for i, h in zip(ids.tolist(), hosts.tolist())
                    ],
                    type=pa.string(),
                ),
                "text": batch.column("text"),
            }
        )

    pages = docs.map_batches(to_pages, batch_format="pyarrow")
    out_dir = os.path.join("/tmp/bioner_warc", uuid.uuid4().hex)
    shutil.rmtree(out_dir, ignore_errors=True)
    manifest = write_warc(pages, out_dir, num_shards=num_shards)
    n_written = sum(r["n_records"] for r in manifest.take_all())
    n_docs = docs.count()
    if n_written != n_docs:
        raise RuntimeError(f"warc manifest {n_written} != docs {n_docs}")
    return read_warc(out_dir)


def _content_pages_batch(batch: pa.Table) -> pa.Table:
    """Synthetic boilerplate-laden pages (fixture construction, not
    under test): a nav div (all-link), (doc_id % 3 + 1) prose
    paragraphs of ≤ 10 real corpus tokens each — paragraph p carries
    one inline link around its first token iff (doc_id + p) % 4 == 0 —
    and a footer div (all-link). Exactly the block mix the
    link-density rule must separate."""
    import numpy as np

    from bioner_ray.stages.textstats import _split_lower

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = _host_idx(ids)
    urls, htmls = [], []
    for (i, h), toks in zip(
        zip(ids.tolist(), hosts.tolist()), _split_lower(batch, "text")
    ):
        parts = [
            '<html><body><div class="nav"><a href="/">home</a> '
            '<a href="/a">about</a> <a href="/c">contact</a></div>'
        ]
        for p in range(i % 3 + 1):
            chunk = toks[p * 10 : p * 10 + 10]
            if not chunk:
                chunk = ["filler"]
            if (i + p) % 4 == 0:
                chunk = [f'<a href="/t">{chunk[0]}</a>'] + chunk[1:]
            parts.append(f'<p class="body">{" ".join(chunk)}</p>')
        parts.append(
            '<div class="footer"><a href="/x">terms</a> <a href="/y">privacy</a></div>'
            "</body></html>"
        )
        urls.append(f"https://site{h}.example.com/doc/{i}")
        htmls.append("".join(parts).encode("utf-8"))
    return pa.table(
        {"url": pa.array(urls, type=pa.string()), "html": pa.array(htmls, type=pa.binary())}
    )


def boilerplate_blocks(sf_dir: str):
    """Main-content extraction by link density (stages/extract.py
    extract_main_blocks_batch — the jusText/trafilatura-family
    heuristic every web-corpus build runs between fetch and text):
    per flat block, exact word / link-word counts and the keep
    verdict; nav and footer divs drop (density 1), prose paragraphs
    survive, and the one-in-four inline-link paragraphs pin the
    fractional-density arithmetic. Columns: url, block_idx, n_words,
    n_link_words, kept."""
    import ray.data as rd

    from bioner_ray.stages.extract import extract_main_blocks_batch

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return docs.map_batches(_content_pages_batch, batch_format="pyarrow").map_batches(
        extract_main_blocks_batch, batch_format="pyarrow"
    )


def dom_depth_stats(sf_dir: str):
    """DOM complexity audit over the structured-page fixture
    (stages/extract.py dom_depth_batch): per page, max tag-nesting
    depth and tag count from a single open/close balance scan — deep
    DOM with little text marks template/widget pages a quality filter
    drops. Spec pages with a table nest to depth 6 (html→body→table→
    tr→td→b), tableless pages stop at 3; tag count tracks the row
    arithmetic, so both columns replay in SQL. Columns: url,
    max_depth, n_tags."""
    import ray.data as rd

    from bioner_ray.stages.extract import dom_depth_batch

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return docs.map_batches(_table_pages_batch, batch_format="pyarrow").map_batches(
        dom_depth_batch, batch_format="pyarrow"
    )


def crawl_budget_waterfill(sf_dir: str, budget_frac_den: int = 2):
    """Crawl-budget allocation under politeness caps — the waterfilling
    shape a fetch fleet solves each cycle: a global page budget
    (``total_docs // budget_frac_den``) is split across hosts
    proportional to host value (doc count), clamped by each host's
    politeness cap (32 + 16·(h mod 4) — tiered crawl-delay classes, sized so the fixture's hottest hosts CLAMP and the surplus redistribution fires at every test scale),
    and the clamped surplus is redistributed once among uncapped hosts
    (two exact integer rounds; a third round moves < #hosts units and
    real schedulers stop here too). All floor-division integer
    arithmetic over the HOST-BOUNDED table (collected once — hosts ≤
    millions at crawl scale, the module-wide bound), so the twin
    replays it bit-for-bit. Columns: host, n_docs, cap, alloc."""
    import numpy as np
    import ray.data as rd

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def to_host(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        return pa.table(
            {
                "host": pa.array(
                    [f"site{h}.example.com" for h in hosts.tolist()], type=pa.string()
                ),
                "h": pa.array(hosts.astype(np.int64)),
            }
        )

    counts = pin_schema(
        bucketed_aggregate(
            with_ones(docs.map_batches(to_host, batch_format="pyarrow"), "n_docs"),
            ["host", "h"],
            [("n_docs", "sum")],
        ),
        pa.schema([("host", pa.string()), ("h", pa.int64()), ("n_docs", pa.int64())]),
    ).to_pandas()  # host-bounded

    counts = counts.sort_values("host", ignore_index=True)
    v = counts["n_docs"].to_numpy(dtype=np.int64)
    cap = 32 + 16 * (counts["h"].to_numpy(dtype=np.int64) % 4)
    total = int(v.sum())
    budget = total // budget_frac_den
    # round 1: proportional, clamped
    a1 = np.minimum(cap, budget * v // total)
    # round 2: redistribute the surplus among uncapped hosts
    residual = budget - int(a1.sum())
    uncapped = a1 < cap
    vu = int(v[uncapped].sum())
    a2 = a1.copy()
    if residual > 0 and vu > 0:
        a2[uncapped] = np.minimum(
            cap[uncapped], a1[uncapped] + residual * v[uncapped] // vu
        )
    return pa.table(
        {
            "host": pa.array(counts["host"].tolist(), type=pa.string()),
            "n_docs": pa.array(v, type=pa.int64()),
            "cap": pa.array(cap, type=pa.int64()),
            "alloc": pa.array(a2, type=pa.int64()),
        }
    )


def template_clusters(sf_dir: str):
    """Server-template detection over the structured-page fixture
    (stages/extract.py tag_sequence_fingerprint_batch): pages cluster
    by the md5 of their open-tag sequence — text-independent, so one
    CMS template yields one fingerprint per host however the content
    varies. The step a crawl pipeline runs BEFORE boilerplate removal
    (per-template block statistics need template groups). The spec
    pages fall into 4 structural classes per host (tableless, 1-3
    spec rows), pinning real cluster structure at every scale. One
    bucketed aggregate over (host, fingerprint). Columns: host,
    fingerprint, n_pages."""
    import ray.data as rd

    from bioner_ray.stages.extract import tag_sequence_fingerprint_batch
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    fps = docs.map_batches(_table_pages_batch, batch_format="pyarrow").map_batches(
        tag_sequence_fingerprint_batch, batch_format="pyarrow"
    )

    def host_of_url(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("host", pa.string()), ("fingerprint", pa.string())]
            ).empty_table()
        hosts = pc.struct_field(
            pc.extract_regex(t.column("url"), r"^[a-z]+://(?P<h>[^/]+)"), "h"
        )
        return pa.table({"host": hosts, "fingerprint": t.column("fingerprint")})

    return pin_schema(
        bucketed_aggregate(
            with_ones(fps.map_batches(host_of_url, batch_format="pyarrow"), "n_pages"),
            ["host", "fingerprint"],
            [("n_pages", "sum")],
        ),
        pa.schema(
            [("host", pa.string()), ("fingerprint", pa.string()), ("n_pages", pa.int64())]
        ),
    )


def host_coverage_gini(sf_dir: str):
    """Crawl-balance summary: the Gini coefficient of pages-per-host —
    the one-number skew report a crawl scheduler watches (0 = every
    host equally covered; →1 = coverage concentrated on a few hosts).
    Exact integer arithmetic over the HOST-BOUNDED count table
    (Σᵢ Σⱼ |xᵢ−xⱼ| cross-differences, gini_milli = floor(1000·Σ|Δ| /
    (2·n·Σx))) — hosts ≤ millions at crawl scale, and the pairwise sum
    over the bounded table is exact where a float Lorenz integral
    would not replay. Columns: n_hosts, n_docs, gini_milli."""
    import numpy as np
    import ray.data as rd

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def to_host(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        return pa.table(
            {
                "host": pa.array(
                    [f"site{h}.example.com" for h in hosts.tolist()], type=pa.string()
                )
            }
        )

    counts = pin_schema(
        bucketed_aggregate(
            with_ones(docs.map_batches(to_host, batch_format="pyarrow"), "n"),
            ["host"],
            [("n", "sum")],
        ),
        pa.schema([("host", pa.string()), ("n", pa.int64())]),
    ).to_pandas()  # host-bounded
    x = counts["n"].to_numpy(dtype=np.int64)
    n = len(x)
    total = int(x.sum())
    diff = int(np.abs(x[:, None] - x[None, :]).sum())
    gini_milli = (1000 * diff) // (2 * n * total) if total else 0
    return pa.table(
        {
            "n_hosts": pa.array([n], type=pa.int64()),
            "n_docs": pa.array([total], type=pa.int64()),
            "gini_milli": pa.array([gini_milli], type=pa.int64()),
        }
    )


def warc_cdx_index(sf_dir: str, num_shards: int = 16):
    """CDX-style offset index for the WARC export — the companion
    artifact Common Crawl ships next to every WARC: per record, its
    shard, byte offset within the shard file and byte length, computed
    from the REAL rendered record bytes (sources/warc.py grammar) with
    per-shard prefix sums in url order (the writer's record order).
    A reader with this index fetches any page by (shard, offset,
    length) without scanning. One shard-keyed bucketed map_groups —
    the same exchange the writer itself needs. The twin re-derives
    lengths arithmetically (47 + len(url) + digits(len(text)) +
    len(text)) and offsets via a window sum, so a single byte of
    grammar drift breaks the hash. Columns: url, shard, offset,
    length."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from bioner_ray.sources.warc import format_warc_record
    from bioner_ray.stages.shuffle import bucketed_map_groups, pin_schema

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    m61 = 1 << 61
    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("shard", pa.int64()),
            ("offset", pa.int64()),
            ("length", pa.int64()),
        ]
    )

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = _host_idx(ids)
        texts = batch.column("text").to_pylist()
        urls, shards, lens = [], [], []
        for i, h, t in zip(ids.tolist(), hosts.tolist(), texts):
            u = f"https://site{h}.example.com/doc/{i}"
            urls.append(u)
            shards.append(
                int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
                % m61
                % num_shards
            )
            lens.append(len(format_warc_record(u, t or "")))
        return pa.table(
            {
                "shard": pa.array(shards, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
                "length": pa.array(lens, type=pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return out_schema.empty_table()
        group = group.sort_by([("shard", "ascending"), ("url", "ascending")])
        sh = group.column("shard").to_numpy(zero_copy_only=False)
        lens = group.column("length").to_numpy(zero_copy_only=False).astype(np.int64)
        new = np.r_[True, sh[1:] != sh[:-1]]
        csum = np.concatenate([[0], np.cumsum(lens)])[:-1]
        base = np.maximum.accumulate(np.where(new, csum, 0))
        offsets = csum - base
        return pa.table(
            {
                "url": group.column("url"),
                "shard": pa.array(sh, type=pa.int64()),
                "offset": pa.array(offsets, type=pa.int64()),
                "length": pa.array(lens, type=pa.int64()),
            },
            schema=out_schema,
        )

    return pin_schema(
        bucketed_map_groups(
            docs.map_batches(render, batch_format="pyarrow"), ["shard"], fold
        ),
        out_schema,
    )


def mirror_confirmed(sf_dir: str, prefix_tokens: int = 4, threshold: float = 0.8):
    """Mirror detection, CONFIRMATION stage — the precision pass after
    ``web_mirror_candidates``' cheap prefix blocking (4-token prefix
    here — looser than the candidate query's 8, so FALSE candidates
    exist and the reject branch is live at test scale): every
    cross-host candidate doc pair is verified against its EXACT
    shingle Jaccard
    (the memoized truth table), and host pairs report candidate vs
    confirmed counts — the evidence grade a crawl dedup uses before
    folding a host family. One pair-keyed left-outer join (candidate-
    set-sized) + one bounded host-pair aggregate on top of the
    blocking stage's own exchange. Columns: host_a, host_b,
    n_candidates, n_confirmed."""
    import numpy as np
    import ray.data as rd

    from bioner_ray.pipelines.corpus import _jaccard_pairs_memo
    from bioner_ray.stages.dedup import _bucketed_pairs
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
    )
    from bioner_ray.stages.textstats import _split_lower

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def key_rows(t: pa.Table) -> pa.Table:
        keys = [" ".join(toks[:prefix_tokens]) for toks in _split_lower(t, "text")]
        return pa.table(
            {"k": pa.array(keys, type=pa.string()), "doc_id": t.column("doc_id")}
        )

    cand_pairs = _bucketed_pairs(
        docs.map_batches(key_rows, batch_format="pyarrow"), "k", "doc_id",
        max_group=1024,
    )

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def cross_only(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pair_schema.empty_table()
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _host_idx(a) != _host_idx(b)
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep])}, schema=pair_schema
        )

    truth = _jaccard_pairs_memo(sf_dir, 0.5).map_batches(
        lambda t: pa.table(
            {
                "a": pc.cast(t.column("a"), pa.int64()),
                "b": pc.cast(t.column("b"), pa.int64()),
                "jaccard": t.column("jaccard"),
            }
        )
        if t.num_columns
        else pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
        ).empty_table(),
        batch_format="pyarrow",
    )
    joined = bucketed_inner_join(
        pin_schema(
            cand_pairs.map_batches(cross_only, batch_format="pyarrow"), pair_schema
        ),
        pin_schema(
            truth,
            pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
        ),
        ["a", "b"],
        pair_schema,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
        join_type="left outer",
    )
    out_schema = pa.schema(
        [
            ("host_a", pa.string()),
            ("host_b", pa.string()),
            ("n_candidates", pa.int64()),
            ("n_confirmed", pa.int64()),
        ]
    )

    def fold_hosts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        j = pc.fill_null(t.column("jaccard"), 0.0).to_numpy(zero_copy_only=False)
        ha, hb = _host_idx(a), _host_idx(b)
        lo = np.minimum(ha, hb)
        hi = np.maximum(ha, hb)
        return pa.table(
            {
                "host_a": pa.array([f"site{h}.example.com" for h in lo.tolist()]),
                "host_b": pa.array([f"site{h}.example.com" for h in hi.tolist()]),
                "n_candidates": pa.array(np.ones(len(a), dtype=np.int64)),
                "n_confirmed": pa.array((j >= threshold).astype(np.int64)),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            joined.map_batches(fold_hosts, batch_format="pyarrow"),
            ["host_a", "host_b"],
            [("n_candidates", "sum"), ("n_confirmed", "sum")],
        ),
        out_schema,
    )
