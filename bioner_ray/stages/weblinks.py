"""Web-graph construction from raw Common-Crawl-style HTML — the
link-extraction axis of the north-star input (pages with an
``html: binary`` column): anchor ``<a href>`` extraction, relative-URL
resolution, host projection, and crawl-frontier URL canonicalization.

The reference has no web-graph stage (its extractor is
pubmed_parser.py — XML abstracts, no hyperlinks); this module is the
§2.11-style scale extension that makes the engine usable on an actual
web crawl: host→host link graph for domain ranking, anchor-text
aggregation for entity linking priors, and URL canonicalization for
crawl dedup.

Scale shape: extraction is an embarrassingly parallel ``map_batches``
(one compiled RE2-compatible regex per page — no DOM build, no Python
token loop); resolution/host projection are fully vectorized
``pyarrow.compute`` kernels; the only shuffles are the final bounded
host-pair / canonical-url aggregates, which ride
``bucketed_aggregate``'s combiner so the exchange is O(distinct keys),
not O(links).

Deterministic page synthesis (test/bench corpus): pages derive from
``documents.doc_id`` by pure integer arithmetic so the DuckDB twins can
re-derive the expected graph without parsing HTML. Generator contract
(replayed verbatim by the SQL twins in ``__ray_entry__``):

  host_idx(i) = i % 4 if i even else i % 16      # hosts 0/2 carry half
  host(i)     = "site{host_idx}.example.com"     # the crawl (hub skew)
  url(i)      = "https://{host(i)}/doc/{i}"
  k(i)        = 1 + i % 4                        # links on page i
  tgt(i, j)   = (7*i + 13*j + 1) % N             # j in 0..k-1
  form(i, j)  = (i + j) % 3                      # 0 absolute,
                                                 # 1 protocol-relative,
                                                 # 2 root-relative
  anchor(i,j) = "ref {tgt % 7}"
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: anchor tags in the canonical double-quoted form; RE2-compatible so
#: a DuckDB regexp_extract_all over the same bytes would agree.
HREF_RE = re.compile(r'<a href="([^"]*)">([^<]*)</a>')

#: scheme://host prefix (host stops at :port, /path, ?query, #frag)
_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"

LINKS_SCHEMA = pa.schema(
    [("src_url", pa.string()), ("href", pa.string()), ("anchor", pa.string())]
)
RESOLVED_SCHEMA = pa.schema(
    [("src_host", pa.string()), ("dst_host", pa.string()), ("anchor", pa.string())]
)


def _host_idx(ids: np.ndarray) -> np.ndarray:
    return np.where(ids % 2 == 0, ids % 4, ids % 16)


def synthesize_pages_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """doc_id batch → (url, html) pages per the module-docstring
    contract. Fixture construction, not an operator under test — on a
    real crawl this batch IS the input."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = _host_idx(ids)
    urls, htmls = [], []
    for i, h in zip(ids.tolist(), hosts.tolist()):
        parts = [f"<html><body><p>page {i} on site{h}</p>"]
        for j in range(1 + i % 4):
            tgt = (7 * i + 13 * j + 1) % n_docs
            th = tgt % 4 if tgt % 2 == 0 else tgt % 16
            form = (i + j) % 3
            if form == 0:
                href = f"https://site{th}.example.com/doc/{tgt}"
            elif form == 1:
                href = f"//site{th}.example.com/doc/{tgt}"
            else:
                href = f"/doc/{tgt}"
            parts.append(f'<a href="{href}">ref {tgt % 7}</a>')
        parts.append("</body></html>")
        urls.append(f"https://site{h}.example.com/doc/{i}")
        htmls.append("".join(parts).encode("utf-8"))
    return pa.table(
        {"url": pa.array(urls, type=pa.string()), "html": pa.array(htmls, type=pa.binary())}
    )


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """(url, html) → one row per anchor tag: (src_url, href, anchor).

    One compiled-regex findall per page — the per-document scan every
    text stage pays; no DOM, no per-token Python. Output fan-out is the
    page's link count, so blocks stay proportional to input bytes."""
    if batch.num_columns == 0:
        return LINKS_SCHEMA.empty_table()
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    src, href, anchor = [], [], []
    for u, h in zip(urls, htmls):
        for m in HREF_RE.finditer((h or b"").decode("utf-8", errors="replace")):
            src.append(u)
            href.append(m.group(1))
            anchor.append(m.group(2))
    return pa.table(
        {
            "src_url": pa.array(src, type=pa.string()),
            "href": pa.array(href, type=pa.string()),
            "anchor": pa.array(anchor, type=pa.string()),
        }
    )


RESOLVED_URL_SCHEMA = pa.schema(
    [("src_url", pa.string()), ("dst_url", pa.string()), ("anchor", pa.string())]
)


# the ONE host grammar every per-host fold in the engine shares:
# scheme then authority, capture stopping at :/?# so ports, paths,
# queries and fragments never enter the host
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<h>[^/:?#]+)"
_SCHEME_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def host_of(urls):
    """Lowercased host of each URL in an Arrow string array (NULL where
    no scheme://host prefix parses). Every consumer MUST go through
    this helper — a host-parsing fix applied to one inlined copy of the
    regex would silently split the engine's per-host folds."""
    return pc.utf8_lower(pc.struct_field(pc.extract_regex(urls, _HOST_RE), "h"))


def _resolve_dst(src, href):
    """Vectorized href → absolute dst_url: absolute hrefs pass through,
    protocol-relative take the source scheme, root-relative take the
    source scheme://host; every other reference (path-relative,
    ``mailto:``, ``javascript:``) resolves to NULL — no URL can be
    derived under the supported forms and a fabricated one would
    pollute every downstream aggregate."""
    scheme = pc.struct_field(
        pc.extract_regex(src, r"^(?P<s>[A-Za-z][A-Za-z0-9+.\-]*)://"), "s"
    )
    src_host = host_of(src)
    is_abs = pc.match_substring_regex(href, _SCHEME_PREFIX_RE)
    is_proto = pc.starts_with(href, "//")
    is_root = pc.and_(pc.starts_with(href, "/"), pc.invert(is_proto))
    return pc.case_when(
        pc.make_struct(is_abs, is_proto, is_root),
        href,
        pc.binary_join_element_wise(scheme, pc.cast(href, pa.string()), ":"),
        pc.binary_join_element_wise(scheme, "://", src_host, pc.cast(href, pa.string()), ""),
        pa.nulls(len(href), pa.string()),
    )


def resolve_dst_urls_batch(batch: pa.Table) -> pa.Table:
    """(src_url, href, anchor) → (src_url, dst_url, anchor) at FULL URL
    granularity (the page-level graph the orphan detector and a
    page-level ranker consume); unresolvable references dropped, same
    contract as ``resolve_links_batch``."""
    if batch.num_columns == 0 or batch.num_rows == 0:
        return RESOLVED_URL_SCHEMA.empty_table()
    dst_url = _resolve_dst(batch.column("src_url"), batch.column("href"))
    out = pa.table(
        {
            "src_url": batch.column("src_url"),
            "dst_url": dst_url,
            "anchor": batch.column("anchor"),
        }
    )
    return out.filter(pc.is_valid(out.column("dst_url")))


def resolve_links_batch(batch: pa.Table) -> pa.Table:
    """(src_url, href, anchor) → (src_host, dst_host, anchor), fully
    vectorized: absolute hrefs pass through, protocol-relative take the
    source scheme, root-relative take the source scheme://host; every
    other reference (path-relative, ``mailto:``, ``javascript:``) is
    DROPPED — no host can be derived under the supported forms and a
    fabricated one would pollute every downstream host aggregate. Hosts
    are lowercased; ports/paths/queries/fragments never enter the host
    (the capture stops at ``:/?#``)."""
    if batch.num_columns == 0 or batch.num_rows == 0:
        return RESOLVED_SCHEMA.empty_table()
    src = batch.column("src_url")
    src_host = host_of(src)
    dst_url = _resolve_dst(src, batch.column("href"))
    dst_host = host_of(dst_url)
    out = pa.table(
        {"src_host": src_host, "dst_host": dst_host, "anchor": batch.column("anchor")}
    )
    # path-relative / mailto: / javascript: references carry no resolvable
    # host under the three supported forms — dropped, never fabricated
    # (a made-up host would pollute every downstream host aggregate)
    return out.filter(pc.is_valid(out.column("dst_host")))


def canonicalize_urls_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``canonical_url``: fragment stripped, ``utm_*`` tracking
    params dropped, scheme+host lowercased, default port removed
    (``:443`` for https, ``:80`` for http). Path/query case and
    non-tracking param order are preserved — canonicalization must
    never merge genuinely distinct resources.

    Every rule is a vectorized RE2 pass (no per-row Python). The utm
    strip runs the interior-param rewrite twice, handling runs of up to
    three consecutive utm params between non-utm neighbors — beyond
    that, callers chain another pass; the trailing-param rule is
    position-anchored and needs one."""
    if batch.num_columns == 0 or batch.num_rows == 0:
        return batch
    u = pc.cast(batch.column(url_col), pa.string())
    u = pc.replace_substring_regex(u, r"#.*$", "")  # fragment
    for _ in range(2):  # interior utm params (each pass eats one run element)
        u = pc.replace_substring_regex(u, r"([?&])utm_[^&#]*&", r"\1")
    u = pc.replace_substring_regex(u, r"[?&]utm_[^&#]*$", "")  # trailing utm
    pre = pc.utf8_lower(
        pc.struct_field(pc.extract_regex(u, f"(?P<p>{_PREFIX_RE})"), "p")
    )
    pre = pc.replace_substring_regex(pre, r"^(https://[^/:?#]*):443$", r"\1")
    pre = pc.replace_substring_regex(pre, r"^(http://[^/:?#]*):80$", r"\1")
    rest = pc.replace_substring_regex(u, _PREFIX_RE, "")
    canon = pc.binary_join_element_wise(pre, rest, "")
    return batch.append_column("canonical_url", canon)


TEMPLATE_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("template", pa.string()),
        ("n_urls", pa.int64()),
        ("example_url", pa.string()),
    ]
)

_TMPL_LONG_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("sec", pa.string()),
        ("nseg", pa.int64()),
        ("pos", pa.int64()),
        ("seg", pa.string()),
    ]
)


def _url_parts(batch: pa.Table):
    """url column → (urls, host, flat path segments, per-row segment
    count, flat offsets), all numpy. Path = everything after
    scheme://host and before ?#; the leading slash is stripped before
    the split so ``/a/b`` yields segments [a, b]."""
    urls = pc.cast(batch.column("url"), pa.string()).combine_chunks()
    host = host_of(urls).to_numpy(zero_copy_only=False)
    path = pc.replace_substring_regex(urls, _SCHEME_PREFIX_RE + r"[^/:?#]*", "")
    path = pc.replace_substring_regex(path, r"[?#].*$", "")
    inner = pc.replace_substring_regex(path, r"^/", "")
    segs = pc.split_pattern(inner, "/")
    if isinstance(segs, pa.ChunkedArray):
        segs = segs.combine_chunks()
    flat = pc.list_flatten(segs).to_numpy(zero_copy_only=False)
    nseg = pc.list_value_length(segs).to_numpy(zero_copy_only=False).astype(np.int64)
    off = np.r_[0, np.cumsum(nseg)]
    return urls.to_numpy(zero_copy_only=False), host, flat, nseg, off


def _tmpl_long_batch(batch: pa.Table) -> pa.Table:
    if batch.num_columns == 0 or batch.num_rows == 0:
        return _TMPL_LONG_SCHEMA.empty_table()
    _, host, flat, nseg, off = _url_parts(batch)
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], nseg) + 1
    return pa.table(
        {
            "host": pa.array(np.repeat(host, nseg), type=pa.string()),
            "sec": pa.array(np.repeat(flat[off[:-1]], nseg), type=pa.string()),
            "nseg": pa.array(np.repeat(nseg, nseg)),
            "pos": pa.array(pos),
            "seg": pa.array(flat, type=pa.string()),
        },
        schema=_TMPL_LONG_SCHEMA,
    )


def url_templates(ds, min_distinct: int = 8, num_buckets: int = 64):
    """Per-host URL path-template induction — the crawl-dedup /
    frontier-compression primitive that folds ``/products/{id}/reviews``
    pages into one template: within every (host, first-segment section,
    path depth), a position generalizes to ``*`` iff it carries
    ``min_distinct``+ distinct segment values; otherwise it stays
    literal. Deterministic (a counting rule, no RNG) and replayed
    verbatim by the SQL twin.

    Scale shape: the url stream flattens to a long segment form (all
    pyarrow list kernels, zero per-row Python), two combiner-compressed
    bucketed aggregates produce the decision table — STRUCTURALLY
    bounded by hosts × sections × depths × positions, NOT by url count,
    so it collects driver-side and broadcasts via ONE ray.put — and the
    template strings then build in one stateless vectorized pass over
    the stream (per-wildcard-key numpy masks; the only per-row work is
    the final ≤depth-element join). The url stream shuffles exactly
    once: the closing (host, template) fold. Columns: host, template,
    n_urls, example_url (lexicographically first member)."""
    import ray

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    long_ds = ds.map_batches(_tmpl_long_batch, batch_format="pyarrow")
    d1 = pin_schema(
        bucketed_aggregate(
            with_ones(long_ds),
            ["host", "sec", "nseg", "pos", "seg"],
            [("one", "min")],
            num_buckets=num_buckets,
        ),
        pa.schema(list(_TMPL_LONG_SCHEMA) + [("one", pa.int64())]),
    )
    d2 = pin_schema(
        bucketed_aggregate(
            d1.map_batches(
                lambda t: t.select(["host", "sec", "nseg", "pos", "one"]),
                batch_format="pyarrow",
            ),
            ["host", "sec", "nseg", "pos"],
            [("one", "sum")],
            num_buckets=num_buckets,
        ),
        pa.schema(
            [
                ("host", pa.string()),
                ("sec", pa.string()),
                ("nseg", pa.int64()),
                ("pos", pa.int64()),
                ("one", pa.int64()),
            ]
        ),
    )
    dec = d2.to_pandas()  # bounded: hosts x sections x depths x positions
    wild = [
        (r.host, r.sec, int(r.nseg), int(r.pos))
        for r in dec.itertuples()
        if int(r.one) >= min_distinct
    ]
    wild_ref = ray.put(wild)

    def build(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema(
                [("host", pa.string()), ("template", pa.string()), ("url", pa.string())]
            ).empty_table()
        urls, host, flat, nseg, off = _url_parts(batch)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], nseg) + 1
        host_rep = np.repeat(host, nseg)
        sec_rep = np.repeat(flat[off[:-1]], nseg)
        nseg_rep = np.repeat(nseg, nseg)
        out = flat.copy()
        for h, s, n, p in ray.get(wild_ref):
            m = (host_rep == h) & (sec_rep == s) & (nseg_rep == n) & (pos == p)
            out[m] = "*"
        tpl = ["/" + "/".join(out[a:b]) for a, b in zip(off[:-1], off[1:])]
        return pa.table(
            {
                "host": pa.array(host, type=pa.string()),
                "template": pa.array(tpl, type=pa.string()),
                "url": pa.array(urls, type=pa.string()),
            }
        )

    agg = bucketed_aggregate(
        with_ones(ds.map_batches(build, batch_format="pyarrow"), "n_urls"),
        ["host", "template"],
        [("n_urls", "sum"), ("url", "min")],
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return TEMPLATE_SCHEMA.empty_table()
        return t.rename_columns(
            ["example_url" if c == "url" else c for c in t.schema.names]
        )

    return pin_schema(agg.map_batches(finish, batch_format="pyarrow"), TEMPLATE_SCHEMA)


ROBOTS_GATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("allowed", pa.int64()),
        ("rule", pa.string()),
    ]
)

_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]+(?P<p>/.*)$"


def robots_gate(urls_ds, rules_by_host: dict):
    """Pre-fetch robots.txt gate under Google-style longest-prefix-
    match semantics: among a host's rules (``(path_prefix, allow)``
    pairs) whose prefix matches the URL path, the LONGEST prefix wins
    and a length tie goes to Allow; a URL matching no rule is allowed
    with rule ``''``. ``allowed`` is int64 0/1 (replayable compare).

    The rule table is robots.txt-sized — tiny and bounded — so it
    ships inside the closure once per task, and the scan is ONE
    vectorized starts_with mask per (host, rule) over the whole batch:
    rules × O(batch) numpy, never a per-URL Python loop over rules.
    Columns: url, host, allowed, rule."""
    by_host = [
        (h, [(prefix, bool(allow)) for prefix, allow in rl])
        for h, rl in sorted(rules_by_host.items())
    ]

    def gate(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return ROBOTS_GATE_SCHEMA.empty_table()
        urls = batch.column("url")
        hosts = host_of(urls)
        paths = pc.fill_null(
            pc.struct_field(pc.extract_regex(urls, _PATH_RE), "p"), ""
        )
        best_len = np.full(batch.num_rows, -1, dtype=np.int64)
        best_allow = np.ones(batch.num_rows, dtype=bool)
        best_rule = np.full(batch.num_rows, "", dtype=object)
        # host mask computed ONCE per host (ADVICE r3 — it was
        # redundantly re-derived per rule), rules of absent hosts skipped
        for h, rl in by_host:
            hmask = np.asarray(
                pc.equal(hosts, h).to_numpy(zero_copy_only=False), dtype=bool
            )
            if not hmask.any():
                continue
            for prefix, allow in rl:
                mask = hmask & np.asarray(
                    pc.starts_with(paths, prefix).to_numpy(zero_copy_only=False),
                    dtype=bool,
                )
                ln = len(prefix)
                upd = mask & (
                    (ln > best_len)
                    | ((ln == best_len) & allow & ~best_allow)
                )
                best_len[upd] = ln
                best_allow[upd] = allow
                best_rule[upd] = prefix
        return pa.table(
            {
                "url": pc.cast(urls, pa.string()),
                "host": pc.cast(hosts, pa.string()),
                "allowed": pa.array(best_allow.astype(np.int64)),
                "rule": pa.array(best_rule.tolist(), type=pa.string()),
            },
            schema=ROBOTS_GATE_SCHEMA,
        )

    return urls_ds.map_batches(gate, batch_format="pyarrow")
