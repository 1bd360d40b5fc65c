"""Graph ops over pair datasets: connected components (dedup clusters).

The "keep one document per near-duplicate CLUSTER" step: pair emission
(Jaccard / MinHash / SimHash / cosine) yields edges, and the component
representative (min doc id reachable) is the keeper. Ray Data has no
iterative graph primitive, so this is min-label propagation composed
from the engine's own pieces:

* labels start as each node's own id;
* per round, every edge ships its neighbor's current label to the node
  (hash join on the neighbor — both sides are the PAIR GRAPH, bounded
  by the near-dup population, not the corpus) and
  ``bucketed_aggregate`` takes the per-node min;
* labels monotonically decrease and are bounded below, so
  ``sum(labels)`` is a fixpoint detector that costs one cheap
  aggregate, never a join;
* each round's labels are materialized — the label table is
  O(#nodes-in-pairs), so this is the same bounded-table argument as
  canonicalize_nodes, and it keeps round k+1 from re-executing round
  k's join lineage.

Rounds needed: near-dup clusters are dense, so plain propagation
converges in 2-3 rounds. From round 3 on, each round ALSO
pointer-jumps (label ← label[label], one extra bounded self-join), so
a pathological long chain converges in O(log diameter) rounds instead
of O(diameter) — ``max_iters`` = 30 therefore covers diameters past
2^25 while typical inputs never pay the extra join.
"""

from __future__ import annotations

import pyarrow as pa

from bioner_ray.stages.shuffle import (
    bucketed_aggregate,
    bucketed_inner_join,
    bucketed_map_groups,
    pin_schema,
    with_ones,
)


def _driver_components(rows, a_col: str, b_col: str):
    """Union-find with path compression over a COLLECTED pair list —
    the fast path for pair sets under the driver gate. Exact same
    contract: (node, component=min node id in the component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = int(r[a_col]), int(r[b_col])
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-id root → component = min
    import ray.data as rd

    nodes = sorted(parent)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "component": pa.array([find(n) for n in nodes], type=pa.int64()),
            }
        )
    )


def connected_components(
    pairs_ds,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 30,
    num_partitions: int | None = None,
    driver_max_pairs: int = 2_000_000,
):
    """(a, b) pair Dataset → (node, component) with component = min
    node id in the connected component. See module docstring.

    The pair set is bounded by the NEAR-DUP population, not the corpus
    — and the downstream keep-filter collects the non-representative
    ids to the driver anyway (pipelines/corpus.py dedup_filter). So
    under ``driver_max_pairs`` the exact union-find runs driver-side
    (micro-seconds vs seconds of per-round join overhead); above it,
    the distributed label-propagation + pointer-jumping path runs.
    Both produce identical labels."""
    pairs_ds = pairs_ds.materialize()  # bounded; single execution, both paths
    if driver_max_pairs and pairs_ds.count() <= driver_max_pairs:
        return _driver_components(pairs_ds.take_all(), a_col, b_col)

    def sym(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = pc.cast(batch.column(a_col), pa.int64()).combine_chunks()
        b = pc.cast(batch.column(b_col), pa.int64()).combine_chunks()
        return pa.table(
            {
                "node": pa.chunked_array([a, b]).combine_chunks(),
                "nbr": pa.chunked_array([b, a]).combine_chunks(),
            }
        )

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"), "label": batch.column("node")})

    labels = bucketed_aggregate(
        edges.map_batches(init_labels, batch_format="pyarrow"), ["node"], [("label", "min")]
    ).materialize()

    edge_schema = pa.schema([("node", pa.int64()), ("nbr", pa.int64())])
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    # bucketed_inner_join, not Ray's native Dataset.join: the native
    # join crashes whenever a hash partition receives zero rows on a
    # side (zero-column table reaches pyarrow's join) — possible here
    # under label-skew once most labels collapse to few component ids.
    prev_sum = None
    converged = False
    for rnd in range(max_iters):
        nbr_labels = labels.rename_columns({"node": "nbr", "label": "nbr_label"})
        msgs = bucketed_inner_join(
            edges,
            nbr_labels,
            ["nbr"],
            edge_schema,
            pa.schema([("nbr", pa.int64()), ("nbr_label", pa.int64())]),
        ).map_batches(
            lambda t: pa.table({"node": t.column("node"), "label": t.column("nbr_label")})
            if t.num_columns
            else label_schema.empty_table(),
            batch_format="pyarrow",
        )
        labels = bucketed_aggregate(
            labels.union(msgs), ["node"], [("label", "min")]
        ).materialize()
        if rnd >= 2:
            # pointer jumping: label ← label[label]. Every label value
            # is itself a node (labels are mins over reachable node
            # ids, monotone ≤ node), so the inner self-join is total;
            # the jump squares the propagation radius per round.
            ptr = labels.rename_columns({"node": "label", "label": "jump"})
            labels = (
                bucketed_inner_join(
                    labels,
                    ptr,
                    ["label"],
                    label_schema,
                    pa.schema([("label", pa.int64()), ("jump", pa.int64())]),
                )
                .map_batches(
                    lambda t: pa.table(
                        {"node": t.column("node"), "label": t.column("jump")}
                    )
                    if t.num_columns
                    else label_schema.empty_table(),
                    batch_format="pyarrow",
                )
                .materialize()
            )
        s = labels.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # A component with propagation diameter > max_iters would get
        # silently-wrong labels; fail loudly instead (raise the cap or
        # pre-contract long chains if this ever fires in practice).
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} rounds "
            "(component diameter exceeds max_iters); labels would be incorrect"
        )
    return labels.rename_columns({"label": "component"})


def string_components(
    pairs_ds,
    lo_col: str = "lo",
    hi_col: str = "hi",
    driver_max_pairs: int = 2_000_000,
):
    """(lo, hi) STRING pair Dataset → (node, rep) with rep = the
    lexicographic-min member of the node's connected component — the
    string-keyed face of ``connected_components`` shared by entity
    merge-grouping (pipelines/analytics.kg_merge_groups) and host
    site-family detection (pipelines/web.web_host_components).

    Under ``driver_max_pairs`` the pair set union-finds driver-side
    (the pair population is bounded by the candidate graph, not the
    corpus, and downstream consumers collect the rep map anyway).
    Above it the DISTRIBUTED path runs: nodes hash to md5-63-bit ids
    (collision odds ~n²/2^64, negligible for any real vocabulary),
    ``connected_components`` label-propagates over the int pairs, and
    one bucketed aggregate takes the min STRING per component —
    identical output, no driver materialization."""
    import ray.data as rd

    pairs_ds = pairs_ds.materialize()  # bounded; single execution, both paths
    if pairs_ds.count() <= driver_max_pairs:
        pairs = pairs_ds.take_all()
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in pairs:
            a, b = r[lo_col], r[hi_col]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = sorted(parent)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, type=pa.string()),
                    "rep": pa.array([find(n) for n in nodes], type=pa.string()),
                }
            )
        )

    import hashlib

    import numpy as np

    def _hid(arr) -> pa.Array:
        # dictionary-encode → md5 the DISTINCT values → take (VERDICT
        # r3, Next #4): identical hashes, Python loop bounded by the
        # batch's unique-node count instead of its row count
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        denc = a.dictionary_encode()
        uniq = denc.dictionary.to_pylist()
        if not uniq:
            return pa.array(np.empty(0, dtype=np.int64), type=pa.int64())
        uh = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 1
                for s in uniq
            ),
            dtype=np.int64,
            count=len(uniq),
        )
        idx = denc.indices.to_numpy(zero_copy_only=False)
        return pa.array(uh[idx], type=pa.int64())

    int_pairs = pairs_ds.map_batches(
        lambda t: pa.table({"a": _hid(t.column(lo_col)), "b": _hid(t.column(hi_col))})
        if t.num_columns
        else pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )
    comp = connected_components(int_pairs, driver_max_pairs=0)  # (node, component)

    def node_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("hid", pa.int64()), ("node", pa.string())]).empty_table()
        lo = t.column(lo_col).combine_chunks()
        hi = t.column(hi_col).combine_chunks()
        names = pa.chunked_array([lo, hi]).combine_chunks()
        return pa.table({"hid": _hid(names), "node": names})

    name_map = pin_schema(
        bucketed_aggregate(
            pairs_ds.map_batches(node_rows, batch_format="pyarrow"),
            ["hid"],
            [("node", "min")],
        ),
        pa.schema([("hid", pa.int64()), ("node", pa.string())]),
    ).materialize()

    labeled = bucketed_inner_join(
        comp.map_batches(
            lambda t: t.rename_columns(["hid", "component"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        name_map,
        ["hid"],
        pa.schema([("hid", pa.int64()), ("component", pa.int64())]),
        pa.schema([("hid", pa.int64()), ("node", pa.string())]),
    )
    # min string per component = the representative
    reps = pin_schema(
        bucketed_aggregate(
            labeled.map_batches(
                lambda t: pa.table(
                    {"component": t.column("component"), "rep": t.column("node")}
                )
                if t.num_columns
                else pa.schema(
                    [("component", pa.int64()), ("rep", pa.string())]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["component"],
            [("rep", "min")],
        ),
        pa.schema([("component", pa.int64()), ("rep", pa.string())]),
    )
    out = bucketed_inner_join(
        labeled,
        reps,
        ["component"],
        pa.schema([("hid", pa.int64()), ("component", pa.int64()), ("node", pa.string())]),
        pa.schema([("component", pa.int64()), ("rep", pa.string())]),
    )
    return out.map_batches(
        lambda t: t.select(["node", "rep"]) if t.num_columns else pa.schema(
            [("node", pa.string()), ("rep", pa.string())]
        ).empty_table(),
        batch_format="pyarrow",
    )


def degree_stats(
    edges_ds,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
):
    """Per-node degree/strength over a directed weighted edge table:
    (node, out_degree, in_degree, out_weight, in_weight).

    The canonical first KG-quality report (hub detection, skew audit
    before any per-entity groupby). One pass over the edges: each edge
    emits its two endpoint rows, and the wide merge is a single
    ``bucketed_aggregate`` — the shuffle moves per-block-combined
    (node, 4×int64) rows, never the edge table, so cost is O(distinct
    nodes per block) regardless of edge multiplicity. Hot hubs (the
    reason this report exists) share a coarse bucket and cannot own a
    straggler partition.
    """
    import numpy as np
    import pyarrow.compute as pc

    def endpoints(batch: pa.Table) -> pa.Table:
        w = pc.cast(batch.column(weight_col), pa.int64()).combine_chunks()
        n = batch.num_rows
        ones = pa.array(np.ones(n, dtype=np.int64))
        zeros = pa.array(np.zeros(n, dtype=np.int64))
        subj = pc.cast(batch.column(subj_col), pa.string()).combine_chunks()
        obj = pc.cast(batch.column(obj_col), pa.string()).combine_chunks()
        out_rows = pa.table(
            {
                "node": subj,
                "out_degree": ones,
                "in_degree": zeros,
                "out_weight": w,
                "in_weight": zeros,
            }
        )
        in_rows = pa.table(
            {
                "node": obj,
                "out_degree": zeros,
                "in_degree": ones,
                "out_weight": zeros,
                "in_weight": w,
            }
        )
        return pa.concat_tables([out_rows, in_rows])

    return bucketed_aggregate(
        edges_ds.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        [
            ("out_degree", "sum"),
            ("in_degree", "sum"),
            ("out_weight", "sum"),
            ("in_weight", "sum"),
        ],
        num_buckets=num_buckets,
    )


def _pagerank_contrib(r, w, ow, damp_num: int, damp_den: int):
    """Exact per-edge PageRank contribution
    ``(damp_num * r * w) // (damp_den * ow)`` as int64.

    Fast path is vectorized int64; when the intermediate product could
    exceed 2^63 the batch falls back to Python big-ints (bit-identical
    result, the oracle's HUGEINT path). The arithmetic is pinned to
    integer floor division precisely so distributed summation order
    can never perturb the result — scaled-integer ranks make the whole
    iteration order-independent and SQL-replayable."""
    import numpy as np

    r = np.asarray(r, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    ow = np.asarray(ow, dtype=np.int64)
    if r.size == 0:
        return np.zeros(0, dtype=np.int64)
    max_prod = int(r.max()) * int(w.max()) * damp_num
    # Both the numerator AND the vectorized denominator must stay in
    # int64: ow is a per-node out-weight sum, unbounded relative to
    # w.max — damp_den * ow can overflow on its own.
    if max_prod < 2**63 and damp_den * int(ow.max()) < 2**63:
        return (damp_num * r * w) // (damp_den * ow)
    return np.array(
        [
            (damp_num * int(ri) * int(wi)) // (damp_den * int(oi))
            for ri, wi, oi in zip(r.tolist(), w.tolist(), ow.tolist())
        ],
        dtype=np.int64,
    )


def pagerank(
    edges_ds,
    iters: int = 3,
    scale: int = 10**12,
    damp_num: int = 850,
    damp_den: int = 1000,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
    seed_nodes: list[str] | None = None,
):
    """Fixed-iteration weighted PageRank over a directed edge table,
    in deterministic scaled-integer arithmetic: (node, rank) with
    rank ≈ pagerank × ``scale`` as int64.

    Semantics (exactly replayable in SQL, hence oracle-checkable):
      * multi-edges collapse to (subj, obj, Σweight) first;
      * rank₀[v] = scale for every node;
      * per iteration, edge (s→o, w) sends
        ``(damp_num · rank[s] · w) // (damp_den · out_weight[s])``
        and rank'[v] = ((damp_den−damp_num)·scale)//damp_den + Σ inbox;
      * dangling mass evaporates (no redistribution) — the standard
        "pagerank without dangling patch" variant, chosen because it
        keeps every step a local edge computation plus one bounded
        per-node sum.

    Shape per iteration: ONE ``bucketed_inner_join`` (edges ⋈ ranks on
    subj — the rank table is O(nodes), edges stream through it; the
    bucketed join is used instead of Ray's native join because the
    latter crashes on hash partitions that receive zero rows) and ONE
    ``bucketed_aggregate`` (per-node sum, combiner-compressed). The
    rank table is materialized per round so round k+1 never re-executes
    round k's join lineage — same bounded-table argument as
    ``connected_components``. Hot hubs: both shuffles key on coarse
    buckets, and the JOIN side that fans out (many in-edges of one hub)
    is the edge stream, not a per-key partition, so a 10^6-in-degree
    entity costs bandwidth, not a straggler.
    """
    import numpy as np
    import pyarrow.compute as pc

    def to_pair(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": pc.cast(batch.column(subj_col), pa.string()),
                "obj": pc.cast(batch.column(obj_col), pa.string()),
                "w": pc.cast(batch.column(weight_col), pa.int64()),
            }
        )

    edge_schema = pa.schema(
        [("subj", pa.string()), ("obj", pa.string()), ("w", pa.int64())]
    )
    rank_schema = pa.schema([("node", pa.string()), ("r", pa.int64())])

    edges = pin_schema(
        bucketed_aggregate(
            edges_ds.map_batches(to_pair, batch_format="pyarrow"),
            ["subj", "obj"],
            [("w", "sum")],
            num_buckets=num_buckets,
        ),
        edge_schema,
    ).materialize()

    outw = pin_schema(
        bucketed_aggregate(
            edges.map_batches(
                lambda t: pa.table({"subj": t.column("subj"), "outw": t.column("w")}),
                batch_format="pyarrow",
            ),
            ["subj"],
            [("outw", "sum")],
            num_buckets=num_buckets,
        ),
        pa.schema([("subj", pa.string()), ("outw", pa.int64())]),
    )
    edges_w = bucketed_inner_join(
        edges,
        outw,
        ["subj"],
        edge_schema,
        pa.schema([("subj", pa.string()), ("outw", pa.int64())]),
        num_buckets=num_buckets,
    ).materialize()

    def endpoint_nodes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.chunked_array(
                    [
                        batch.column("subj").combine_chunks(),
                        batch.column("obj").combine_chunks(),
                    ]
                ).combine_chunks()
            }
        ).append_column("r", pa.array(np.zeros(2 * batch.num_rows, dtype=np.int64)))

    # distinct nodes, carried with r=0 so base+contrib union-aggregates
    nodes = pin_schema(
        bucketed_aggregate(
            edges.map_batches(endpoint_nodes, batch_format="pyarrow"),
            ["node"],
            [("r", "min")],
            num_buckets=num_buckets,
        ),
        rank_schema,
    ).materialize()

    base = ((damp_den - damp_num) * scale) // damp_den
    # personalized variant: init mass and per-round teleport go ONLY to
    # the seed set (rank₀/base are 0 elsewhere) — the random-walk-with-
    # restart relevance score around a query node set. Seeds are a
    # bounded broadcast list; absent seeds contribute nothing (same as
    # the SQL twin's CASE ... IN).
    seed_arr = (
        None
        if seed_nodes is None
        else np.array(sorted(set(seed_nodes)), dtype=object)
    )

    def with_const(value: int):
        def fn(t: pa.Table) -> pa.Table:
            if seed_arr is None:
                vals = np.full(t.num_rows, value, dtype=np.int64)
            else:
                nd = t.column("node").to_numpy(zero_copy_only=False)
                vals = np.where(np.isin(nd, seed_arr), value, 0).astype(np.int64)
            return pa.table({"node": t.column("node"), "r": pa.array(vals)})

        return fn

    ranks = nodes.map_batches(with_const(scale), batch_format="pyarrow").materialize()
    base_rows = nodes.map_batches(with_const(base), batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # schema-less empty reduce partition
            return rank_schema.empty_table()
        c = _pagerank_contrib(
            t.column("r").to_numpy(zero_copy_only=False),
            t.column("w").to_numpy(zero_copy_only=False),
            t.column("outw").to_numpy(zero_copy_only=False),
            damp_num,
            damp_den,
        )
        return pa.table({"node": t.column("obj"), "r": pa.array(c)})

    for _ in range(iters):
        joined = bucketed_inner_join(
            edges_w,
            ranks.rename_columns({"node": "subj"}),
            ["subj"],
            pa.schema(
                [
                    ("subj", pa.string()),
                    ("obj", pa.string()),
                    ("w", pa.int64()),
                    ("outw", pa.int64()),
                ]
            ),
            pa.schema([("subj", pa.string()), ("r", pa.int64())]),
            num_buckets=num_buckets,
        )
        contribs = joined.map_batches(contrib, batch_format="pyarrow")
        ranks = pin_schema(
            bucketed_aggregate(
                base_rows.union(contribs),
                ["node"],
                [("r", "sum")],
                num_buckets=num_buckets,
            ),
            rank_schema,
        ).materialize()
    return ranks.rename_columns({"r": "rank"})


def _walk_params(length: int, seed: int = 42):
    """Per-step affine-mix constants (A_i, B_i, C_i) in [0, 2^61) —
    61-bit so the SQL twin's HUGEINT products (≤ 2^122) never overflow
    int128; inlined verbatim into the twin by ``__ray_entry__``."""
    import numpy as np

    rng = np.random.default_rng(seed)
    bound = 1 << 61
    a = rng.integers(1, bound, size=length, dtype=np.uint64)
    b = rng.integers(1, bound, size=length, dtype=np.uint64)
    c = rng.integers(0, bound, size=length, dtype=np.uint64)
    return a, b, c


def _node_hash_column(col, memo: dict) -> "np.ndarray":
    """61-bit md5-derived node hash (first 8 bytes, masked), memoized
    per distinct string — SQL replay:
    ``CAST(concat('0x', substr(md5(node), 1, 16)) AS UBIGINT) % 2^61``.

    Arrow ``dictionary_encode`` first (VERDICT r3, Next #4): the Python
    md5 loop runs over the batch's DISTINCT values only, then a numpy
    take fans the hashes back onto rows — on a Zipfian node column the
    per-row Python cost disappears while hashes and twins stay
    byte-identical."""
    import hashlib

    import numpy as np

    mask = (1 << 61) - 1
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    denc = arr.dictionary_encode()
    uniq = denc.dictionary.to_pylist()
    uh = np.empty(len(uniq), dtype=np.uint64)
    for i, s in enumerate(uniq):
        h = memo.get(s)
        if h is None:
            h = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") & mask
            memo[s] = h
        uh[i] = h
    if not len(uniq):
        return np.empty(0, dtype=np.uint64)
    idx = denc.indices.to_numpy(zero_copy_only=False)
    return uh[idx]


def hash_walks(
    edges_ds,
    length: int = 3,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
    seed: int = 42,
):
    """Deterministic hash-greedy walks over a directed edge table: from
    every node with out-edges, a ``length``-step walk where step i
    moves to the out-neighbor minimizing the 64-bit affine mix
    ``(A_i·h(cur) + B_i·h(nxt) + C_i) mod 2^64`` (ties by neighbor id)
    — pseudo-random but RNG-free and SQL-replayable (HUGEINT replays
    the uint64 wrap, the same family the minhash twin pins). h(node)
    is a 61-bit md5-derived hash computed ONCE per edge endpoint at
    edge-table build; the per-step cost is a numpy multiply-add over
    the candidate batch, not a Python md5 per candidate — the walk
    corpus generator KG-embedding training reads.

    The walk is MEMORYLESS — step i's choice from node u depends only
    on (u, i) — so no walk-frontier ⋈ edges join is ever needed: per
    step, ONE combiner-pruned per-group top-1 over the edge table
    (``stages/rank.top_k_per_group``, ≤ 1 candidate per (block, node)
    shuffled) yields a NODE-sized best-next-hop map, and the walks are
    assembled by chaining ``length − 1`` node-sized bucketed joins.
    Exchange per step is bounded by nodes × blocks, never edges — the
    earlier form joined the full edge table once per step. Walks whose
    current node has no out-edges are dropped (inner-join semantics:
    the output is walks that complete all ``length`` steps — chained
    inner joins in the SQL twin). Columns: start, n1 … n``length``.
    """
    import numpy as np
    import pyarrow.compute as pc

    from bioner_ray.stages.rank import top_k_per_group

    pa_a, pa_b, pa_c = _walk_params(length, seed=seed)

    def to_pair(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cur": pc.cast(batch.column(subj_col), pa.string()),
                "nxt": pc.cast(batch.column(obj_col), pa.string()),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    dedup_schema = pa.schema([("cur", pa.string()), ("nxt", pa.string())])

    def add_node_hashes(t: pa.Table) -> pa.Table:
        memo: dict = {}
        t = t.append_column("hcur", pa.array(_node_hash_column(t.column("cur"), memo)))
        return t.append_column(
            "hnxt", pa.array(_node_hash_column(t.column("nxt"), memo))
        )

    edges = (
        pin_schema(
            bucketed_aggregate(
                edges_ds.map_batches(to_pair, batch_format="pyarrow"),
                ["cur", "nxt"],
                [("one", "min")],
                num_buckets=num_buckets,
            ),
            dedup_schema,  # select() drops the ones column
        )
        .map_batches(add_node_hashes, batch_format="pyarrow")
        .materialize()
    )

    # per step: node-sized argmin map best_i(u) = (u, nxt)
    best: list = []
    for i in range(1, length + 1):
        ai, bi, ci = pa_a[i - 1], pa_b[i - 1], pa_c[i - 1]

        def add_hash(t: pa.Table, ai=ai, bi=bi, ci=ci) -> pa.Table:
            if t.num_columns == 0:
                return pa.table(
                    {
                        "cur": pa.array([], type=pa.string()),
                        "nxt": pa.array([], type=pa.string()),
                        "h": pa.array([], type=pa.uint64()),
                    }
                )
            hc = t.column("hcur").to_numpy(zero_copy_only=False).astype(np.uint64)
            hn = t.column("hnxt").to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = ai * hc + bi * hn + ci  # uint64 wrap == mod 2^64
            return pa.table(
                {"cur": t.column("cur"), "nxt": t.column("nxt"), "h": pa.array(h)}
            )

        picked = top_k_per_group(
            edges.map_batches(add_hash, batch_format="pyarrow"),
            key_col="cur",
            order_by=[("h", "ascending"), ("nxt", "ascending")],
            k=1,
        )
        best.append(
            pin_schema(
                picked.map_batches(
                    lambda t: t.select(["cur", "nxt"]) if t.num_columns else t,
                    batch_format="pyarrow",
                ),
                dedup_schema,
            ).materialize()
        )

    # chain the node-sized maps: walks after step i have columns
    # start, n1 … n_i; join i+1 attaches best_{i+1} on n_i
    walks = best[0].map_batches(
        lambda t: t.rename_columns(["start", "n1"]) if t.num_columns else t,
        batch_format="pyarrow",
    )
    walk_cols = ["start", "n1"]
    for i in range(2, length + 1):
        prev = f"n{i - 1}"
        walk_schema = pa.schema([(c, pa.string()) for c in walk_cols])
        step_map = best[i - 1].map_batches(
            lambda t, prev=prev, col=f"n{i}": t.rename_columns([prev, col])
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        walks = bucketed_inner_join(
            walks,
            step_map,
            [prev],
            walk_schema,
            pa.schema([(prev, pa.string()), (f"n{i}", pa.string())]),
            num_buckets=num_buckets,
        )
        walk_cols = walk_cols + [f"n{i}"]

    final_schema = pa.schema([(c, pa.string()) for c in walk_cols])
    return pin_schema(walks, final_schema)


def _und_deg(edges_ds, subj_col: str, obj_col: str, num_buckets: int):
    """Undirected simple graph + degrees from a directed edge stream:
    ``und`` = distinct (lo, hi) edges (self-loops dropped, materialized
    — it is read twice by every consumer), ``deg`` = undirected degree
    per node. The shared prefix of all structural KG ops."""
    import numpy as np
    import pyarrow.compute as pc

    def to_und(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(subj_col), pa.string())
        o = pc.cast(batch.column(obj_col), pa.string())
        keep = pc.not_equal(s, o)  # drop self-loops
        s, o = s.filter(keep), o.filter(keep)
        lo = pc.min_element_wise(s, o)
        hi = pc.max_element_wise(s, o)
        n = len(lo)
        return pa.table(
            {"lo": lo, "hi": hi, "one": pa.array(np.ones(n, dtype=np.int64))}
        )

    und_schema = pa.schema([("lo", pa.string()), ("hi", pa.string())])
    und = pin_schema(
        bucketed_aggregate(
            edges_ds.map_batches(to_und, batch_format="pyarrow"),
            ["lo", "hi"],
            [("one", "min")],
            num_buckets=num_buckets,
        ),
        und_schema,
    ).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "node": pa.chunked_array(
                    [t.column("lo").combine_chunks(), t.column("hi").combine_chunks()]
                ).combine_chunks(),
                "deg": pa.array(np.ones(2 * n, dtype=np.int64)),
            }
        )

    deg_schema = pa.schema([("node", pa.string()), ("deg", pa.int64())])
    deg = pin_schema(
        bucketed_aggregate(
            und.map_batches(endpoints, batch_format="pyarrow"),
            ["node"],
            [("deg", "sum")],
            num_buckets=num_buckets,
        ),
        deg_schema,
    )
    return und, deg


def _triangle_plan(edges_ds, subj_col: str, obj_col: str, num_buckets: int):
    """Shared plan for triangle-based ops: undirected simple graph →
    degree-ordered orientation → wedge self-join → edge-closure check.
    Returns (closed, und, deg): ``closed`` = one (u, lo, hi) row per
    triangle (found exactly once at its orientation-minimum vertex),
    ``und`` = distinct (lo, hi) undirected edges, ``deg`` = undirected
    degree per node. The orientation bounds wedge generation to
    O(E^1.5) total — a hub contributes only its oriented out-edges —
    which is what makes triangle ops runnable at web scale.
    """
    import numpy as np
    import pyarrow.compute as pc

    und, deg = _und_deg(edges_ds, subj_col, obj_col, num_buckets)
    und_schema = pa.schema([("lo", pa.string()), ("hi", pa.string())])

    # attach both endpoint degrees, then orient by (degree, id)
    j1 = bucketed_inner_join(
        und,
        deg.map_batches(
            lambda t: t.rename_columns(["lo", "deg_lo"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        ["lo"],
        und_schema,
        pa.schema([("lo", pa.string()), ("deg_lo", pa.int64())]),
        num_buckets=num_buckets,
    )
    j2 = bucketed_inner_join(
        j1,
        deg.map_batches(
            lambda t: t.rename_columns(["hi", "deg_hi"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        ["hi"],
        und_schema.append(pa.field("deg_lo", pa.int64())),
        pa.schema([("hi", pa.string()), ("deg_hi", pa.int64())]),
        num_buckets=num_buckets,
    )

    orient_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def orient(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return orient_schema.empty_table()
        lo_first = pc.or_(
            pc.less(t.column("deg_lo"), t.column("deg_hi")),
            pc.and_(
                pc.equal(t.column("deg_lo"), t.column("deg_hi")),
                pc.less(t.column("lo"), t.column("hi")),
            ),
        )
        u = pc.if_else(lo_first, t.column("lo"), t.column("hi"))
        v = pc.if_else(lo_first, t.column("hi"), t.column("lo"))
        return pa.table({"u": u, "v": v})

    oriented = pin_schema(
        j2.map_batches(orient, batch_format="pyarrow"), orient_schema
    ).materialize()

    # wedge self-join at the shared source, canonical (v1 < v2)
    wedges = bucketed_inner_join(
        oriented.rename_columns({"v": "v1"}),
        oriented.rename_columns({"v": "v2"}),
        ["u"],
        pa.schema([("u", pa.string()), ("v1", pa.string())]),
        pa.schema([("u", pa.string()), ("v2", pa.string())]),
        num_buckets=num_buckets,
    ).map_batches(
        lambda t: pa.table(
            {
                "u": t.column("u"),
                "lo": t.column("v1"),
                "hi": t.column("v2"),
            }
        ).filter(pc.less(t.column("v1"), t.column("v2")))
        if t.num_columns
        else pa.schema(
            [("u", pa.string()), ("lo", pa.string()), ("hi", pa.string())]
        ).empty_table(),
        batch_format="pyarrow",
    )
    # NOTE: (v1, v2) from a degree-oriented wedge need canonicalizing
    # only by id — both orders appear in the self-join, so keeping
    # v1 < v2 both dedups the wedge and matches und's (lo, hi) layout.

    closed = bucketed_inner_join(
        wedges,
        und.map_batches(
            lambda t: t.append_column(
                "is_edge", pa.array(np.ones(t.num_rows, dtype=np.int64))
            )
            if t.num_columns
            else pa.schema(
                [("lo", pa.string()), ("hi", pa.string()), ("is_edge", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        ),
        ["lo", "hi"],
        pa.schema([("u", pa.string()), ("lo", pa.string()), ("hi", pa.string())]),
        pa.schema([("lo", pa.string()), ("hi", pa.string()), ("is_edge", pa.int64())]),
        num_buckets=num_buckets,
    )
    return closed, und, deg


def triangle_counts(
    edges_ds,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """Per-node triangle participation over the undirected simple graph
    of an edge table: (node, n_triangles). The KG-quality signal for
    community density / redundant-path detection. See
    ``_triangle_plan`` for the degree-ordered-orientation shape; each
    triangle emits its three endpoint rows into one
    ``bucketed_aggregate``.
    """
    import numpy as np

    closed, _und, _deg = _triangle_plan(edges_ds, subj_col, obj_col, num_buckets)

    def tri_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("node", pa.string()), ("n_triangles", pa.int64())]
            ).empty_table()
        n = t.num_rows
        return pa.table(
            {
                "node": pa.chunked_array(
                    [
                        t.column("u").combine_chunks(),
                        t.column("lo").combine_chunks(),
                        t.column("hi").combine_chunks(),
                    ]
                ).combine_chunks(),
                "n_triangles": pa.array(np.ones(3 * n, dtype=np.int64)),
            }
        )

    return bucketed_aggregate(
        closed.map_batches(tri_rows, batch_format="pyarrow"),
        ["node"],
        [("n_triangles", "sum")],
        num_buckets=num_buckets,
    )


def clustering_coefficients(
    edges_ds,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """Per-node LOCAL clustering coefficient over the undirected simple
    graph: coeff = 2·triangles(v) / (deg(v)·(deg(v)−1)), pinned to 0.0
    for deg < 2 — the community-density score per entity. ONE
    ``_triangle_plan`` provides both the O(E^1.5)-bounded triangle
    stream and the degree table; nodes without triangles survive via a
    bucketed LEFT OUTER join from the degree side (never an inner join
    that would silently drop triangle-free nodes). The division is the
    engine's replayable exact-int → float64 composition.
    Columns: node, deg, n_triangles, coeff."""
    import numpy as np
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import pin_schema

    closed, _und, deg = _triangle_plan(edges_ds, subj_col, obj_col, num_buckets)

    def tri_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("node", pa.string()), ("n_triangles", pa.int64())]
            ).empty_table()
        n = t.num_rows
        return pa.table(
            {
                "node": pa.chunked_array(
                    [
                        t.column("u").combine_chunks(),
                        t.column("lo").combine_chunks(),
                        t.column("hi").combine_chunks(),
                    ]
                ).combine_chunks(),
                "n_triangles": pa.array(np.ones(3 * n, dtype=np.int64)),
            }
        )

    tri = pin_schema(
        bucketed_aggregate(
            closed.map_batches(tri_rows, batch_format="pyarrow"),
            ["node"],
            [("n_triangles", "sum")],
            num_buckets=num_buckets,
        ),
        pa.schema([("node", pa.string()), ("n_triangles", pa.int64())]),
    )
    joined = bucketed_inner_join(
        pin_schema(deg, pa.schema([("node", pa.string()), ("deg", pa.int64())])),
        tri,
        ["node"],
        pa.schema([("node", pa.string()), ("deg", pa.int64())]),
        pa.schema([("node", pa.string()), ("n_triangles", pa.int64())]),
        num_buckets=num_buckets,
        join_type="left outer",
    )

    def coeff(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("node", pa.string()),
                ("deg", pa.int64()),
                ("n_triangles", pa.int64()),
                ("coeff", pa.float64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        deg_v = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        nt = (
            pc.fill_null(t.column("n_triangles"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        denom = deg_v * (deg_v - 1)
        c = np.where(denom > 0, (2.0 * nt) / np.where(denom > 0, denom, 1), 0.0)
        return pa.table(
            {
                "node": t.column("node"),
                "deg": pa.array(deg_v),
                "n_triangles": pa.array(nt),
                "coeff": pa.array(c.astype(np.float64)),
            },
            schema=out_schema,
        )

    return joined.map_batches(coeff, batch_format="pyarrow")


def edge_support(
    edges_ds,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """Per-edge triangle support + structural Jaccard of the endpoints:
    (lo, hi, support, deg_lo, deg_hi, jaccard) with
    support = |N(lo) ∩ N(hi)| (each triangle supports its 3 edges) and
    jaccard = support / (deg_lo − 1 + deg_hi − 1 − support) — common
    over union of the neighbor sets excluding the endpoints themselves.
    The k-truss building block AND the structural entity-merge signal
    (two surfaces for one real-world entity share most neighbors even
    when their strings don't match — the complement of alias_groups).

    Cost is the triangle plan (O(E^1.5) wedges, see _triangle_plan)
    plus one union + bucketed aggregate; zero-support edges are kept
    via a zero-row union, not a left join. Union size is bounded by
    E + 3·triangles."""
    import numpy as np
    import pyarrow.compute as pc

    closed, und, deg = _triangle_plan(edges_ds, subj_col, obj_col, num_buckets)

    sup_schema = pa.schema(
        [("lo", pa.string()), ("hi", pa.string()), ("support", pa.int64())]
    )

    def tri_edges(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return sup_schema.empty_table()
        u = t.column("u").combine_chunks()
        lo = t.column("lo").combine_chunks()
        hi = t.column("hi").combine_chunks()
        # the three edges of triangle (u, lo, hi): (u,lo), (u,hi), (lo,hi)
        # — u is orientation-min, not id-min, so re-canonicalize by id
        a = pa.chunked_array([u, u, lo]).combine_chunks()
        b = pa.chunked_array([lo, hi, hi]).combine_chunks()
        return pa.table(
            {
                "lo": pc.min_element_wise(a, b),
                "hi": pc.max_element_wise(a, b),
                "support": pa.array(np.ones(3 * t.num_rows, dtype=np.int64)),
            }
        )

    def zero_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return sup_schema.empty_table()
        return pa.table(
            {
                "lo": t.column("lo"),
                "hi": t.column("hi"),
                "support": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    sup = pin_schema(
        bucketed_aggregate(
            closed.map_batches(tri_edges, batch_format="pyarrow").union(
                und.map_batches(zero_rows, batch_format="pyarrow")
            ),
            ["lo", "hi"],
            [("support", "sum")],
            num_buckets=num_buckets,
        ),
        sup_schema,
    )

    j1 = bucketed_inner_join(
        sup,
        deg.map_batches(
            lambda t: t.rename_columns(["lo", "deg_lo"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        ["lo"],
        sup_schema,
        pa.schema([("lo", pa.string()), ("deg_lo", pa.int64())]),
        num_buckets=num_buckets,
    )
    j2 = bucketed_inner_join(
        j1,
        deg.map_batches(
            lambda t: t.rename_columns(["hi", "deg_hi"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        ["hi"],
        sup_schema.append(pa.field("deg_lo", pa.int64())),
        pa.schema([("hi", pa.string()), ("deg_hi", pa.int64())]),
        num_buckets=num_buckets,
    )

    out_schema = (
        sup_schema.append(pa.field("deg_lo", pa.int64()))
        .append(pa.field("deg_hi", pa.int64()))
        .append(pa.field("jaccard", pa.float64()))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        denom_i = pc.subtract(
            pc.add(
                pc.subtract(t.column("deg_lo"), 1),
                pc.subtract(t.column("deg_hi"), 1),
            ),
            t.column("support"),
        )
        # isolated edge (both endpoints degree 1): defined as 0.0, the
        # same pin the SQL twin carries (float div-by-zero semantics
        # differ between engines)
        zero = pc.equal(denom_i, 0)
        denom = pc.cast(pc.if_else(zero, 1, denom_i), pa.float64())
        jac = pc.if_else(
            zero,
            pa.scalar(0.0),
            pc.divide(pc.cast(t.column("support"), pa.float64()), denom),
        )
        return t.append_column("jaccard", jac)

    return j2.map_batches(finish, batch_format="pyarrow")


def edge_weighted_jaccard(
    edges_ds,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
    max_center_degree: int = 8192,
):
    """Per-edge WEIGHTED structural Jaccard of the endpoints' neighbor
    weight vectors over the undirected collapsed graph:
    (lo, hi, w, min_sum, s_lo, s_hi, wjaccard) with

      min_sum  = Σ_x min(w(lo,x), w(hi,x))       (common neighbors x)
      wjaccard = min_sum / (s_lo + s_hi − min_sum)

    via the identity Σ_x max(a,b) = S(lo) + S(hi) − Σ_x min(a,b), so
    only the min-sums and the two strengths are ever exchanged. Unlike
    set Jaccard (``edge_support``), the weighted form does not saturate
    when the graph densifies: at crawl scale every frequent entity pair
    is eventually connected SOMEWHERE, so |N∩|/|N∪| → 1 for everything,
    while an entity whose links are weak relative to the core keeps a
    near-zero weighted score — the discriminating structural-merge
    signal ``kg_merge_groups`` thresholds.

    Shape: undirected collapse + strengths (two bucketed aggregates);
    min-sum wedges via a coarse-bucket shuffle on the wedge CENTER with
    in-bucket sorted-run pair emission (numpy triu per run — no per-key
    Python, the dedup inverted-index pattern); edge restriction +
    zero-fill by tagging edge rows into the SAME aggregate (no join);
    two bucketed joins attach the strengths. Wedge count is Σ_x deg(x)²
    — centers above ``max_center_degree`` are stop-centers, skipped
    with a logged count (the hub cap, same bounded-blowup contract as
    the stop-shingle cap; oracle corpora stay far below it).
    """
    import logging

    import numpy as np
    import pyarrow.compute as pc

    from bioner_ray.stages.dedup import _run_pair_indices, _sorted_runs

    log = logging.getLogger(__name__)
    del log  # _run_pair_indices logs its own cap warnings

    def to_und(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(subj_col), pa.string())
        o = pc.cast(batch.column(obj_col), pa.string())
        w = pc.cast(batch.column(weight_col), pa.int64())
        keep = pc.not_equal(s, o)
        s, o, w = s.filter(keep), o.filter(keep), w.filter(keep)
        return pa.table(
            {
                "lo": pc.min_element_wise(s, o),
                "hi": pc.max_element_wise(s, o),
                "w": w,
            }
        )

    und_schema = pa.schema([("lo", pa.string()), ("hi", pa.string()), ("w", pa.int64())])
    und = pin_schema(
        bucketed_aggregate(
            edges_ds.map_batches(to_und, batch_format="pyarrow"),
            ["lo", "hi"],
            [("w", "sum")],
            num_buckets=num_buckets,
        ),
        und_schema,
    ).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        lo = t.column("lo").combine_chunks()
        hi = t.column("hi").combine_chunks()
        w = t.column("w").combine_chunks()
        return pa.table(
            {
                "u": pa.chunked_array([lo, hi]).combine_chunks(),
                "v": pa.chunked_array([hi, lo]).combine_chunks(),
                "w": pa.chunked_array([w, w]).combine_chunks(),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pyarrow")

    strength_schema = pa.schema([("node", pa.string()), ("s", pa.int64())])
    strengths = pin_schema(
        bucketed_aggregate(
            adj.map_batches(
                lambda t: pa.table({"node": t.column("u"), "s": t.column("w")}),
                batch_format="pyarrow",
            ),
            ["node"],
            [("s", "sum")],
            num_buckets=num_buckets,
        ),
        strength_schema,
    )

    # min-sum wedges: colocate each center's adjacency rows by coarse
    # bucket, emit per-run neighbor pairs carrying min(w_i, w_j)
    from bioner_ray.stages.shuffle import hash_strings_u64

    def add_bucket(t: pa.Table) -> pa.Table:
        buckets = (hash_strings_u64(t.column("u")) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return t.append_column("bucket", pa.array(buckets, type=pa.int32()))

    wedge_schema = pa.schema(
        [
            ("lo", pa.string()),
            ("hi", pa.string()),
            ("w", pa.int64()),
            ("min_sum", pa.int64()),
            ("is_edge", pa.int64()),
        ]
    )

    def emit(group: pa.Table) -> pa.Table:
        if group.num_columns == 0:
            return wedge_schema.empty_table()
        t, bounds = _sorted_runs(group, "u", "v")
        ii, jj = _run_pair_indices(bounds, max_center_degree, what="center")
        if t.num_rows:
            v = t.column("v").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            v = np.zeros(0, dtype=object)
            w = np.zeros(0, dtype=np.int64)
        n = len(ii)
        return pa.table(
            {
                # v sorted ascending within each run ⇒ v[ii] < v[jj]
                "lo": pa.array(v[ii], type=pa.string()),
                "hi": pa.array(v[jj], type=pa.string()),
                "w": pa.array(np.zeros(n, dtype=np.int64)),
                "min_sum": pa.array(np.minimum(w[ii], w[jj])),
                "is_edge": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    wedges = (
        adj.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "lo": t.column("lo"),
                "hi": t.column("hi"),
                "w": t.column("w"),
                "min_sum": pa.array(np.zeros(n, dtype=np.int64)),
                "is_edge": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    # one aggregate does edge-restriction (is_edge ≥ 1 filter), zero-fill
    # (edges with no common neighbor keep min_sum 0) and the min-sum
    merged = pin_schema(
        bucketed_aggregate(
            wedges.union(und.map_batches(edge_rows, batch_format="pyarrow")),
            ["lo", "hi"],
            [("w", "sum"), ("min_sum", "sum"), ("is_edge", "sum")],
            num_buckets=num_buckets,
        ),
        wedge_schema,
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("is_edge"), 1)).drop_columns(
            ["is_edge"]
        ),
        batch_format="pyarrow",
    )

    base_schema = pa.schema(
        [("lo", pa.string()), ("hi", pa.string()), ("w", pa.int64()), ("min_sum", pa.int64())]
    )
    j1 = bucketed_inner_join(
        merged,
        strengths.map_batches(
            lambda t: t.rename_columns(["lo", "s_lo"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        ["lo"],
        base_schema,
        pa.schema([("lo", pa.string()), ("s_lo", pa.int64())]),
        num_buckets=num_buckets,
    )
    j2 = bucketed_inner_join(
        j1,
        strengths.map_batches(
            lambda t: t.rename_columns(["hi", "s_hi"]) if t.num_columns else t,
            batch_format="pyarrow",
        ),
        ["hi"],
        base_schema.append(pa.field("s_lo", pa.int64())),
        pa.schema([("hi", pa.string()), ("s_hi", pa.int64())]),
        num_buckets=num_buckets,
    )

    out_schema = (
        base_schema.append(pa.field("s_lo", pa.int64()))
        .append(pa.field("s_hi", pa.int64()))
        .append(pa.field("wjaccard", pa.float64()))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        denom_i = pc.subtract(
            pc.add(t.column("s_lo"), t.column("s_hi")), t.column("min_sum")
        )
        # denominator ≥ s_hi + w > 0 for any edge; guard anyway with the
        # same 0.0 pin as edge_support so both engines agree on junk
        zero = pc.less_equal(denom_i, 0)
        denom = pc.cast(pc.if_else(zero, 1, denom_i), pa.float64())
        wj = pc.if_else(
            zero,
            pa.scalar(0.0),
            pc.divide(pc.cast(t.column("min_sum"), pa.float64()), denom),
        )
        return t.append_column("wjaccard", wj)

    return j2.map_batches(finish, batch_format="pyarrow")


def kcore_nodes(
    edges_ds,
    k: int = 3,
    max_rounds: int = 10,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """k-core decomposition by iterative peel over the undirected
    simple graph (self-loops dropped, multi-edges collapsed): each
    round drops nodes with degree < ``k`` and the edges touching them,
    until stable or ``max_rounds`` — the standard cohesion extraction
    (Seidman 1983) a KG build runs to separate the entity core from
    crawl-noise whiskers; the full truss/community stack prunes from
    this core.

    Per round: ONE bucketed degree aggregate + TWO left-semi bucketed
    joins (edges against surviving nodes on each endpoint) — exchange
    bounded by nodes + surviving edges, never all-pairs. Early exit
    when a round removes no edge is fixpoint-safe (further rounds are
    identity), so the fixed-round SQL twin replays the result exactly
    whether or not it converged early. Columns: node, deg (degree
    inside the core)."""
    import numpy as np
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    def to_und(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(subj_col), pa.string())
        o = pc.cast(batch.column(obj_col), pa.string())
        keep = pc.not_equal(s, o)
        s, o = s.filter(keep), o.filter(keep)
        return pa.table(
            {"lo": pc.min_element_wise(s, o), "hi": pc.max_element_wise(s, o)}
        )

    und_schema = pa.schema([("lo", pa.string()), ("hi", pa.string())])
    edges = pin_schema(
        bucketed_aggregate(
            with_ones(edges_ds.map_batches(to_und, batch_format="pyarrow")),
            ["lo", "hi"],
            [("one", "min")],
            num_buckets=num_buckets,
        ),
        und_schema,
    ).materialize()

    deg_schema = pa.schema([("node", pa.string()), ("deg", pa.int64())])

    def endpoints(t: pa.Table) -> pa.Table:
        lo = t.column("lo").combine_chunks()
        hi = t.column("hi").combine_chunks()
        node = pa.chunked_array([lo, hi]).combine_chunks()
        return pa.table({"node": node}).append_column(
            "deg", pa.array(np.ones(2 * t.num_rows, dtype=np.int64))
        )

    def degrees(e):
        return pin_schema(
            bucketed_aggregate(
                e.map_batches(endpoints, batch_format="pyarrow"),
                ["node"],
                [("deg", "sum")],
                num_buckets=num_buckets,
            ),
            deg_schema,
        )

    n_edges = edges.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        surv = degrees(edges).map_batches(
            lambda t: t.select(["node"]).filter(pc.greater_equal(t.column("deg"), k)),
            batch_format="pyarrow",
        )
        surv_schema = pa.schema([("node", pa.string())])
        e1 = bucketed_inner_join(
            edges,
            surv.map_batches(
                lambda t: t.rename_columns(["lo"]) if t.num_columns else t,
                batch_format="pyarrow",
            ),
            ["lo"],
            und_schema,
            pa.schema([("lo", pa.string())]),
            num_buckets=num_buckets,
            join_type="left semi",
        )
        edges = bucketed_inner_join(
            e1,
            surv.map_batches(
                lambda t: t.rename_columns(["hi"]) if t.num_columns else t,
                batch_format="pyarrow",
            ),
            ["hi"],
            und_schema,
            pa.schema([("hi", pa.string())]),
            num_buckets=num_buckets,
            join_type="left semi",
        ).materialize()
        del surv_schema
        n_now = edges.count()
        if n_now == n_edges:
            break  # fixpoint: every further round is identity
        n_edges = n_now

    return degrees(edges)


def reach2_kmv(
    edges_ds,
    k: int = 64,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """2-hop out-neighborhood cardinality per node via KMV bottom-k
    sketches: (node, n_synopsis, kth_hash, est_reach2) — exact when the
    2-hop set is under ``k``, the (k−1)·2^61/h_k estimate above.

    The naive |N(N(v))| needs the edges⋈edges self-join — Σ deg_in·
    deg_out candidate rows, genuinely quadratic on hubs. Bottom-k
    sketches are EXACTLY mergeable (bottom-k(A∪B) = bottom-k(bottom-k(A)
    ∪ bottom-k(B))), so instead: build each node's 1-hop synopsis (≤ k
    hashes), ship synopsis — not neighbors — across each edge (one
    bucketed join, ≤ k rows per edge), re-unique, re-cut. Total
    exchange is O(E·k) regardless of hub degree, and the result is
    bit-identical to sketching the exact 2-hop set — the DuckDB twin
    replays it from the exact join at test scale. Hash construction is
    shared with stages/sketch.py (md5-derived 61-bit, deterministic).
    """
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.sketch import _M61

    pair_schema = pa.schema([("subj", pa.string()), ("obj", pa.string())])

    def to_pair(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "subj": pc.cast(batch.column(subj_col), pa.string()),
                "obj": pc.cast(batch.column(obj_col), pa.string()),
            }
        )
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    pairs = pin_schema(
        bucketed_aggregate(
            edges_ds.map_batches(to_pair, batch_format="pyarrow"),
            ["subj", "obj"],
            [("one", "min")],
            num_buckets=num_buckets,
        ),
        pair_schema,
    ).materialize()

    hv_schema = pa.schema([("node", pa.string()), ("hv", pa.int64())])

    def hop1_hashes(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return hv_schema.empty_table().append_column(
                "one", pa.array([], type=pa.int64())
            )
        objs = t.column("obj").to_pylist()
        hs = [
            int.from_bytes(hashlib.md5(o.encode()).digest()[:8], "big") % _M61
            for o in objs
        ]
        out = pa.table(
            {"node": t.column("subj"), "hv": pa.array(hs, type=pa.int64())}
        )
        return out.append_column("one", pa.array(np.ones(out.num_rows, dtype=np.int64)))

    def bottom_k(ds):
        distinct = pin_schema(
            bucketed_aggregate(
                ds, ["node", "hv"], [("one", "min")], num_buckets=num_buckets
            ),
            hv_schema,
        )
        kept = top_k_per_group(
            distinct, key_col="node", order_by=[("hv", "ascending")], k=k
        )
        return kept.map_batches(
            lambda t: t.drop_columns(["rk"]) if t.num_columns else t,
            batch_format="pyarrow",
        )

    s1 = bottom_k(pairs.map_batches(hop1_hashes, batch_format="pyarrow")).materialize()

    # pack each node's synopsis into ONE int64-LE blob so the join
    # ships one row per edge, not k — pyarrow joins accept binary
    # payloads (same trick as entity_centroids); the per-node pack
    # reuses the groupby machinery top_k itself runs on
    def pack(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.schema(
                [("obj", pa.string()), ("blob", pa.binary())]
            ).empty_table()
        # multi-NODE run-scan (the bucketed_map_groups contract): the
        # (node, hv) sort makes each node's run already hv-sorted
        g = g.sort_by([("node", "ascending"), ("hv", "ascending")])
        nodes = g.column("node").to_numpy(zero_copy_only=False)
        hv = g.column("hv").to_numpy(zero_copy_only=False).astype("<i8")
        starts = np.flatnonzero(np.r_[True, nodes[1:] != nodes[:-1]])
        ends = np.r_[starts[1:], len(nodes)]
        return pa.table(
            {
                "obj": pa.array(nodes[starts], type=pa.string()),
                "blob": pa.array(
                    [hv[s:e].tobytes() for s, e in zip(starts.tolist(), ends.tolist())],
                    type=pa.binary(),
                ),
            }
        )

    s1_packed = bucketed_map_groups(s1, ["node"], pack)

    # ship each target node's packed synopsis back across its in-edges,
    # then explode vectorized on the narrow post-join map stage
    def explode(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return hv_schema.empty_table().append_column(
                "one", pa.array([], type=pa.int64())
            )
        blobs = t.column("blob").to_pylist()
        hv = np.frombuffer(b"".join(blobs), dtype="<i8")
        lengths = np.array([len(b) // 8 for b in blobs], dtype=np.int64)
        nodes_rep = pc.take(
            t.column("subj"),
            pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64), lengths)),
        )
        return pa.table(
            {
                "node": nodes_rep,
                "hv": pa.array(hv),
                "one": pa.array(np.ones(len(hv), dtype=np.int64)),
            }
        )

    shipped = bucketed_inner_join(
        pairs,
        s1_packed,
        ["obj"],
        pair_schema,
        pa.schema([("obj", pa.string()), ("blob", pa.binary())]),
        num_buckets=num_buckets,
    ).map_batches(explode, batch_format="pyarrow")
    s2 = bottom_k(shipped)

    def widen(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("node", pa.string()), ("one", pa.int64()), ("hv", pa.int64())]
            ).empty_table()
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    agg = bucketed_aggregate(
        s2.map_batches(widen, batch_format="pyarrow"),
        ["node"],
        [("one", "sum"), ("hv", "max")],
        num_buckets=num_buckets,
    )

    out_schema = pa.schema(
        [
            ("node", pa.string()),
            ("n_synopsis", pa.int64()),
            ("kth_hash", pa.int64()),
            ("est_reach2", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        n = t.column("one").to_numpy(zero_copy_only=False)
        kth = t.column("hv").to_numpy(zero_copy_only=False)
        est = np.where(
            n < k, n.astype(np.float64), (k - 1) * 2305843009213693952.0 / kth
        )
        return pa.table(
            {
                "node": t.column("node"),
                "n_synopsis": pa.array(n),
                "kth_hash": pa.array(kth),
                "est_reach2": pa.array(est),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def bfs_distances(
    edges_ds,
    n_seeds: int = 3,
    max_hops: int = 3,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
    directed: bool = False,
):
    """Multi-source BFS hop distances over the undirected simple graph
    (Pregel frontier expansion): seeds are the ``n_seeds``
    lexicographically-smallest node names (deterministic and
    SQL-replayable — no RNG); each round expands the frontier one hop
    and assigns unvisited neighbors dist = round. The k-hop
    neighborhood query a KG serves for entity-context windows.

    Scale shape: per round ONE left-semi bucketed join of the adjacency
    against the node-sized frontier (keyed on src), one bucketed
    distinct, one left-anti bucketed join against the node-sized
    visited set — never an all-pairs product, never driver-side state.
    The visited/frontier tables are materialized per round to cut
    lineage (the kg_pagerank argument). Early exit on an empty frontier
    is fixpoint-safe: an empty frontier stays empty, so the fixed-round
    SQL twin replays the result exactly. With ``directed=True`` edges
    expand forward only (crawl-depth semantics); seeds are then the
    lexicographically-smallest SOURCE nodes. Columns: node, dist (hops
    from the nearest seed; nodes beyond ``max_hops`` are absent).
    """
    import numpy as np
    import pyarrow.compute as pc

    def to_adj(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(subj_col), pa.string()).combine_chunks()
        o = pc.cast(batch.column(obj_col), pa.string()).combine_chunks()
        keep = pc.not_equal(s, o)
        s, o = s.filter(keep), o.filter(keep)
        if directed:
            return pa.table({"src": s, "dst": o})
        return pa.table(
            {
                "src": pa.chunked_array([s, o]).combine_chunks(),
                "dst": pa.chunked_array([o, s]).combine_chunks(),
            }
        )

    adj_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    adj = pin_schema(
        bucketed_aggregate(
            with_ones(edges_ds.map_batches(to_adj, batch_format="pyarrow")),
            ["src", "dst"],
            [("one", "min")],
            num_buckets=num_buckets,
        ).map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow"),
        adj_schema,
    ).materialize()

    node_schema = pa.schema([("node", pa.string())])
    vis_schema = pa.schema([("node", pa.string()), ("dist", pa.int64())])

    seeds = (
        pin_schema(
            bucketed_aggregate(
                with_ones(
                    adj.map_batches(
                        lambda t: t.select(["src"]).rename_columns(["node"]),
                        batch_format="pyarrow",
                    )
                ),
                ["node"],
                [("one", "min")],
                num_buckets=num_buckets,
            ).map_batches(lambda t: t.select(["node"]), batch_format="pyarrow"),
            node_schema,
        )
        .sort("node")
        .limit(n_seeds)
    )

    def with_dist(r: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    "dist": pa.array(np.full(t.num_rows, r, dtype=np.int64)),
                }
            )

        return fn

    visited = pin_schema(
        seeds.map_batches(with_dist(0), batch_format="pyarrow"), vis_schema
    ).materialize()
    frontier = pin_schema(
        visited.map_batches(lambda t: t.select(["node"]), batch_format="pyarrow"),
        node_schema,
    ).materialize()

    for r in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        cand = bucketed_inner_join(
            adj,
            frontier.map_batches(
                lambda t: t.rename_columns(["src"]), batch_format="pyarrow"
            ),
            ["src"],
            adj_schema,
            pa.schema([("src", pa.string())]),
            num_buckets=num_buckets,
            join_type="left semi",
        ).map_batches(
            lambda t: t.select(["dst"]).rename_columns(["node"]), batch_format="pyarrow"
        )
        cand = pin_schema(
            bucketed_aggregate(
                with_ones(cand), ["node"], [("one", "min")], num_buckets=num_buckets
            ).map_batches(lambda t: t.select(["node"]), batch_format="pyarrow"),
            node_schema,
        )
        new = pin_schema(
            bucketed_inner_join(
                cand,
                visited.map_batches(
                    lambda t: t.select(["node"]), batch_format="pyarrow"
                ),
                ["node"],
                node_schema,
                node_schema,
                num_buckets=num_buckets,
                join_type="left anti",
            ),
            node_schema,
        ).materialize()
        visited = visited.union(
            new.map_batches(with_dist(r), batch_format="pyarrow")
        ).materialize()
        frontier = new

    return visited


def _pivot_bfs(
    edges_ds,
    n_seeds: int = 3,
    max_hops: int = 3,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
    with_sigma: bool = False,
    return_adj: bool = False,
):
    """Multi-source per-seed BFS over the undirected simple graph,
    shared by the pivot estimators (``harmonic_centrality``,
    ``hop_histogram``, ``shortest_path_counts``): seeds are the
    ``n_seeds`` lexicographically smallest nodes (no RNG,
    SQL-replayable); the visited table keys on (seed, node) so every
    seed keeps its own distance field. With ``with_sigma`` the frontier
    additionally carries shortest-path counts, and the per-round
    (seed, node) distinct becomes an exact integer σ-sum over frontier
    predecessors (σ(v at d) = Σ σ(pred at d−1)) — the Brandes forward
    fold.

    Scale shape: per round ONE bucketed join of the edge-sized
    adjacency against the (seeds × frontier)-sized frontier (keyed on
    src), one bucketed (seed, node) distinct/σ-sum, one left-anti
    bucketed join against the visited set — state is O(n_seeds ·
    nodes), never all-pairs; rounds materialize to cut lineage (the
    kg_pagerank argument) and exit early on an empty frontier
    (fixpoint-safe for fixed-round twins). Returns ``(visited,
    nodes)``: visited = (seed, node, dist[, sigma]) within
    ``max_hops``, nodes = every non-isolated node."""
    import numpy as np
    import pyarrow.compute as pc

    def to_adj(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(subj_col), pa.string()).combine_chunks()
        o = pc.cast(batch.column(obj_col), pa.string()).combine_chunks()
        keep = pc.not_equal(s, o)
        s, o = s.filter(keep), o.filter(keep)
        return pa.table(
            {
                "src": pa.chunked_array([s, o]).combine_chunks(),
                "dst": pa.chunked_array([o, s]).combine_chunks(),
            }
        )

    adj_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    adj = pin_schema(
        bucketed_aggregate(
            with_ones(edges_ds.map_batches(to_adj, batch_format="pyarrow")),
            ["src", "dst"],
            [("one", "min")],
            num_buckets=num_buckets,
        ).map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow"),
        adj_schema,
    ).materialize()

    node_schema = pa.schema([("node", pa.string())])
    sn_schema = pa.schema([("seed", pa.string()), ("node", pa.string())])
    sig_field = [("sigma", pa.int64())] if with_sigma else []
    fr_schema = pa.schema(
        [("seed", pa.string()), ("node", pa.string())] + sig_field
    )
    fr_cols = list(fr_schema.names)
    vis_schema = pa.schema(
        [("seed", pa.string()), ("node", pa.string()), ("dist", pa.int64())] + sig_field
    )

    nodes = pin_schema(
        bucketed_aggregate(
            with_ones(
                adj.map_batches(
                    lambda t: t.select(["src"]).rename_columns(["node"]),
                    batch_format="pyarrow",
                )
            ),
            ["node"],
            [("one", "min")],
            num_buckets=num_buckets,
        ).map_batches(lambda t: t.select(["node"]), batch_format="pyarrow"),
        node_schema,
    ).materialize()
    seeds = nodes.sort("node").limit(n_seeds)

    def with_dist(r: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = {
                "seed": t.column("seed"),
                "node": t.column("node"),
                "dist": pa.array(np.full(t.num_rows, r, dtype=np.int64)),
            }
            if with_sigma:
                cols["sigma"] = t.column("sigma")
            return pa.table(cols)

        return fn

    def init_visited(t: pa.Table) -> pa.Table:
        cols = {
            "seed": t.column("node"),
            "node": t.column("node"),
            "dist": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        }
        if with_sigma:
            cols["sigma"] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.table(cols)

    visited = pin_schema(
        seeds.map_batches(init_visited, batch_format="pyarrow"), vis_schema
    ).materialize()
    frontier = pin_schema(
        visited.map_batches(lambda t: t.select(fr_cols), batch_format="pyarrow"),
        fr_schema,
    ).materialize()

    join_right_schema = pa.schema(
        [("src", pa.string()), ("seed", pa.string())] + sig_field
    )

    def to_join_right(t: pa.Table) -> pa.Table:
        cols = {"src": t.column("node"), "seed": t.column("seed")}
        if with_sigma:
            cols["sigma"] = t.column("sigma")
        return pa.table(cols)

    def from_join(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return fr_schema.empty_table()
        cols = {"seed": t.column("seed"), "node": t.column("dst")}
        if with_sigma:
            cols["sigma"] = t.column("sigma")
        return pa.table(cols)

    for r in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        cand = bucketed_inner_join(
            adj,
            frontier.map_batches(to_join_right, batch_format="pyarrow"),
            ["src"],
            adj_schema,
            join_right_schema,
            num_buckets=num_buckets,
        ).map_batches(from_join, batch_format="pyarrow")
        if with_sigma:
            cand = pin_schema(
                bucketed_aggregate(
                    cand, ["seed", "node"], [("sigma", "sum")], num_buckets=num_buckets
                ),
                fr_schema,
            )
        else:
            cand = pin_schema(
                bucketed_aggregate(
                    with_ones(cand),
                    ["seed", "node"],
                    [("one", "min")],
                    num_buckets=num_buckets,
                ).map_batches(lambda t: t.select(["seed", "node"]), batch_format="pyarrow"),
                fr_schema,
            )
        new = pin_schema(
            bucketed_inner_join(
                cand,
                visited.map_batches(
                    lambda t: t.select(["seed", "node"]), batch_format="pyarrow"
                ),
                ["seed", "node"],
                fr_schema,
                sn_schema,
                num_buckets=num_buckets,
                join_type="left anti",
            ),
            fr_schema,
        ).materialize()
        visited = visited.union(
            new.map_batches(with_dist(r), batch_format="pyarrow")
        ).materialize()
        frontier = new

    if return_adj:
        return visited, nodes, adj
    return visited, nodes


def harmonic_centrality(
    edges_ds,
    n_seeds: int = 3,
    max_hops: int = 3,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """Sampled harmonic closeness centrality: from the ``_pivot_bfs``
    per-seed distances, score every node ``hc_micro = Σ_seeds
    floor(10^6 / dist)`` over the seeds that reach it (dist > 0; the
    seed itself contributes nothing). The Boldi–Vigna-style pivot
    estimator of closeness — exact integer arithmetic, so the
    fixed-round unrolled SQL twin replays it bit-for-bit. Columns:
    node, hc_micro (0 for nodes no seed reaches within ``max_hops``).
    """
    import numpy as np

    visited, nodes = _pivot_bfs(
        edges_ds,
        n_seeds=n_seeds,
        max_hops=max_hops,
        subj_col=subj_col,
        obj_col=obj_col,
        num_buckets=num_buckets,
    )
    hc_schema = pa.schema([("node", pa.string()), ("hc_micro", pa.int64())])

    def contrib(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return hc_schema.empty_table()
        d = t.column("dist").to_numpy(zero_copy_only=False)
        keep = d > 0
        return pa.table(
            {
                "node": t.column("node").filter(pa.array(keep)),
                "hc_micro": pa.array(1_000_000 // d[keep], type=pa.int64()),
            }
        )

    zeros = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "hc_micro": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    return pin_schema(
        bucketed_aggregate(
            visited.map_batches(contrib, batch_format="pyarrow").union(zeros),
            ["node"],
            [("hc_micro", "sum")],
            num_buckets=num_buckets,
        ),
        hc_schema,
    )


def shortest_path_counts(
    edges_ds,
    n_seeds: int = 3,
    max_hops: int = 3,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """Per-(seed, node) shortest-path counts σ over the undirected
    simple graph — the Brandes primitive (betweenness' forward pass),
    here a first-class audit: nodes whose σ explodes relative to their
    distance are the graph's corridor points. The ``_pivot_bfs``
    machinery with ``with_sigma``: each round SUMS the frontier's σ
    into newly-reached nodes (σ(v at d) = Σ σ(pred at d−1) over edges
    pred→v) — an exact integer fold, so the unrolled SQL twin replays
    it bit-for-bit. σ stays int64-bounded because ``max_hops`` is small
    by contract (σ ≤ max_degree^hops). Columns: seed, node, dist,
    sigma (dist 0 rows included, σ = 1).
    """
    visited, _ = _pivot_bfs(
        edges_ds,
        n_seeds=n_seeds,
        max_hops=max_hops,
        subj_col=subj_col,
        obj_col=obj_col,
        num_buckets=num_buckets,
        with_sigma=True,
    )
    return visited


def betweenness_centrality(
    edges_ds,
    n_seeds: int = 3,
    max_hops: int = 3,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """Sampled bounded-distance betweenness (Brandes pivots,
    quantized): the forward pass is the shared σ-carrying pivot BFS;
    the backward pass folds dependencies level-by-level in exact
    integer micro-units —

        δq(v) = Σ_{w ∈ succ(v)}  (σ(v) · (10^6 + δq(w))) // σ(w)

    where succ(v) are v's BFS-DAG successors (neighbors at
    dist(v)+1 under the same seed) and 1.0 ≙ 10^6 with floor at every
    division — a deterministic quantization of Brandes' accumulation
    (error vs the float algorithm ≤ hops·10⁻⁶ per pair), so the
    unrolled SQL twin replays it bit-for-bit. bc_micro(node) =
    Σ_seeds δq(seed, node); distances are capped at ``max_hops``
    (k-bounded betweenness), seeds contribute as sources only.

    Scale shape: per backward round ONE adjacency join keyed on the
    level's nodes, one (seed, node) join against the previous level,
    one bounded aggregate — state stays O(n_seeds · nodes) like every
    pivot estimator here; rounds materialize to cut lineage. Columns:
    node, bc_micro (0 for nodes on no sampled shortest path)."""
    import numpy as np
    import pyarrow.compute as pc

    visited, nodes, adj = _pivot_bfs(
        edges_ds,
        n_seeds=n_seeds,
        max_hops=max_hops,
        subj_col=subj_col,
        obj_col=obj_col,
        num_buckets=num_buckets,
        with_sigma=True,
        return_adj=True,
    )
    visited = visited.materialize()

    w_schema = pa.schema(
        [("node", pa.string()), ("seed", pa.string()), ("sigma_w", pa.int64())]
    )
    delta_schema = pa.schema(
        [("node", pa.string()), ("seed", pa.string()), ("delta", pa.int64())]
    )
    pred_schema = pa.schema(
        [("seed", pa.string()), ("node", pa.string()), ("sigma_p", pa.int64())]
    )
    cand_schema = pa.schema(
        [
            ("seed", pa.string()),
            ("node", pa.string()),
            ("sigma_w", pa.int64()),
            ("val", pa.int64()),
        ]
    )

    def at_level(d: int, names: dict):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.schema(
                    [(v, pa.string() if k != "sigma" else pa.int64()) for k, v in names.items()]
                ).empty_table()
            t = t.filter(pc.equal(t.column("dist"), d))
            return pa.table({v: t.column(k) for k, v in names.items()})

        return fn

    def to_cand(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return cand_schema.empty_table()
        delta = (
            pc.fill_null(t.column("delta"), 0)
            if "delta" in t.column_names
            else pa.array(np.zeros(t.num_rows, dtype=np.int64))
        )
        return pa.table(
            {
                "seed": t.column("seed"),
                "node": t.column("dst"),
                "sigma_w": t.column("sigma_w"),
                "val": pc.add_checked(delta, pa.scalar(1_000_000, pa.int64())),
            }
        )

    def contribution(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return delta_schema.empty_table()
        sp = t.column("sigma_p").to_numpy(zero_copy_only=False)
        sw = t.column("sigma_w").to_numpy(zero_copy_only=False)
        val = t.column("val").to_numpy(zero_copy_only=False)
        # σp·val can exceed int64 on dense graphs: guard like
        # _pagerank_contrib and fall back to Python big ints
        if int(sp.max()) * int(val.max()) < 2**63:
            c = (sp * val) // sw
        else:
            c = np.fromiter(
                ((int(p) * int(v)) // int(w) for p, v, w in zip(sp, val, sw)),
                dtype=np.int64,
                count=len(sp),
            )
        return pa.table(
            {
                "node": t.column("node"),
                "seed": t.column("seed"),
                "delta": pa.array(c.astype(np.int64)),
            }
        )

    deltas_prev = None  # (node, seed, delta) rows of the level just processed
    all_deltas = []
    for d in range(max_hops, 1, -1):
        w = pin_schema(
            visited.map_batches(
                at_level(d, {"node": "node", "seed": "seed", "sigma": "sigma_w"}),
                batch_format="pyarrow",
            ),
            w_schema,
        )
        wd_schema = pa.schema(list(w_schema) + [("delta", pa.int64())])
        if deltas_prev is not None:
            w = pin_schema(
                bucketed_inner_join(
                    w,
                    deltas_prev,
                    ["node", "seed"],
                    w_schema,
                    delta_schema,
                    num_buckets=num_buckets,
                    join_type="left outer",
                ),
                wd_schema,
            )
        # adjacency fan-out: (src=w.node) → successors' predecessors
        # v=dst. The join's declared b-side schema must describe w AS
        # RENAMED, so derive it from whichever schema w actually has.
        w_actual = w_schema if deltas_prev is None else wd_schema
        joined = bucketed_inner_join(
            adj,
            w.map_batches(
                lambda t: t.rename_columns(
                    ["src" if c == "node" else c for c in t.schema.names]
                )
                if t.num_columns
                else t,
                batch_format="pyarrow",
            ),
            ["src"],
            pa.schema([("src", pa.string()), ("dst", pa.string())]),
            pa.schema(
                [("src" if f.name == "node" else f.name, f.type) for f in w_actual]
            ),
            num_buckets=num_buckets,
        ).map_batches(to_cand, batch_format="pyarrow")
        preds = pin_schema(
            visited.map_batches(
                at_level(d - 1, {"seed": "seed", "node": "node", "sigma": "sigma_p"}),
                batch_format="pyarrow",
            ),
            pred_schema,
        )
        pairs = bucketed_inner_join(
            pin_schema(joined, cand_schema),
            preds,
            ["seed", "node"],
            cand_schema,
            pred_schema,
            num_buckets=num_buckets,
        ).map_batches(contribution, batch_format="pyarrow")
        lvl_delta = pin_schema(
            bucketed_aggregate(
                pairs, ["node", "seed"], [("delta", "sum")], num_buckets=num_buckets
            ),
            delta_schema,
            ensure_block=True,
        ).materialize()
        deltas_prev = lvl_delta
        all_deltas.append(lvl_delta)

    bc_schema = pa.schema([("node", pa.string()), ("bc_micro", pa.int64())])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return bc_schema.empty_table()
        return pa.table({"node": t.column("node"), "bc_micro": t.column("delta")})

    zeros = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "bc_micro": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    acc = zeros
    for lvl_delta in all_deltas:
        acc = acc.union(lvl_delta.map_batches(fold, batch_format="pyarrow"))
    return pin_schema(
        bucketed_aggregate(acc, ["node"], [("bc_micro", "sum")], num_buckets=num_buckets),
        bc_schema,
    )


def hop_histogram(
    edges_ds,
    n_seeds: int = 3,
    max_hops: int = 3,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_buckets: int = 256,
):
    """Neighborhood-function profile from the pivot BFS (the
    HyperANF-style effective-diameter curve, computed exactly on the
    sampled seeds instead of approximately on all nodes): for each hop
    distance 1 ≤ d ≤ ``max_hops``, the number of (seed, node) pairs
    first reached at exactly d. A growth curve that flattens early
    says the graph core is tight; the largest non-empty d is a
    diameter lower bound. One bounded aggregate over the
    ``_pivot_bfs`` state. Columns: dist, n_pairs."""
    visited, _ = _pivot_bfs(
        edges_ds,
        n_seeds=n_seeds,
        max_hops=max_hops,
        subj_col=subj_col,
        obj_col=obj_col,
        num_buckets=num_buckets,
    )

    def positive(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("dist", pa.int64())]).empty_table()
        import pyarrow.compute as pc

        return t.filter(pc.greater(t.column("dist"), 0)).select(["dist"])

    return pin_schema(
        bucketed_aggregate(
            with_ones(visited.map_batches(positive, batch_format="pyarrow"), "n_pairs"),
            ["dist"],
            [("n_pairs", "sum")],
            num_buckets=num_buckets,
        ),
        pa.schema([("dist", pa.int64()), ("n_pairs", pa.int64())]),
    )


def undirected_adjacency(
    edges_ds,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
):
    """Collapse a (possibly multi-)edge stream to the symmetric
    weighted adjacency ``(src, dst, w)``: self-loops dropped, both
    directions emitted, parallel edges/preds summed — ONE bucketed
    aggregate over the edge stream, materialized so downstream
    consumers (label_propagation rounds, community_stats) reread blocks
    instead of re-running the shuffle. ``weight_col`` absent → every
    row counts 1."""
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def to_adj(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(subj_col), pa.string()).combine_chunks()
        o = pc.cast(batch.column(obj_col), pa.string()).combine_chunks()
        if weight_col in batch.column_names:
            w = pc.cast(batch.column(weight_col), pa.int64()).combine_chunks()
        else:
            w = pa.array([1] * batch.num_rows, type=pa.int64())
        keep = pc.not_equal(s, o)
        s, o, w = s.filter(keep), o.filter(keep), w.filter(keep)
        return pa.table(
            {
                "src": pa.chunked_array([s, o]).combine_chunks(),
                "dst": pa.chunked_array([o, s]).combine_chunks(),
                "w": pa.chunked_array([w, w]).combine_chunks(),
            }
        )

    adj_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())]
    )
    return pin_schema(
        bucketed_aggregate(
            edges_ds.map_batches(to_adj, batch_format="pyarrow"),
            ["src", "dst"],
            [("w", "sum")],
            num_buckets=num_buckets,
        ),
        adj_schema,
    ).materialize()


def label_propagation(
    edges_ds,
    rounds: int = 4,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
    adj=None,
):
    """Deterministic synchronous weighted label propagation — the
    community-detection pass a KG build runs between entity resolution
    (``kg_merge_groups``: folds *identical* entities) and serving
    (communities group *related* entities into topics).

    Standard LPA is RNG-driven (random node order, random tie-breaks);
    this is the synchronous determinized form: every node starts as its
    own label, and round r assigns ``label(v) = argmax over neighbor
    labels of the summed adjacent edge weight``, ties broken by the
    lexicographically SMALLEST label. No RNG, no node ordering, fixed
    rounds — bit-replayable in SQL round by round (the kg_bfs / kg_kcore
    twin pattern). Synchronous LPA can 2-cycle on bipartite-ish regions
    instead of converging; a fixed even round count is the standard
    determinization and both sides replay whatever state round R has.

    Scale shape: the adjacency build is ONE bucketed aggregate over the
    edge stream; each round is ONE bucketed join of the edge-sized
    adjacency against the node-sized label table (keyed on src — the
    same single partitioning key every round), ONE bucketed (node,
    label) weight aggregate, and ONE combiner-pruned per-node argmax
    (stages/rank.top_k_per_group, k=1 — the shuffle moves ≤ one row per
    (block, node)). Labels materialize per round to cut lineage (the
    kg_pagerank argument). Never all-pairs, no driver-side state.

    Self-loops are dropped; multi-edges/preds collapse by weight sum
    (``weight_col`` absent → every row counts 1). Columns: node, label.

    No reference analog (the reference's graph ends at canonical
    triples, entity_level_precision_recall.py evaluates spans);
    extension per SURVEY.md §2.11.
    """
    adj_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())]
    )
    if adj is None:
        adj = undirected_adjacency(
            edges_ds,
            subj_col=subj_col,
            obj_col=obj_col,
            weight_col=weight_col,
            num_buckets=num_buckets,
        )

    lab_schema = pa.schema([("node", pa.string()), ("label", pa.string())])

    def self_label(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "label": t.column("node")})

    # every node in adj appears as a src (adjacency is symmetric), so
    # distinct src IS the node set
    labels = pin_schema(
        bucketed_aggregate(
            with_ones(
                pin_schema(adj, adj_schema).map_batches(
                    lambda t: t.select(["src"]).rename_columns(["node"]),
                    batch_format="pyarrow",
                )
            ),
            ["node"],
            [("one", "min")],
            num_buckets=num_buckets,
        ),
        pa.schema([("node", pa.string())]),
    ).map_batches(self_label, batch_format="pyarrow").materialize()

    from bioner_ray.stages.rank import top_k_per_group

    score_schema = pa.schema(
        [("dst", pa.string()), ("label", pa.string()), ("w", pa.int64())]
    )
    for _ in range(rounds):
        # pin_schema does select+cast in one pass, absorbing any
        # schema-less empty reduce partitions before the bare lambdas
        joined = pin_schema(
            bucketed_inner_join(
                adj,
                labels.map_batches(
                    lambda t: t.rename_columns(["src", "label"]),
                    batch_format="pyarrow",
                ),
                ["src"],
                adj_schema,
                pa.schema([("src", pa.string()), ("label", pa.string())]),
                num_buckets=num_buckets,
            ),
            score_schema,
        )
        scores = pin_schema(
            bucketed_aggregate(
                joined, ["dst", "label"], [("w", "sum")], num_buckets=num_buckets
            ),
            score_schema,
        )
        labels = pin_schema(
            top_k_per_group(
                scores,
                key_col="dst",
                order_by=[("w", "descending"), ("label", "ascending")],
                k=1,
            ),
            pa.schema([("dst", pa.string()), ("label", pa.string())]),
        ).map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        ).materialize()

    return labels


def community_stats(
    edges_ds,
    rounds: int = 4,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
):
    """Per-community modularity decomposition over the deterministic
    label-propagation partition: for each community c, ``n_nodes``,
    ``degree_w`` = Σ_{i∈c} k_i (weighted degree mass, denominator term
    of modularity's null model) and ``intra_w`` = Σ A_ij over pairs with
    both endpoints in c (directed-double-counted, consistent with
    2m = Σ degree_w). Global modularity is then
    Q = Σ_c [ intra_w_c / 2m − (degree_w_c / 2m)² ] — kept as exact
    int64 decomposition rows rather than one quantized scalar so the
    output stays integer-exact AND community-partitioned (no
    Σ d_c² overflow, no driver-side collect of the community table).

    Scale shape: adjacency + LP as in ``label_propagation`` (shared
    materialized adj, computed once); then ONE edge-scale bucketed join
    per endpoint (src→label, dst→label), a (label) weight aggregate for
    intra_w, a node-scale join for degrees and a label-keyed outer join
    to assemble — every exchange bucketed, nothing driver-side.

    No reference analog; extension per SURVEY.md §2.11 (community
    quality gate before serving a KG topic partition).
    """
    import pyarrow.compute as pc

    adj = undirected_adjacency(
        edges_ds,
        subj_col=subj_col,
        obj_col=obj_col,
        weight_col=weight_col,
        num_buckets=num_buckets,
    )
    labels = label_propagation(
        edges_ds, rounds=rounds, num_buckets=num_buckets, adj=adj
    )

    adj_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())]
    )
    lab_src = pa.schema([("src", pa.string()), ("l_src", pa.string())])
    lab_dst = pa.schema([("dst", pa.string()), ("l_dst", pa.string())])

    # endpoint labels: two edge-scale bucketed joins on the same adj
    j1 = pin_schema(
        bucketed_inner_join(
            adj,
            labels.map_batches(
                lambda t: t.rename_columns(["src", "l_src"]), batch_format="pyarrow"
            ),
            ["src"],
            adj_schema,
            lab_src,
            num_buckets=num_buckets,
        ),
        pa.schema(list(adj_schema) + [("l_src", pa.string())]),
    )
    j2 = pin_schema(
        bucketed_inner_join(
            j1,
            labels.map_batches(
                lambda t: t.rename_columns(["dst", "l_dst"]), batch_format="pyarrow"
            ),
            ["dst"],
            pa.schema(list(adj_schema) + [("l_src", pa.string())]),
            lab_dst,
            num_buckets=num_buckets,
        ),
        pa.schema(list(adj_schema) + [("l_src", pa.string()), ("l_dst", pa.string())]),
    )

    def intra_only(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("l_src"), t.column("l_dst"))
        t = t.filter(keep)
        return pa.table({"label": t.column("l_src"), "intra_w": t.column("w")})

    intra_schema = pa.schema([("label", pa.string()), ("intra_w", pa.int64())])
    intra = pin_schema(
        bucketed_aggregate(
            j2.map_batches(intra_only, batch_format="pyarrow"),
            ["label"],
            [("intra_w", "sum")],
            num_buckets=num_buckets,
        ),
        intra_schema,
    )

    # per-node weighted degree → per-community degree mass + node count
    deg_schema = pa.schema([("node", pa.string()), ("degree_w", pa.int64())])
    deg = pin_schema(
        bucketed_aggregate(
            adj.map_batches(
                lambda t: pa.table(
                    {"node": t.column("src"), "degree_w": t.column("w")}
                ),
                batch_format="pyarrow",
            ),
            ["node"],
            [("degree_w", "sum")],
            num_buckets=num_buckets,
        ),
        deg_schema,
    )
    degl = pin_schema(
        bucketed_inner_join(
            deg,
            labels,
            ["node"],
            deg_schema,
            pa.schema([("node", pa.string()), ("label", pa.string())]),
            num_buckets=num_buckets,
        ),
        pa.schema(list(deg_schema) + [("label", pa.string())]),
    )
    comm_schema = pa.schema(
        [("label", pa.string()), ("degree_w", pa.int64()), ("n_nodes", pa.int64())]
    )
    comm = pin_schema(
        bucketed_aggregate(
            with_ones(degl, "n_nodes").map_batches(
                lambda t: t.select(["label", "degree_w", "n_nodes"]),
                batch_format="pyarrow",
            ),
            ["label"],
            [("degree_w", "sum"), ("n_nodes", "sum")],
            num_buckets=num_buckets,
        ),
        comm_schema,
    )

    # assemble: every community has nodes; one with zero internal edges
    # (all mass on the cut) needs intra_w = 0, hence left outer
    out = bucketed_inner_join(
        comm,
        intra,
        ["label"],
        comm_schema,
        intra_schema,
        num_buckets=num_buckets,
        join_type="left outer",
    )

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": t.column("label"),
                "n_nodes": t.column("n_nodes"),
                "degree_w": t.column("degree_w"),
                "intra_w": pc.fill_null(t.column("intra_w"), 0),
            }
        )

    return pin_schema(
        out.map_batches(fill, batch_format="pyarrow"),
        pa.schema(
            [
                ("label", pa.string()),
                ("n_nodes", pa.int64()),
                ("degree_w", pa.int64()),
                ("intra_w", pa.int64()),
            ]
        ),
    )


def adamic_adar(
    edges_ds,
    subj_col: str = "subj",
    obj_col: str = "obj",
    k: int = 50,
    max_center_degree: int = 100_000,
    num_buckets: int = 256,
    exclude_edges: bool = False,
):
    """Adamic–Adar pair affinity over the undirected simple graph:
    AA(u, v) = Σ_{z ∈ N(u) ∩ N(v)} 1 / ln(deg(z)) — the classic
    link-prediction / entity-merge evidence score that discounts common
    neighbors by how promiscuous they are (a shared hub proves little;
    a shared rare neighbor proves a lot).

    Exactness: per-center weight is quantized to integer micro-nats
    w(z) = floor(10^12 / ln(deg z)) — ln is the one libm call (bit-equal
    between Python ``math.log`` and DuckDB ``ln``), floor avoids every
    round-half tie, and the pair score is then an ORDER-FREE integer
    sum, so the distributed result replays bit-for-bit in SQL.

    Plan: wedge emission needs each center's neighbor list co-located —
    one bucketed join (deg → neighbor relation, keyed on the center)
    feeding one center-keyed exchange whose reducer emits every
    neighbor pair fully vectorized (per-basket-size ``np.triu_indices``
    templates, as in basket_pairs); scores then ride a (u, v)
    ``bucketed_aggregate`` and a left-outer flag join against the edge
    set marks which scored pairs are already adjacent. Unlike
    triangles, AA needs ALL wedges, so degree orientation cannot bound
    hubs; centers above ``max_center_degree`` (Σ deg² blow-up) are
    skipped WITH A LOG — mirror the cap in any twin. Output: top-``k``
    by (aa_micro desc, u, v): u, v, aa_micro, n_common, is_edge."""
    import logging
    import math

    import numpy as np
    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import _bucket_column

    und, deg = _und_deg(edges_ds, subj_col, obj_col, num_buckets)

    nbr_schema = pa.schema([("c", pa.string()), ("n", pa.string())])

    def both_dirs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return nbr_schema.empty_table()
        lo = t.column("lo").combine_chunks()
        hi = t.column("hi").combine_chunks()
        return pa.table(
            {
                "c": pa.chunked_array([lo, hi]).combine_chunks(),
                "n": pa.chunked_array([hi, lo]).combine_chunks(),
            },
            schema=nbr_schema,
        )

    wz_schema = pa.schema([("c", pa.string()), ("w", pa.int64())])

    def center_weight(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return wz_schema.empty_table()
        d = t.column("deg").to_numpy(zero_copy_only=False)
        capped = int((d > max_center_degree).sum())
        if capped:
            logging.getLogger(__name__).warning(
                "adamic_adar: skipping %d hub centers above degree cap %d",
                capped,
                max_center_degree,
            )
        keep = (d >= 2) & (d <= max_center_degree)  # deg-1 nodes have no wedge
        dk = d[keep]
        uniq, inv = np.unique(dk, return_inverse=True)
        wvals = np.array(
            [math.floor(1e12 / math.log(float(v))) for v in uniq], dtype=np.int64
        )
        return pa.table(
            {
                "c": t.column("node").filter(pa.array(keep)),
                "w": pa.array(wvals[inv] if len(dk) else np.empty(0, np.int64)),
            },
            schema=wz_schema,
        )

    centered = bucketed_inner_join(
        und.map_batches(both_dirs, batch_format="pyarrow"),
        pin_schema(deg.map_batches(center_weight, batch_format="pyarrow"), wz_schema),
        ["c"],
        nbr_schema,
        wz_schema,
        num_buckets=num_buckets,
    )

    pair_schema = pa.schema(
        [
            ("u", pa.string()),
            ("v", pa.string()),
            ("aa_micro", pa.int64()),
            ("n_common", pa.int64()),
        ]
    )

    def rebucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return nbr_schema.append(pa.field("w", pa.int64())).empty_table().append_column(
                "_bucket", pa.array([], type=pa.int64())
            )
        return t.append_column("_bucket", _bucket_column(t, ["c"], num_buckets))

    def emit_pairs(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pair_schema.empty_table()
        g = g.sort_by([("c", "ascending"), ("n", "ascending")])
        c = g.column("c").to_numpy(zero_copy_only=False)
        nb = g.column("n").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        sizes = np.diff(np.r_[starts, len(c)])
        us, vs, ws = [], [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            ti, tj = np.triu_indices(int(s), k=1)
            base = starts[sizes == s]
            us.append(nb[(base[:, None] + ti[None, :]).ravel()])
            vs.append(nb[(base[:, None] + tj[None, :]).ravel()])
            ws.append(np.repeat(w[base], len(ti)))
        if not us:
            return pair_schema.empty_table()
        u = np.concatenate(us)
        return pa.table(
            {
                "u": pa.array(u, type=pa.string()),
                "v": pa.array(np.concatenate(vs), type=pa.string()),
                "aa_micro": pa.array(np.concatenate(ws)),
                "n_common": pa.array(np.ones(len(u), dtype=np.int64)),
            },
            schema=pair_schema,
        )

    scores = pin_schema(
        bucketed_aggregate(
            centered.map_batches(rebucket, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(emit_pairs, batch_format="pyarrow"),
            ["u", "v"],
            [("aa_micro", "sum"), ("n_common", "sum")],
            num_buckets=num_buckets,
        ),
        pair_schema,
    )

    flag_schema = pa.schema(
        [("u", pa.string()), ("v", pa.string()), ("is_edge", pa.int64())]
    )
    flagged = bucketed_inner_join(
        scores,
        und.map_batches(
            lambda t: pa.table(
                {
                    "u": t.column("lo"),
                    "v": t.column("hi"),
                    "is_edge": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                },
                schema=flag_schema,
            )
            if t.num_columns
            else flag_schema.empty_table(),
            batch_format="pyarrow",
        ),
        ["u", "v"],
        pair_schema,
        flag_schema,
        num_buckets=num_buckets,
        join_type="left outer",
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("is_edge"),
            "is_edge",
            pc.coalesce(t.column("is_edge"), pa.scalar(0, pa.int64())),
        )
        if t.num_columns
        else pair_schema.append(pa.field("is_edge", pa.int64())).empty_table(),
        batch_format="pyarrow",
    )
    if exclude_edges:
        # link-PREDICTION mode: keep only scored NON-edges — the 2-hop
        # candidate facts a KG-completion pass proposes (is_edge is
        # then constant and dropped)
        flagged = flagged.map_batches(
            lambda t: t.filter(pc.equal(t.column("is_edge"), 0)).drop_columns(["is_edge"])
            if t.num_columns
            else pair_schema.empty_table(),
            batch_format="pyarrow",
        )
    return flagged.sort(
        ["aa_micro", "u", "v"], descending=[True, False, False]
    ).limit(k)


def _hits_product(x, w):
    """Exact per-edge ``x * w`` as int64, with the _pagerank_contrib
    big-int fallback when the vectorized product could exceed 2^63."""
    import numpy as np

    x = np.asarray(x, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    if int(x.max()) * int(w.max()) < 2**63:
        return x * w
    return np.array(
        [int(a) * int(b) for a, b in zip(x.tolist(), w.tolist())], dtype=np.int64
    )


def hits(
    edges_ds,
    iters: int = 2,
    scale: int = 10**6,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
):
    """Fixed-iteration weighted HITS (Kleinberg '99 hubs/authorities)
    over a directed edge table, in deterministic scaled-integer
    arithmetic: (node, hub, auth) with scores ≈ value × ``scale``.

    Semantics (exactly replayable in SQL, hence oracle-checkable):
      * multi-edges collapse to (subj, obj, Σweight) first;
      * hub₀[u] = scale for every node;
      * per round: auth_raw[v] = Σ over in-edges (u→v,w) of hub[u]·w,
        then the FLOOR-DIVIDE renormalization
        ``auth[v] = auth_raw[v] // max(1, max_v(auth_raw) // scale)``
        (a monotone transform, so rankings are exactly HITS's, while
        every value stays ≤ ~2·scale — no L2 sqrt, no overflow, and
        the global max is an order-independent streamed reduce);
        hubs update symmetrically from the fresh authorities.

    Shape per half-step: ONE bucketed join (edge stream ⋈ the bounded
    node-score table) + ONE bucketed aggregate + one streamed max —
    the same per-round cost as stages/graph.pagerank, with the same
    materialize-per-round lineage cut. Hot hubs ride the edge stream,
    never a per-key partition.

    No reference analog; §2.11 KG-analytics extension (companion to
    pagerank — authority ranking for entity importance, hub ranking
    for aggregator/survey-page detection in a web KG).
    """
    import numpy as np
    import pyarrow.compute as pc

    def to_pair(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": pc.cast(batch.column(subj_col), pa.string()),
                "obj": pc.cast(batch.column(obj_col), pa.string()),
                "w": pc.cast(batch.column(weight_col), pa.int64()),
            }
        )

    edge_schema = pa.schema(
        [("subj", pa.string()), ("obj", pa.string()), ("w", pa.int64())]
    )
    score_schema = pa.schema([("node", pa.string()), ("s", pa.int64())])

    edges = pin_schema(
        bucketed_aggregate(
            edges_ds.map_batches(to_pair, batch_format="pyarrow"),
            ["subj", "obj"],
            [("w", "sum")],
            num_buckets=num_buckets,
        ),
        edge_schema,
    ).materialize()

    def endpoint_nodes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.chunked_array(
                    [
                        batch.column("subj").combine_chunks(),
                        batch.column("obj").combine_chunks(),
                    ]
                ).combine_chunks()
            }
        ).append_column("s", pa.array(np.zeros(2 * batch.num_rows, dtype=np.int64)))

    zeros = pin_schema(
        bucketed_aggregate(
            edges.map_batches(endpoint_nodes, batch_format="pyarrow"),
            ["node"],
            [("s", "min")],
            num_buckets=num_buckets,
        ),
        score_schema,
    ).materialize()

    def with_const(value: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    "s": pa.array(np.full(t.num_rows, value, dtype=np.int64)),
                }
            )

        return fn

    hub = zeros.map_batches(with_const(scale), batch_format="pyarrow").materialize()

    def half_step(scores, key_in: str, key_out: str):
        """auth-from-hub when (key_in, key_out) = (subj, obj); the
        hub-from-auth update is the same join with the keys swapped."""
        joined = bucketed_inner_join(
            edges,
            scores.rename_columns({"node": key_in}),
            [key_in],
            edge_schema,
            pa.schema([(key_in, pa.string()), ("s", pa.int64())]),
            num_buckets=num_buckets,
        )

        def contrib(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return score_schema.empty_table()
            c = _hits_product(
                t.column("s").to_numpy(zero_copy_only=False),
                t.column("w").to_numpy(zero_copy_only=False),
            )
            return pa.table({"node": t.column(key_out), "s": pa.array(c)})

        raw = pin_schema(
            bucketed_aggregate(
                zeros.union(joined.map_batches(contrib, batch_format="pyarrow")),
                ["node"],
                [("s", "sum")],
                num_buckets=num_buckets,
            ),
            score_schema,
        ).materialize()
        mx = raw.max("s")
        div = max(1, int(mx or 0) // scale)

        def norm(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    "s": pc.divide(t.column("s"), pa.scalar(div, type=pa.int64())),
                }
            )

        return raw.map_batches(norm, batch_format="pyarrow").materialize()

    auth = None
    for _ in range(iters):
        auth = half_step(hub, "subj", "obj")
        hub = half_step(auth, "obj", "subj")

    out = bucketed_inner_join(
        hub.rename_columns({"s": "hub"}),
        auth.rename_columns({"s": "auth"}),
        ["node"],
        pa.schema([("node", pa.string()), ("hub", pa.int64())]),
        pa.schema([("node", pa.string()), ("auth", pa.int64())]),
        num_buckets=num_buckets,
    )
    return pin_schema(
        out,
        pa.schema([("node", pa.string()), ("hub", pa.int64()), ("auth", pa.int64())]),
    )


def _katz_contrib(x, w, alpha_num: int, alpha_den: int):
    """Exact per-edge ``(alpha_num · x · w) // alpha_den`` as int64,
    with the _pagerank_contrib big-int fallback when the vectorized
    product could exceed 2^63."""
    import numpy as np

    x = np.asarray(x, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    if alpha_num * int(x.max()) * int(w.max()) < 2**63:
        return (alpha_num * x * w) // alpha_den
    return np.array(
        [(alpha_num * int(a) * int(b)) // alpha_den for a, b in zip(x.tolist(), w.tolist())],
        dtype=np.int64,
    )


def katz(
    edges_ds,
    iters: int = 3,
    scale: int = 10**6,
    alpha_num: int = 1,
    alpha_den: int = 8,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
):
    """Fixed-iteration weighted Katz centrality (Katz '53) over a
    directed edge table, in deterministic scaled-integer arithmetic:
    (node, katz) with score ≈ value × ``scale``. Unlike PageRank, Katz
    does NOT normalize by out-degree — a node inherits the full
    attenuated mass of every walker reaching it, so prolific linkers
    count more, not less (the complementary prior for web/KG entity
    importance; PageRank answers "where does a random surfer end up",
    Katz "how many attenuated walks end here").

    Semantics (exactly replayable in SQL, hence oracle-checkable):
      * multi-edges collapse to (subj, obj, Σweight) first;
      * katz₀[v] = scale for every node (the β·1 injection);
      * per round: raw[v] = scale + Σ over in-edges (s→v, w) of
        ``(alpha_num · katz[s] · w) // alpha_den`` (per-edge floor
        division — the attenuation α = alpha_num/alpha_den), then the
        hits()-style FLOOR-DIVIDE renormalization
        ``katz[v] = raw[v] // max(1, max_v(raw) // scale)`` — a
        monotone transform, so the ranking is exactly Katz's while
        every value stays ≤ ~2·scale (no geometric-series overflow,
        no convergence-radius condition on α).

    Shape per round: ONE bucketed join (edge stream ⋈ the bounded
    node-score table) + ONE bucketed aggregate + one streamed max —
    identical to stages/graph.pagerank / hits, with the same
    materialize-per-round lineage cut; hot hubs ride the edge stream.

    No reference analog; §2.11 KG-analytics extension (third member of
    the centrality family next to pagerank/ppr and hits).
    """
    import numpy as np
    import pyarrow.compute as pc

    def to_pair(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": pc.cast(batch.column(subj_col), pa.string()),
                "obj": pc.cast(batch.column(obj_col), pa.string()),
                "w": pc.cast(batch.column(weight_col), pa.int64()),
            }
        )

    edge_schema = pa.schema(
        [("subj", pa.string()), ("obj", pa.string()), ("w", pa.int64())]
    )
    score_schema = pa.schema([("node", pa.string()), ("s", pa.int64())])

    edges = pin_schema(
        bucketed_aggregate(
            edges_ds.map_batches(to_pair, batch_format="pyarrow"),
            ["subj", "obj"],
            [("w", "sum")],
            num_buckets=num_buckets,
        ),
        edge_schema,
    ).materialize()

    def endpoint_nodes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.chunked_array(
                    [
                        batch.column("subj").combine_chunks(),
                        batch.column("obj").combine_chunks(),
                    ]
                ).combine_chunks()
            }
        ).append_column("s", pa.array(np.zeros(2 * batch.num_rows, dtype=np.int64)))

    zeros = pin_schema(
        bucketed_aggregate(
            edges.map_batches(endpoint_nodes, batch_format="pyarrow"),
            ["node"],
            [("s", "min")],
            num_buckets=num_buckets,
        ),
        score_schema,
    ).materialize()

    def with_const(value: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    "s": pa.array(np.full(t.num_rows, value, dtype=np.int64)),
                }
            )

        return fn

    k = zeros.map_batches(with_const(scale), batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = bucketed_inner_join(
            edges,
            k.rename_columns({"node": "subj"}),
            ["subj"],
            edge_schema,
            pa.schema([("subj", pa.string()), ("s", pa.int64())]),
            num_buckets=num_buckets,
        )

        def contrib(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return score_schema.empty_table()
            c = _katz_contrib(
                t.column("s").to_numpy(zero_copy_only=False),
                t.column("w").to_numpy(zero_copy_only=False),
                alpha_num,
                alpha_den,
            )
            return pa.table({"node": t.column("obj"), "s": pa.array(c)})

        agg = pin_schema(
            bucketed_aggregate(
                zeros.union(joined.map_batches(contrib, batch_format="pyarrow")),
                ["node"],
                [("s", "sum")],
                num_buckets=num_buckets,
            ),
            score_schema,
        ).materialize()
        # raw = agg + scale per node; max(raw) = max(agg) + scale (the
        # +scale is a constant shift), so the renormalizer needs no
        # second pass over the table
        div = max(1, (int(agg.max("s") or 0) + scale) // scale)

        def norm(t: pa.Table, _div=div) -> pa.Table:
            raw = pc.add(t.column("s"), pa.scalar(scale, type=pa.int64()))
            return pa.table(
                {
                    "node": t.column("node"),
                    "s": pc.divide(raw, pa.scalar(_div, type=pa.int64())),
                }
            )

        k = agg.map_batches(norm, batch_format="pyarrow").materialize()

    return k.rename_columns({"s": "katz"})


def sssp_distances(
    edges_ds,
    n_seeds: int = 3,
    rounds: int = 4,
    base_cost: int = 1_000_000,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_buckets: int = 256,
):
    """Multi-source WEIGHTED shortest paths (fixed-round Bellman-Ford)
    over the undirected KG: edge cost = ``base_cost // w`` (integer —
    strong associations are short hops, exactly replayable as DuckDB
    ``//``), seeds = the ``n_seeds`` lexicographically-smallest nodes
    at distance 0. Round r relaxes every edge once: dist'(v) =
    min(dist(v), min over in-edges (dist(u) + cost(u,v))). After k
    rounds dist(v) is the exact shortest distance over paths of ≤ k
    edges — the bounded-horizon form a 10^12-node graph actually
    serves (full convergence needs diameter rounds; the twin replays
    the same k).

    Scale shape: the dist table is node-sized; per round ONE bucketed
    join (dist ⋈ adjacency, keyed src) + ONE bucketed min-aggregate
    over dist ∪ candidates — the kg_pagerank exchange pattern, with
    materialize-per-round to cut lineage. Relaxation is monotone
    non-increasing, so converged rounds are no-ops (fixpoint-safe).
    Columns: node, dist (absent = unreachable within k edges).

    No reference analog (extension per SURVEY.md §2.11); the graph
    serving pattern next to bfs_distances' unweighted hops.
    """
    import numpy as np
    import pyarrow.compute as pc

    def to_adj(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(subj_col), pa.string()).combine_chunks()
        o = pc.cast(batch.column(obj_col), pa.string()).combine_chunks()
        if weight_col in batch.column_names:
            w = pc.cast(batch.column(weight_col), pa.int64()).combine_chunks()
        else:
            w = pa.array([1] * batch.num_rows, type=pa.int64())
        keep = pc.not_equal(s, o)
        s, o, w = s.filter(keep), o.filter(keep), w.filter(keep)
        return pa.table(
            {
                "src": pa.chunked_array([s, o]).combine_chunks(),
                "dst": pa.chunked_array([o, s]).combine_chunks(),
                "w": pa.chunked_array([w, w]).combine_chunks(),
            }
        )

    adj_schema = pa.schema([("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())])
    cost_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("cost", pa.int64())]
    )
    adj = pin_schema(
        bucketed_aggregate(
            edges_ds.map_batches(to_adj, batch_format="pyarrow"),
            ["src", "dst"],
            [("w", "sum")],
            num_buckets=num_buckets,
        ),
        adj_schema,
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "cost": pa.array(
                    base_cost
                    // t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    adj = pin_schema(adj, cost_schema).materialize()

    node_schema = pa.schema([("node", pa.string())])
    dist_schema = pa.schema([("node", pa.string()), ("dist", pa.int64())])

    seeds = (
        pin_schema(
            bucketed_aggregate(
                with_ones(
                    adj.map_batches(
                        lambda t: t.select(["src"]).rename_columns(["node"]),
                        batch_format="pyarrow",
                    )
                ),
                ["node"],
                [("one", "min")],
                num_buckets=num_buckets,
            ).map_batches(lambda t: t.select(["node"]), batch_format="pyarrow"),
            node_schema,
        )
        .sort("node")
        .limit(n_seeds)
    )
    dist = pin_schema(
        seeds.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "dist": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        dist_schema,
    ).materialize()

    for _ in range(rounds):
        relaxed = pin_schema(
            bucketed_inner_join(
                adj,
                dist.map_batches(
                    lambda t: t.rename_columns(["src", "dist"]), batch_format="pyarrow"
                ),
                ["src"],
                cost_schema,
                pa.schema([("src", pa.string()), ("dist", pa.int64())]),
                num_buckets=num_buckets,
            ),
            pa.schema(
                [
                    ("src", pa.string()),
                    ("dst", pa.string()),
                    ("cost", pa.int64()),
                    ("dist", pa.int64()),
                ]
            ),
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("dst"),
                    "dist": pc.add(t.column("dist"), t.column("cost")),
                }
            ),
            batch_format="pyarrow",
        )
        dist = pin_schema(
            bucketed_aggregate(
                dist.union(relaxed),
                ["node"],
                [("dist", "min")],
                num_buckets=num_buckets,
            ),
            dist_schema,
            ensure_block=True,
        ).materialize()

    return dist
