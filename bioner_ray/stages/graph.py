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

from bioner_ray.stages.shuffle import bucketed_aggregate


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
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(4, cpus // 4)

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

    prev_sum = None
    converged = False
    for rnd in range(max_iters):
        nbr_labels = labels.rename_columns({"node": "nbr", "label": "nbr_label"})
        msgs = edges.join(
            nbr_labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("nbr",),
            aggregator_ray_remote_args={"num_cpus": 0.25},
        ).map_batches(
            lambda t: pa.table({"node": t.column("node"), "label": t.column("nbr_label")}),
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
                labels.join(
                    ptr,
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=("label",),
                    aggregator_ray_remote_args={"num_cpus": 0.25},
                )
                .map_batches(
                    lambda t: pa.table(
                        {"node": t.column("node"), "label": t.column("jump")}
                    ),
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
