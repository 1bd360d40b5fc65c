"""Actor-pool sizing for stateful map_batches stages.

Ray's autoscaling actor pool (``concurrency=(1, N)``) ramps up from its
minimum by backlog heuristics; measured on the 96k-page headline at 32
CPUs it plateaued around 8 actors — HALF the job's wall was actors that
were never started (min=1 → 15.0s, min=16 → 8.3s, min=24 → 7.5s wall
for identical work). A FIXED pool sized to ¾ of the cluster's CPUs
starts every actor immediately and still leaves headroom for the read
tasks and the shuffle that bracket the pool — a pool equal to the full
CPU count deadlocks the streaming executor (every CPU held by an actor,
upstream read tasks starve; the same failure mode as the join
aggregator note in ``stages/dedup._join``).
"""

from __future__ import annotations


def pool_size(
    max_actors: int | None = None, fraction: float = 0.75, pools: int = 1
) -> int:
    """Fixed actor count for a stateful stage: ``fraction`` of the
    cluster's CPUs (floor 1), optionally capped at ``max_actors``.

    ``pools`` = number of CONCURRENT actor-pool stages in the same
    pipeline execution: the ¾ budget is split between them so their
    combined reservation still leaves CPUs for the task-pool stages
    (otherwise two pools on a small cluster hold every core and the
    reads starve).

    Call at pipeline-build time (driver side) — the cluster size is
    stable for the life of a fixed-size Ray cluster, which is the
    deployment model (north rule: fixed multi-node clusters).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    size = max(1, int(cpus * fraction / max(pools, 1)))
    if max_actors is not None:
        size = max(1, min(size, max_actors))
    return size


def sized_pool(
    n_rows: int | None,
    batch_size: int = 256,
    max_actors: int | None = None,
    pools: int = 1,
    min_batches_per_actor: int = 2,
) -> int:
    """``pool_size`` additionally capped by the WORK: no more actors
    than ``batches / min_batches_per_actor`` — an actor that exists for
    a single batch costs more in cold start than it contributes. At
    production scale (thousands of batches) the cluster fraction is the
    binding cap and this is identical to ``pool_size``; at bench/test
    scale it stops 24 actors spawning for 20 batches of work.

    ``n_rows=None`` (unknown input size) falls back to ``pool_size``.
    """
    cap = pool_size(max_actors, pools=pools)
    if n_rows is None:
        return cap
    batches = max(1, -(-int(n_rows) // max(batch_size, 1)))
    return max(1, min(cap, batches // max(min_batches_per_actor, 1) or 1))
