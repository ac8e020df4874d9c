"""Small runtime helpers (no ray.init here — sessions are owned by
bench.py / CLIs / the test fixture, per the driver contract)."""

from __future__ import annotations

import ray


def default_concurrency(fraction: float = 0.75, floor: int = 2) -> int:
    """Actor-pool size leaving headroom for read/write/shuffle stages.

    A pool that reserves every CPU starves the other stages and the
    pipeline serializes — size to a fraction of the session's CPUs.
    """
    if not ray.is_initialized():
        return floor
    cpus = ray.cluster_resources().get("CPU", floor)
    return max(floor, int(cpus * fraction))


def default_actor_pool(fraction: float = 0.5,
                       floor: int = 2) -> tuple[int, int]:
    """Autoscaling actor-pool bounds ``(floor, fraction × CPUs)``.

    Stateful stages default to this instead of a fixed pool: a small
    input never pays more than ``floor`` actor startups, while a
    volume corpus scales the pool out on backlog.  The round-5 minhash
    volume curve caught the alternative — a hardcoded pool of 2 left
    30 of 32 CPUs idle through the signature pass at 16× volume.  The
    fraction leaves headroom so the pool can't starve read/shuffle
    stages (see memory: actor-pool starvation).
    """
    hi = default_concurrency(fraction=fraction, floor=floor)
    return (min(floor, hi), hi)
