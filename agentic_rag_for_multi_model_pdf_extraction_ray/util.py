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
