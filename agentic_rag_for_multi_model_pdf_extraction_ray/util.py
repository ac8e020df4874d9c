"""Small runtime helpers (no ray.init here — sessions are owned by
bench.py / CLIs / the test fixture, per the driver contract)."""

from __future__ import annotations

import ray
import ray.data as rd


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


def counted_pin(src, threshold_rows: int):
    """Execute ``src`` ONCE while deciding whether to pin it.

    Streams the dataset's ``RefBundle``s — blocks land in the object
    store as they are produced and holding their refs keeps them
    alive; nothing is pulled to the driver — and bails out the moment
    the running exact row count exceeds ``threshold_rows``.  Returns a
    Dataset over the held blocks (the caller's remaining
    passes read pinned Arrow, no upstream re-execution), or
    ``None`` to stream: the abandoned partial execution is bounded at
    ~``threshold_rows`` rows, the price of learning "too big" without
    a full pass.  Unknown per-block row counts bail conservatively.

    The identity ``map_batches`` normalizes blocks to Arrow so
    ``from_arrow_refs`` is safe regardless of the upstream's block
    format; on already-Arrow blocks it is zero-copy.
    """
    arrow = src.map_batches(lambda t: t, batch_format="pyarrow",
                            batch_size=None)
    refs: list = []
    n = 0
    it = arrow.iter_internal_ref_bundles()
    try:
        for bundle in it:
            for block_ref, md in bundle.blocks:
                if md.num_rows is None:
                    return None
                refs.append(block_ref)
                n += md.num_rows
            if n > threshold_rows:
                return None
    finally:
        close = getattr(it, "close", None)
        if close is not None:
            close()
    if not refs or n == 0:
        # don't pin an empty source: blocks of zero rows can carry an
        # unknown schema, and the caller's schema-stable empty path
        # needs the ORIGINAL dataset's column types
        return None
    return rd.from_arrow_refs(refs)
