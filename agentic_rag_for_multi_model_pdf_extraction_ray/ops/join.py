"""Joins: broadcast (small side) first, shuffle join only when both
sides are large.

The reference's only joins are positional pairing and tiny nested
loops (SURVEY.md §2.4); at scale the rules are:

* dimension-table / lookup joins → broadcast: ``ray.put`` the small
  side ONCE on the driver, ``ray.get`` it in each map task (object
  store is shared per node — no per-batch reshipping), merge/map per
  batch.  No shuffle.
* semi/anti joins → broadcast the key set and filter with a vectorized
  ``isin`` mask.
* large⋈large → ``Dataset.join`` (hash-partitioned) with explicit
  ``num_partitions``.
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data as rd


def broadcast_merge(
    ds: rd.Dataset,
    small: pd.DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Broadcast hash join: small side shipped once via ray.put."""
    if columns is not None:
        small = small[list(dict.fromkeys(columns + [right_on]))]
    ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        # ray.get on an owned object is a local object-store read; the
        # small side is shipped to each node once, not per batch
        return batch.merge(ray.get(ref), left_on=left_on, right_on=right_on, how=how)

    return ds.map_batches(merge, batch_format="pandas")


def broadcast_semi_join(ds: rd.Dataset, keys, on: str, anti: bool = False) -> rd.Dataset:
    """Semi (or anti) join against a broadcast key collection."""
    import numpy as np

    arr = np.asarray(list(keys) if not hasattr(keys, "__array__") else keys)
    ref = ray.put(arr)

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[on].isin(ray.get(ref))
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(filt, batch_format="pandas")


def asof_join_broadcast(
    left: rd.Dataset,
    right: pd.DataFrame,
    key: str,
    right_key: str,
    ts: str,
    right_ts: str,
    right_cols: list[str],
) -> rd.Dataset:
    """As-of (backward) join: for each left row, the most recent right
    row with ``right_ts <= ts`` for the same key.

    Broadcast shape: the right side (dimension-like — orders, rates,
    config history) is shipped once via ``ray.put`` sorted by
    (key, ts); each left batch runs one vectorized ``pd.merge_asof``.
    No shuffle.  For two LARGE sides the pattern is hash-bucketing both
    on ``key`` and running this per bucket (the partitioning
    assumption: all rows of a key land in one bucket).

    Right rows must be unique per (key, ts) for deterministic output —
    pre-aggregate the right side (e.g. keep max id per (key, ts)).
    """
    r = right[[right_key, right_ts] + [c for c in right_cols
                                       if c not in (right_key, right_ts)]]
    r = r.sort_values([right_ts, right_key], kind="mergesort").reset_index(drop=True)
    ref = ray.put(r)

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        rt = ray.get(ref)
        lb = batch.sort_values(ts, kind="mergesort")
        out = pd.merge_asof(
            lb, rt, left_on=ts, right_on=right_ts,
            left_by=key, right_by=right_key, direction="backward",
        )
        return out

    return left.map_batches(per_batch, batch_format="pandas")


def sized_join(
    left: rd.Dataset,
    right: rd.Dataset,
    join_type: str,
    on: tuple,
    right_on: tuple | None = None,
    requested_partitions: int = 16,
) -> rd.Dataset:
    """``Dataset.join`` with cluster-aware sizing.

    Ray's hash-shuffle join reserves ~50% of cluster CPUs for its
    aggregator actors BY DEFAULT — two joins in one pipeline (e.g.
    ``verify_pairs``'s pair⋈feature double join) then starve the map
    tasks and deadlock on small sessions.  Cap partitions at
    ``cpus // 2`` and size each aggregator so one join's pool takes
    ≤25% of the cluster."""
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    n = max(2, min(requested_partitions, cpus // 2))
    agg_cpus = min(1.0, max(0.25, cpus / (n * 4)))
    return left.join(
        right,
        join_type=join_type,
        num_partitions=n,
        on=on,
        right_on=right_on,
        aggregator_ray_remote_args={"num_cpus": agg_cpus},
    )


def asof_join_bucketed(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    right_key: str,
    ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 64,
) -> rd.Dataset:
    """LARGE⋈LARGE as-of (backward) join: hash-bucket BOTH sides on
    the key, co-locate with one bounded groupby, vectorized
    ``pd.merge_asof`` per bucket.

    This is the scale path :func:`asof_join_broadcast`'s docstring
    promises — use it when the right side is too big to broadcast.
    Partitioning assumption: ALL rows of a key land in one bucket
    (hash on the key); a key so hot its bucket overflows a worker
    needs time-range sub-bucketing on top.  Right rows must be unique
    per (key, ts) for deterministic output (pre-aggregate upstream).

    Side-specific columns travel TYPED (Arrow blocks, nulls for the
    other side) through the union — int64 payloads survive exactly;
    the round-2 float64-with-NaN carriage silently corrupted int64
    ≥ 2⁵³.  Unmatched rows surface as nulls (pandas nullable Int64 /
    NaN after ``to_pandas``).  Timestamps are normalized to
    microsecond resolution (the engine-wide convention)."""
    import numpy as np
    import pyarrow as pa

    def _arrow_types(ds: rd.Dataset, cols: list[str]) -> dict:
        sch = ds.schema()
        m = dict(zip(sch.names, sch.types))
        out = {}
        for c in cols:
            t = m[c]
            if not isinstance(t, pa.DataType):
                t = pa.from_numpy_dtype(t)  # pandas-backed blocks
            out[c] = t
        return out

    ltypes = _arrow_types(left, left_cols)
    rtypes = _arrow_types(right, right_cols)

    def tag(side: int, k: str, t: str, own: list[str], own_t: dict,
            other: list[str], other_t: dict):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            kv = b.column(k).to_numpy(zero_copy_only=False)
            from pandas.util import hash_array

            kh = hash_array(kv, categorize=False) if kv.dtype == object \
                else hash_array(kv)
            cols = {
                "bk": pa.array((kh % np.uint64(n_buckets)).astype(np.int64)),
                "side": pa.array(np.full(n, side, dtype=np.int8)),
                "k": b.column(k),
                "t": b.column(t).cast(pa.timestamp("us")),
            }
            for c in own:
                cols[c] = b.column(c).cast(own_t[c])
            for c in other:
                cols[c] = pa.nulls(n, type=other_t[c])
            return pa.table(cols)

        return f

    rows = left.map_batches(
        tag(0, key, ts, left_cols, ltypes, right_cols, rtypes),
        batch_format="pyarrow",
    ).union(right.map_batches(
        tag(1, right_key, right_ts, right_cols, rtypes, left_cols, ltypes),
        batch_format="pyarrow",
    ))

    def per_bucket(g: pa.Table) -> pa.Table:
        # ArrowDtype payload columns keep int64 exact through
        # merge_asof (only k/t drive the algorithm; payloads ride)
        df = g.to_pandas(types_mapper=pd.ArrowDtype)
        kt = g.column("k").type
        df["k"] = (df["k"].astype(object) if pa.types.is_string(kt)
                   else df["k"].to_numpy(dtype=kt.to_pandas_dtype()))
        df["t"] = df["t"].astype("datetime64[us]")
        l = df[df["side"] == 0][["k", "t", *left_cols]].sort_values(
            "t", kind="mergesort")
        r = df[df["side"] == 1][["k", "t", *right_cols]].sort_values(
            "t", kind="mergesort")
        if not len(l):
            return pa.table({
                "k": pa.nulls(0, type=kt),
                "t": pa.nulls(0, type=pa.timestamp("us")),
                **{c: pa.nulls(0, type=ltypes[c]) for c in left_cols},
                **{c: pa.nulls(0, type=rtypes[c]) for c in right_cols},
            })
        out = pd.merge_asof(l, r, on="t", by="k", direction="backward",
                            suffixes=("", "_r"))
        return pa.Table.from_pandas(
            out[["k", "t", *left_cols, *right_cols]], preserve_index=False)

    return rows.groupby("bk").map_groups(per_bucket, batch_format="pyarrow")


def range_join_broadcast(
    left: rd.Dataset,
    intervals: pd.DataFrame,
    key: str,
    right_key: str,
    ts: str,
    lo: str,
    hi: str,
    right_cols: list[str],
) -> rd.Dataset:
    """Interval (range) join: one output row per (left row, interval)
    pair with equal key and ``lo <= ts <= hi`` (inclusive both ends —
    SQL ``BETWEEN`` semantics).  Overlapping intervals MULTIPLY
    matches — the many-match semantics a point-in-interval join needs,
    vs the as-of join's exactly-one-backward-match.

    Broadcast shape: the interval side is shipped once via
    ``ray.put``; each left batch runs one vectorized equi-merge on the
    key then a mask.  Per-batch amplification is bounded by the max
    interval count per key — keep the broadcast side dimension-sized;
    for two LARGE sides use :func:`range_join_bucketed`."""
    r = intervals[[right_key, lo, hi] + [c for c in right_cols
                                         if c not in (right_key, lo, hi)]]
    ref = ray.put(r.reset_index(drop=True))

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        rt = ray.get(ref)
        m = batch.merge(rt, left_on=key, right_on=right_key, how="inner")
        return m[(m[ts] >= m[lo]) & (m[ts] <= m[hi])]

    return left.map_batches(per_batch, batch_format="pandas")


def range_join_bucketed(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    right_key: str,
    ts: str,
    lo: str,
    hi: str,
    left_cols: list[str],
    right_cols: list[str],
    bucket_width: int,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """LARGE⋈LARGE interval join, both sides streamed.

    Co-partitioning: a point lands in time bucket ``ts // bucket_width``
    (exactly one); an interval is REPLICATED into every bucket its
    ``[lo, hi]`` span overlaps (amplification ``span/bucket_width + 1``
    — size ``bucket_width`` near the typical interval length).  Rows
    then shuffle once on ``hash(key, time_bucket) % n_buckets``
    (bounded groups, cluster-derived default width) and each group
    runs one vectorized merge + mask.  Each (point, interval) match
    pair coexists in exactly one time bucket (the point's), so the
    output has no duplicates.  ``ts``/``lo``/``hi`` must be numeric
    and mutually comparable (the engine convention: int64 epoch
    microseconds).  Inner semantics; payload columns travel typed
    (Arrow, nulls for the other side) like
    :func:`asof_join_bucketed`."""
    import numpy as np
    import pyarrow as pa

    from .dedup import _shuffle_width

    nb = n_buckets or _shuffle_width(2.0, floor=16)
    W = int(bucket_width)

    def _arrow_types(ds: rd.Dataset, cols: list[str]) -> dict:
        sch = ds.schema()
        m = dict(zip(sch.names, sch.types))
        out = {}
        for c in cols:
            t = m[c]
            if not isinstance(t, pa.DataType):
                t = pa.from_numpy_dtype(t)
            out[c] = t
        return out

    ltypes = _arrow_types(left, left_cols)
    rtypes = _arrow_types(right, right_cols)

    def _bk(kv: np.ndarray, tb: np.ndarray) -> np.ndarray:
        from pandas.util import hash_array

        kh = hash_array(kv, categorize=False) if kv.dtype == object \
            else hash_array(kv)
        mixed = kh + tb.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return (mixed % np.uint64(nb)).astype(np.int64)

    def tag_points(b: pa.Table) -> pa.Table:
        n = b.num_rows
        kv = b.column(key).to_numpy(zero_copy_only=False)
        t = b.column(ts).to_numpy(zero_copy_only=False).astype(np.int64)
        tb = t // W
        cols = {
            "bk": pa.array(_bk(kv, tb)),
            "tb": pa.array(tb),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "k": b.column(key),
            "t": pa.array(t),
            "lo": pa.nulls(n, type=pa.int64()),
            "hi": pa.nulls(n, type=pa.int64()),
        }
        for c in left_cols:
            cols[c] = b.column(c).cast(ltypes[c])
        for c in right_cols:
            cols[c] = pa.nulls(n, type=rtypes[c])
        return pa.table(cols)

    def tag_intervals(b: pa.Table) -> pa.Table:
        kv = b.column(right_key).to_numpy(zero_copy_only=False)
        lov = b.column(lo).to_numpy(zero_copy_only=False).astype(np.int64)
        hiv = b.column(hi).to_numpy(zero_copy_only=False).astype(np.int64)
        tb_lo, tb_hi = lov // W, hiv // W
        reps = np.maximum(tb_hi - tb_lo + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), reps)
        # bucket offsets 0..reps-1 per source row, vectorized
        offs = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        tb = tb_lo[idx] + offs
        take = pa.array(idx)
        n = len(idx)
        cols = {
            "bk": pa.array(_bk(kv[idx], tb)),
            "tb": pa.array(tb),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "k": b.column(right_key).take(take),
            "t": pa.nulls(n, type=pa.int64()),
            "lo": pa.array(lov[idx]),
            "hi": pa.array(hiv[idx]),
        }
        for c in right_cols:
            cols[c] = b.column(c).take(take).cast(rtypes[c])
        for c in left_cols:
            cols[c] = pa.nulls(n, type=ltypes[c])
        return pa.table(cols)

    # coalesce the union before the groupby: the sort's transfer
    # fan-out is quadratic in input block count, and a union doubles it
    rows = left.map_batches(tag_points, batch_format="pyarrow").union(
        right.map_batches(tag_intervals, batch_format="pyarrow")
    ).repartition(_shuffle_width())

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas(types_mapper=pd.ArrowDtype)
        kt = g.column("k").type
        df["k"] = (df["k"].astype(object) if pa.types.is_string(kt)
                   else df["k"].to_numpy(dtype=kt.to_pandas_dtype()))
        empty = pa.table({
            "k": pa.nulls(0, type=kt),
            "t": pa.nulls(0, type=pa.int64()),
            **{c: pa.nulls(0, type=ltypes[c]) for c in left_cols},
            "lo": pa.nulls(0, type=pa.int64()),
            "hi": pa.nulls(0, type=pa.int64()),
            **{c: pa.nulls(0, type=rtypes[c]) for c in right_cols},
        })
        pts = df[df["side"] == 0][["k", "tb", "t", *left_cols]]
        ivs = df[df["side"] == 1][["k", "tb", "lo", "hi", *right_cols]]
        if not len(pts) or not len(ivs):
            return empty
        m = pts.merge(ivs, on=["k", "tb"], how="inner")
        if not len(m):
            return empty
        t = m["t"].to_numpy(dtype=np.int64)
        m = m[(t >= m["lo"].to_numpy(dtype=np.int64))
              & (t <= m["hi"].to_numpy(dtype=np.int64))]
        return pa.Table.from_pandas(
            m[["k", "t", *left_cols, "lo", "hi", *right_cols]],
            preserve_index=False)

    return rows.groupby("bk").map_groups(per_bucket, batch_format="pyarrow")


def shuffle_anti_join(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    on: str,
    right_on: str,
    num_partitions: int = 16,
) -> rd.Dataset:
    """EXACT anti join at scale: left_outer against the (distinct)
    right key column with a match marker, keep null-marker rows.

    The Bloom anti-join (``bloom_semi_join`` inverted) is only a
    pre-filter — its false positives would wrongly DROP left rows —
    so the exact form shuffles.  Pass an already-distinct right side
    (``ops.dedup.distinct_column``) so the join output stays one row
    per left row."""

    def mark(b: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        return pd.DataFrame({right_on: b[right_on].to_numpy(),
                             "__matched": np.ones(len(b), dtype=np.int8)})

    marked = right_keys.map_batches(mark, batch_format="pandas")
    j = sized_join(left, marked, "left_outer", on=(on,), right_on=(right_on,),
                   requested_partitions=num_partitions)

    def keep_unmatched(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["__matched"].isna()].drop(columns=["__matched"])

    return j.map_batches(keep_unmatched, batch_format="pandas")


def shuffle_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Large⋈large hash-partitioned join (both sides shuffled)."""
    return sized_join(
        left,
        right,
        join_type,
        on=(on,),
        right_on=(right_on,) if right_on else None,
        requested_partitions=num_partitions,
    )
