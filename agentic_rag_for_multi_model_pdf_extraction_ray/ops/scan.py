"""Distributed prefix scan (running aggregates over a global order) —
the primitive behind event-time watermarks, running totals/budget
caps, and CDF construction in a streaming log pipeline.  Ray Data has
no window functions; the reference is strictly batch (SURVEY.md §2.8).

Shape — the classic two-level scan, nothing corpus-sized on the
driver:

  1. bucket by ``order // bucket_width`` (fixed-width ranges of the
     order key — one cheap map pass, no sort),
  2. per-bucket partials (one tiny row per bucket) → driver-side
     EXCLUSIVE scan over the ≤ #buckets partials,
  3. broadcast the bucket offsets; ``groupby(bucket).map_groups``
     sorts each bucket internally and accumulates, seeded with its
     bucket's offset.

Partitioning assumptions: the order key is integer-comparable and
roughly dense (fixed-width buckets stay balanced; a wildly skewed key
needs quantile buckets instead), and one bucket fits a worker
(``bucket_width`` rows).

Exactness: for ``op="sum"`` on float columns pass ``scale`` (e.g. 100
for cents) so partial sums are exact int64 and the result is
independent of distribution — and exactly mirrorable by a DuckDB
``sum(...) OVER (ORDER BY ...)`` window oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_OPS = {"sum", "max"}


def _quantile_edges(src: rd.Dataset, order_col: str,
                    n_buckets: int, per_block: int = 256) -> np.ndarray:
    """Sampled quantile cut points for range-bucketing a skewed order
    key: a strided per-block sample (≤ ``per_block`` values each — the
    driver sees O(blocks × per_block) numbers, never the column) →
    ``n_buckets - 1`` interior quantiles.  Edge quality only affects
    LOAD BALANCE, never correctness — any monotone bucketing of the
    order axis yields the same scan."""

    def sample(t: pa.Table) -> pa.Table:
        o = t.column(order_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        stride = max(1, len(o) // per_block)
        return pa.table({"o": pa.array(o[::stride])})

    rows = (src.select_columns([order_col])
            .map_batches(sample, batch_format="pyarrow", batch_size=None)
            .take_all())
    samp = np.array([r["o"] for r in rows], dtype=np.int64)
    if not len(samp):
        return np.empty(0, dtype=np.int64)
    qs = np.quantile(samp, np.linspace(0, 1, n_buckets + 1)[1:-1])
    return np.unique(qs.astype(np.int64))


def prefix_scan(ds: rd.Dataset, order_col: str, value_col: str,
                op: str = "sum", bucket_width: int = 65536,
                scale: int | None = None,
                alias: str | None = None,
                quantile_buckets: int | None = None) -> rd.Dataset:
    """Add ``alias`` (default ``running_<op>``) = inclusive running
    aggregate of ``value_col`` in ``order_col`` order.

    Bucketing: by default fixed-width ranges of the order key
    (``order // bucket_width`` — cheap, but assumes a roughly dense
    key).  For a SKEWED order key pass ``quantile_buckets=N``:
    sampled quantile edges split the order axis into N range buckets
    of roughly equal row count regardless of the key distribution
    (the sample is bounded per block; edges are broadcast once).
    Bucket assignment stays monotone in the order value either way,
    which is all the two-level scan's correctness needs."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")
    alias = alias or f"running_{op}"

    if quantile_buckets is not None:
        # materialize once so the sampling pass doesn't recompute the
        # upstream pipeline (same trade as the bucketed materialize
        # below; at 100 TB the alternative is one extra upstream pass)
        src = ds.materialize()
        edges = _quantile_edges(src, order_col, quantile_buckets)
        e_ref = ray.put(edges)

        def add_bucket(t: pa.Table) -> pa.Table:
            order = t.column(order_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            bk = np.searchsorted(ray.get(e_ref), order, side="right")
            return t.append_column("__bk", pa.array(bk.astype(np.int64)))

        bucketed = src.map_batches(add_bucket,
                                   batch_format="pyarrow").materialize()
    else:
        def add_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            order = t.column(order_col).cast(pa.int64())
            # integer divide truncates = floor for the non-negative
            # keys this operator supports
            return t.append_column("__bk", pc.divide(order, bucket_width))

        bucketed = ds.map_batches(add_bucket,
                                  batch_format="pyarrow").materialize()

    def _vals(b: pd.DataFrame) -> np.ndarray:
        v = b[value_col].to_numpy()
        if scale is not None:
            # half-up, mirroring the SQL floor(x*scale + 0.5) oracle
            # convention (np.rint would round halves to even)
            return np.floor(np.asarray(v, dtype=np.float64) * scale
                            + 0.5).astype(np.int64)
        return v

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        v = _vals(b)
        g = b.groupby("__bk", sort=False)
        idx = g.indices
        rows = {"__bk": [], "p": []}
        for bk, ii in idx.items():
            rows["__bk"].append(bk)
            rows["p"].append(v[ii].sum() if op == "sum" else v[ii].max())
        return pd.DataFrame(rows)

    part = bucketed.map_batches(partials, batch_format="pandas",
                                batch_size=None).to_pandas()
    part = part.groupby("__bk")["p"].agg("sum" if op == "sum" else "max")
    part = part.sort_index()
    if op == "sum":
        offsets = part.cumsum().shift(1, fill_value=0)
    else:
        offsets = part.cummax().shift(1)  # NaN for the first bucket
    off_ref = ray.put(dict(offsets))

    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        bk = int(g["__bk"].iloc[0])
        g = g.sort_values(order_col, kind="mergesort")
        v = _vals(g)
        if op == "sum":
            run = np.cumsum(v) + offs.get(bk, 0)
            if scale is not None:
                run = run / scale
        else:
            run = np.maximum.accumulate(v)
            prev = offs.get(bk, None)
            if prev is not None and not pd.isna(prev):
                run = np.maximum(run, prev)
            if scale is not None:
                # undo the fixed-point scaling, same as the sum branch
                # (running max of scaled values == scaled running max —
                # scaling is monotone)
                run = run / scale
        out = g.drop(columns=["__bk"]).copy()
        out[alias] = run
        return out

    from .dedup import _shuffle_width

    # repartition after the map_groups: the groupby emits one block per
    # bucket plus schema-less EMPTY blocks for empty partitions, and a
    # downstream groupby/join over that ragged block list measurably
    # degrades (5.4 s -> 2.3 s for the watermark window's tumbling
    # aggregate at sf0.1) or errors outright ([[ray-local-pitfalls]]).
    # Cluster-derived width; plain (split/merge) repartition, no shuffle.
    return (bucketed.groupby("__bk")
            .map_groups(scan_group, batch_format="pandas")
            .repartition(_shuffle_width(1.0)))
