"""Distributed prefix scan (running aggregates over a global order) —
the primitive behind event-time watermarks, running totals/budget
caps, and CDF construction in a streaming log pipeline.  Ray Data has
no window functions; the reference is strictly batch (SURVEY.md §2.8).

Shape — the classic two-level scan, nothing corpus-sized pinned or
driver-resident:

  1. one PRUNED profiling pass over just the order column (per-block
     row counts + strided samples, O(blocks × 256) numbers at the
     driver) derives a BOUNDED set of range-bucket edges — quantile
     cut points of the sampled order key, so skewed keys balance
     automatically; bucket count scales with sampled row count
     (``rows_per_bucket``) and is hard-capped at ``_MAX_BUCKETS`` so
     the offsets broadcast stays trivial at any corpus size,
  2. a partials pass computes ``__bk = searchsorted(edges, order)``
     inline and reduces to one tiny row per (block, bucket); a
     coalesce + re-combine bounds what the driver collects at
     O(width × buckets) even on a million-block corpus; the driver
     runs an EXCLUSIVE scan over the ≤ ``_MAX_BUCKETS`` bucket
     partials,
  3. the bucket offsets are broadcast ONCE as parallel sorted arrays
     (``searchsorted`` lookup, no per-bucket dict);
     ``groupby(bucket).map_groups`` sorts each bucket internally and
     accumulates, seeded with its bucket's offset.

The source dataset is consumed THREE times (profile, partials, scan).
Above ``pin_threshold_rows`` it is never materialized — each pass
streams with backpressure, which is the 100 TB trade: re-reading a
pruned column beats pinning the corpus in the object store.  The
default ``pin="auto"`` decides with a COUNTED pin
(:func:`..util.counted_pin`): stream the source's block refs once, holding
them, and bail out the moment the running row count exceeds the
threshold — so a small source pays exactly ONE upstream execution
(profile/partials/scan then read the pinned blocks; re-reads dominate
at small scale, interleaved A/B: ~40-60% slower unpinned at 1M rows)
while a huge source wastes at most ~threshold rows of partial work
before the three passes stream as before.  For an EXPENSIVE computed
upstream pass ``pin=True`` to materialize up-front regardless of
size; ``pin=False`` forces pure streaming.

Partitioning assumptions: the order key is integer-comparable, and
one bucket (≈ ``rows_per_bucket`` rows, or corpus/``_MAX_BUCKETS`` at
extreme scale) fits a worker for the in-bucket sort.

Exactness: for ``op="sum"`` on float columns pass ``scale`` (e.g. 100
for cents) so partial sums are exact int64 and the result is
independent of distribution — and exactly mirrorable by a DuckDB
``sum(...) OVER (ORDER BY ...)`` window oracle.  Bucket-edge
placement is sampled, but any monotone bucketing of the order axis
yields the same scan, so edge quality only affects load balance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..util import counted_pin

_OPS = {"sum", "max"}

# Hard cap on scan buckets: bounds the offsets broadcast (64Ki int64s
# ≈ 1 MB), the driver-side partial table, and the group count of the
# final map_groups.  At 10^12 rows this means ~15M-row buckets — a
# worker-sortable block — while small inputs derive far fewer buckets
# via rows_per_bucket.
_MAX_BUCKETS = 65536


def prefix_scan(ds: rd.Dataset, order_col: str, value_col: str,
                op: str = "sum", bucket_width: int | None = None,
                scale: int | None = None,
                alias: str | None = None,
                quantile_buckets: int | None = None,
                rows_per_bucket: int = 262144,
                pin: bool | str = "auto",
                pin_threshold_rows: int = 8_000_000) -> rd.Dataset:
    """Add ``alias`` (default ``running_<op>``) = inclusive running
    aggregate of ``value_col`` in ``order_col`` order.

    Bucketing: by default, quantile edges sampled from the order
    column with bucket count derived from the sampled row count
    (``ceil(rows / rows_per_bucket)``, clamped to
    [cluster width, ``_MAX_BUCKETS``]) — skewed keys balance
    automatically and the bucket count is bounded at any scale.
    ``quantile_buckets=N`` forces an explicit bucket count;
    ``bucket_width=W`` forces fixed-width ranges of the key (edges at
    multiples of W over the sampled range, widened if the range/W
    would exceed the cap).  Bucket assignment stays monotone in the
    order value in every mode, which is all the two-level scan's
    correctness needs.

    Pinning: ``pin="auto"`` (default) runs a COUNTED pin — the source
    executes once while its block refs are held, and the pin is
    abandoned mid-stream if the running row count passes
    ``pin_threshold_rows``.  A small source therefore pays exactly one
    upstream execution (the profile then reads the pinned blocks; the
    round-5 interleaved A/B measured three streaming re-reads ~40-60%
    slower than the pin at 1M rows), while above the threshold at most
    ~threshold rows of partial work are discarded and every pass
    streams — pinning a 100 TB corpus is the anti-pattern the
    streaming path exists to avoid.  ``pin=True`` materializes
    up-front regardless of size (for expensive computed upstreams);
    ``pin=False`` never materializes."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")
    alias = alias or f"running_{op}"
    if pin is True:
        ds = ds.materialize()
    elif pin == "auto":
        pinned = counted_pin(ds, pin_threshold_rows)
        if pinned is not None:
            ds = pinned

    from .dedup import _shuffle_width

    n_rows, samp = _profile(ds, order_col)
    if n_rows == 0:
        # degenerate empty source: tag the alias column and return
        # (note: Ray 2.49 itself drops schema through map_batches over
        # zero-row blocks, so downstream .to_pandas() may still see no
        # columns — rows are what's contractual here)
        def tag_empty(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            out[alias] = np.float64() if scale else np.int64()
            return out
        return ds.map_batches(tag_empty, batch_format="pandas")

    width = max(1, int(_shuffle_width(1.0)))
    if quantile_buckets is not None:
        n_buckets = int(min(max(1, quantile_buckets), _MAX_BUCKETS))
        qs = np.quantile(samp, np.linspace(0, 1, n_buckets + 1)[1:-1])
        edges = np.unique(qs.astype(np.int64))
    elif bucket_width is not None:
        lo, hi = int(samp.min()), int(samp.max())
        span = hi - lo + 1
        w_eff = max(int(bucket_width), -(-span // _MAX_BUCKETS))
        # edges at multiples of w_eff so the bucketing matches the
        # documented fixed-width semantics over the sampled range
        first = (lo // w_eff + 1) * w_eff
        edges = np.arange(first, hi + 1, w_eff, dtype=np.int64)
    else:
        n_buckets = int(min(max(width, -(-n_rows // rows_per_bucket)),
                            _MAX_BUCKETS))
        qs = np.quantile(samp, np.linspace(0, 1, n_buckets + 1)[1:-1])
        edges = np.unique(qs.astype(np.int64))
    e_ref = ray.put(edges)

    def _bk(order: np.ndarray) -> np.ndarray:
        return np.searchsorted(ray.get(e_ref), order, side="right")

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
        bk = _bk(b[order_col].to_numpy(dtype=np.int64, na_value=0))
        order = np.argsort(bk, kind="stable")
        bks, starts = np.unique(bk[order], return_index=True)
        agg = (np.add if op == "sum" else np.maximum).reduceat(
            v[order], starts)
        return pd.DataFrame({"__bk": bks, "p": agg})

    def recombine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("__bk", sort=True)["p"]
        out = (g.sum() if op == "sum" else g.max()).reset_index()
        return out

    # partials stream per block; a coalesce + per-block re-combine
    # bounds the driver collection at O(width × buckets) rows even
    # when the corpus has millions of blocks
    part = (ds.map_batches(partials, batch_format="pandas",
                           batch_size=None)
            .repartition(width)
            .map_batches(recombine, batch_format="pandas",
                         batch_size=None)
            .to_pandas())
    part = part.groupby("__bk")["p"].agg("sum" if op == "sum" else "max")
    part = part.sort_index()
    bks_sorted = part.index.to_numpy(dtype=np.int64)
    if op == "sum":
        offs = part.cumsum().shift(1, fill_value=0).to_numpy()
        valid = np.ones(len(offs), dtype=bool)
    else:
        shifted = part.cummax().shift(1)
        valid = ~shifted.isna().to_numpy()
        offs = shifted.fillna(0).to_numpy()
    off_ref = ray.put((bks_sorted, offs, valid))

    def add_bucket(t: pa.Table) -> pa.Table:
        order = t.column(order_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # strip pandas schema metadata: pa.Schema with a metadata dict
        # is UNHASHABLE, which defeats Ray's sort-stage schema
        # deduplication (the "Failed to hash the schemas" warning wall
        # in every reduce) — round-4 verdict housekeeping item
        return t.replace_schema_metadata(None).append_column(
            "__bk", pa.array(_bk(order).astype(np.int64)))

    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        bks, offarr, validarr = ray.get(off_ref)
        bk = int(g["__bk"].iloc[0])
        pos = int(np.searchsorted(bks, bk))
        has = pos < len(bks) and bks[pos] == bk
        g = g.sort_values(order_col, kind="mergesort")
        v = _vals(g)
        if op == "sum":
            run = np.cumsum(v) + (offarr[pos] if has else 0)
            if scale is not None:
                run = run / scale
        else:
            run = np.maximum.accumulate(v)
            if has and validarr[pos]:
                run = np.maximum(run, offarr[pos])
            if scale is not None:
                # undo the fixed-point scaling, same as the sum branch
                # (running max of scaled values == scaled running max —
                # scaling is monotone)
                run = run / scale
        out = g.drop(columns=["__bk"]).copy()
        out[alias] = run
        return out

    # repartition after the map_groups: the groupby emits one block per
    # bucket plus schema-less EMPTY blocks for empty partitions, and a
    # downstream groupby/join over that ragged block list measurably
    # degrades (5.4 s -> 2.3 s for the watermark window's tumbling
    # aggregate at sf0.1) or errors outright ([[ray-local-pitfalls]]).
    # Cluster-derived width; plain (split/merge) repartition, no shuffle.
    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bk")
            .map_groups(scan_group, batch_format="pandas")
            .repartition(width))


def _profile(src: rd.Dataset, order_col: str,
             per_block: int = 256) -> tuple[int, np.ndarray]:
    """One pruned streaming pass over ``order_col``: exact total row
    count + a strided per-block sample.  Each block emits its row
    count on its FIRST sample row and 0 on the rest, so the driver
    recovers the exact total by summing — no block-boundary
    bookkeeping, O(blocks × per_block) numbers at the driver."""

    def sample(t: pa.Table) -> pa.Table:
        o = t.column(order_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        stride = max(1, len(o) // per_block)
        s = o[::stride]
        n = np.zeros(len(s), dtype=np.int64)
        if len(n):
            n[0] = len(o)
        return pa.table({"n": pa.array(n), "o": pa.array(s)})

    rows = (src.select_columns([order_col])
            .map_batches(sample, batch_format="pyarrow", batch_size=None)
            .take_all())
    if not rows:
        return 0, np.empty(0, dtype=np.int64)
    samp = np.array([r["o"] for r in rows], dtype=np.int64)
    total = int(sum(int(r["n"]) for r in rows))
    return total, samp
