"""Deterministic sampling + exact order statistics + heavy hitters.

Training-data operators with exact cross-engine semantics (every one
has a DuckDB oracle):

* :func:`bernoulli_sample` — hash-based deterministic sampling: keep a
  row iff ``(int(md5(key)[:8],16) % 10^6) / 10^6 < rate``.  Unlike
  ``ds.random_sample`` this is reproducible across engines, runs and
  partitionings (the property corpus sampling needs for lineage).
* :func:`stratified_head` — first-N per group in a deterministic
  order (SQL ``row_number() over (partition by g order by k)``).
* :func:`grouped_median` — exact per-group median via in-group sort
  (groups fit in memory by assumption; no sums → no float-order
  issues).
* :func:`top_tokens` — corpus heavy hitters: per-batch token counts
  (pre-aggregation) → bounded hash-bucketed reduce with per-bucket
  top-k → driver merges ≤ buckets×k rows, with deterministic
  tie-break (count desc, token asc).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd


_MOD = 1_000_000


def _hash_frac(keys: pd.Series) -> pd.Series:
    return keys.map(
        lambda k: (int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % _MOD) / _MOD
    )


def bernoulli_sample(ds: rd.Dataset, key_col: str, rate: float) -> rd.Dataset:
    """SQL mirror: ``WHERE (('0x'||substr(md5(key),1,8))::BIGINT % 1000000)
    / 1000000.0 < rate``."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[_hash_frac(batch[key_col]) < rate]

    return ds.map_batches(f, batch_format="pandas")


def stratified_head(ds: rd.Dataset, group_col: str, order_col, n: int,
                    ascending=True, n_buckets: int = 256) -> rd.Dataset:
    """First n rows per group in a deterministic order (SQL
    ``row_number() over (partition by g order by ...)``); pass lists
    for multi-column ordering / top-N-by-value.

    Scale shape: each batch first keeps at most n rows per group (the
    global per-group top-n is a subset of the union of per-batch
    top-ns — a combiner, so the shuffle moves ≤ n×#groups×#batches
    rows), then groups are hash-bucketed into a BOUNDED number of
    map_groups calls, each resolving ALL its groups in one vectorized
    sort+head (per-group map_groups overhead dominates for many small
    groups)."""
    order_cols = order_col if isinstance(order_col, list) else [order_col]

    def local_prune(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(order_cols, ascending=ascending, kind="mergesort")
        b = b.groupby(group_col, sort=False).head(n).copy()
        b["__bk"] = (pd.util.hash_array(b[group_col].to_numpy())
                     % np.uint64(n_buckets)).astype(np.int64)
        return b

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, ascending=ascending, kind="mergesort")
        return g.groupby(group_col, sort=False).head(n).drop(columns="__bk")

    return (ds.map_batches(local_prune, batch_format="pandas",
                           batch_size=None)
            .groupby("__bk")
            .map_groups(per_bucket, batch_format="pandas"))


def grouped_median(ds: rd.Dataset, group_col: str, value_col: str,
                   alias: str = "median") -> rd.Dataset:
    """Exact per-group median (average of middle two for even counts —
    DuckDB ``median`` semantics for numeric types)."""

    def med(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            group_col: [group[group_col].iloc[0]],
            alias: [float(np.median(group[value_col].to_numpy()))],
        })

    return ds.groupby(group_col).map_groups(med, batch_format="pandas")


def weighted_bernoulli_sample(ds: rd.Dataset, key_col: str, weight_col: str,
                              target_k: int) -> rd.Dataset:
    """Weight-proportional sampling with expected size ``target_k``:
    keep a row iff ``hash_frac(key) < target_k · w / Σw`` — the
    quality-weighted corpus sampling a training-data pipeline uses
    (weight = doc length, quality score, ...).

    Deterministic and exactly SQL-mirrorable: the hash fraction is the
    same md5 construction as :func:`bernoulli_sample`, Σw is an exact
    integer sum (one tiny aggregate — no driver loop), and the
    threshold expression is evaluated with the same float64 op order
    as the DuckDB oracle.

    Rows whose ``target_k·w/Σw > 1`` are kept with probability 1
    (clipped), so for heavy-tailed weights the realized expected size
    undershoots ``target_k`` — use weighted reservoir sampling when an
    exact count matters."""
    total = ds.sum(weight_col)
    if total is None:  # empty dataset: Dataset.sum returns None
        return ds
    total = int(total)

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        hf = _hash_frac(batch[key_col]).to_numpy()
        w = batch[weight_col].to_numpy()
        thr = (target_k * w * 1.0) / total
        return batch[hf < thr]

    return ds.map_batches(filt, batch_format="pandas")


def grouped_median_histogram(ds: rd.Dataset, group_col: str, value_col: str,
                             alias: str = "median", scale: int = 100) -> rd.Dataset:
    """Exact per-group median for FIXED-PRECISION values (e.g. cents)
    via mergeable partial histograms — the scale path for
    :func:`grouped_median`, whose in-group sort holds one full group
    in memory (~20% of a 100 TB table for 5 event types).

    Per batch: (group, int(value·scale)) counts (pre-aggregated
    map-side) → groupby(group) merges the tiny histograms → median
    from cumulative counts.  Memory per group is bounded by the number
    of DISTINCT values, not the row count.  Exact when every value is
    a multiple of 1/scale (asserted); DuckDB ``median`` semantics
    (average of the two middle values for even counts, computed on the
    reconstructed float64s)."""

    def partial_hist(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        iv = np.rint(v * scale)
        if not np.allclose(iv / scale, v, rtol=0, atol=1e-9):
            raise ValueError(
                f"{value_col} is not fixed-precision at scale={scale}; "
                "grouped_median_histogram would be approximate — use "
                "grouped_median instead")
        df = pd.DataFrame({group_col: batch[group_col],
                           "iv": iv.astype(np.int64)})
        g = df.groupby([group_col, "iv"], sort=False).size().reset_index(name="n")
        return g

    def merge_median(group: pd.DataFrame) -> pd.DataFrame:
        h = group.groupby("iv", sort=True)["n"].sum()
        counts = h.to_numpy()
        vals = h.index.to_numpy().astype(np.float64) / scale
        cum = np.cumsum(counts)
        total = int(cum[-1])
        if total % 2:
            m = float(vals[np.searchsorted(cum, total // 2 + 1)])
        else:
            a = vals[np.searchsorted(cum, total // 2)]
            b = vals[np.searchsorted(cum, total // 2 + 1)]
            m = float((a + b) / 2.0)
        return pd.DataFrame({group_col: [group[group_col].iloc[0]], alias: [m]})

    return (
        ds.map_batches(partial_hist, batch_format="pandas", batch_size=None)
        .groupby(group_col)
        .map_groups(merge_median, batch_format="pandas")
    )


def grouped_quantiles_histogram(ds: rd.Dataset, group_col: str, value_col: str,
                                quantiles: dict[str, float],
                                scale: int = 100) -> rd.Dataset:
    """Exact per-group discrete quantiles for fixed-precision values
    via the same mergeable partial histograms as
    :func:`grouped_median_histogram` — one pass, any number of
    quantiles, per-group memory bounded by distinct values.

    DuckDB ``quantile_disc`` semantics: the value at 1-based position
    ``max(1, ceil(q·n))`` of the sorted group.  ``quantiles`` maps
    output column name → q."""

    def partial_hist(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        iv = np.rint(v * scale)
        if not np.allclose(iv / scale, v, rtol=0, atol=1e-9):
            raise ValueError(
                f"{value_col} is not fixed-precision at scale={scale}")
        df = pd.DataFrame({group_col: batch[group_col],
                           "iv": iv.astype(np.int64)})
        return df.groupby([group_col, "iv"], sort=False).size().reset_index(name="n")

    def merge_q(group: pd.DataFrame) -> pd.DataFrame:
        h = group.groupby("iv", sort=True)["n"].sum()
        counts = h.to_numpy()
        vals = h.index.to_numpy().astype(np.float64) / scale
        cum = np.cumsum(counts)
        total = int(cum[-1])
        out = {group_col: [group[group_col].iloc[0]]}
        for name, q in quantiles.items():
            pos = max(1, int(np.ceil(q * total)))
            out[name] = [float(vals[np.searchsorted(cum, pos)])]
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial_hist, batch_format="pandas", batch_size=None)
        .groupby(group_col)
        .map_groups(merge_q, batch_format="pandas")
    )


def top_tokens(ds: rd.Dataset, text_col: str, k: int = 20,
               n_buckets: int = 256) -> pd.DataFrame:
    """Top-k whitespace tokens by total count across the corpus.

    Shape: per-batch explode + LOCAL count (the combiner — the shuffle
    moves one row per distinct token per batch, never per occurrence)
    → hash-bucketed groupby (``n_buckets`` reduce groups, NOT one per
    distinct token) → per-bucket vectorized sum + top-k inside
    ``map_groups`` → driver merges at most ``n_buckets × k`` rows.

    A token hashes to exactly one bucket, so each bucket's top-k is
    computed over that token's complete global count and the union of
    per-bucket top-k's contains the global top-k.  The previous shape
    (``groupby("token")`` then ``to_pandas()``) pulled EVERY distinct
    token's total to the driver — billions of rows on a web corpus.
    ``n_buckets`` trades per-group map_groups overhead (~5 ms/group
    locally) against per-bucket memory (distinct_tokens / n_buckets
    rows per group at the reduce); 256 keeps both comfortable from sf
    test sizes up to ~10^9-token vocabularies."""
    parts = top_tokens_parts(ds, text_col, k, n_buckets).to_pandas()
    out = parts.sort_values(["n", "token"], ascending=[False, True]).head(k)
    return out[["token", "n"]].reset_index(drop=True)


def top_tokens_parts(ds: rd.Dataset, text_col: str, k: int,
                     n_buckets: int) -> rd.Dataset:
    """The distributed part of :func:`top_tokens`: per-bucket top-k
    candidate rows (``token``, ``n``, ``bk``), at most ``n_buckets × k``
    of them — the only rows that ever reach the driver."""
    from ..functions.hashing import hash_tokens

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.split()
        exploded = toks.explode().dropna()
        counts = exploded.value_counts()
        tok = counts.index.to_numpy()
        bk = hash_tokens(tok) % np.uint64(n_buckets)
        return pd.DataFrame(
            {"token": tok, "n": counts.to_numpy(), "bk": bk.astype(np.int64)}
        )

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        totals = g.groupby("token", sort=False)["n"].sum().reset_index()
        totals["bk"] = g["bk"].iloc[0]
        return totals.sort_values(
            ["n", "token"], ascending=[False, True]
        ).head(k)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("bk")
        .map_groups(bucket_topk, batch_format="pandas")
    )


def weighted_reservoir_sample(ds: rd.Dataset, key_col: str, weight_col: str,
                              k: int) -> rd.Dataset:
    """EXACTLY-k weight-proportional sample (Efraimidis–Spirakis A-ES):
    each row draws ``u = hash_frac(key)`` and scores ``u^(1/w)``; the
    global top-k scores are the sample.  Deterministic (hash-derived
    u), exact size (unlike :func:`weighted_bernoulli_sample`'s
    expected-size threshold), and distributed as per-batch partial
    top-k → one tiny global merge — no shuffle.

    Cross-engine exactness: the score is ROUNDED to int64 at 1e9 and
    ties break on the key, so a last-ulp ``pow`` difference between
    numpy and the SQL oracle cannot flip the selection:
    ``ORDER BY CAST(floor(power(u, 1.0/w) * 1e9) AS BIGINT) DESC, key
    LIMIT k``.  Rows with non-positive weight are excluded."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = np.asarray(batch[weight_col].to_numpy(), dtype=np.float64)
        keep = w > 0
        sub = batch[keep]
        if not len(sub):
            return sub.assign(__rk=pd.Series(dtype="int64"))
        u = _hash_frac(sub[key_col]).to_numpy()
        score = np.floor(np.power(u, 1.0 / w[keep]) * 1e9).astype(np.int64)
        out = sub.assign(__rk=score)
        return out.sort_values(["__rk", key_col],
                               ascending=[False, True]).head(k)

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(partials):
        # keep the output schema input-independent: the internal score
        # column must not leak on the empty/all-filtered path either
        return rd.from_pandas(
            partials.drop(columns=["__rk"], errors="ignore"))
    top = (partials.sort_values(["__rk", key_col], ascending=[False, True])
           .head(k).drop(columns=["__rk"]).reset_index(drop=True))
    return rd.from_pandas(top)
