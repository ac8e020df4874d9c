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


def shuffle_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Large⋈large hash-partitioned join (both sides shuffled)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )
