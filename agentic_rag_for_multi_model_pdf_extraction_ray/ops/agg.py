"""Partial (combiner-style) aggregation.

A bare ``groupby(key).aggregate(...)`` shuffles every row.  At 100 TB
the right shape is: compute per-batch partial aggregates inside
``map_batches`` (one row per key per batch), then run the small global
``groupby`` over the partials — the exchange moves ``#keys × #batches``
rows instead of every row.  The reference's only aggregations are tiny
driver-side counters (SURVEY.md §2.5 A1-A5); this is their
scale-correct generalization.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def partial_groupby_sum_count(
    ds: rd.Dataset,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str = "n",
    batch_size: int | None = None,
) -> rd.Dataset:
    """groupby(keys) with Sum over ``sum_cols`` ({src_col: out_name})
    and a row count — pre-aggregated per batch, then merged globally.

    Returns one row per key combination with the requested output
    column names (sums exact; count exact).  ``batch_size=None``
    (default) combines WHOLE BLOCKS: the win is #rows → #keys×#blocks,
    and small fixed batches would emit ~min(batch, #keys) rows each —
    no reduction at all, just overhead (measured: 1024-row batches
    made a 3,600-group combine slower than the direct groupby; forced
    65k batches paid more in rebatching).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False, sort=False).agg(
            **{out: (src, "sum") for src, out in sum_cols.items()},
            __pc=(keys[0], "size"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    aggs = [Sum(out, alias_name=out) for out in sum_cols.values()]
    aggs.append(Sum("__pc", alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def groupby_aggregate(ds: rd.Dataset, keys: list[str], *aggs) -> rd.Dataset:
    """Direct grouped aggregate (Ray already pushes partial aggregation
    into the map side for its built-in AggregateFns); kept as the
    simple spelling for Min/Max/Count shapes."""
    return ds.groupby(keys if len(keys) > 1 else keys[0]).aggregate(*aggs)


__all__ = ["partial_groupby_sum_count", "groupby_aggregate", "Sum", "Min", "Max", "Count"]
