"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time machinery (and the reference is strictly
batch, SURVEY.md §2.8); windows are expressed per the Ray guide:
tumbling windows = truncate-timestamp groupby; session windows =
``groupby(key).map_groups`` over ts-sorted groups.  Both have exact
DuckDB oracles (date_trunc / lag+gap window functions).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

SESSION_GAP_SEC = 1800


def tumbling_window(events: rd.Dataset, key: str = "event_type",
                    freq: str = "h") -> rd.Dataset:
    """Count + sum(value) per (key, window-start-hour).

    ``freq`` accepts a pandas-style offset alias with an optional
    integer multiple over second/minute/hour/day units — "h", "2h",
    "30min", "1d", "90s" (the round-3 Arrow rewrite had narrowed the
    accepted set to bare {"h","min","d"}; multiples are restored via
    ``floor_temporal(multiple=...)``).

    window column is a formatted string so the Arrow/DuckDB timestamp
    unit mismatch can't bite the comparison.
    """
    import re

    from ..functions.rounding import cents

    m = re.fullmatch(r"(\d*)(s|sec|min|t|h|d)",
                     freq.strip().lower())
    if not m:
        raise ValueError(
            "freq must be an integer multiple of s/min/h/d "
            f"(e.g. 'h', '2h', '30min', '1d'); got {freq!r}")
    _mult = int(m.group(1) or 1)
    _UNIT = {"s": "second", "sec": "second", "min": "minute",
             "t": "minute", "h": "hour", "d": "day"}[m.group(2)]

    def add_window(batch: pa.Table) -> pa.Table:
        # Arrow-native (zero-copy in): floor_temporal + strftime in C,
        # exact integer cents → order-independent distributed sums
        ts = batch.column("ts").cast(pa.timestamp("us"))
        # cast the floored stamp to seconds — Arrow's %S prints
        # fractional digits for sub-second units
        w = pc.strftime(
            pc.floor_temporal(ts, multiple=_mult, unit=_UNIT)
            .cast(pa.timestamp("s")),
            format="%Y-%m-%d %H:%M:%S")
        return pa.table({
            key: batch.column(key),
            "window_start": w,
            "value_cents": pa.array(cents(batch.column("value").to_numpy())),
        })

    def finish(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "sum_value", pc.divide(batch.column("value_cents").cast(pa.float64()), 100.0)
        ).drop_columns(["value_cents"])

    from .agg import partial_groupby_sum_count

    return (
        partial_groupby_sum_count(
            events.map_batches(add_window, batch_format="pyarrow"),
            [key, "window_start"], {"value_cents": "value_cents"},
            count_alias="n",
        )  # map-side combine: the shuffle moves #keys×#windows rows
        # per batch, not every event (Ray's sort-based groupby sorts
        # raw rows otherwise)
        .map_batches(finish, batch_format="pyarrow")
    )


def hopping_window(events: rd.Dataset, key: str = "event_type",
                   window_sec: int = 3600, hop_sec: int = 900) -> rd.Dataset:
    """Hopping (sliding) windows: count + sum(value) per (key,
    window_start) where windows are ``window_sec`` long and start
    every ``hop_sec`` (window_sec must be a multiple of hop_sec).

    Each event belongs to exactly window/hop windows — the map stage
    explodes it into that many (key, window_start) rows (bounded ×K
    amplification), then the same partial-aggregating groupby as the
    tumbling window.  window_start is int64 epoch seconds so the
    comparison can't hit timestamp-unit drift."""
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    k = window_sec // hop_sec

    from ..functions.rounding import cents

    import numpy as np

    def explode(batch: pa.Table) -> pa.Table:
        # Arrow-native: explicit microsecond cast (a bare int64 view
        # yields whatever unit the block kept — ns vs us varies);
        # the key column explodes via Arrow take (no object copies)
        us = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        base = us // (hop_sec * 1_000_000)  # hop index of each event
        i = np.arange(k, dtype=np.int64)
        starts = ((base[:, None] - i[None, :]) * hop_sec).reshape(-1)
        idx = pa.array(np.repeat(np.arange(len(us), dtype=np.int64), k))
        return pa.table({
            key: batch.column(key).take(idx),
            "window_start": pa.array(starts),
            "value_cents": pa.array(np.repeat(cents(batch.column("value").to_numpy()), k)),
        })

    def finish(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "sum_value", pc.divide(batch.column("value_cents").cast(pa.float64()), 100.0)
        ).drop_columns(["value_cents"])

    from .agg import partial_groupby_sum_count

    return (
        partial_groupby_sum_count(
            events.map_batches(explode, batch_format="pyarrow"),
            [key, "window_start"], {"value_cents": "value_cents"},
            count_alias="n",
        )  # the ×K explode collapses back to #keys×#windows rows per
        # batch before the shuffle
        .map_batches(finish, batch_format="pyarrow")
    )


def sessionize(events: rd.Dataset, key: str = "user_id",
               gap_sec: int = SESSION_GAP_SEC,
               n_buckets: int | None = None) -> rd.Dataset:
    """Per-key session windows: a new session starts when the gap to
    the previous event exceeds ``gap_sec``.  One row per session:
    (key, session_idx 0-based in ts order, n_events, session_start).

    Keys are hash-bucketed into a BOUNDED number of groups (all events
    of a key land in one bucket) and each bucket sessionizes ALL its
    keys in one vectorized pass — one ``map_groups`` call per bucket,
    not per key (per-group overhead dominates when keys are small,
    [[ray-local-pitfalls]])."""
    import numpy as np

    if n_buckets is None:
        n_buckets = 256

    def add_bk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bk"] = (pd.util.hash_array(b[key].to_numpy())
                     % np.uint64(n_buckets)).astype(np.int64)
        return b

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key, "ts", "event_id"], kind="mergesort")
        same_key = g[key].to_numpy()[1:] == g[key].to_numpy()[:-1]
        gaps = g["ts"].diff().dt.total_seconds().to_numpy()
        new_sess = np.ones(len(g), dtype=bool)
        new_sess[1:] = ~same_key | (gaps[1:] > gap_sec)
        sess_id = np.cumsum(new_sess) - 1  # bucket-global session ids
        out = (g.assign(__sid=sess_id)
               .groupby("__sid", sort=False, as_index=False)
               .agg(**{key: (key, "first")},
                    n_events=("event_id", "size"),
                    session_start=("ts", "min")))
        # 0-based per-key session index in ts order (sessions are
        # emitted in (key, ts) order, so a per-key cumcount is exact)
        out["session_idx"] = out.groupby(key, sort=False).cumcount()
        out["session_start"] = out["session_start"].dt.strftime(
            "%Y-%m-%d %H:%M:%S.%f")
        return out[[key, "session_idx", "n_events", "session_start"]]

    return (events.map_batches(add_bk, batch_format="pandas")
            .groupby("__bk")
            .map_groups(per_bucket, batch_format="pandas"))


def _with_watermark(events: rd.Dataset, arrival_col: str, ts_col: str,
                    bucket_width: int | None) -> rd.Dataset:
    """Attach ``__ts_us`` (event time, int64 µs) and ``__wm_us`` (the
    watermark: running max of event time over arrival order) via the
    distributed two-level :func:`~..ops.scan.prefix_scan`."""

    def add_us(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return t.append_column("__ts_us", us)

    from .scan import prefix_scan

    return prefix_scan(events.map_batches(add_us, batch_format="pyarrow"),
                       arrival_col, "__ts_us", op="max",
                       bucket_width=bucket_width, alias="__wm_us")


def late_event_filter(events: rd.Dataset, arrival_col: str,
                      ts_col: str = "ts", lateness_sec: int = 3600,
                      bucket_width: int | None = None,
                      keep_stats_cols: bool = False) -> rd.Dataset:
    """Watermark-based late-data filter (the streaming engines'
    allowed-lateness semantics, batch-replayable).

    The watermark at each event is the running max of EVENT time over
    ARRIVAL order (``arrival_col``, an integer arrival sequence —
    processing time).  An event survives iff::

        event_time >= watermark - lateness_sec

    i.e. it is at most ``lateness_sec`` behind the newest event time
    already seen when it arrives — exactly Flink/Beam's bounded-out-
    of-orderness watermark, expressed as a composition of engine
    primitives: one epoch-microseconds projection, a distributed
    :func:`~..ops.scan.prefix_scan` (op="max", two-level — nothing
    corpus-sized on the driver), and a vectorized filter.  Exact (all
    int64 microseconds) and mirrorable by a SQL
    ``max(epoch_us(ts)) OVER (ORDER BY arrival)`` window oracle.

    With ``keep_stats_cols`` the internal ``__ts_us`` / ``__wm_us``
    columns survive for inspection (e.g. counting drops); by default
    the output schema equals the input schema.

    Partitioning assumption (inherited from prefix_scan): the arrival
    key is integer-comparable and roughly dense, and one
    ``bucket_width`` range of it fits a worker.
    """
    import numpy as np

    late_us = int(lateness_sec) * 1_000_000
    with_wm = _with_watermark(events, arrival_col, ts_col, bucket_width)

    def keep_on_time(b: pd.DataFrame) -> pd.DataFrame:
        # __wm_us may arrive float64 (the scan's cross-bucket offsets
        # ride a NaN-able series) — values are exact below 2^53, which
        # holds for any epoch-microsecond timestamp before year 2255
        ok = b["__ts_us"].to_numpy() >= (
            np.asarray(b["__wm_us"].to_numpy(), dtype=np.int64) - late_us)
        out = b[ok]
        return out if keep_stats_cols else out.drop(
            columns=["__ts_us", "__wm_us"])

    return with_wm.map_batches(keep_on_time, batch_format="pandas")


def watermarked_tumbling_window(events: rd.Dataset, key: str = "event_type",
                                freq: str = "h", arrival_col: str = "arrival",
                                ts_col: str = "ts",
                                lateness_sec: int = 3600,
                                bucket_width: int | None = None) -> rd.Dataset:
    """Tumbling count+sum windows over only the events that survive
    the :func:`late_event_filter` watermark — the end-to-end
    "windowed aggregate with allowed lateness" a streaming log
    pipeline needs when replayed as a batch job."""
    on_time = late_event_filter(events, arrival_col, ts_col=ts_col,
                                lateness_sec=lateness_sec,
                                bucket_width=bucket_width)
    return tumbling_window(on_time, key=key, freq=freq)


def watermarked_hopping_window(events: rd.Dataset, key: str = "event_type",
                               window_sec: int = 3600, hop_sec: int = 900,
                               arrival_col: str = "arrival",
                               ts_col: str = "ts",
                               lateness_sec: int = 3600,
                               bucket_width: int | None = None) -> rd.Dataset:
    """Hopping (sliding) count+sum windows over only the events that
    survive the :func:`late_event_filter` watermark — the sliding
    sibling of :func:`watermarked_tumbling_window`, completing the
    allowed-lateness surface (tumbling + hopping) for batch replays of
    streaming logs.  Same pipeline shape: one prefix-scan watermark
    pass, a vectorized filter, then the ×(window/hop) explode with
    map-side combine — nothing corpus-sized touches the driver."""
    on_time = late_event_filter(events, arrival_col, ts_col=ts_col,
                                lateness_sec=lateness_sec,
                                bucket_width=bucket_width)
    return hopping_window(on_time, key=key, window_sec=window_sec,
                          hop_sec=hop_sec)


def late_event_stats(events: rd.Dataset, arrival_col: str,
                     ts_col: str = "ts", lateness_sec: int = 3600,
                     bucket_width: int | None = None) -> dict:
    """Drop-visibility companion to :func:`late_event_filter`:
    ``{"n_total", "n_late", "max_lateness_sec"}`` computed in one
    distributed pass (the same watermark scan, then a per-batch
    partial reduce — the driver sees one tiny row per batch)."""
    import numpy as np

    late_us = int(lateness_sec) * 1_000_000
    flagged = _with_watermark(events, arrival_col, ts_col, bucket_width)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lag = (np.asarray(b["__wm_us"].to_numpy(), dtype=np.int64)
               - b["__ts_us"].to_numpy())
        return pd.DataFrame({
            "n": [len(b)],
            "late": [int((lag > late_us).sum())],
            "max_lag_us": [int(lag.max()) if len(b) else 0],
        })

    parts = flagged.map_batches(partial, batch_format="pandas",
                                batch_size=None).to_pandas()
    return {
        "n_total": int(parts["n"].sum()),
        "n_late": int(parts["late"].sum()),
        "max_lateness_sec": float(parts["max_lag_us"].max() / 1e6) if len(parts) else 0.0,
    }
