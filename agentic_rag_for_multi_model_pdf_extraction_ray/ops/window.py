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


def _parse_freq(freq: str):
    """Pandas-style offset alias with an optional integer multiple
    over second/minute/hour/day units → (multiple, arrow unit)."""
    import re

    m = re.fullmatch(r"(\d*)(s|sec|min|t|h|d)", freq.strip().lower())
    if not m:
        raise ValueError(
            "freq must be an integer multiple of s/min/h/d "
            f"(e.g. 'h', '2h', '30min', '1d'); got {freq!r}")
    return int(m.group(1) or 1), {
        "s": "second", "sec": "second", "min": "minute",
        "t": "minute", "h": "hour", "d": "day"}[m.group(2)]


def _tumble_project(batch: pa.Table, key: str, mult: int,
                    unit: str) -> pa.Table:
    """(key, window_start, value_cents) projection for the tumbling
    aggregate — Arrow-native (zero-copy in): floor_temporal + strftime
    in C, exact integer cents → order-independent distributed sums."""
    from ..functions.rounding import cents

    ts = batch.column("ts").cast(pa.timestamp("us"))
    # cast the floored stamp to seconds — Arrow's %S prints
    # fractional digits for sub-second units
    w = pc.strftime(
        pc.floor_temporal(ts, multiple=mult, unit=unit)
        .cast(pa.timestamp("s")),
        format="%Y-%m-%d %H:%M:%S")
    return pa.table({
        key: batch.column(key),
        "window_start": w,
        "value_cents": pa.array(cents(batch.column("value").to_numpy())),
    })


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
    _mult, _UNIT = _parse_freq(freq)

    def add_window(batch: pa.Table) -> pa.Table:
        return _tumble_project(batch, key, _mult, _UNIT)

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


def _hop_project(batch: pa.Table, key: str, window_sec: int,
                 hop_sec: int) -> pa.Table:
    """(key, window_start, value_cents) ×(window/hop) explode for the
    hopping aggregate.  Arrow-native: explicit microsecond cast (a
    bare int64 view yields whatever unit the block kept — ns vs us
    varies); the key column explodes via Arrow take (no object
    copies); window_start is int64 epoch seconds."""
    import numpy as np

    from ..functions.rounding import cents

    k = window_sec // hop_sec
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

    def explode(batch: pa.Table) -> pa.Table:
        return _hop_project(batch, key, window_sec, hop_sec)

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


# Printable sentinels on purpose: Ray's sort-based groupby mis-sorts
# NUL-prefixed ("\x00...") string keys — groups fail to merge and
# boundary groups merge wrongly (reproduced on ray 2.49: two
# ('\x00a','') rows in different blocks aggregate to TWO output
# rows).  A real key named "__wm__*" would collide; documented in
# the stats_out docstrings.
_WM_TOTAL = "__wm__total"
_WM_LATE = "__wm__late"
_WM_MAXLAG = "__wm__maxlag"


def _fused_watermark_agg(events: rd.Dataset, key: str, project_kept,
                         ws_sentinel, arrival_col: str, ts_col: str,
                         lateness_sec: int, bucket_width: int | None,
                         stats_out: dict) -> rd.Dataset:
    """ONE-scan watermark aggregate + drop stats (round-4 verdict: a
    caller wanting both must not pay the prefix_scan twice).

    Per-batch sentinel-key stats partials (total / late counts ×100
    in ``value_cents``; per-batch max lag encoded in ``window_start``
    so a SUM-shaped shuffle can carry a MAX) ride the SAME projection
    pass and partial-groupby shuffle as the window rows — exact and
    retry-safe (unlike an actor side channel, re-executed blocks
    replace rather than double-count).  The aggregate is small by
    construction (#keys×#windows + ≤3×#batches sentinel rows), so it
    is collected, split, and returned as a fresh Dataset while
    ``stats_out`` receives ``{"n_total", "n_late",
    "max_lateness_sec"}`` — identical to :func:`late_event_stats`."""
    import numpy as np

    sch = events.schema()
    key_type = dict(zip(sch.names, sch.types)).get(key)
    if isinstance(key_type, pa.DataType):  # arrow-backed blocks
        key_is_str = (pa.types.is_string(key_type)
                      or pa.types.is_large_string(key_type))
    else:  # pandas-backed blocks report numpy dtypes / python types
        key_is_str = key_type in (object, str) or str(key_type) in (
            "object", "string", "str")
    if not key_is_str:
        raise ValueError(
            f"stats_out requires a string key column (sentinel stats "
            f"rows share the key column); {key!r} is {key_type}")

    late_us = int(lateness_sec) * 1_000_000
    flagged = _with_watermark(events, arrival_col, ts_col, bucket_width)

    def project(b: pa.Table) -> pa.Table:
        ts = np.asarray(b.column("__ts_us").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        wm = np.asarray(b.column("__wm_us").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        lag = wm - ts  # ≥ 0: the watermark is an inclusive running max
        ok = lag <= late_us
        kept = b.drop_columns(["__ts_us", "__wm_us"]).filter(pa.array(ok))
        out = project_kept(kept)
        if not len(b):
            return out
        stats = pa.table({
            key: pa.array([_WM_TOTAL, _WM_LATE, _WM_MAXLAG]),
            "window_start": pa.array(
                [ws_sentinel(None), ws_sentinel(None),
                 ws_sentinel(int(lag.max()))],
                type=out.schema.field("window_start").type),
            "value_cents": pa.array(
                [100 * len(b), 100 * int((~ok).sum()), 0],
                type=pa.int64()),
        }).cast(out.schema)
        return pa.concat_tables([out, stats])

    from .agg import partial_groupby_sum_count

    def finish(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "sum_value",
            pc.divide(batch.column("value_cents").cast(pa.float64()), 100.0)
        ).drop_columns(["value_cents"])

    agg = (
        partial_groupby_sum_count(
            flagged.map_batches(project, batch_format="pyarrow"),
            [key, "window_start"], {"value_cents": "value_cents"},
            count_alias="n",
        )
        .map_batches(finish, batch_format="pyarrow")
        .to_pandas()
    )
    is_stats = agg[key].isin([_WM_TOTAL, _WM_LATE, _WM_MAXLAG])
    srows = agg[is_stats]
    maxlag = srows.loc[srows[key] == _WM_MAXLAG, "window_start"]
    stats_out.update({
        "n_total": int(round(
            srows.loc[srows[key] == _WM_TOTAL, "sum_value"].sum())),
        "n_late": int(round(
            srows.loc[srows[key] == _WM_LATE, "sum_value"].sum())),
        "max_lateness_sec": (
            float(maxlag.astype(np.int64).max() / 1e6) if len(maxlag) else 0.0),
    })
    return rd.from_pandas(agg[~is_stats].reset_index(drop=True))


def watermarked_tumbling_window(events: rd.Dataset, key: str = "event_type",
                                freq: str = "h", arrival_col: str = "arrival",
                                ts_col: str = "ts",
                                lateness_sec: int = 3600,
                                bucket_width: int | None = None,
                                stats_out: dict | None = None) -> rd.Dataset:
    """Tumbling count+sum windows over only the events that survive
    the :func:`late_event_filter` watermark — the end-to-end
    "windowed aggregate with allowed lateness" a streaming log
    pipeline needs when replayed as a batch job.

    Pass ``stats_out={}`` to ALSO receive the drop stats
    (:func:`late_event_stats` fields) from the SAME single watermark
    scan — the sentinel-partials fusion in
    :func:`_fused_watermark_agg`; requires a string ``key`` column."""
    if stats_out is not None:
        mult, unit = _parse_freq(freq)
        return _fused_watermark_agg(
            events, key,
            lambda t: _tumble_project(t, key, mult, unit),
            lambda lag_us: "" if lag_us is None else str(lag_us).zfill(20),
            arrival_col, ts_col, lateness_sec, bucket_width, stats_out)
    on_time = late_event_filter(events, arrival_col, ts_col=ts_col,
                                lateness_sec=lateness_sec,
                                bucket_width=bucket_width)
    return tumbling_window(on_time, key=key, freq=freq)


def watermarked_hopping_window(events: rd.Dataset, key: str = "event_type",
                               window_sec: int = 3600, hop_sec: int = 900,
                               arrival_col: str = "arrival",
                               ts_col: str = "ts",
                               lateness_sec: int = 3600,
                               bucket_width: int | None = None,
                               stats_out: dict | None = None) -> rd.Dataset:
    """Hopping (sliding) count+sum windows over only the events that
    survive the :func:`late_event_filter` watermark — the sliding
    sibling of :func:`watermarked_tumbling_window`, completing the
    allowed-lateness surface (tumbling + hopping) for batch replays of
    streaming logs.  Same pipeline shape: one prefix-scan watermark
    pass, a vectorized filter, then the ×(window/hop) explode with
    map-side combine — nothing corpus-sized touches the driver.

    ``stats_out={}`` fuses the drop stats into the same scan (see
    :func:`watermarked_tumbling_window`); hopping sentinel
    ``window_start`` values are negative epochs (total/late) or the
    per-batch max lag in µs (maxlag rows), disjoint from real hop
    starts for any post-1970 event log."""
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    if stats_out is not None:
        return _fused_watermark_agg(
            events, key,
            lambda t: _hop_project(t, key, window_sec, hop_sec),
            lambda lag_us: -1 if lag_us is None else int(lag_us),
            arrival_col, ts_col, lateness_sec, bucket_width, stats_out)
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
