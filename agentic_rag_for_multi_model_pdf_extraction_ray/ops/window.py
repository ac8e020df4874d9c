"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time machinery (and the reference is strictly
batch, SURVEY.md §2.8); windows are expressed per the Ray guide:
tumbling windows = truncate-timestamp groupby; session windows =
``groupby(key).map_groups`` over ts-sorted groups.  Both have exact
DuckDB oracles (date_trunc / lag+gap window functions).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd
from ray.data.aggregate import Count, Sum

SESSION_GAP_SEC = 1800


def tumbling_window(events: rd.Dataset, key: str = "event_type",
                    freq: str = "h") -> rd.Dataset:
    """Count + sum(value) per (key, window-start-hour).

    window column is a formatted string so the Arrow/DuckDB timestamp
    unit mismatch can't bite the comparison.
    """

    from ..functions.rounding import cents

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor(freq).dt.strftime("%Y-%m-%d %H:%M:%S")
        # exact integer cents → order-independent distributed sums
        return pd.DataFrame(
            {key: batch[key], "window_start": w, "value_cents": cents(batch["value"].to_numpy())}
        )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_value"] = batch["value_cents"] / 100.0
        return batch.drop(columns=["value_cents"])

    return (
        events.map_batches(add_window, batch_format="pandas")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="value_cents"))
        .map_batches(finish, batch_format="pandas")
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

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        # force microsecond resolution — a bare astype(int64) yields
        # whatever unit pandas kept (ns vs us varies by version)
        us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        base = us // (hop_sec * 1_000_000)  # hop index of each event
        i = np.arange(k, dtype=np.int64)
        starts = ((base[:, None] - i[None, :]) * hop_sec).reshape(-1)
        return pd.DataFrame({
            key: np.repeat(batch[key].to_numpy(), k),
            "window_start": starts,
            "value_cents": np.repeat(cents(batch["value"].to_numpy()), k),
        })

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_value"] = batch["value_cents"] / 100.0
        return batch.drop(columns=["value_cents"])

    return (
        events.map_batches(explode, batch_format="pandas")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="value_cents"))
        .map_batches(finish, batch_format="pandas")
    )


def sessionize(events: rd.Dataset, key: str = "user_id",
               gap_sec: int = SESSION_GAP_SEC) -> rd.Dataset:
    """Per-key session windows: a new session starts when the gap to
    the previous event exceeds ``gap_sec``.  One row per session:
    (key, session_idx 0-based in ts order, n_events, session_start)."""

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds()
        new_sess = (gaps > gap_sec) | gaps.isna()
        sess_idx = new_sess.cumsum() - 1
        out = g.assign(session_idx=sess_idx).groupby("session_idx", as_index=False).agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
        )
        out[key] = g[key].iloc[0]
        out["session_start"] = out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return out[[key, "session_idx", "n_events", "session_start"]]

    return events.groupby(key).map_groups(per_user, batch_format="pandas")
