"""Join operator units: broadcast merge, semi/anti, shuffle join."""

import pandas as pd
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.ops.join import (
    broadcast_merge,
    broadcast_semi_join,
    shuffle_join,
)


def _left():
    return rd.from_pandas(pd.DataFrame({
        "k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"],
    })).repartition(2)


def test_broadcast_merge_inner_and_left():
    dim = pd.DataFrame({"id": [1, 2], "name": ["one", "two"]})
    inner = broadcast_merge(_left(), dim, left_on="k", right_on="id").to_pandas()
    assert sorted(inner["name"]) == ["one", "two"]
    left = broadcast_merge(_left(), dim, left_on="k", right_on="id", how="left").to_pandas()
    assert len(left) == 4
    assert left[left["k"] == 3]["name"].isna().all()


def test_broadcast_semi_and_anti():
    semi = broadcast_semi_join(_left(), {2, 4}, on="k").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    anti = broadcast_semi_join(_left(), {2, 4}, on="k", anti=True).to_pandas()
    assert sorted(anti["k"]) == [1, 3]


def test_shuffle_join_inner():
    right = rd.from_pandas(pd.DataFrame({"rk": [2, 3, 9], "w": [20, 30, 90]}))
    out = shuffle_join(_left(), right, on="k", right_on="rk",
                       num_partitions=2).to_pandas()
    assert sorted(out["k"]) == [2, 3]
    assert dict(zip(out["k"], out["w"])) == {2: 20, 3: 30}


def test_asof_bucketed_preserves_big_int64_payloads():
    # int64 payloads above 2^53 would be corrupted by a float64
    # round-trip; the typed (Arrow) carriage must keep them exact
    import numpy as np

    big = 2**53 + 1  # not representable in float64
    left = rd.from_pandas(pd.DataFrame({
        "uid": [1, 1, 2],
        "ts": pd.to_datetime(["2024-01-02", "2024-01-05", "2024-01-02"]),
        "eid": np.array([big, big + 2, big + 4], dtype=np.int64),
    }))
    right = rd.from_pandas(pd.DataFrame({
        "cid": [1, 1, 2],
        "od": pd.to_datetime(["2024-01-01", "2024-01-04", "2024-01-03"]),
        "ok": np.array([big + 10, big + 12, big + 14], dtype=np.int64),
    }))
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.join import asof_join_bucketed

    out = asof_join_bucketed(
        left, right, key="uid", right_key="cid", ts="ts", right_ts="od",
        left_cols=["eid"], right_cols=["ok"], n_buckets=4,
    ).to_pandas().dropna(subset=["ok"])
    got = {int(e): int(o) for e, o in zip(out["eid"], out["ok"])}
    # uid=1 @ 01-02 -> order @ 01-01; uid=1 @ 01-05 -> order @ 01-04;
    # uid=2 @ 01-02 -> no order yet (dropped)
    assert got == {big: big + 10, big + 2: big + 12}


def test_range_join_broadcast_and_bucketed_match_oracle():
    # randomized points ⋈ overlapping intervals vs a pandas brute-force
    # oracle; broadcast and bucketed paths must agree exactly
    import numpy as np

    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.join import (
        range_join_broadcast,
        range_join_bucketed,
    )

    rng = np.random.RandomState(5)
    n_pts, n_iv = 400, 60
    pts = pd.DataFrame({
        "uid": rng.randint(0, 8, n_pts),
        "t_us": rng.randint(0, 10_000, n_pts).astype(np.int64),
        "val": np.arange(n_pts, dtype=np.int64) + 2**53,  # big-int payload
    })
    lo = rng.randint(0, 9_000, n_iv).astype(np.int64)
    ivs = pd.DataFrame({
        "uid": rng.randint(0, 8, n_iv),
        "lo_us": lo,
        "hi_us": lo + rng.randint(0, 2_500, n_iv),  # overlapping spans
        "win": np.arange(n_iv, dtype=np.int64),
    })

    # brute-force oracle: key-equal cartesian + mask
    o = pts.merge(ivs, on="uid")
    o = o[(o["t_us"] >= o["lo_us"]) & (o["t_us"] <= o["hi_us"])]
    want = sorted(zip(o["val"], o["win"]))

    bc = range_join_broadcast(
        rd.from_pandas(pts).repartition(4), ivs, key="uid",
        right_key="uid", ts="t_us", lo="lo_us", hi="hi_us",
        right_cols=["win"]).to_pandas()
    assert sorted(zip(bc["val"], bc["win"])) == want

    bk = range_join_bucketed(
        rd.from_pandas(pts).repartition(4),
        rd.from_pandas(ivs).repartition(3),
        key="uid", right_key="uid", ts="t_us", lo="lo_us", hi="hi_us",
        left_cols=["val"], right_cols=["win"],
        bucket_width=1_000, n_buckets=16).to_pandas()
    assert sorted(zip(bk["val"].astype(np.int64),
                      bk["win"].astype(np.int64))) == want
    # big-int64 payloads survive the typed carriage exactly
    assert bk["val"].min() >= 2**53


def test_range_join_bucketed_string_key_and_edges():
    import numpy as np

    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.join import (
        range_join_bucketed,
    )

    pts = pd.DataFrame({
        "k": ["a", "a", "b", "c"],
        "t": np.array([5, 10, 5, 5], dtype=np.int64),
        "pid": np.arange(4, dtype=np.int64),
    })
    ivs = pd.DataFrame({
        "k": ["a", "a", "b"],
        "lo": np.array([5, 0, 6], dtype=np.int64),   # lo == t inclusive
        "hi": np.array([10, 4, 9], dtype=np.int64),  # hi == t inclusive
        "win": np.array([0, 1, 2], dtype=np.int64),
    })
    out = range_join_bucketed(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        key="k", right_key="k", ts="t", lo="lo", hi="hi",
        left_cols=["pid"], right_cols=["win"],
        bucket_width=3, n_buckets=8).to_pandas()
    got = sorted(zip(out["pid"].astype(int), out["win"].astype(int)))
    # pid0 (a,5): win0 [5,10] yes, win1 [0,4] no; pid1 (a,10): win0 yes;
    # pid2 (b,5): win2 [6,9] no; pid3 (c,5): no intervals
    assert got == [(0, 0), (1, 0)]
