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
