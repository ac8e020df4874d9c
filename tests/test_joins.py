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
