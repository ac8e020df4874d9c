"""Cross-engine rounding helpers + partial-aggregation combiner."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.functions.rounding import (
    cents,
    micro_units,
    round_half_up,
    sql_cents,
    sql_round6,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.ops.agg import (
    partial_groupby_sum_count,
)


def test_cents_exact_for_two_decimal_values():
    vals = np.array([0.01, 0.07, 994.28, -994.28, 123456.78])
    got = cents(vals)
    assert got.tolist() == [1, 7, 99428, -99428, 12345678]


def test_round_half_up_matches_sql_fragments():
    con = duckdb.connect()
    xs = [0.0078125, 4.5, -1.2345675, 2.5e-07, 33.394999999999996, 1 / 3]
    for x in xs:
        sql = con.sql(f"SELECT {sql_round6(str(x))}").fetchone()[0]
        assert float(round_half_up(x, 6)) == sql, x
    for x in [68423.46, -0.005, 12.345]:
        sql = con.sql(f"SELECT {sql_cents(str(x))}").fetchone()[0]
        assert int(cents(np.array([x]))[0]) == sql, x


def test_micro_units_roundtrip():
    v = np.array([1.2345678, 0.0000004, 8.999999523162842])
    m = micro_units(v)
    assert m.dtype == np.int64
    # within half a micro-unit
    assert np.all(np.abs(m / 1e6 - v) <= 5.1e-7)


def test_partial_groupby_sum_count_exact():
    df = pd.DataFrame({
        "g": ["a"] * 50 + ["b"] * 30,
        "x": list(range(50)) + list(range(30)),
    })
    out = (
        partial_groupby_sum_count(
            rd.from_pandas(df).repartition(5), keys=["g"],
            sum_cols={"x": "sum_x"}, count_alias="n",
        )
        .to_pandas()
        .set_index("g")
    )
    assert out.loc["a", "sum_x"] == sum(range(50))
    assert out.loc["a", "n"] == 50
    assert out.loc["b", "sum_x"] == sum(range(30))
    assert out.loc["b", "n"] == 30
