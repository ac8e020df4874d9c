"""HLL and Bloom sketches: accuracy, mergeability, semi-join filter."""

import numpy as np
import pandas as pd
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sketch import (
    BloomFilter,
    HyperLogLog,
    approx_distinct,
    bloom_semi_join,
)


def test_hll_accuracy_and_merge():
    h = HyperLogLog(p=12)
    values = [f"v{i}" for i in range(20000)]
    h.add(np.array(values))
    est = h.estimate()
    assert abs(est - 20000) / 20000 < 0.05

    # mergeability: two halves merged == same estimate as one pass
    h1, h2 = HyperLogLog(12), HyperLogLog(12)
    h1.add(np.array(values[:10000]))
    h2.add(np.array(values[5000:]))  # overlapping
    merged = h1.merge(h2)
    assert abs(merged.estimate() - est) / est < 0.01  # same register state

    # serialization round-trip
    rt = HyperLogLog.from_bytes(merged.to_bytes(), 12)
    assert rt.estimate() == merged.estimate()


def test_hll_small_range_correction():
    h = HyperLogLog(p=12)
    h.add(np.array([f"x{i}" for i in range(50)]))
    assert abs(h.estimate() - 50) < 5


def test_approx_distinct_dataset():
    df = pd.DataFrame({"u": [i % 500 for i in range(5000)]})
    est = approx_distinct(rd.from_pandas(df).repartition(4), "u")
    assert abs(est - 500) / 500 < 0.05


def test_bloom_no_false_negatives():
    bf = BloomFilter(n_bits=1 << 16, k=5)
    members = np.array([f"m{i}" for i in range(1000)])
    bf.add(members)
    assert bf.contains(members).all()
    others = np.array([f"q{i}" for i in range(1000)])
    fp_rate = bf.contains(others).mean()
    assert fp_rate < 0.05


def test_bloom_semi_join():
    ds = rd.from_pandas(pd.DataFrame({"k": list(range(100)), "v": range(100)}))
    out = bloom_semi_join(ds, keys=[5, 50, 99], on="k").to_pandas()
    assert {5, 50, 99} <= set(out["k"])          # no false negatives
    assert len(out) <= 10                         # few false positives
