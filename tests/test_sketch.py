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


def test_hash64_batch_width_normalized():
    # ADVICE r4: same logical numbers must hash identically across
    # numeric widths (int32(-1) vs int64(-1), float32 vs float64);
    # numeric vs string stays distinct by documented contract.
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sketch import (
        _hash64_batch,
    )

    ints = [-1, 0, 42, 2**31 - 1]
    h64 = _hash64_batch(np.array(ints, dtype=np.int64))
    h32 = _hash64_batch(np.array(ints, dtype=np.int32))
    np.testing.assert_array_equal(h64, h32)
    f64 = _hash64_batch(np.array([1.5, -2.25, 42.0], dtype=np.float64))
    f32 = _hash64_batch(np.array([1.5, -2.25, 42.0], dtype=np.float32))
    np.testing.assert_array_equal(f64, f32)
    hb = _hash64_batch(np.array([True, False]))
    hi = _hash64_batch(np.array([1, 0], dtype=np.int64))
    np.testing.assert_array_equal(hb, hi)


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


def test_count_min_overestimates_only_and_merges():
    import numpy as np

    from agentic_rag_for_multi_model_pdf_extraction_ray.functions.hashing import (
        hash_tokens,
    )
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sketch import (
        CountMinSketch,
    )

    rng = np.random.RandomState(11)
    # zipf-ish token stream: token i appears ~1/(i+1) of the time
    toks = np.array([f"t{i}" for i in rng.zipf(1.5, 20_000) if i < 500],
                    dtype=object)
    true = {}
    for t in toks:
        true[t] = true.get(t, 0) + 1

    # split the stream, sketch halves independently, merge
    a, b = CountMinSketch(1024, 4), CountMinSketch(1024, 4)
    a.add_hashes(hash_tokens(toks[: len(toks) // 2]))
    b.add_hashes(hash_tokens(toks[len(toks) // 2:]))
    m = a.merge(b)

    keys = np.array(list(true), dtype=object)
    est = m.estimate_hashes(hash_tokens(keys))
    truth = np.array([true[k] for k in keys])
    # CMS never undercounts
    assert (est >= truth).all()
    # error bound: e/width * N at confidence 1 - e^-depth; assert the
    # (loose) deterministic bound holds for every key here
    assert (est - truth <= np.e / 1024 * len(toks) + 1).all()
    # heavy hitters are estimated exactly at this width
    top = keys[np.argsort(-truth)[:5]]
    assert (m.estimate_hashes(hash_tokens(top))
            == np.array([true[k] for k in top])).all()

    # serialization round-trip
    r = CountMinSketch.from_bytes(m.to_bytes(), 1024, 4)
    assert (r.estimate_hashes(hash_tokens(keys)) == est).all()


def test_count_min_distributed_matches_single_process():
    import numpy as np

    from agentic_rag_for_multi_model_pdf_extraction_ray.functions.hashing import (
        hash_tokens,
    )
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sketch import (
        CountMinSketch,
        cms_estimate,
        count_min,
    )

    rng = np.random.RandomState(3)
    vals = [f"u{i}" for i in rng.randint(0, 200, 5000)]
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)

    sk = count_min(ds, "v", width=512, depth=4)
    ref = CountMinSketch(512, 4)
    ref.add_hashes(hash_tokens(np.asarray(vals, dtype=object)))
    assert (sk.counts == ref.counts).all()

    est = cms_estimate(sk, ["u0", "u1", "nope"])
    true0 = vals.count("u0")
    assert est[0] >= true0 and est[2] >= 0


def test_count_min_weighted_adds():
    import numpy as np

    from agentic_rag_for_multi_model_pdf_extraction_ray.functions.hashing import (
        hash_tokens,
    )
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sketch import (
        CountMinSketch,
    )

    s = CountMinSketch(256, 4)
    keys = np.array(["x", "y"], dtype=object)
    s.add_hashes(hash_tokens(keys), weights=[7, 3])
    s.add_hashes(hash_tokens(keys[:1]), weights=[5])
    est = s.estimate_hashes(hash_tokens(keys))
    assert est[0] >= 12 and est[1] >= 3  # never undercounts
    assert est[0] == 12 and est[1] == 3  # exact at this load factor


def test_cms_heavy_hitters_candidates_then_verify():
    # round-4 verdict #7: CMS + exact bounded top-k wired into ONE
    # candidates-then-verify pipeline.  Deterministic skewed corpus
    # (token h{i} appears 400-25i times, no ties) + 2000 singleton
    # noise tokens; the pipeline must recover the exact top-10, never
    # undercount, and stay within the e/width*N envelope.
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sample import (
        top_tokens,
    )
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sketch import (
        cms_heavy_hitters,
    )

    rng = np.random.RandomState(5)
    stream = []
    for i in range(12):
        stream += [f"h{i:02d}"] * (400 - 25 * i)
    stream += [f"noise{j}" for j in range(2000)]
    rng.shuffle(stream)
    docs = [" ".join(stream[i:i + 20]) for i in range(0, len(stream), 20)]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(4)
    n_total = len(stream)

    exact_top = top_tokens(ds, "text", k=10)
    hh = cms_heavy_hitters(ds, "text", k=10, width=4096, depth=4)

    # recovered set == the exact top-k (local candidates caught every
    # global heavy hitter on this skew)
    assert set(hh["token"]) == set(exact_top["token"])
    # verify pass agrees with the exact operator token-by-token
    want = dict(zip(exact_top["token"], exact_top["n"]))
    for t, n in zip(hh["token"], hh["exact_count"]):
        assert want[t] == n
    # CMS never undercounts, and the error obeys the envelope
    assert (hh["est_count"] >= hh["exact_count"]).all()
    env = int(np.ceil(np.e / 4096 * n_total))
    assert (hh["envelope"] == env).all()
    assert ((hh["est_count"] - hh["exact_count"]) <= env).all()

    # unverified mode: same tokens/estimates, no exact column
    hh2 = cms_heavy_hitters(ds, "text", k=10, width=4096, depth=4,
                            verify=False)
    assert "exact_count" not in hh2.columns
    assert hh2["token"].tolist() == hh["token"].tolist()
    assert hh2["est_count"].tolist() == hh["est_count"].tolist()

    # empty input: schema-stable empty frame
    empty = cms_heavy_hitters(
        rd.from_pandas(pd.DataFrame({"text": pd.Series([], dtype=str)})),
        "text", k=5)
    assert list(empty.columns) == ["token", "est_count", "exact_count",
                                   "envelope"] and not len(empty)
