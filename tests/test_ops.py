"""Operator-level unit tests: dedup family, similarity, windows, text
kernels, hashing invariants, media plumbing, embedder determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.functions.hashing import (
    MinHasher,
    char_shingles,
    hamming64,
    jaccard,
    simhash64,
    stable_hash64,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.functions.text import (
    avg_token_len,
    langid,
    quality_ok,
    token_count,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.ops.dedup import (
    cosine_near_dup_pairs,
    exact_dedup,
    minhash_dedup_clusters,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.ops.similarity import (
    knn_bruteforce,
    knn_lsh,
    retrieval_with_figure_boost,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.ops.window import (
    sessionize,
    tumbling_window,
)


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_stable_hash_is_process_stable():
    assert stable_hash64("abc") == 15617099051652453721  # frozen value


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=128)
    a = char_shingles("the quick brown fox jumps over the lazy dog extended text here")
    b = char_shingles("the quick brown fox jumps over the lazy cat extended text here")
    est = (mh.signature(a) == mh.signature(b)).mean()
    true = jaccard(a, b)
    assert abs(est - true) < 0.15


def test_jaccard_mixed_and_nonunique_inputs():
    # ADVICE r4: ndarray × set must not hit np.asarray(set) (0-d object
    # array), and non-unique caller arrays must be deduped, not
    # miscounted by intersect1d(assume_unique=True)
    arr = np.array([1, 2, 3, 4], dtype=np.uint64)
    assert jaccard(arr, {2, 3, 4, 5}) == pytest.approx(3 / 5)
    assert jaccard({2, 3, 4, 5}, arr) == pytest.approx(3 / 5)
    dup = np.array([1, 1, 2, 2, 3], dtype=np.int64)  # non-uint64 → deduped
    assert jaccard(dup, np.array([2, 3, 4], dtype=np.int64)) == pytest.approx(2 / 4)
    assert jaccard(np.array([], dtype=np.uint64), set()) == 1.0
    assert jaccard(np.array([1], dtype=np.uint64), set()) == 0.0


def test_simhash_similar_texts_close():
    t1 = "word " * 50 + "alpha beta gamma"
    t2 = "word " * 50 + "alpha beta delta"
    s1 = simhash64([stable_hash64(w) for w in t1.split()])
    s2 = simhash64([stable_hash64(w) for w in t2.split()])
    s3 = simhash64([stable_hash64(w) for w in "completely different content entirely".split()])
    assert hamming64(s1, s2) < hamming64(s1, s3)


def test_exact_dedup_keeps_min_id():
    ds = _docs([
        {"doc_id": 3, "text": "same"},
        {"doc_id": 1, "text": "same"},
        {"doc_id": 2, "text": "other"},
    ])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert sorted(out["doc_id"].tolist()) == [1, 2]


def test_minhash_clusters_group_near_dups():
    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + "tail"},          # near-dup of 1
        {"doc_id": 3, "text": "entirely unrelated content about ray data pipelines " * 5},
    ]
    out = minhash_dedup_clusters(_docs(rows), threshold=0.6)
    m = dict(zip(out["doc_id"], out["cluster_id"]))
    assert m[1] == m[2] == 1
    assert m[3] == 3


def test_simhash_near_dups_finds_pair():
    # one extra token → measured hamming 6 under the engine's
    # token-hash contract (hash_tokens; unrelated doc: 32) with at
    # least one shared 16-bit band
    base = " ".join(f"w{i} w{i}" for i in range(80))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " qq"},
        {"doc_id": 3, "text": "nothing in common with those documents at all " * 6},
    ]
    pairs = simhash_near_dups(_docs(rows), max_hamming=6)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_ngram_jaccard_pairs():
    rows = [
        {"doc_id": 1, "text": "a b c d e f g h"},
        {"doc_id": 2, "text": "a b c d e f g x"},
        {"doc_id": 3, "text": "q r s t u v w z"},
    ]
    pairs = ngram_jaccard_pairs(_docs(rows), n=3, threshold=0.3)
    got = set(zip(pairs["a"], pairs["b"]))
    assert got == {(1, 2)}


def test_cosine_near_dup_pairs():
    rows = [
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [0.99, 0.01, 0.0]},
        {"vec_id": 3, "embedding": [0.0, 1.0, 0.0]},
    ]
    pairs = cosine_near_dup_pairs(_docs(rows), threshold=0.95)
    assert set(zip(pairs["a"], pairs["b"])) == {(1, 2)}


def test_knn_bruteforce_exact():
    rng = np.random.RandomState(0)
    M = rng.normal(size=(200, 16))
    rows = [{"vec_id": i, "embedding": M[i].tolist()} for i in range(200)]
    q = M[0]
    out = knn_bruteforce(_docs(rows).repartition(5), q, k=5, exclude_ids={0})
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    s = Mn @ (q / np.linalg.norm(q))
    s[0] = -np.inf
    want = np.argsort(-s)[:5].tolist()
    assert out["vec_id"].tolist() == want


def test_knn_lsh_recall_reasonable():
    rng = np.random.RandomState(1)
    M = rng.normal(size=(300, 16))
    rows = [{"vec_id": i, "embedding": M[i].tolist()} for i in range(300)]
    q = M[7]
    exact = set(knn_bruteforce(_docs(rows), q, k=10)["vec_id"])
    approx = set(knn_lsh(_docs(rows), q, k=10, n_bits=4, n_probes=1)["vec_id"])
    assert len(exact & approx) >= 5  # generous: ANN, not exact


def test_retrieval_figure_boost_dedup():
    hits = pd.DataFrame({"text": ["a", "b"], "score": [0.9, 0.8]})
    figs = pd.DataFrame({"text": ["b", "c"], "score": [0.7, 0.6]})
    out = retrieval_with_figure_boost(hits, figs)
    assert out["text"].tolist() == ["a", "b", "c"]


def test_tumbling_window():
    ev = rd.from_pandas(pd.DataFrame({
        "event_type": ["x", "x", "y"],
        "ts": pd.to_datetime(["2024-01-01 10:05", "2024-01-01 10:55", "2024-01-01 11:05"]),
        "value": [1.0, 2.0, 4.0],
    }))
    out = tumbling_window(ev).to_pandas().sort_values(["event_type", "window_start"])
    assert out["n"].tolist() == [2, 1]
    assert out["sum_value"].tolist() == [3.0, 4.0]
    assert out["window_start"].tolist() == ["2024-01-01 10:00:00", "2024-01-01 11:00:00"]


def test_sessionize_gap():
    ev = rd.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 10:10",   # session 0
            "2024-01-01 12:00",                          # session 1 (gap > 30min)
            "2024-01-01 09:00",
        ]),
    }))
    out = sessionize(ev).to_pandas().sort_values(["user_id", "session_idx"])
    u1 = out[out["user_id"] == 1]
    assert u1["session_idx"].tolist() == [0, 1]
    assert u1["n_events"].tolist() == [2, 1]
    assert len(out[out["user_id"] == 2]) == 1


def test_text_kernels():
    assert token_count("  a  b c ") == 3
    assert token_count("") == 0
    assert avg_token_len("ab cd") == 2.0
    assert langid("the cat and the hat is the best") == "en"
    assert langid("le chat et la maison est belle") == "fr"
    assert langid("中文文档内容") == "zh"
    assert langid("zzz qqq") == "und"
    assert quality_ok("real words go here with reasonable length")
    assert not quality_ok("x")


def test_media_features_plumbing():
    from agentic_rag_for_multi_model_pdf_extraction_ray.stages.media import (
        extract_media_features,
    )
    from agentic_rag_for_multi_model_pdf_extraction_ray.synth import generate_corpus

    corpus = generate_corpus(30, seed=3)
    n_media = sum(len(m) for m in corpus.column("media").to_pylist())
    out = extract_media_features(rd.from_arrow(corpus), concurrency=2).to_pandas()
    assert len(out) == n_media
    assert set(out.columns) == {"doc_id", "media_ref", "width", "height",
                                "feature", "thumb_w", "thumb_h"}
    # deterministic features
    out2 = extract_media_features(rd.from_arrow(corpus), concurrency=2).to_pandas()
    assert out.sort_values("media_ref")["feature"].tolist() == \
        out2.sort_values("media_ref")["feature"].tolist()


def test_embedder_deterministic_and_normalized():
    from agentic_rag_for_multi_model_pdf_extraction_ray.stages.embed import embed

    ds = _docs([{"structured_text": f"tok{i} alpha beta gamma", "i": i} for i in range(10)])
    out = embed(ds, dim=32, concurrency=2).to_pandas()
    M = np.stack(out["embedding"].to_numpy())
    assert M.shape == (10, 32)
    np.testing.assert_allclose(np.linalg.norm(M, axis=1), 1.0, rtol=1e-5)


def test_bm25_ranks_matching_docs():
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.text_rank import bm25_score

    rows = [
        {"doc_id": 1, "text": "spark shuffle spill shuffle spill"},
        {"doc_id": 2, "text": "spark shuffle " + "filler " * 50},
        {"doc_id": 3, "text": "nothing relevant here"},
        {"doc_id": 4, "text": ""},
    ]
    out = bm25_score(_docs(rows), "shuffle spill", k=10)
    # doc 1: both terms, high tf, short -> top; doc 2: one term, long
    assert out["doc_id"].tolist() == [1, 2]
    assert out["score"].iloc[0] > out["score"].iloc[1] > 0
    # empty query and empty corpus degrade to typed empties
    assert len(bm25_score(_docs(rows), "")) == 0
    assert len(bm25_score(_docs([{"doc_id": 9, "text": ""}]), "x")) == 0


def test_prefix_scan_running_sum_and_max():
    # distributed two-level scan == single-threaded cumulative oracle
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.scan import prefix_scan

    rng = np.random.RandomState(0)
    n = 1000
    df = pd.DataFrame({"event_id": rng.permutation(n),
                       "value": np.round(rng.uniform(0, 100, n), 2)})
    ds = rd.from_pandas(df).repartition(5)
    ref = df.sort_values("event_id")
    out = prefix_scan(ds, "event_id", "value", op="sum", bucket_width=128,
                      scale=100).to_pandas().sort_values("event_id")
    want = np.floor(ref["value"].to_numpy() * 100 + 0.5).astype(np.int64).cumsum() / 100
    assert np.array_equal(out["running_sum"].to_numpy(), want)
    outm = prefix_scan(ds, "event_id", "value", op="max",
                       bucket_width=128).to_pandas().sort_values("event_id")
    assert np.array_equal(outm["running_max"].to_numpy(),
                          np.maximum.accumulate(ref["value"].to_numpy()))


def test_prefix_scan_property_random_shapes():
    # randomized shapes/widths vs the single-threaded cumulative oracle
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.scan import prefix_scan

    rng = np.random.RandomState(42)
    for trial in range(3):
        n = int(rng.randint(1, 400))
        width = int(rng.choice([1, 7, 64, 1000]))
        order = rng.permutation(n) * int(rng.choice([1, 3]))  # gappy ok
        vals = np.round(rng.uniform(-50, 50, n), 2)
        df = pd.DataFrame({"k": order, "v": vals})
        ds = rd.from_pandas(df).repartition(int(rng.randint(1, 6)))
        out = prefix_scan(ds, "k", "v", op="sum", bucket_width=width,
                          scale=100).to_pandas().sort_values("k")
        ref = df.sort_values("k")
        want = np.floor(ref["v"].to_numpy() * 100 + 0.5).astype(np.int64).cumsum() / 100
        assert np.array_equal(out["running_sum"].to_numpy(), want), (n, width)


def test_hash_tokens_deterministic_across_processes():
    # the token-hash contract claims cross-process determinism (fixed
    # siphash key); guard it with a fresh-interpreter comparison
    import subprocess
    import sys

    from agentic_rag_for_multi_model_pdf_extraction_ray.functions.hashing import (
        hash_tokens,
    )

    toks = ["alpha", "beta", "élève", "", "x" * 100]
    here = hash_tokens(toks).tolist()
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from agentic_rag_for_multi_model_pdf_extraction_ray.functions.hashing import hash_tokens;"
        f"print(hash_tokens({toks!r}).tolist())"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True).stdout.strip()
    assert out == str(here)


def test_weighted_reservoir_exact_k_and_bias():
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sample import (
        weighted_reservoir_sample,
    )

    rows = [{"doc_id": i, "w": (1000 if i < 10 else 1)} for i in range(200)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    out = weighted_reservoir_sample(ds, "doc_id", "w", k=20).to_pandas()
    assert len(out) == 20
    # heavy rows (1000x weight) should dominate the sample
    assert sum(1 for d in out["doc_id"] if d < 10) >= 8
    # zero/negative weights excluded; k > population degrades gracefully
    small = weighted_reservoir_sample(
        rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "w": [0, 5]})),
        "doc_id", "w", k=10).to_pandas()
    assert small["doc_id"].tolist() == [2]


def test_top_tokens_bounded_driver_frame():
    """top_tokens must ship ≤ n_buckets×k candidate rows to the driver
    (never the full vocabulary) and still return the exact global
    top-k with the (count desc, token asc) tie-break."""
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sample import (
        top_tokens,
        top_tokens_parts,
    )

    rng = np.random.default_rng(7)
    vocab = [f"tok{i:04d}" for i in range(500)]
    texts = [
        " ".join(rng.choice(vocab, size=30, p=None)) for _ in range(400)
    ]
    df = pd.DataFrame({"text": texts})
    ds = rd.from_pandas(df).repartition(4)

    k, n_buckets = 5, 8
    parts = top_tokens_parts(ds, "text", k, n_buckets).to_pandas()
    assert len(parts) <= n_buckets * k  # the ONLY rows the driver sees

    out = top_tokens(ds, "text", k=k, n_buckets=n_buckets)
    brute = (
        df["text"].str.split().explode().value_counts().reset_index()
    )
    brute.columns = ["token", "n"]
    brute = brute.sort_values(
        ["n", "token"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    assert out["token"].tolist() == brute["token"].tolist()
    assert out["n"].tolist() == brute["n"].tolist()


def test_grouped_exact_distinct_bounded_and_exact():
    """grouped_exact_distinct must match a brute-force per-group
    nunique for both int and string value columns, without ever
    creating a reduce group per (group, value) pair."""
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sketch import (
        grouped_exact_distinct,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=5000),
        "v_int": rng.integers(0, 700, size=5000),
    })
    df["v_str"] = "u" + df["v_int"].astype(str)
    ds = rd.from_pandas(df).repartition(6)

    for col in ("v_int", "v_str"):
        got = (
            grouped_exact_distinct(ds, "g", col, alias="n", n_buckets=32)
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        want = (
            df.groupby("g")[col].nunique().reset_index(name="n")
            .sort_values("g").reset_index(drop=True)
        )
        assert got["g"].tolist() == want["g"].tolist()
        assert got["n"].tolist() == want["n"].tolist()


def test_prefix_scan_max_with_scale_unscales():
    # ADVICE r3: op="max" with scale must divide the fixed-point values
    # back out (it used to return the running max ×scale)
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.scan import prefix_scan

    rng = np.random.RandomState(7)
    n = 300
    df = pd.DataFrame({"k": rng.permutation(n),
                       "v": np.round(rng.uniform(0, 100, n), 2)})
    ds = rd.from_pandas(df).repartition(4)
    out = prefix_scan(ds, "k", "v", op="max", bucket_width=64,
                      scale=100).to_pandas().sort_values("k")
    ref = df.sort_values("k")
    scaled = np.floor(ref["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    want = np.maximum.accumulate(scaled) / 100
    assert np.array_equal(out["running_max"].to_numpy(), want)


def test_tumbling_window_freq_multiples():
    # ADVICE r3: the Arrow rewrite must keep pandas-style multiples
    # ("30min", "2h"), not just bare {"h","min","d"}
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.window import (
        tumbling_window,
    )

    ev = rd.from_pandas(pd.DataFrame({
        "event_type": ["x", "x", "x"],
        "ts": pd.to_datetime(["2024-01-01 10:05", "2024-01-01 10:40",
                              "2024-01-01 11:10"]),
        "value": [1.0, 2.0, 4.0],
    }))
    out = (tumbling_window(ev, freq="30min").to_pandas()
           .sort_values("window_start"))
    assert out["window_start"].tolist() == [
        "2024-01-01 10:00:00", "2024-01-01 10:30:00", "2024-01-01 11:00:00"]
    assert out["n"].tolist() == [1, 1, 1]

    out2 = (tumbling_window(ev, freq="2h").to_pandas()
            .sort_values("window_start"))
    assert out2["window_start"].tolist() == ["2024-01-01 10:00:00"]
    assert out2["n"].tolist() == [3]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="freq"):
        tumbling_window(ev, freq="fortnight")


def test_weighted_reservoir_empty_path_schema():
    # ADVICE r3: the all-filtered path must not leak the internal
    # __rk score column (schema must be input-independent)
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.sample import (
        weighted_reservoir_sample,
    )

    empty = weighted_reservoir_sample(
        rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "w": [0.0, -3.0]})),
        "doc_id", "w", k=5).to_pandas()
    assert len(empty) == 0
    assert "__rk" not in empty.columns


def test_late_event_filter_watermark_semantics():
    # bounded-out-of-orderness watermark: an event survives iff its
    # event time is at most lateness behind the max event time already
    # seen in ARRIVAL order (inclusive running max == an event is never
    # late w.r.t. itself)
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.window import (
        late_event_filter,
        watermarked_tumbling_window,
    )

    base = pd.Timestamp("2024-01-01 10:00:00")
    # arrival order: t+0h, t+3h (advances watermark), then stragglers
    # 1h / 2h / 4h behind the 13:00 watermark, then t+3h30
    rows = pd.DataFrame({
        "arrival": [0, 1, 2, 3, 4, 5],
        "ts": [base, base + pd.Timedelta(hours=3),
               base + pd.Timedelta(hours=2),      # 1h late  -> keep @2h
               base + pd.Timedelta(hours=1),      # 2h late  -> drop @<2h... keep @2h (>=)
               base - pd.Timedelta(hours=1),      # 4h late  -> drop @2h
               base + pd.Timedelta(hours=3, minutes=30)],
        "event_type": ["x"] * 6,
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
    })
    ds = rd.from_pandas(rows).repartition(3)

    kept = late_event_filter(ds, "arrival", lateness_sec=2 * 3600,
                             bucket_width=2).to_pandas()
    # 2h-late straggler sits exactly AT watermark - lateness: kept (>=)
    assert sorted(kept["value"].tolist()) == [1.0, 2.0, 4.0, 8.0, 32.0]
    assert "__wm_us" not in kept.columns and "__ts_us" not in kept.columns

    strict = late_event_filter(ds, "arrival", lateness_sec=3600 - 1,
                               bucket_width=2).to_pandas()
    assert sorted(strict["value"].tolist()) == [1.0, 2.0, 32.0]

    # singleton oracle: per-window aggregate over survivors only
    agg = (watermarked_tumbling_window(ds, lateness_sec=2 * 3600,
                                       bucket_width=2)
           .to_pandas().sort_values("window_start"))
    assert agg["window_start"].tolist() == [
        "2024-01-01 10:00:00", "2024-01-01 11:00:00",
        "2024-01-01 12:00:00", "2024-01-01 13:00:00"]
    assert agg["n"].tolist() == [1, 1, 1, 2]
    assert agg["sum_value"].tolist() == [1.0, 8.0, 4.0, 34.0]


@pytest.mark.parametrize("seed", [0, 7, 23])
def test_late_event_filter_randomized_oracle(seed):
    # randomized arrival orders with heavy jitter, duplicate event
    # times and watermark ties vs the pandas cummax oracle — the
    # distributed prefix-scan watermark must match exactly
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.window import (
        late_event_filter,
    )

    rng = np.random.RandomState(seed)
    n = 300
    base_us = 1_700_000_000 * 1_000_000
    # event times: random walk with duplicates (whole seconds)
    ts_us = base_us + np.sort(
        rng.randint(0, 48 * 3600, n)).astype(np.int64) * 1_000_000
    # arrival: event order with jitter up to ±40 positions
    arrival = np.argsort(np.arange(n) + rng.randint(-40, 40, n),
                         kind="stable").argsort().astype(np.int64)
    df = pd.DataFrame({
        "arrival": arrival,
        "ts": pd.to_datetime(ts_us, unit="us"),
        "eid": np.arange(n),
    })
    lateness = int(rng.choice([0, 1, 3600, 7200]))

    kept = late_event_filter(
        rd.from_pandas(df.sample(frac=1.0, random_state=rng)).repartition(5),
        "arrival", lateness_sec=lateness, bucket_width=64).to_pandas()

    o = df.sort_values("arrival")
    wm = o["ts"].astype("int64").cummax()  # ns
    surv = o[o["ts"].astype("int64") >= wm - lateness * 1_000_000_000]
    assert sorted(kept["eid"].tolist()) == sorted(surv["eid"].tolist())


def test_watermarked_hopping_window():
    # sliding sibling of the tumbling test above: same survivors
    # (lateness 2h drops only the 4h-late straggler), then 1h windows
    # hopping every 30min — each survivor lands in exactly 2 windows
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.window import (
        watermarked_hopping_window,
    )

    base = pd.Timestamp("2024-01-01 10:00:00")
    rows = pd.DataFrame({
        "arrival": [0, 1, 2, 3, 4, 5],
        "ts": [base, base + pd.Timedelta(hours=3),
               base + pd.Timedelta(hours=2),
               base + pd.Timedelta(hours=1),
               base - pd.Timedelta(hours=1),      # 4h late -> dropped
               base + pd.Timedelta(hours=3, minutes=30)],
        "event_type": ["x"] * 6,
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
    })
    ds = rd.from_pandas(rows).repartition(3)

    agg = (watermarked_hopping_window(ds, window_sec=3600, hop_sec=1800,
                                      lateness_sec=2 * 3600, bucket_width=2)
           .to_pandas().sort_values("window_start"))

    # pandas oracle over the survivor set
    surv = rows[rows["value"] != 16.0]
    t0 = int(base.timestamp())
    want = {}
    for _, r in surv.iterrows():
        s = int(r["ts"].timestamp()) // 1800 * 1800
        for start in (s - 1800, s):
            n, sv = want.get(start, (0, 0.0))
            want[start] = (n + 1, sv + r["value"])
    assert dict(zip(agg["window_start"],
                    zip(agg["n"], agg["sum_value"]))) == want
    # the 13:00 window holds both the 13:00 and 13:30 events
    assert want[t0 + 3 * 3600] == (2, 34.0)


@pytest.mark.parametrize("seed", [1, 13])
def test_watermarked_windows_fused_stats(seed):
    # ONE-scan fusion (round-4 verdict #3): stats_out={} must yield
    # (a) the exact same aggregate rows as the unfused path and
    # (b) the exact same stats dict as a standalone late_event_stats —
    # for both tumbling and hopping.
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.window import (
        late_event_stats,
        watermarked_hopping_window,
        watermarked_tumbling_window,
    )

    rng = np.random.RandomState(seed)
    n = 400
    base_us = 1_700_000_000 * 1_000_000
    ts_us = base_us + np.sort(
        rng.randint(0, 24 * 3600, n)).astype(np.int64) * 1_000_000
    arrival = np.argsort(np.arange(n) + rng.randint(-60, 60, n),
                         kind="stable").argsort().astype(np.int64)
    df = pd.DataFrame({
        "arrival": arrival,
        "ts": pd.to_datetime(ts_us, unit="us"),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": rng.uniform(0, 10, n).round(2),
    })
    ds = rd.from_pandas(df).repartition(5)
    lateness = 1800

    want_stats = late_event_stats(ds, "arrival", lateness_sec=lateness,
                                  bucket_width=64)
    base_agg = (watermarked_tumbling_window(
        ds, lateness_sec=lateness, bucket_width=64)
        .to_pandas().sort_values(["event_type", "window_start"])
        .reset_index(drop=True))

    stats: dict = {}
    fused = (watermarked_tumbling_window(
        ds, lateness_sec=lateness, bucket_width=64, stats_out=stats)
        .to_pandas().sort_values(["event_type", "window_start"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        fused[base_agg.columns], base_agg, check_dtype=False)
    assert stats == want_stats

    base_hop = (watermarked_hopping_window(
        ds, window_sec=3600, hop_sec=1800, lateness_sec=lateness,
        bucket_width=64)
        .to_pandas().sort_values(["event_type", "window_start"])
        .reset_index(drop=True))
    hstats: dict = {}
    fused_hop = (watermarked_hopping_window(
        ds, window_sec=3600, hop_sec=1800, lateness_sec=lateness,
        bucket_width=64, stats_out=hstats)
        .to_pandas().sort_values(["event_type", "window_start"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        fused_hop[base_hop.columns], base_hop, check_dtype=False)
    assert hstats == want_stats

    # non-string key refuses loudly (sentinel rows share the key col)
    with pytest.raises(ValueError, match="string key"):
        watermarked_tumbling_window(
            rd.from_pandas(df.assign(event_type=1)), stats_out={})


def test_prefix_scan_quantile_buckets_skewed_key():
    # a pathologically skewed order key (99% of rows in [0,100], a few
    # huge outliers) puts everything in ONE fixed-width bucket; the
    # quantile mode balances load AND stays exact vs the cumulative
    # oracle (any monotone bucketing gives the same scan)
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.scan import (
        _profile,
        prefix_scan,
    )

    rng = np.random.RandomState(3)
    n = 2000
    # a unique skewed key: 1980 keys dense in [0, 1980), 20 huge outliers
    order = np.concatenate([np.arange(n - 20, dtype=np.int64),
                            10**9 + np.arange(20, dtype=np.int64) * 10**7])
    vals = np.round(rng.uniform(-10, 10, n), 2)
    df = pd.DataFrame({"k": rng.permutation(order), "v": vals})
    ds = rd.from_pandas(df).repartition(4)

    out = prefix_scan(ds, "k", "v", op="sum", scale=100,
                      quantile_buckets=8).to_pandas().sort_values("k")
    ref = df.sort_values("k")
    want = np.floor(ref["v"].to_numpy() * 100 + 0.5).astype(np.int64).cumsum() / 100
    assert np.array_equal(out["running_sum"].to_numpy(), want)

    # max + quantile buckets also exact
    outm = prefix_scan(ds, "k", "v", op="max",
                       quantile_buckets=8).to_pandas().sort_values("k")
    assert np.array_equal(outm["running_max"].to_numpy(),
                          np.maximum.accumulate(ref["v"].to_numpy()))

    # balance evidence: quantile edges split the skewed key into
    # buckets where no bucket holds more than ~half the rows (fixed
    # width 65536 would put 99% into bucket 0)
    src = rd.from_pandas(df).repartition(4)
    n_rows, samp = _profile(src, "k")
    assert n_rows == n  # the pruned pass recovers the exact row count
    edges = np.unique(np.quantile(
        samp, np.linspace(0, 1, 9)[1:-1]).astype(np.int64))
    bk = np.searchsorted(edges, df["k"].to_numpy(), side="right")
    counts = np.bincount(bk)
    assert counts.max() <= 0.5 * n
    fixed = np.bincount(df["k"].to_numpy() // 65536)
    assert fixed.max() >= 0.98 * n  # the failure mode quantiles fix


def test_prefix_scan_streams_without_materialize(monkeypatch):
    # the 100 TB contract: above pin_threshold_rows the corpus is
    # never pinned in the object store — three streaming passes, no
    # Dataset.materialize (threshold lowered so a 500-row input is
    # "above" it; the default auto-pin for small inputs is covered by
    # test_prefix_scan_auto_pins_small)
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.scan import prefix_scan

    def boom(self, *a, **k):
        raise AssertionError("prefix_scan materialized the corpus")

    monkeypatch.setattr(rd.Dataset, "materialize", boom)
    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                       "v": np.ones(500, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(4)
    out = prefix_scan(ds, "k", "v", op="sum",
                      pin_threshold_rows=100).to_pandas().sort_values("k")
    assert np.array_equal(out["running_sum"].to_numpy(),
                          np.arange(1, 501, dtype=np.int64))
    # pin=False forces streaming at any size; quantile and fixed-width
    # modes stream too
    out2 = prefix_scan(ds, "k", "v", op="max",
                       quantile_buckets=4, pin=False).to_pandas()
    assert len(out2) == 500
    out3 = prefix_scan(ds, "k", "v", op="sum",
                       bucket_width=100, pin=False).to_pandas()
    assert len(out3) == 500


def test_prefix_scan_counted_pin_boundaries():
    # threshold boundary: exactly-at-threshold pins, one-above bails
    # to streaming; empty input degrades to the schema-stable empty
    # path through the same counted-pin probe
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.scan import prefix_scan
    from agentic_rag_for_multi_model_pdf_extraction_ray.util import (
        counted_pin as _counted_pin,
    )

    df = pd.DataFrame({"k": np.arange(64, dtype=np.int64),
                       "v": np.ones(64, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(4)
    assert _counted_pin(ds, 64) is not None       # == threshold: pin
    assert _counted_pin(ds, 63) is None           # > threshold: stream
    empty = rd.from_pandas(df.iloc[:0])
    # empty source must NOT pin: zero-row blocks can carry an unknown
    # schema and the schema-stable empty path needs the original types
    assert _counted_pin(empty, 64) is None
    out = prefix_scan(empty, "k", "v", op="sum").to_pandas()
    # Ray 2.49 drops schema through map_batches over zero-row blocks,
    # so only the row count is checkable here
    assert len(out) == 0
    # both boundary modes produce the same scan
    lo = prefix_scan(ds, "k", "v", op="sum",
                     pin_threshold_rows=64).to_pandas().sort_values("k")
    hi = prefix_scan(ds, "k", "v", op="sum",
                     pin_threshold_rows=63).to_pandas().sort_values("k")
    assert np.array_equal(lo["running_sum"].to_numpy(),
                          hi["running_sum"].to_numpy())


def test_prefix_scan_auto_pins_small(tmp_path, monkeypatch):
    # pin="auto" (default): a source at/below pin_threshold_rows pays
    # exactly ONE upstream execution (the counted pin holds the block
    # refs; profile/partials/scan read the pinned blocks) — re-reads
    # dominate at small scale (round-5 interleaved A/B).  Dataset
    # .materialize() is never used on the auto path at all.
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.scan import prefix_scan

    def boom(self, *a, **k):
        raise AssertionError("auto pin must not call materialize()")

    monkeypatch.setattr(rd.Dataset, "materialize", boom)

    probe = tmp_path / "exec_count"

    def tally(t):
        # one line per executed upstream batch; 4 blocks × batch_size=
        # None → 4 lines per full execution of the source
        with open(probe, "a") as f:
            f.write("x\n")
        return t

    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                       "v": np.ones(500, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(4).map_batches(
        tally, batch_format="pyarrow", batch_size=None)
    out = prefix_scan(ds, "k", "v", op="sum").to_pandas().sort_values("k")
    assert np.array_equal(out["running_sum"].to_numpy(),
                          np.arange(1, 501, dtype=np.int64))
    assert probe.read_text().count("x") == 4  # one execution, 4 blocks


def test_prefix_scan_pin_materializes_once(monkeypatch):
    # pin=True is the explicit opt-in for expensive computed upstreams:
    # exactly one materialize of the source
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.scan import prefix_scan

    calls = []
    orig = rd.Dataset.materialize

    def counting(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(rd.Dataset, "materialize", counting)
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                       "v": np.ones(100, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(2)
    out = prefix_scan(ds, "k", "v", op="sum", pin=True).to_pandas()
    assert len(out) == 100 and len(calls) == 1


def test_prefix_scan_bucket_count_bounded():
    # the derived bucket count obeys rows_per_bucket and _MAX_BUCKETS —
    # the driver-side offsets stay O(buckets) at any corpus size
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops import scan as scan_mod

    df = pd.DataFrame({"k": np.arange(10_000, dtype=np.int64),
                       "v": np.ones(10_000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(4)
    out = scan_mod.prefix_scan(ds, "k", "v", op="sum",
                               rows_per_bucket=1000).to_pandas()
    assert np.array_equal(np.sort(out["running_sum"].to_numpy()),
                          np.arange(1, 10_001, dtype=np.int64))
    # a forced bucket count above the cap is clamped
    outc = scan_mod.prefix_scan(ds, "k", "v", op="sum",
                                quantile_buckets=scan_mod._MAX_BUCKETS * 4
                                ).to_pandas()
    assert np.array_equal(np.sort(outc["running_sum"].to_numpy()),
                          np.arange(1, 10_001, dtype=np.int64))


def test_late_event_stats_counts():
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.window import (
        late_event_stats,
    )

    base = pd.Timestamp("2024-01-01 10:00:00")
    rows = pd.DataFrame({
        "arrival": [0, 1, 2, 3, 4, 5],
        "ts": [base, base + pd.Timedelta(hours=3),
               base + pd.Timedelta(hours=2),
               base + pd.Timedelta(hours=1),
               base - pd.Timedelta(hours=1),
               base + pd.Timedelta(hours=3, minutes=30)],
        "event_type": ["x"] * 6,
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
    })
    ds = rd.from_pandas(rows).repartition(3)
    s = late_event_stats(ds, "arrival", lateness_sec=2 * 3600, bucket_width=2)
    assert s["n_total"] == 6
    assert s["n_late"] == 1            # only the 4h-late straggler
    assert s["max_lateness_sec"] == 4 * 3600.0
