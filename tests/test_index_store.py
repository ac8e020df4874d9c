"""Persisted LSH index (bucket-partitioned parquet), partial upsert
semantics, manifest layout guard, zero-span doc lineage."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.ops.similarity import (
    build_lsh_index_store,
    knn_bruteforce,
    query_lsh_index,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.vector_store import (
    build_store_index,
    query_store,
    upsert_chunks,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.state.manifest import read_output


def _vectors(n=300, d=32, seed=2):
    rng = np.random.RandomState(seed)
    M = rng.normal(size=(n, d))
    return M, rd.from_pandas(pd.DataFrame(
        {"vec_id": range(n), "embedding": [r.tolist() for r in M]}
    )).repartition(4)


def test_persisted_index_prunes_and_ranks(tmp_path):
    M, ds = _vectors()
    idx = str(tmp_path / "idx")
    rows = build_lsh_index_store(ds, idx, n_bits=4)
    assert sum(r["rows"] for r in rows) == 300
    assert os.path.isfile(os.path.join(idx, "_INDEX.json"))

    q = M[0]
    hits, stats = query_lsh_index(idx, q, k=5, n_probes=2, exclude_ids={0})
    # partition pruning: strictly fewer buckets read than exist
    assert stats["files_read"] <= stats["buckets_probed"] < stats["buckets_total"]
    assert len(hits) == 5

    # recall vs brute force over the same data (deterministic seed)
    brute = knn_bruteforce(ds, q, k=5, exclude_ids={0})
    recall = len(set(hits["vec_id"]) & set(brute["vec_id"])) / 5
    assert recall >= 0.6

    # full probe (covering every bucket) is exact
    hits_all, stats_all = query_lsh_index(idx, q, k=5, n_probes=4,
                                          exclude_ids={0})
    assert stats_all["buckets_probed"] == stats_all["buckets_total"]
    assert hits_all["vec_id"].tolist() == brute["vec_id"].tolist()


def test_ivf_index_prunes_and_full_probe_exact(tmp_path):
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.similarity import (
        build_ivf_index_store,
        query_ivf_index,
    )

    M, ds = _vectors(n=400, d=24, seed=9)
    idx = str(tmp_path / "ivf")
    rows = build_ivf_index_store(ds, idx, n_centroids=16)
    assert sum(r["rows"] for r in rows) == 400

    q = M[7]
    hits, stats = query_ivf_index(idx, q, k=5, nprobe=4, exclude_ids={7})
    assert stats["files_read"] <= 4 < stats["buckets_total"]
    assert len(hits) == 5
    brute = knn_bruteforce(ds, q, k=5, exclude_ids={7})
    recall = len(set(hits["vec_id"]) & set(brute["vec_id"])) / 5
    assert recall >= 0.6

    hits_all, stats_all = query_ivf_index(idx, q, k=5, nprobe=16,
                                          exclude_ids={7})
    assert hits_all["vec_id"].tolist() == brute["vec_id"].tolist()


def test_ivf_nprobe_tuning(tmp_path):
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.similarity import (
        build_ivf_index_store,
        query_index,
        query_ivf_index,
        tune_ivf_nprobe,
    )

    M, ds = _vectors(n=400, d=24, seed=9)
    idx = str(tmp_path / "ivf")
    build_ivf_index_store(ds, idx, n_centroids=16)

    sweep = tune_ivf_nprobe(ds, idx, M[:8], k=5, nprobes=(1, 2, 4, 16),
                            target_recall=0.95)
    # recall is monotone nondecreasing in nprobe, exact at full probe
    r = sweep.sort_values("nprobe")["recall_at_k"].to_numpy()
    assert np.all(np.diff(r) >= -1e-9)
    assert r[-1] == 1.0
    # pruning visible: fewer rows scanned at nprobe=1 than full probe
    f = sweep.sort_values("nprobe")["frac_rows"].to_numpy()
    assert f[0] < f[-1] == 1.0

    # persisted recommendation = smallest nprobe reaching the target,
    # and nprobe=None routes through it
    tuning = json.load(open(os.path.join(idx, "_TUNING.json")))
    rec = tuning["recommended_nprobe"]
    assert rec == int(sweep[sweep["recall_at_k"] >= 0.95]["nprobe"].min())
    hits, stats = query_ivf_index(idx, M[7], k=5, nprobe=None)
    assert stats["nprobe"] == rec and len(hits) == 5
    assert stats["rows_scanned"] >= len(hits)

    # the kind dispatcher uses the tuned value by DEFAULT...
    hits2, stats2 = query_index(idx, M[7], k=5)
    assert stats2["nprobe"] == rec and stats2["tuned"]
    assert hits2["vec_id"].tolist() == hits["vec_id"].tolist()
    # ...but an explicitly passed knob is always honored (ADVICE r4)
    _, stats3 = query_index(idx, M[7], k=5, n_probes=1)
    assert stats3["nprobe"] == 2 and not stats3["tuned"]  # 1 → 2 centroids


def test_lsh_nprobes_tuning(tmp_path):
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.similarity import (
        query_index,
        tune_lsh_nprobes,
    )

    M, ds = _vectors(n=400, d=24, seed=9)
    idx = str(tmp_path / "lsh")
    build_lsh_index_store(ds, idx, n_bits=4)

    sweep = tune_lsh_nprobes(ds, idx, M[:8], k=5, n_probes_list=(0, 1, 2, 4),
                             target_recall=0.95)
    r = sweep.sort_values("n_probes")["recall_at_k"].to_numpy()
    f = sweep.sort_values("n_probes")["frac_rows"].to_numpy()
    assert np.all(np.diff(r) >= -1e-9)
    # radius n_bits probes every bucket = exact, full scan
    assert r[-1] == 1.0 and f[-1] == 1.0 and f[0] < 1.0

    tuning = json.load(open(os.path.join(idx, "_TUNING.json")))
    rec = tuning["recommended_n_probes"]
    assert rec == int(sweep[sweep["recall_at_k"] >= 0.95]["n_probes"].min())
    hits, stats = query_lsh_index(idx, M[7], k=5, n_probes=None)
    assert stats["n_probes"] == rec and len(hits) == 5

    # dispatcher defaults to the tuned radius for LSH too...
    hits2, stats2 = query_index(idx, M[7], k=5)
    assert stats2["n_probes"] == rec and stats2["tuned"]
    assert hits2["vec_id"].tolist() == hits["vec_id"].tolist()
    # ...while an explicit radius always wins (ADVICE r4)
    _, stats3 = query_index(idx, M[7], k=5, n_probes=0)
    assert stats3["n_probes"] == 0 and not stats3["tuned"]


def _chunks(texts):
    return rd.from_pandas(pd.DataFrame({
        "chunk_id": list(texts),
        "kind": ["text"] * len(texts),
        "structured_text": list(texts.values()),
    }))


def test_partial_upsert_preserves_other_chunks(tmp_path):
    store = str(tmp_path / "store")
    full = {f"c{i}": f"content number {i} alpha beta" for i in range(10)}
    upsert_chunks(_chunks(full), store, dim=32, n_partitions=4, concurrency=1)
    assert read_output(store).num_rows == 10

    # re-ingest ONE updated chunk: the other 9 must survive
    upsert_chunks(_chunks({"c3": "revised content gamma"}), store, dim=32,
                  n_partitions=4, concurrency=1)
    t = read_output(store)
    assert t.num_rows == 10
    assert sorted(t.column("chunk_id").to_pylist()) == sorted(full)


def test_store_index_query_path(tmp_path):
    store = str(tmp_path / "store")
    full = {f"c{i}": f"topic {i} " + "ray data streaming " * (i + 1)
            for i in range(12)}
    upsert_chunks(_chunks(full), store, dim=32, n_partitions=4, concurrency=1)
    idx = str(tmp_path / "idx")
    build_store_index(store, idx, n_bits=3)
    hits = query_store(store, "ray data streaming", top_k=3, dim=32,
                       index_dir=idx, n_probes=3)
    assert len(hits) == 3


def _raw_docs(n=40):
    from agentic_rag_for_multi_model_pdf_extraction_ray.synth import (
        synthesize_raw_batch,
    )

    base = rd.from_pandas(pd.DataFrame({
        "doc_id": list(range(n)),
        "text": [f"document {i} " + "alpha beta gamma delta epsilon " * 8
                 for i in range(n)],
    }))
    return base.map_batches(synthesize_raw_batch, batch_format="pyarrow")


def test_layout_mismatch_refused(tmp_path):
    from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.extract import (
        run_extraction,
    )

    out = str(tmp_path / "out")
    run_extraction(_raw_docs(), out, n_partitions=4, concurrency=1)
    # same layout resumes cleanly (everything already complete)
    m = run_extraction(_raw_docs(), out, n_partitions=4, concurrency=1)
    assert m == [] or all(r.get("num_docs") is not None for r in m)
    # different n_partitions must refuse, not silently mix layouts
    with pytest.raises(ValueError, match="layout"):
        run_extraction(_raw_docs(), out, n_partitions=8, concurrency=1)


def test_zero_span_docs_have_lineage(tmp_path):
    from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.extract import (
        run_extraction,
    )

    out = str(tmp_path / "out")
    raw = rd.from_pandas(pd.DataFrame({
        "doc_id": ["d-real", "d-empty"],
        "payload": [
            "<h1>Heading</h1><p>" + "alpha beta gamma delta " * 5 + "</p>",
            "<p>tiny</p>",  # below MIN_TEXT_LEN → zero spans
        ],
    }))
    run_extraction(raw, out, n_partitions=2, concurrency=1)
    t = read_output(out)
    assert sorted(t.column("doc_id").to_pylist()) == ["d-empty", "d-real"]
    import pyarrow.compute as pc

    lens = dict(zip(t.column("doc_id").to_pylist(),
                    pc.list_value_length(t.column("spans")).to_pylist()))
    assert lens["d-empty"] == 0 and lens["d-real"] > 0
    with open(os.path.join(out, "_RUN_METRICS.json")) as f:
        metrics = json.load(f)
    assert metrics["num_docs_empty"] == 1
    assert metrics["num_docs"] == 2


def test_ivf_query_filter_fn(tmp_path):
    # filter_fn parity with the LSH index query (kind-style metadata
    # filter applied to probed candidates only)
    import numpy as np

    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.similarity import (
        build_ivf_index_store,
        query_ivf_index,
    )

    rng = np.random.RandomState(2)
    rows = [{"vec_id": i, "embedding": rng.normal(size=16).tolist(),
             "kind": "figure" if i % 3 == 0 else "text"} for i in range(60)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    idx = str(tmp_path / "ivf")
    build_ivf_index_store(ds, idx, n_centroids=4)
    q = np.asarray(rows[5]["embedding"])
    hits, stats = query_ivf_index(idx, q, k=5, nprobe=4,
                                  filter_fn=lambda b: b[b["kind"] == "figure"])
    assert len(hits) == 5
    assert all(int(v) % 3 == 0 for v in hits["vec_id"])
    assert stats["files_read"] >= 1 and stats["paths"]


def test_token_hash_sentinel_guards_index_and_store(tmp_path):
    # ADVICE r3: persisted indexes/stores record hash_tokens(["a"]) at
    # build time and refuse to serve queries on a drifted installation
    from agentic_rag_for_multi_model_pdf_extraction_ray.functions.hashing import (
        token_hash_fingerprint,
    )

    M, ds = _vectors(n=60, d=16)
    idx = str(tmp_path / "idx")
    build_lsh_index_store(ds, idx, n_bits=3)
    meta_path = os.path.join(idx, "_INDEX.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["token_hash_sentinel"] == token_hash_fingerprint()

    # untampered: query serves
    hits, _ = query_lsh_index(idx, M[0], k=3, n_probes=3)
    assert len(hits) == 3

    # tampered sentinel (simulated hash drift): loud refusal
    meta["token_hash_sentinel"] = meta["token_hash_sentinel"] ^ 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(RuntimeError, match="token-hash mismatch"):
        query_lsh_index(idx, M[0], k=3)

    # store-level sentinel rides _STORE.json through upsert/query
    chunks = rd.from_pandas(pd.DataFrame({
        "chunk_id": [f"c{i}" for i in range(8)],
        "structured_text": [f"alpha beta {i}" for i in range(8)],
        "kind": ["text"] * 8,
    }))
    store = str(tmp_path / "store")
    upsert_chunks(chunks, store, dim=32, n_partitions=2, concurrency=1)
    spath = os.path.join(store, "_STORE.json")
    with open(spath) as f:
        smeta = json.load(f)
    assert smeta["token_hash_sentinel"] == token_hash_fingerprint()
    assert len(query_store(store, "alpha", top_k=2, dim=32)) == 2
    smeta["token_hash_sentinel"] ^= 1
    with open(spath, "w") as f:
        json.dump(smeta, f)
    with pytest.raises(RuntimeError, match="token-hash mismatch"):
        query_store(store, "alpha", top_k=2, dim=32)


def test_store_index_kind_dispatch_ivf(tmp_path):
    # index-type parity: build_store_index(kind="ivf") and the SAME
    # query_store call serves it (dispatch on _INDEX.json kind), with
    # an exact-agreement check against brute force at full probe
    store = str(tmp_path / "store")
    full = {f"c{i}": f"topic {i} " + "ray data streaming " * (i + 1)
            for i in range(12)}
    upsert_chunks(_chunks(full), store, dim=32, n_partitions=4, concurrency=1)
    idx = str(tmp_path / "ivf")
    build_store_index(store, idx, kind="ivf", n_centroids=3)
    with open(os.path.join(idx, "_INDEX.json")) as f:
        assert json.load(f)["kind"] == "ivf"

    hits = query_store(store, "ray data streaming", top_k=3, dim=32,
                       index_dir=idx, n_probes=3)  # nprobe=6 ≥ all 3 cells
    brute = query_store(store, "ray data streaming", top_k=3, dim=32)
    assert hits["chunk_id"].tolist() == brute["chunk_id"].tolist()

    with pytest.raises(ValueError, match="kind"):
        build_store_index(store, str(tmp_path / "bad"), kind="flat")


def test_store_dim_mismatch_refused(tmp_path):
    # re-upserting with a different embedding dim must fail BEFORE any
    # partition merge (mixed-dim partitions would poison every query)
    chunks = rd.from_pandas(pd.DataFrame({
        "chunk_id": ["a", "b"],
        "structured_text": ["alpha beta", "gamma delta"],
        "kind": ["text", "text"],
    }))
    store = str(tmp_path / "store")
    upsert_chunks(chunks, store, dim=32, n_partitions=2, concurrency=1)
    with pytest.raises(ValueError, match="dim"):
        upsert_chunks(chunks, store, dim=64, n_partitions=2, concurrency=1)
    # same dim re-upsert remains fine (idempotent)
    upsert_chunks(chunks, store, dim=32, n_partitions=2, concurrency=1)


def test_store_sentinel_drift_refuses_reupsert(tmp_path):
    # ADVICE r4: a re-upsert on an installation whose token hash has
    # drifted must be refused BEFORE _STORE.json is overwritten —
    # otherwise old rows keep old-hash embeddings, new rows get
    # new-hash ones, and the sentinel evidence is clobbered.
    chunks = rd.from_pandas(pd.DataFrame({
        "chunk_id": ["a", "b"],
        "structured_text": ["alpha beta", "gamma delta"],
        "kind": ["text", "text"],
    }))
    store = str(tmp_path / "store")
    upsert_chunks(chunks, store, dim=32, n_partitions=2, concurrency=1)
    spath = os.path.join(store, "_STORE.json")
    with open(spath) as f:
        smeta = json.load(f)
    drifted = dict(smeta, token_hash_sentinel=smeta["token_hash_sentinel"] ^ 1)
    with open(spath, "w") as f:
        json.dump(drifted, f)
    with pytest.raises(ValueError, match="sentinel"):
        upsert_chunks(chunks, store, dim=32, n_partitions=2, concurrency=1)
    # the drifted meta file survives untouched (evidence preserved)
    with open(spath) as f:
        assert json.load(f) == drifted
