"""Distributed dedup machinery: connected components vs a union-find
oracle, blocked exact cosine vs numpy brute force, LSH candidate
recall, generic (string) ids, within-bucket pair generation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.ops.dedup import (
    _distinct_pairs,
    _within_bucket_pairs,
    connected_components_min_label,
    cosine_lsh_pair_ds,
    cosine_near_dup_pairs,
    minhash_dedup_clusters,
    ngram_jaccard_pairs,
    simhash_near_dups,
)


def _union_find_components(edges, nodes):
    """Driver-side oracle: min-id label per connected component."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


def test_connected_components_matches_union_find():
    rng = np.random.RandomState(7)
    # several chains + stars + singleton-free edge soup
    edges = []
    for base in range(0, 60, 10):
        chain = list(range(base, base + 7))
        edges += list(zip(chain, chain[1:]))          # diameter-6 chains
    edges += [(100, x) for x in range(101, 110)]       # star
    extra = rng.randint(200, 260, size=(30, 2))
    edges += [tuple(sorted(e)) for e in extra if e[0] != e[1]]
    nodes = sorted({x for e in edges for x in e})

    eds = rd.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    got = connected_components_min_label(eds).to_pandas()
    want = _union_find_components(edges, nodes)
    gm = dict(zip(got["node"], got["label"]))
    assert gm == want


def test_connected_components_long_chain_pointer_doubling():
    # a 48-node path has diameter 47: plain 1-hop propagation needs 47
    # rounds, pointer-doubling ~log2(47) ≈ 6 — must converge well
    # inside the default max_iters and label every node with the min
    chain = list(range(100, 148))
    edges = list(zip(chain, chain[1:]))
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    got = connected_components_min_label(eds, max_iters=10).to_pandas()
    assert dict(zip(got["node"], got["label"])) == {n: 100 for n in chain}


def test_within_bucket_pairs_all_and_star():
    g = pd.DataFrame({
        "bk": [1, 1, 1, 2, 2, 3] + [9] * 10,
        "id": [3, 1, 2, 5, 4, 9] + list(range(20, 30)),
    })
    out = _within_bucket_pairs(g, "bk", "id", cap=5)
    pairs = set(zip(out["a"], out["b"]))
    # bucket 1: all pairs; bucket 2: the pair; bucket 3: none
    assert {(1, 2), (1, 3), (2, 3), (4, 5)} <= pairs
    # bucket 9 exceeds cap → star pairs against min id 20 only
    star = {p for p in pairs if p[0] == 20}
    assert len(star) == 9
    assert not {p for p in pairs if p[0] > 20 and p[1] > 20 and p[0] >= 20}


def test_distinct_pairs_string_ids():
    cand = rd.from_pandas(pd.DataFrame({
        "a": ["d1", "d1", "d2", "d1"],
        "b": ["d2", "d2", "d9", "d3"],
    }))
    out = _distinct_pairs(cand).to_pandas()
    assert set(zip(out["a"], out["b"])) == {("d1", "d2"), ("d2", "d9"), ("d1", "d3")}


def test_minhash_clusters_string_ids():
    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [
        {"doc_id": "b-doc", "text": base},
        {"doc_id": "a-doc", "text": base + "tail"},
        {"doc_id": "z-doc", "text": "entirely unrelated content about pipelines " * 5},
    ]
    out = minhash_dedup_clusters(rd.from_pandas(pd.DataFrame(rows)), threshold=0.6)
    m = dict(zip(out["doc_id"], out["cluster_id"]))
    assert m["a-doc"] == m["b-doc"] == "a-doc"
    assert m["z-doc"] == "z-doc"


def test_cosine_blocked_matches_numpy_bruteforce():
    rng = np.random.RandomState(3)
    M = rng.normal(size=(120, 16))
    # plant near-dups
    M[50] = M[10] + 0.01 * rng.normal(size=16)
    M[51] = M[10] + 0.02 * rng.normal(size=16)
    rows = [{"vec_id": i, "embedding": M[i].tolist()} for i in range(len(M))]
    thr = 0.6
    got = cosine_near_dup_pairs(rd.from_pandas(pd.DataFrame(rows)).repartition(5),
                                threshold=thr, n_blocks=4)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    ii, jj = np.nonzero(np.triu(S >= thr, k=1))
    want = set(zip(ii.tolist(), jj.tolist()))
    assert set(zip(got["a"], got["b"])) == want


def test_cosine_lsh_recall_at_high_threshold():
    rng = np.random.RandomState(5)
    M = rng.normal(size=(150, 32))
    for i in range(10):  # ten planted near-dup pairs
        M[100 + i] = M[i] + 0.05 * rng.normal(size=32)
    rows = [{"vec_id": i, "embedding": M[i].tolist()} for i in range(len(M))]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    thr = 0.95
    got = cosine_lsh_pair_ds(ds, threshold=thr).to_pandas()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    ii, jj = np.nonzero(np.triu(S >= thr, k=1))
    want = set(zip(ii.tolist(), jj.tolist()))
    assert want, "test setup must plant pairs above threshold"
    assert set(zip(got["a"], got["b"])) == want  # miss prob < 1e-7 per pair


def test_simhash_and_ngram_return_dataset_backed_results():
    base = " ".join(f"w{i} w{i}" for i in range(80))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " qq"},
        {"doc_id": 3, "text": "nothing in common with those documents at all " * 6},
    ]
    # measured under the engine's token-hash contract (hash_tokens):
    # the one-token edit lands at hamming 6 (unrelated doc: 32) and
    # the pair still shares an LSH band
    pairs = simhash_near_dups(rd.from_pandas(pd.DataFrame(rows)), max_hamming=6)
    assert (1, 2) in set(zip(pairs["a"], pairs["b"]))
    assert 3 not in set(pairs["a"]) | set(pairs["b"])
    j = ngram_jaccard_pairs(rd.from_pandas(pd.DataFrame(rows)), n=3, threshold=0.3)
    assert (1, 2) in set(zip(j["a"], j["b"]))


def test_attach_labels_preserves_big_int64_ids():
    # both attach paths must keep int64 ids/labels >= 2^53 exact
    # (the dict-map/float64 round-trip corrupted them)
    import numpy as np
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.dedup import (
        attach_component_labels,
    )

    big = 2**53 + 1
    ids = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([big, big + 2, big + 4], dtype=np.int64)}))
    labels = rd.from_pandas(pd.DataFrame({
        "node": np.array([big + 2], dtype=np.int64),
        "label": np.array([big], dtype=np.int64),
    }))
    for thresh in (10, 0):  # broadcast path, then join path
        out = attach_component_labels(
            ids, labels, broadcast_threshold=thresh).to_pandas()
        got = {int(i): int(c) for i, c in zip(out["doc_id"], out["cluster_id"])}
        assert got == {big: big, big + 2: big, big + 4: big + 4}, thresh


def test_shuffle_width_scales_with_cluster_cpus(monkeypatch):
    import ray
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops import dedup

    assert dedup._shuffle_width() == int(ray.cluster_resources()["CPU"])
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 1024.0})
    assert dedup._shuffle_width() == 1024
    assert dedup._shuffle_width(0.5) == 512
    assert dedup._shuffle_width(0.25, floor=4) == 256
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 2.0})
    assert dedup._shuffle_width() == 4  # floor


def test_ngram_exact_verify_not_undercounted_by_pair_cap():
    # two docs share 30 grams, 10 of which are "hot" (present in many
    # other docs -> capped star blocking). count-based scoring
    # undercounts their intersection (with a UserWarning);
    # exact_verify must not.
    import warnings

    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.dedup import (
        ngram_jaccard_pair_ds, _gram_hashes,
    )

    hot = " ".join(f"h{i}" for i in range(12))        # 10 hot 3-grams
    a_rest = " ".join(f"a{i}" for i in range(22))
    rows = [{"doc_id": 51, "text": hot + " " + a_rest},
            {"doc_id": 52, "text": hot + " " + a_rest}]
    # many fillers containing the hot run -> its grams exceed cap=4;
    # filler ids are SMALLER so a filler becomes the star hub and the
    # capped grams contribute nothing to the (51, 52) count
    rows += [{"doc_id": k, "text": f"f{k}a f{k}b " + hot + f" f{k}c f{k}d"}
             for k in range(8)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = ngram_jaccard_pair_ds(ds, n=3, threshold=0.9, pair_cap=4,
                                exact_verify=True).to_pandas()
    got = dict(zip(zip(out["a"], out["b"]), out["jaccard"]))
    ga = _gram_hashes(rows[0]["text"], 3)
    gb = _gram_hashes(rows[1]["text"], 3)
    sh = np.intersect1d(ga, gb).size
    expect = round(sh / (ga.size + gb.size - sh), 6)
    assert got.get((51, 52)) == expect == 1.0
    # count-based path undercounts the same pair below the threshold —
    # and says so via the capped-gram warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        low = ngram_jaccard_pair_ds(ds, n=3, threshold=0.9, pair_cap=4,
                                    exact_verify=False).to_pandas()
    assert any("exceeded pair_cap" in str(x.message) for x in w)
    assert len(low) == 0 or (51, 52) not in set(zip(low["a"], low["b"]))
    # no warning when nothing is capped
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ngram_jaccard_pair_ds(rd.from_pandas(pd.DataFrame(rows[:2])),
                              n=3, threshold=0.9).to_pandas()
    assert not any("exceeded pair_cap" in str(x.message) for x in w)


def test_minhash_small_path_matches_distributed_cc():
    # the bounded driver union-find fast path and the distributed
    # min-label CC must label identically
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.dedup import (
        minhash_cluster_labels,
    )

    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [{"doc_id": i, "text": base + ("x" if i % 3 == 0 else "")}
            for i in range(12)]
    rows += [{"doc_id": 100 + i, "text": f"totally different doc {i} " * 8}
             for i in range(4)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    small = minhash_cluster_labels(ds, threshold=0.6).to_pandas()
    dist = minhash_cluster_labels(ds, threshold=0.6,
                                  small_edges_threshold=0).to_pandas()
    sm = dict(zip(small["doc_id"], small["cluster_id"]))
    dm = dict(zip(dist["doc_id"], dist["cluster_id"]))
    assert sm == dm and len(sm) == len(rows)


def test_feature_tables_stream_identically_when_pin_bails(monkeypatch):
    # the 100 TB path: when counted_pin declines (input-sized feature
    # table above threshold), the lazy table re-executes per consumer
    # — results must be identical to the pinned path for both ngram
    # Jaccard and cosine LSH
    import agentic_rag_for_multi_model_pdf_extraction_ray.ops.dedup as dd

    docs = rd.from_pandas(pd.DataFrame([
        {"doc_id": 1, "text": "a b c d e f g h"},
        {"doc_id": 2, "text": "a b c d e f g x"},
        {"doc_id": 3, "text": "q r s t u v w z"},
    ])).repartition(2)
    vecs = rd.from_pandas(pd.DataFrame([
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [0.99, 0.01, 0.0]},
        {"vec_id": 3, "embedding": [0.0, 1.0, 0.0]},
    ])).repartition(2)

    def run():
        ng = dd.ngram_jaccard_pairs(docs, n=3, threshold=0.3)
        cs = dd.cosine_lsh_pair_ds(vecs, threshold=0.95).to_pandas()
        return (set(zip(ng["a"], ng["b"])), set(zip(cs["a"], cs["b"])))

    pinned = run()
    monkeypatch.setattr(dd, "counted_pin", lambda src, thr: None)
    streamed = run()
    assert pinned == streamed
    assert pinned[0] == {(1, 2)} and pinned[1] == {(1, 2)}


def test_minhash_inline_verify_matches_join_verify():
    # the default in-bucket signature-agreement verify must produce
    # exactly the labels of the pair-join verify path on a randomized
    # dup-structured corpus (near-dup families + unique docs + empties)
    from agentic_rag_for_multi_model_pdf_extraction_ray.ops.dedup import (
        minhash_cluster_labels,
    )

    rng = np.random.default_rng(7)
    words = [f"w{c}" for c in range(60)]
    rows = []
    did = 0
    for fam in range(8):
        base = " ".join(rng.choice(words, size=40))
        for v in range(int(rng.integers(1, 5))):
            mut = base + " " + " ".join(rng.choice(words, size=v))
            rows.append({"doc_id": did, "text": mut})
            did += 1
    for _ in range(10):
        rows.append({"doc_id": did,
                     "text": " ".join(rng.choice(words, size=40))})
        did += 1
    rows.append({"doc_id": did, "text": ""})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    inline = minhash_cluster_labels(ds, threshold=0.6).to_pandas()
    joined = minhash_cluster_labels(ds, threshold=0.6,
                                    verify="join").to_pandas()
    im = dict(zip(inline["doc_id"], inline["cluster_id"]))
    jm = dict(zip(joined["doc_id"], joined["cluster_id"]))
    assert im == jm and len(im) == len(rows)
    # the dup families must actually cluster (not all singletons)
    assert len(set(im.values())) < len(rows)
