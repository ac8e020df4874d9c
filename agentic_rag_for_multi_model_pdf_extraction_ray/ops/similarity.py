"""Similarity search over an embedding column.

The reference's retrieval is a ChromaDB top-k ANN probe
(``/root/reference/src/core/store.py:79-99``, top-8 + figure-boost
top-3 + exact-text dedup, ``orchestrator.py:98-135``).  Re-expressed:

* brute-force cosine top-k — the exact baseline: broadcast the query
  matrix once (``ray.put``), per-batch GEMM + per-batch partial top-k,
  then a single tiny global merge (each batch forwards only k rows, so
  the shuffle is k×#batches rows — never the corpus).
* LSH-bucketed ANN — the scale path: random-hyperplane sign buckets;
  only the query's bucket (and optional neighbor probes) is scanned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.rounding import round_half_up


def _as_matrix(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64)


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def knn_bruteforce(ds: rd.Dataset, query_vec: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   exclude_ids: set | None = None) -> pd.DataFrame:
    """Exact cosine top-k: per-batch score + partial top-k, global merge.

    Returns (id_col, score) sorted by (score desc, id asc) — the
    deterministic tie-break.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)
    excl = frozenset(exclude_ids or ())

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        sub = batch[~batch[id_col].isin(excl)] if excl else batch
        if len(sub) == 0:
            return pd.DataFrame({id_col: [], "score": []})
        M = _normalize(_as_matrix(sub[vec_col]))
        s = M @ qv
        out = pd.DataFrame({id_col: sub[id_col].to_numpy(), "score": round_half_up(s, 6)})
        return out.sort_values(["score", id_col], ascending=[False, True]).head(k)

    partials = ds.map_batches(partial_topk, batch_format="pandas", batch_size=4096).to_pandas()
    if partials.empty:  # empty corpus loses the schema entirely
        return pd.DataFrame({id_col: pd.Series(dtype=object),
                             "score": pd.Series(dtype="float64")})
    return (
        partials.sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def knn_multi_query(ds: rd.Dataset, queries: np.ndarray, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Batched top-k for Q query vectors at once (one GEMM per batch
    against the broadcast query matrix).  → (query_idx, id, score)."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(Q)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        M = _normalize(_as_matrix(batch[vec_col]))
        S = Qm @ M.T  # (Q, B)
        ids = batch[id_col].to_numpy()
        kk = min(k, S.shape[1])
        # one argpartition over the whole (Q, B) score matrix — no
        # per-query Python loop
        idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]  # (Q, kk)
        qi = np.repeat(np.arange(S.shape[0]), kk)
        flat = idx.reshape(-1)
        return pd.DataFrame({
            "query_idx": qi,
            id_col: ids[flat],
            "score": round_half_up(S[qi, flat], 6),
        })

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=4096).to_pandas()
    return (
        partials.sort_values(["query_idx", "score", id_col], ascending=[True, False, True])
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )


# ---------- LSH-bucketed ANN (scale path) ----------


def _hyperplanes(dim: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim))


def lsh_bucket_ids(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (M @ planes.T) > 0
    return (bits @ (1 << np.arange(planes.shape[0]))).astype(np.int64)


def build_lsh_index(ds: rd.Dataset, dim: int, n_bits: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 11) -> rd.Dataset:
    """Add a ``bucket`` column (sign-LSH).  At scale, write this
    partitioned by bucket so a query reads one bucket's files only."""
    planes = _hyperplanes(dim, n_bits, seed)
    p_ref = ray.put(planes)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        P = ray.get(p_ref)
        M = _normalize(_as_matrix(batch[vec_col]))
        batch = batch.copy()
        batch["bucket"] = lsh_bucket_ids(M, P)
        return batch

    return ds.map_batches(add_bucket, batch_format="pandas")


def knn_lsh(ds: rd.Dataset, query_vec: np.ndarray, k: int = 10, n_bits: int = 8,
            n_probes: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 11) -> pd.DataFrame:
    """ANN: scan only the query's LSH bucket (+ Hamming-1 probes).

    Approximate — recall depends on n_bits/n_probes; the exactness
    oracle is knn_bruteforce.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    dim = len(q)
    planes = _hyperplanes(dim, n_bits, seed)
    qb = int(lsh_bucket_ids(q[None, :], planes)[0])
    probe = {qb}
    for _ in range(n_probes):
        probe |= {b ^ (1 << i) for b in list(probe) for i in range(n_bits)}

    indexed = build_lsh_index(ds, dim, n_bits, id_col, vec_col, seed)
    probe_arr = np.array(sorted(probe), dtype=np.int64)

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["bucket"].isin(probe_arr)]

    cand = indexed.map_batches(filt, batch_format="pandas")
    return knn_bruteforce(cand, query_vec, k, id_col, vec_col)


# ---------- persisted bucket-partitioned index ----------


def build_lsh_index_store(ds: rd.Dataset, index_dir: str, n_bits: int = 6,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 11) -> list[dict]:
    """PERSIST the sign-LSH index: write the vector table partitioned
    by bucket (``part=<bucket>/data.parquet`` + per-partition manifest,
    the same atomic machinery as the extraction sink) plus an
    ``_INDEX.json`` describing (dim, n_bits, seed).

    A query then reads ONLY the probed buckets' files — the
    reference's real capability (ChromaDB ANN probe,
    ``/root/reference/src/core/store.py:91-99``) expressed as
    partition pruning instead of a server."""
    import json
    import os

    from ..state.manifest import write_partition

    dim = len(ds.take(1)[0][vec_col])
    indexed = build_lsh_index(ds, dim, n_bits, id_col, vec_col, seed)

    import pyarrow as pa

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("bucket")[0].as_py())
        data = group.drop_columns(["bucket"]).sort_by(id_col)
        m = write_partition(index_dir, part, data, f"rows={data.num_rows}")
        return pa.Table.from_pylist([{"part": part, "rows": data.num_rows,
                                      "status": m["status"]}])

    out = (
        indexed.groupby("bucket")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()  # tiny: one row per non-empty bucket
    )
    os.makedirs(index_dir, exist_ok=True)
    from ..functions.hashing import token_hash_fingerprint

    with open(os.path.join(index_dir, "_INDEX.json"), "w") as f:
        json.dump({"dim": dim, "n_bits": n_bits, "seed": seed,
                   "id_col": id_col, "vec_col": vec_col,
                   "token_hash_sentinel": token_hash_fingerprint()}, f)
    return out


def _check_token_hash(meta: dict, index_dir: str) -> None:
    """Fail loudly if this installation's token-hash function would
    bucket queries differently from the one that BUILT the index (the
    persisted sentinel is hash_tokens(["a"]) at build time) — a silent
    mismatch would return confidently-wrong neighbors."""
    from ..functions.hashing import token_hash_fingerprint

    want = meta.get("token_hash_sentinel")
    if want is not None and int(want) != token_hash_fingerprint():
        raise RuntimeError(
            f"token-hash mismatch for index {index_dir}: built with "
            f"sentinel {want}, this installation computes "
            f"{token_hash_fingerprint()} — rebuild the index (or align "
            "pandas/hash-key versions) before querying")


def query_lsh_index(index_dir: str, query_vec: np.ndarray, k: int = 10,
                    n_probes: int | None = 2, exclude_ids: set | None = None,
                    filter_fn=None):
    """Top-k against a persisted LSH index, reading ONLY probed
    buckets' parquet files (multiprobe: all buckets within Hamming
    ``n_probes`` of the query's bucket).

    Returns ``(hits, stats)`` where stats records exactly which files
    were read and how many rows they hold (parquet footers — no data
    read) — the partition-pruning evidence.  ``n_probes=None`` uses
    the recommendation persisted by :func:`tune_lsh_nprobes` in
    ``_TUNING.json`` (fallback 2 if untuned)."""
    import json
    import os

    with open(os.path.join(index_dir, "_INDEX.json")) as f:
        meta = json.load(f)
    _check_token_hash(meta, index_dir)
    tuned = False
    if n_probes is None:
        n_probes = 2
        tpath = os.path.join(index_dir, "_TUNING.json")
        if os.path.isfile(tpath):
            with open(tpath) as f:
                n_probes = int(json.load(f).get("recommended_n_probes", 2))
            tuned = True
    n_bits, seed = meta["n_bits"], meta["seed"]
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    planes = _hyperplanes(meta["dim"], n_bits, seed)
    qb = int(lsh_bucket_ids(q[None, :], planes)[0])
    probe = {qb}
    for _ in range(n_probes):
        probe |= {b ^ (1 << i) for b in list(probe) for i in range(n_bits)}

    files = []
    for b in sorted(probe):
        path = os.path.join(index_dir, f"part={b}", "data.parquet")
        if os.path.isfile(path):
            files.append(path)
    import pyarrow.parquet as pq

    stats = {
        "buckets_total": 1 << n_bits,
        "buckets_probed": len(probe),
        "files_read": len(files),
        "rows_scanned": sum(pq.ParquetFile(p).metadata.num_rows
                            for p in files),
        "n_probes": int(n_probes),
        "tuned": tuned,
        "paths": files,
    }
    if not files:
        return pd.DataFrame({meta["id_col"]: [], "score": []}), stats
    cand = rd.read_parquet(files)
    if filter_fn is not None:
        cand = cand.map_batches(filter_fn, batch_format="pandas")
    hits = knn_bruteforce(cand, query_vec, k, meta["id_col"], meta["vec_col"],
                          exclude_ids=exclude_ids)
    return hits, stats


# ---------- IVF (centroid-bucketed) index ----------


def train_ivf_centroids(ds: rd.Dataset, n_centroids: int = 64,
                        sample_rate: float = 1.0, iters: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 11) -> np.ndarray:
    """Deterministic IVF training: hash-sampled vectors → Lloyd's
    k-means on the (small) sample.  Training on a driver-side sample
    is the standard IVF recipe (FAISS does the same); the full corpus
    is never collected — only ``sample_rate`` of it, which the caller
    sizes to O(centroids × 1000) rows."""
    from ..functions.hashing import stable_hash64

    def sampled(b: pd.DataFrame) -> pd.DataFrame:
        if sample_rate >= 1.0:
            return b[[id_col, vec_col]]
        keep = [
            (stable_hash64(f"{seed}:{i}") % 1_000_000) / 1_000_000 < sample_rate
            for i in b[id_col]
        ]
        return b[[id_col, vec_col]][np.asarray(keep, dtype=bool)]

    s = ds.map_batches(sampled, batch_format="pandas").to_pandas()
    s = s.sort_values(id_col)  # deterministic regardless of block order
    X = _normalize(np.stack(s[vec_col].to_numpy()).astype(np.float64))
    k = min(n_centroids, len(X))
    C = X[:k].copy()  # deterministic init: first k by id order
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on normalized rows
        for j in range(k):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[j] = v / n
    return C


def build_ivf_index_store(ds: rd.Dataset, index_dir: str, n_centroids: int = 64,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 11, sample_rate: float = 1.0,
                          iters: int = 10) -> list[dict]:
    """Persist an IVF index: vectors partitioned by nearest centroid
    (``part=<cid>`` + manifests, centroids in ``_INDEX.json``).
    Assignment is one broadcast GEMM per batch."""
    import json
    import os

    import pyarrow as pa
    import ray

    from ..state.manifest import write_partition

    C = train_ivf_centroids(ds, n_centroids, sample_rate, iters,
                            id_col, vec_col, seed)
    c_ref = ray.put(C)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(c_ref)
        M = _normalize(_as_matrix(b[vec_col]))
        b = b.copy()
        b["bucket"] = np.argmax(M @ Cm.T, axis=1).astype(np.int64)
        return b

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("bucket")[0].as_py())
        data = group.drop_columns(["bucket"]).sort_by(id_col)
        m = write_partition(index_dir, part, data, f"rows={data.num_rows}")
        return pa.Table.from_pylist([{"part": part, "rows": data.num_rows,
                                      "status": m["status"]}])

    out = (
        ds.map_batches(assign, batch_format="pandas")
        .groupby("bucket")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()  # tiny: one row per non-empty centroid
    )
    os.makedirs(index_dir, exist_ok=True)
    from ..functions.hashing import token_hash_fingerprint

    with open(os.path.join(index_dir, "_INDEX.json"), "w") as f:
        json.dump({"kind": "ivf", "centroids": C.tolist(),
                   "id_col": id_col, "vec_col": vec_col,
                   "token_hash_sentinel": token_hash_fingerprint()}, f)
    return out


def query_ivf_index(index_dir: str, query_vec: np.ndarray, k: int = 10,
                    nprobe: int | None = 4, exclude_ids: set | None = None,
                    filter_fn=None):
    """Top-k against a persisted IVF index: scan only the ``nprobe``
    nearest centroids' partitions.  Returns (hits, stats).
    ``filter_fn`` (pandas batch → batch) pre-filters candidates, e.g.
    a ``kind`` metadata filter — same contract as
    :func:`query_lsh_index`.

    ``nprobe=None`` uses the recommendation persisted by
    :func:`tune_ivf_nprobe` in ``_TUNING.json`` (fallback 4 if the
    index was never tuned).  Stats include ``rows_scanned`` (from
    parquet footers — no data read) so callers can audit pruning."""
    import json
    import os

    with open(os.path.join(index_dir, "_INDEX.json")) as f:
        meta = json.load(f)
    _check_token_hash(meta, index_dir)
    tuned = False
    if nprobe is None:
        nprobe = 4
        tpath = os.path.join(index_dir, "_TUNING.json")
        if os.path.isfile(tpath):
            with open(tpath) as f:
                nprobe = int(json.load(f).get("recommended_nprobe", 4))
            tuned = True
    C = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    order = np.argsort(-(C @ q))
    probe = order[:min(nprobe, len(order))]
    files = []
    for b in sorted(int(x) for x in probe):
        path = os.path.join(index_dir, f"part={b}", "data.parquet")
        if os.path.isfile(path):
            files.append(path)
    import pyarrow.parquet as pq

    rows_scanned = sum(pq.ParquetFile(p).metadata.num_rows for p in files)
    stats = {"buckets_total": len(C), "buckets_probed": len(probe),
             "files_read": len(files), "rows_scanned": rows_scanned,
             "nprobe": int(nprobe), "tuned": tuned, "paths": files}
    if not files:
        return pd.DataFrame({meta["id_col"]: [], "score": []}), stats
    cand = rd.read_parquet(files)
    if filter_fn is not None:
        cand = cand.map_batches(filter_fn, batch_format="pandas")
    hits = knn_bruteforce(cand, query_vec, k, meta["id_col"], meta["vec_col"],
                          exclude_ids=exclude_ids)
    return hits, stats


def tune_ivf_nprobe(ds: rd.Dataset, index_dir: str, query_vecs: np.ndarray,
                    k: int = 10, nprobes=(1, 2, 4, 8, 16),
                    target_recall: float = 0.95,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    persist: bool = True) -> pd.DataFrame:
    """Recall@k sweep for the IVF ``nprobe`` knob (the FAISS-style
    recall/latency dial).

    Ground truth is ONE distributed multi-query brute-force pass over
    ``ds`` (:func:`knn_multi_query` — a GEMM per batch against the
    broadcast query matrix; nothing corpus-sized on the driver).  Each
    sweep row then probes the persisted index per query and reports::

        nprobe, recall_at_k, mean_rows_scanned, frac_rows, wall_sec

    where ``frac_rows`` is the mean fraction of the corpus the probe
    actually scanned (from parquet footers).  With ``persist`` the
    sweep plus ``recommended_nprobe`` — the smallest nprobe whose
    recall ≥ ``target_recall`` (else the best measured) — is written
    to ``<index_dir>/_TUNING.json``, which ``query_ivf_index(...,
    nprobe=None)`` reads at query time.

    Tuning cost is Q × len(nprobes) driver-orchestrated probes — size
    Q to tens; the ground-truth pass is the only corpus-wide work.
    """
    return _tune_probe_sweep(
        ds, index_dir, query_vecs, k, nprobes, target_recall,
        id_col, vec_col, persist, knob="nprobe",
        rec_key="recommended_nprobe",
        probe_fn=lambda q, pv: query_ivf_index(index_dir, q, k=k, nprobe=pv))


def tune_lsh_nprobes(ds: rd.Dataset, index_dir: str, query_vecs: np.ndarray,
                     k: int = 10, n_probes_list=(0, 1, 2, 3),
                     target_recall: float = 0.95,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     persist: bool = True) -> pd.DataFrame:
    """LSH sibling of :func:`tune_ivf_nprobe`: sweep the Hamming
    multiprobe radius against the same one-pass brute-force ground
    truth.  Persists ``recommended_n_probes`` (smallest radius whose
    recall ≥ ``target_recall``) to ``_TUNING.json``, consumed by
    ``query_lsh_index(n_probes=None)`` and the kind dispatcher.
    Radius ``n_bits`` probes every bucket = exact."""
    return _tune_probe_sweep(
        ds, index_dir, query_vecs, k, n_probes_list, target_recall,
        id_col, vec_col, persist, knob="n_probes",
        rec_key="recommended_n_probes",
        probe_fn=lambda q, pv: query_lsh_index(index_dir, q, k=k,
                                               n_probes=pv))


def _tune_probe_sweep(ds, index_dir, query_vecs, k, probe_values,
                      target_recall, id_col, vec_col, persist,
                      knob, rec_key, probe_fn) -> pd.DataFrame:
    """Shared recall@k sweep: ONE distributed ground-truth pass, then
    Q × len(probe_values) driver-orchestrated index probes.

    Tie handling (ADVICE r4): the ground-truth top-k is fetched with
    headroom (2k+8 rows) and the truth SET includes every id whose
    score ties the k-th score — an index returning any k of a tied
    cohort scores recall 1.0 instead of being penalized for the
    brute-force pass's arbitrary tie order.  The denominator stays
    min(k, ranked rows) so untied sweeps are numerically unchanged."""
    import json
    import os
    import time

    Q = np.asarray(query_vecs, dtype=np.float64)
    gt = knn_multi_query(ds, Q, k=2 * k + 8, id_col=id_col, vec_col=vec_col)
    gt_sets: dict[int, set] = {}
    gt_denoms: dict[int, int] = {}
    for qi, g in gt.groupby("query_idx"):
        g = g.sort_values("score", ascending=False)
        kth = float(g["score"].iloc[min(k, len(g)) - 1])
        gt_sets[int(qi)] = set(g.loc[g["score"] >= kth - 1e-9, id_col])
        gt_denoms[int(qi)] = min(k, len(g))
    total_rows = ds.count()

    rows = []
    for pv in probe_values:
        t0 = time.perf_counter()
        recs, scanned = [], []
        for qi in range(len(Q)):
            truth = gt_sets.get(qi, set())
            hits, stats = probe_fn(Q[qi], pv)
            recs.append(len(set(hits[id_col]) & truth)
                        / max(1, gt_denoms.get(qi, 0)))
            scanned.append(stats["rows_scanned"])
        rows.append({
            knob: int(pv),
            "recall_at_k": float(np.mean(recs)),
            "mean_rows_scanned": float(np.mean(scanned)),
            "frac_rows": float(np.mean(scanned) / max(1, total_rows)),
            "wall_sec": time.perf_counter() - t0,
        })
    sweep = pd.DataFrame(rows)

    ok = sweep[sweep["recall_at_k"] >= target_recall]
    rec = int(ok[knob].min()) if len(ok) else int(
        sweep.loc[sweep["recall_at_k"].idxmax(), knob])
    if persist:
        with open(os.path.join(index_dir, "_TUNING.json"), "w") as f:
            json.dump({rec_key: rec, "k": k,
                       "target_recall": target_recall,
                       "n_queries": int(len(Q)),
                       "sweep": sweep.to_dict(orient="records")}, f)
    return sweep


def query_index(index_dir: str, query_vec: np.ndarray, k: int = 10,
                n_probes: int | None = None, exclude_ids: set | None = None,
                filter_fn=None):
    """Top-k against ANY persisted index, dispatching on the
    ``_INDEX.json`` ``kind`` field ("ivf" → centroid partitions,
    default → sign-LSH buckets).  ``n_probes`` means Hamming radius
    for LSH and (×2) nearest-centroid count for IVF — both bound how
    many partitions are read.

    Override contract (ADVICE r4 — the tuned value must not silently
    beat an explicit caller choice): ``n_probes=None`` (default) uses
    the ``_TUNING.json`` recommendation when the index was tuned
    (:func:`tune_ivf_nprobe` / :func:`tune_lsh_nprobes`), else the
    per-kind default (LSH radius 2, IVF nprobe 4); an explicitly
    passed integer is ALWAYS honored.  Stats carry ``tuned=True``
    when a persisted recommendation was applied.
    Returns (hits, stats) like the per-kind query functions."""
    import json
    import os

    with open(os.path.join(index_dir, "_INDEX.json")) as f:
        kind = json.load(f).get("kind", "lsh")
    if kind == "ivf":
        # radius-R LSH multiprobe reads O(n_bits^R) buckets, so map
        # the same knob to "2R nearest centroids" (min 1)
        return query_ivf_index(
            index_dir, query_vec, k,
            nprobe=None if n_probes is None else max(1, n_probes * 2),
            exclude_ids=exclude_ids, filter_fn=filter_fn)
    return query_lsh_index(index_dir, query_vec, k, n_probes=n_probes,
                           exclude_ids=exclude_ids, filter_fn=filter_fn)


def retrieval_with_figure_boost(hits: pd.DataFrame, figure_hits: pd.DataFrame,
                                text_col: str = "text") -> pd.DataFrame:
    """Reference J2 (orchestrator.py:120-127): union of general top-k
    and figure-only top-k, deduped by exact text, order preserved."""
    merged = pd.concat([hits, figure_hits], ignore_index=True)
    return merged.drop_duplicates(subset=[text_col], keep="first").reset_index(drop=True)
