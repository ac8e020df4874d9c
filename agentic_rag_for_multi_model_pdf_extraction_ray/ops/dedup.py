"""Deduplication family: exact, normalized-exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

The reference deduplicates only retrieval hits by exact text
(``orchestrator.py:125-126``); a 100 TB training-data pipeline needs
the full family.  Shapes:

* exact / normalized: vectorized fingerprint column in ``map_batches``
  → ``groupby(fp).aggregate(Min(doc_id))`` — the shuffle moves one
  small row per distinct fingerprint group (Ray pushes partial
  Min/Count into the map side).
* MinHash+LSH: shingle → signature per batch (vectorized modular
  hashing) → explode to (band_key, doc_id) rows → ``groupby(band_key)``
  → candidate pairs within buckets → Jaccard verify → min-label
  connected components.  Only band-key rows shuffle, never documents.
* SimHash: 64-bit signature per doc; near-dup candidates = identical
  value on any of 4 16-bit sub-bands (Hamming ≤ 3 guarantee via
  pigeonhole needs the verify step, done on candidate pairs).
* embedding cosine: per-batch matmul against a broadcast matrix (small
  corpora) or LSH-bucketed (random-hyperplane signs) at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd
from ray.data.aggregate import Min

from ..functions.hashing import (
    _SHINGLE_BASE,
    _mix64,
    MinHasher,
    char_shingles,
    hamming64,
    jaccard,
    simhash64,
    stable_hash64,
    word_ngrams,
)
from ..functions.rounding import round_half_up
from ..functions.text import fingerprint_batch

# ---------- exact ----------


def exact_dedup_keys(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                     normalize: bool = False) -> rd.Dataset:
    """One row per distinct (possibly normalized) text: (fp, doc_id=min id).

    SQL-oracle shape: GROUP BY md5(text) → min(doc_id).
    """

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col]
        if normalize:
            t = t.fillna("").str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
        return pd.DataFrame({"fp": fingerprint_batch(t), id_col: batch[id_col]})

    return ds.map_batches(add_fp, batch_format="pandas").groupby("fp").aggregate(
        Min(id_col, alias_name=id_col)
    )


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Keep the min-id representative row per exact text.

    groupby(fp).map_groups(head(1) after sort) — the canonical
    hash-partition + per-group-first shape.
    """

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["fp"] = fingerprint_batch(batch[text_col])
        return batch

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return (
        ds.map_batches(add_fp, batch_format="pandas")
        .groupby("fp")
        .map_groups(first, batch_format="pandas")
    )


# ---------- MinHash + LSH ----------

def _distinct_pairs(cand: rd.Dataset) -> rd.Dataset:
    """Exact distributed DISTINCT over (a, b) pair rows.

    A groupby-aggregate here creates one reduce group per distinct
    pair (measured: 31 s for 218k pairs); instead bucket pairs into a
    BOUNDED number of groups and drop duplicates vectorized per
    bucket."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        with np.errstate(over="ignore"):
            h = (b["a"].to_numpy().astype(np.int64) * np.int64(1099511628211)
                 + b["b"].to_numpy().astype(np.int64))
        b["pk"] = h % 1024
        return b

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    return (
        cand.map_batches(add_bucket, batch_format="pandas")
        .repartition(32)
        .groupby("pk")
        .map_groups(dedup, batch_format="pandas")
    )




class MinHashSignatures:
    """Actor stage: text → (doc_id, band_key rows).  MinHasher state
    (permutation coefficients) built once per actor."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, shingle_k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.mh = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized over the batch: concat every doc's shingle
        # hashes, one modular-hash matrix + minimum.reduceat, then a
        # (docs × bands) key matrix — no per-doc numpy calls
        per_doc = [
            np.fromiter(char_shingles(t or "", self.shingle_k), dtype=np.uint64)
            for t in batch[self.text_col]
        ]
        nonempty = [i for i, a in enumerate(per_doc) if len(a)]
        if not nonempty:
            return pd.DataFrame({"doc_id": [], "band_key": []})
        arrs = [per_doc[i] for i in nonempty]
        lens = np.array([len(a) for a in arrs])
        # chunk so each (num_perm × shingles) temp stays L2-resident —
        # measured faster than both per-doc calls and giant matrices
        max_shingles = 4096
        sig_chunks = []
        i = 0
        while i < len(arrs):
            j, tot = i, 0
            while j < len(arrs) and (tot == 0 or tot + lens[j] <= max_shingles):
                tot += lens[j]
                j += 1
            chunk = arrs[i:j]
            cl = lens[i:j]
            starts = np.concatenate([[0], np.cumsum(cl)[:-1]])
            sig_chunks.append(self.mh.signatures_concat(np.concatenate(chunk), starts))
            i = j
        sigs = np.concatenate(sig_chunks, axis=0)
        keys = self.mh.band_keys_matrix(sigs, self.num_bands)  # (D, B)
        ids = batch[self.id_col].to_numpy()[nonempty]
        return pd.DataFrame({
            "doc_id": np.repeat(ids, self.num_bands),
            "band_key": keys.reshape(-1).view(np.int64),  # two's-complement view
        })


def minhash_lsh_candidates(ds: rd.Dataset, num_perm: int = 64, num_bands: int = 16,
                           shingle_k: int = 5, concurrency: int = 2) -> rd.Dataset:
    """→ candidate pair rows (a, b) with a < b, distinct."""
    band_rows = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs=dict(num_perm=num_perm, num_bands=num_bands, shingle_k=shingle_k),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def add_super_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        # group by a coarse super-bucket (bounded group count), then
        # vectorize over the real band keys inside each group — a
        # map_groups call per raw band key (~16×docs groups) would be
        # dominated by per-group invocation overhead
        batch = batch.copy()
        batch["gk"] = batch["band_key"] % 4096
        return batch

    def star_pairs_vec(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["band_key", "doc_id"]).sort_values(
            ["band_key", "doc_id"]
        )
        # star pairs per band bucket: (min doc, other) — O(k) per
        # bucket, enough to connect components
        first = g.groupby("band_key")["doc_id"].transform("first")
        mask = (g["doc_id"] != first).to_numpy()
        return pd.DataFrame(
            {"a": first.to_numpy()[mask], "b": g["doc_id"].to_numpy()[mask]}
        )

    from ray.data.aggregate import Count

    cand = (
        band_rows.map_batches(add_super_bucket, batch_format="pandas")
        .repartition(32)  # bound the groupby's B^2 shuffle fan-out
        .groupby("gk")
        .map_groups(star_pairs_vec, batch_format="pandas")
    )
    return _distinct_pairs(cand)


class SignatureStage:
    """Actor stage: text → one (doc_id, sig bytes) row per doc."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.mh = MinHasher(num_perm=num_perm)
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs, keep = [], []
        for i, t in zip(batch[self.id_col], batch[self.text_col]):
            sh = char_shingles(t or "", self.shingle_k)
            if not sh:
                continue
            keep.append(i)
            sigs.append(self.mh.signature(sh).tobytes())
        return pd.DataFrame({self.id_col: keep, "sig": sigs})


def minhash_dedup_clusters(ds: rd.Dataset, threshold: float = 0.7, num_perm: int = 64,
                           num_bands: int = 16, shingle_k: int = 5,
                           id_col: str = "doc_id", text_col: str = "text",
                           concurrency: int = 2) -> pd.DataFrame:
    """Full near-dup pass → (doc_id, cluster_id=min id of its cluster).

    ONE heavy pass over the corpus: per-doc signatures (64 uint64 =
    512 B/doc) are computed once and materialized (tiny vs the texts);
    band keys for LSH blocking AND the pair verification (estimated
    Jaccard = fraction of agreeing signature positions — standard at
    corpus scale; std ≈ 1/√num_perm) both derive from that table, so
    the raw text is never re-scanned.  Clustering is driver-side
    union-find over the verified pairs — valid while candidates fit on
    the driver; the scale path iterates min-label propagation as a
    groupby loop instead.
    """
    mh = MinHasher(num_perm=num_perm)
    sig_ds = ds.map_batches(
        SignatureStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   id_col=id_col, text_col=text_col),
        batch_format="pandas",
        concurrency=concurrency,
    ).materialize()

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([np.frombuffer(b, dtype=np.uint64) for b in batch["sig"]]) \
            if len(batch) else np.zeros((0, num_perm), dtype=np.uint64)
        keys = mh.band_keys_matrix(sigs, num_bands) if len(batch) else \
            np.zeros((0, num_bands), dtype=np.uint64)
        return pd.DataFrame({
            "doc_id": np.repeat(batch[id_col].to_numpy(), num_bands),
            "band_key": keys.reshape(-1).view(np.int64),
            "gk": (keys.reshape(-1).view(np.int64)) % 4096,
        })

    def star_pairs_vec(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["band_key", "doc_id"]).sort_values(
            ["band_key", "doc_id"])
        first = g.groupby("band_key")["doc_id"].transform("first")
        mask = (g["doc_id"] != first).to_numpy()
        return pd.DataFrame(
            {"a": first.to_numpy()[mask], "b": g["doc_id"].to_numpy()[mask]}
        )

    from ray.data.aggregate import Count

    cand = _distinct_pairs(
        sig_ds.map_batches(explode_bands, batch_format="pandas")
        .repartition(32)  # bound the groupby's B^2 shuffle fan-out
        .groupby("gk")
        .map_groups(star_pairs_vec, batch_format="pandas")
    ).to_pandas()
    all_ids = ds.select_columns([id_col]).to_pandas()[id_col]
    if len(cand) == 0:
        return pd.DataFrame({id_col: all_ids, "cluster_id": all_ids})

    # verification from the signature table (estimated Jaccard)
    sig_df = sig_ds.to_pandas()
    sigmap = {i: np.frombuffer(b, dtype=np.uint64)
              for i, b in zip(sig_df[id_col], sig_df["sig"])}

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = sigmap.get(a), sigmap.get(b)
        if sa is None or sb is None:
            continue
        if float((sa == sb).mean()) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

    return pd.DataFrame({id_col: all_ids, "cluster_id": [find(i) for i in all_ids]})


# ---------- SimHash ----------


class SimHashStage:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for t in batch[self.text_col]:
            toks = (t or "").lower().split()
            sigs.append(simhash64([stable_hash64(w) for w in toks]))
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col],
                "simhash": [f"{s:016x}" for s in sigs],
            }
        )


def simhash_signatures(ds: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return ds.map_batches(SimHashStage, batch_format="pandas", concurrency=concurrency)


def simhash_near_dups(ds: rd.Dataset, max_hamming: int = 3, concurrency: int = 2) -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4×16-bit band blocking (pigeonhole:
    any pair with Hamming ≤ 3 shares at least one of 4 bands), verify
    Hamming on candidates."""
    sig = simhash_signatures(ds, concurrency)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.fromiter(
            (int(h, 16) for h in batch["simhash"]), dtype=np.uint64, count=len(batch)
        )
        out = []
        for b in range(4):
            key = (v >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            out.append(pd.DataFrame({
                "doc_id": batch["doc_id"].to_numpy(),
                "band_key": key.astype(np.int64) * 4 + b,
                "sim": v,
            }))
        return pd.concat(out, ignore_index=True)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in group.groupby("band_key"):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            if len(g) < 2:
                continue
            ids = g["doc_id"].to_numpy()
            sims = g["sim"].to_numpy()
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    h = hamming64(int(sims[i]), int(sims[j]))
                    if h <= 3:
                        rows.append((ids[i], ids[j], h))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    def add_super_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["gk"] = batch["band_key"] % 1024  # bounded group count
        return batch

    cand = (
        sig.map_batches(explode, batch_format="pandas")
        .map_batches(add_super_bucket, batch_format="pandas")
        .groupby("gk")
        .map_groups(pairs, batch_format="pandas")
    )
    out = cand.to_pandas()
    if out.empty:  # all-empty groups lose the schema
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    out = out.drop_duplicates(["a", "b"]).reset_index(drop=True)
    return out[out["hamming"] <= max_hamming]


# ---------- n-gram Jaccard ----------


def ngram_jaccard_pairs(ds: rd.Dataset, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """Near-dup pairs by word n-gram Jaccard; candidates blocked by
    shared n-grams (explode → groupby(gram)) so only docs sharing at
    least one n-gram are ever compared.  The per-doc n-gram HASH sets
    (one materialized pass) also feed the exact-Jaccard verification —
    hashing word n-grams instead of materializing their strings is
    exact for Jaccard up to 64-bit collisions (~n²/2⁶⁴)."""

    def gram_hashes(text: str) -> np.ndarray:
        toks = (text or "").lower().split()
        if not toks:
            return np.zeros(0, dtype=np.uint64)
        if len(toks) < n:
            return np.array([stable_hash64(" ".join(toks))], dtype=np.uint64)
        tok_h = np.fromiter((stable_hash64(t) for t in toks), dtype=np.uint64,
                            count=len(toks))
        with np.errstate(over="ignore"):
            windows = np.lib.stride_tricks.sliding_window_view(tok_h, n)
            weights = np.empty(n, dtype=np.uint64)
            weights[0] = 1
            for i in range(1, n):
                weights[i] = weights[i - 1] * _SHINGLE_BASE
            h = _mix64((windows * weights[None, ::-1]).sum(axis=1, dtype=np.uint64))
        return np.unique(h)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            h = gram_hashes(t)
            ids.append(np.full(len(h), i))
            grams.append(h.view(np.int64))
        if not ids:
            return pd.DataFrame({"doc_id": [], "gram": []})
        return pd.DataFrame({"doc_id": np.concatenate(ids),
                             "gram": np.concatenate(grams)})

    def add_super_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["gk"] = batch["gram"] % 4096
        return batch

    def star_pairs_vec(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["gram", "doc_id"]).sort_values(["gram", "doc_id"])
        first = g.groupby("gram")["doc_id"].transform("first")
        mask = (g["doc_id"] != first).to_numpy()
        return pd.DataFrame(
            {"a": first.to_numpy()[mask], "b": g["doc_id"].to_numpy()[mask]}
        )

    from ray.data.aggregate import Count

    cand = _distinct_pairs(
        ds.map_batches(explode, batch_format="pandas")
        .map_batches(add_super_bucket, batch_format="pandas")
        .repartition(32)  # bound the groupby's B^2 shuffle fan-out
        .groupby("gk")
        .map_groups(star_pairs_vec, batch_format="pandas")
    ).to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    need = set(cand["a"]) | set(cand["b"])
    ref = ray.put(need)

    def grams_of(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch[id_col].isin(ray.get(ref))]
        return pd.DataFrame(
            {id_col: sub[id_col],
             "g": [set(gram_hashes(t).tolist()) for t in sub[text_col]]}
        )

    gm = ds.map_batches(grams_of, batch_format="pandas").to_pandas()
    gmap = dict(zip(gm[id_col], gm["g"]))
    jac = [jaccard(gmap.get(a, set()), gmap.get(b, set())) for a, b in zip(cand["a"], cand["b"])]
    cand = cand.assign(jaccard=round_half_up(np.asarray(jac), 6))
    return cand[cand["jaccard"] >= threshold].reset_index(drop=True)


# ---------- embedding cosine ----------


def cosine_near_dup_pairs(ds: rd.Dataset, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """All pairs (a<b) with cosine ≥ threshold.

    Small/medium corpora: broadcast the full (normalized) matrix once,
    per-batch matmul against it — each batch does a (B×d)·(d×N) GEMM.
    The scale path is sign-LSH bucketing (cosine_lsh_buckets) to keep N
    per bucket bounded.
    """
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = full[id_col].to_numpy()
    M = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Mn = M / norms
    mat_ref = ray.put((ids, Mn))

    def batch_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, Mn_ = ray.get(mat_ref)
        bids = batch[id_col].to_numpy()
        B = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        bn = np.linalg.norm(B, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        S = (B / bn) @ Mn_.T
        bi, gj = np.nonzero(S >= threshold)
        a, b = bids[bi], all_ids[gj]
        keep = a < b
        return pd.DataFrame(
            {"a": a[keep], "b": b[keep], "cosine": round_half_up(S[bi, gj][keep], 6)}
        )

    return (
        ds.map_batches(batch_pairs, batch_format="pandas", batch_size=512)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
