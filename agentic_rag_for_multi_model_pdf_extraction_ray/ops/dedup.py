"""Deduplication family: exact, normalized-exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

The reference deduplicates only retrieval hits by exact text
(``orchestrator.py:125-126``); a 100 TB training-data pipeline needs
the full family.  Shapes — no stage materializes the corpus or the
candidate set on the driver:

* exact / normalized: vectorized fingerprint column in ``map_batches``
  → ``groupby(fp).aggregate(Min(doc_id))`` — the shuffle moves one
  small row per distinct fingerprint group (Ray pushes partial
  Min/Count into the map side).
* MinHash+LSH: one signature pass (512 B/doc, materialized) → band
  explode with signatures riding the band rows → bounded-bucket
  within-band pairs agreement-verified IN the bucket
  (``minhash_edges_inline``, default; the pair⋈signature double-join
  path remains as ``verify="join"`` for dup-sparse corpora) →
  distributed min-label propagation
  (``connected_components_min_label``).
* SimHash: 64-bit signature per doc; 4×16-bit band blocking; verify =
  vectorized XOR+popcount on pairs carried through the band groupby.
* n-gram Jaccard: gram-hash feature table (one pass) → shared-gram
  blocking → exact Jaccard verify via two hash joins on the feature
  table.
* embedding cosine: exact baseline = block-replicated all-pairs GEMM
  (``cosine_pairs_blocked``, ×n_blocks data amplification, bounded
  group count); scale path = banded sign-LSH candidates
  (``cosine_lsh_buckets``) + exact-cosine verify on candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Min

from ..functions.hashing import (
    _SHINGLE_BASE,
    _mix64,
    MinHasher,
    char_shingles,
    hash_tokens,
)
from ..functions.rounding import round_half_up
from ..functions.text import fingerprint_batch
from ..util import counted_pin, default_actor_pool

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

    return ds.map_batches(add_fp, batch_format="pandas",
                          batch_size=None).groupby("fp").aggregate(
        Min(id_col, alias_name=id_col)
    )


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = 1024) -> rd.Dataset:
    """Keep the min-id representative row per exact text — the
    canonical hash-partition + per-group-first shape, with a map-side
    combiner (each batch keeps one row per fp first) and a BOUNDED
    bucket count (one vectorized dedup per bucket, not one reduce
    group per distinct text — the per-group overhead trap)."""

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["fp"] = fingerprint_batch(batch[text_col])
        # combiner: local min-id row per fp before the shuffle
        batch = (batch.sort_values(id_col, kind="mergesort")
                 .drop_duplicates("fp"))
        batch["__bk"] = (_id_hash(batch["fp"]) % np.uint64(n_buckets)
                         ).astype(np.int64)
        return batch

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values(id_col, kind="mergesort")
                .drop_duplicates("fp").drop(columns=["__bk"]))

    return (
        ds.map_batches(add_fp, batch_format="pandas", batch_size=None)
        .groupby("__bk")
        .map_groups(first, batch_format="pandas")
    )


# ---------- shared pair machinery ----------


def _shuffle_width(scale: float = 1.0, floor: int = 4) -> int:
    """Shuffle width derived from advertised cluster CPUs (like
    :func:`..ops.join.sized_join`), not pinned to this box's 32.

    ``scale`` multiplies the CPU count (1.0 → one partition per core;
    0.5 → the post-groupby coalesce width).  On a 1,000-core cluster
    the dedup shuffles widen accordingly instead of capping at 32."""
    import ray

    cpus = 8.0
    if ray.is_initialized():
        cpus = float(ray.cluster_resources().get("CPU", 8))
    return max(floor, int(cpus * scale))


def _id_hash(values) -> np.ndarray:
    """Deterministic uint64 hash of an id array of ANY dtype (int,
    string, ...) — pandas' siphash with its fixed default key, stable
    across processes/workers."""
    from pandas.util import hash_array

    arr = np.asarray(values)
    if arr.dtype == object:
        return hash_array(arr, categorize=False)
    return hash_array(arr)


def _binary_blob_views(col, n: int):
    """Zero-copy views of a non-null Arrow binary column: returns
    ``(values, offsets)`` where ``values`` is the concatenated payload
    bytes as a uint64 array and ``offsets`` the per-row BYTE offsets
    (length n+1, starting at 0).  Replaces the old
    ``b"".join(col.to_pylist())`` hop — the Arrow data buffer already
    IS the concatenation; we only slice and reinterpret it.  Falls
    back to the Python path for exotic column types or nulls."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if (pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type)) \
            and col.null_count == 0:
        off_dt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        offs = np.frombuffer(col.buffers()[1], dtype=off_dt)[
            col.offset: col.offset + n + 1].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        vals = data[offs[0]: offs[-1]]
        return vals.view(np.uint64), offs - offs[0]
    blobs = col.to_pylist()
    lens = np.fromiter(map(len, blobs), dtype=np.int64, count=len(blobs))
    offs = np.concatenate([[0], np.cumsum(lens)])
    joined = np.frombuffer(b"".join(blobs), dtype=np.uint64) if blobs \
        else np.empty(0, dtype=np.uint64)
    return joined, offs


def _distinct_pairs(cand: rd.Dataset, extra_cols: tuple = (),
                    n_buckets: int = 256) -> rd.Dataset:
    """Exact distributed DISTINCT over (a, b) pair rows (extra columns
    ride along, first occurrence kept — callers emit identical extras
    for identical pairs).

    A groupby-aggregate here creates one reduce group per distinct
    pair (measured: 31 s for 218k pairs); instead bucket pairs into a
    BOUNDED number of groups and drop duplicates vectorized per
    bucket.  Ids of any dtype (hashed, not cast)."""
    keep = ["a", "b", *extra_cols]

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = _id_hash(b["a"]) * np.uint64(0x9E3779B97F4A7C15) ^ _id_hash(b["b"])
        b["pk"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return b

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[keep]

    return (
        cand.map_batches(add_bucket, batch_format="pandas")
        .repartition(_shuffle_width())
        .groupby("pk")
        .map_groups(dedup, batch_format="pandas")
        # coalesce: groupby emits schema-less empty blocks on empty
        # partitions, which break a downstream Arrow hash join's key
        # resolution — repartition unifies them into schemaed blocks
        .repartition(_shuffle_width(0.5))
    )


def distinct_column(ds: rd.Dataset, col: str, n_buckets: int = 1024) -> rd.Dataset:
    """Exact distributed DISTINCT over one column: per-batch local
    unique → bounded-bucket groupby dedup (a groupby on the raw value
    would create one reduce group per distinct value)."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        u = b[col].drop_duplicates().to_numpy()
        return pd.DataFrame({
            col: u,
            "bk": (_id_hash(u) % np.uint64(n_buckets)).astype(np.int64),
        })

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(col)[[col]]

    return (
        ds.map_batches(local, batch_format="pandas", batch_size=None)
        .groupby("bk")
        .map_groups(dd, batch_format="pandas")
        .repartition(_shuffle_width(0.5))
    )


def _set_op_keys(a: rd.Dataset, b: rd.Dataset, col_a: str, col_b: str,
                 op: str, n_buckets: int = 1024) -> rd.Dataset:
    """SQL INTERSECT / EXCEPT set semantics over two key columns,
    distributed: tag each side, per-batch local unique, bounded-bucket
    groupby, vectorized membership per bucket.  Output column is
    ``col_a``; all values of one key land in one bucket, so presence
    tests are exact."""
    if op not in ("intersect", "except"):
        raise ValueError(op)

    def tag(side: int, col: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            u = batch[col].drop_duplicates().to_numpy()
            return pd.DataFrame({
                "v": u,
                "side": np.full(len(u), side, dtype=np.int8),
                "bk": (_id_hash(u) % np.uint64(n_buckets)).astype(np.int64),
            })

        return f

    rows = a.map_batches(tag(0, col_a), batch_format="pandas",
                         batch_size=None).union(
        b.map_batches(tag(1, col_b), batch_format="pandas", batch_size=None))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        in_a = set(g.loc[g["side"] == 0, "v"])
        in_b = set(g.loc[g["side"] == 1, "v"])
        keep = (in_a & in_b) if op == "intersect" else (in_a - in_b)
        return pd.DataFrame({col_a: sorted(keep)})

    return (
        rows.groupby("bk")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(_shuffle_width(0.25))
    )


def intersect_keys(a: rd.Dataset, b: rd.Dataset, col_a: str,
                   col_b: str | None = None) -> rd.Dataset:
    """Distinct values present in BOTH datasets (SQL INTERSECT)."""
    return _set_op_keys(a, b, col_a, col_b or col_a, "intersect")


def except_keys(a: rd.Dataset, b: rd.Dataset, col_a: str,
                col_b: str | None = None) -> rd.Dataset:
    """Distinct values of ``a`` absent from ``b`` (SQL EXCEPT)."""
    return _set_op_keys(a, b, col_a, col_b or col_a, "except")


def _pair_counts(cand: rd.Dataset, n_buckets: int = 256,
                 weight_col: str | None = None,
                 max_cols: tuple = ()) -> rd.Dataset:
    """Exact distributed multiplicity per (a, b) pair row → columns
    (a, b, shared).  Same bounded-bucket shape as
    :func:`_distinct_pairs`; all occurrences of a pair hash to one
    bucket, so the per-bucket count is the exact global one.  With
    ``weight_col``, rows carry partial counts (map-side combiner) that
    are summed instead of counted; ``max_cols`` names flag columns
    merged with max (requires ``weight_col``)."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = _id_hash(b["a"]) * np.uint64(0x9E3779B97F4A7C15) ^ _id_hash(b["b"])
        b["pk"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return b

    def count(g: pd.DataFrame) -> pd.DataFrame:
        if weight_col is None:
            return (g.groupby(["a", "b"], sort=False).size()
                    .reset_index(name="shared"))
        aggs = {"shared": (weight_col, "sum")}
        aggs.update({c: (c, "max") for c in max_cols})
        return g.groupby(["a", "b"], sort=False).agg(**aggs).reset_index()

    return (
        cand.map_batches(add_bucket, batch_format="pandas")
        .repartition(_shuffle_width())
        .groupby("pk")
        .map_groups(count, batch_format="pandas")
        .repartition(_shuffle_width(0.5))
    )


def _within_bucket_pairs(g: pd.DataFrame, bucket_col: str, id_col: str,
                         extra_cols: tuple = (), cap: int = 64,
                         mark_capped: bool = False) -> pd.DataFrame:
    """All unordered id pairs within each bucket, vectorized.

    Buckets of size ≤ cap: full all-pairs via a self-merge (C-speed).
    Degenerate buckets (> cap — e.g. the empty-text band or a
    stopword gram): star pairs against the bucket's min id, which
    still connects the bucket for component purposes without the k²
    blow-up.  Extra columns come out suffixed ``_a`` / ``_b``.
    ``mark_capped`` adds an int8 ``capped`` column (1 = the pair came
    from an over-cap bucket, so downstream counts involving it are
    lower bounds)."""
    cols = [bucket_col, id_col, *extra_cols]
    g = g[cols].drop_duplicates([bucket_col, id_col])
    sizes = g.groupby(bucket_col)[id_col].transform("size")
    out = []
    small = g[(sizes >= 2) & (sizes <= cap)]
    if len(small):
        m = small.merge(small, on=bucket_col, suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if mark_capped:
            m = m.assign(capped=np.int8(0))
        out.append(m)
    large = g[sizes > cap]
    if len(large):
        l = large.sort_values([bucket_col, id_col], kind="mergesort")
        isfirst = ~l[bucket_col].duplicated().to_numpy()
        hub = l[isfirst]
        rest = l[~isfirst]
        m = rest.merge(hub, on=bucket_col, suffixes=("_b", "_a"))
        if mark_capped:
            m = m.assign(capped=np.int8(1))
        out.append(m)
    cols_out = {"a": f"{id_col}_a", "b": f"{id_col}_b"}
    cols_out.update({f"{e}_a": f"{e}_a" for e in extra_cols})
    cols_out.update({f"{e}_b": f"{e}_b" for e in extra_cols})
    if mark_capped:
        cols_out["capped"] = "capped"
    if not out:
        src = {"a": id_col, "b": id_col}
        src.update({f"{e}_a": e for e in extra_cols})
        src.update({f"{e}_b": e for e in extra_cols})
        empty = {k: pd.Series(dtype=g[c].dtype) for k, c in src.items()}
        if mark_capped:
            empty["capped"] = pd.Series(dtype="int8")
        return pd.DataFrame(empty)
    m = pd.concat(out, ignore_index=True)
    return pd.DataFrame({k: m[c].to_numpy() for k, c in cols_out.items()})


def verify_pairs(pairs: rd.Dataset, features: rd.Dataset, score_fn,
                 id_col: str = "doc_id", feat_col: str = "feat",
                 num_partitions: int | None = None,
                 pass_cols: tuple = ()) -> rd.Dataset:
    """Score candidate pairs against a per-id feature table with two
    hash-partitioned joins — each id's feature ships to exactly the
    partitions that need it; nothing lands on the driver.

    ``score_fn(feats_a: list, feats_b: list, *pass_col_arrays) ->
    np.ndarray`` is called per batch (vectorize inside); ``pass_cols``
    names extra columns of ``pairs`` forwarded to it positionally.
    Features must be join-safe scalars (serialize arrays to bytes).
    Pairs whose id lacks a feature row are dropped (inner join)."""
    def _renamed(side: str) -> rd.Dataset:
        # Dataset.rename_columns fails on pandas-format blocks in this
        # Ray version — rename per batch instead
        def r(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({side: b[id_col].to_numpy(),
                                 f"feat_{side}": b[feat_col].to_numpy()})

        return features.map_batches(r, batch_format="pandas")

    fa = _renamed("a")
    fb = _renamed("b")
    if num_partitions is None:
        # cluster-derived, not pinned: sized_join only caps DOWN
        num_partitions = _shuffle_width(0.5)
    from .join import sized_join

    j = sized_join(
        sized_join(pairs, fa, "inner", on=("a",),
                   requested_partitions=num_partitions),
        fb, "inner", on=("b",), requested_partitions=num_partitions)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            # dtype-preserving empty: an untyped {"a": []} block is
            # float64 and poisons the unioned id dtype downstream
            base = (b[["a", "b"]].copy() if {"a", "b"} <= set(b.columns)
                    else pd.DataFrame({"a": pd.Series(dtype=object),
                                       "b": pd.Series(dtype=object)}))
            base["score"] = pd.Series(dtype="float64")
            return base
        extras = tuple(b[c].to_numpy() for c in pass_cols)
        s = np.asarray(score_fn(b["feat_a"].tolist(), b["feat_b"].tolist(),
                                *extras),
                       dtype=np.float64)
        return pd.DataFrame({"a": b["a"].to_numpy(), "b": b["b"].to_numpy(),
                             "score": s})

    return j.map_batches(score, batch_format="pandas")


def connected_components_min_label(edges: rd.Dataset, max_iters: int = 30,
                                   num_partitions: int | None = None,
                                   n_buckets: int = 1024) -> rd.Dataset:
    """Distributed connected components by iterative min-label
    propagation — the scale replacement for driver-side union-find.

    Each round combines
      * propagation: ``label(x) ← min(label(x), min over neighbors'
        labels)`` (one hash join edges ⋈ labels), and
      * pointer-doubling (shortcutting): ``label(x) ← label(label(x))``
        (one labels ⋈ labels join) — labels chase their component min
        at doubling distance, so a diameter-D chain converges in
        O(log D) rounds instead of D (a plain-propagation chain longer
        than max_iters would converge WRONG, silently),
    then one bounded-bucket per-node min (never one reduce group per
    node).  Convergence is detected with an order-insensitive XOR
    checksum of (node, label) hashes — one tiny row per batch reaches
    the driver.  Raises if max_iters rounds pass without a fixpoint.

    Returns (node, label) for every node that appears in an edge.
    """

    if num_partitions is None:
        num_partitions = _shuffle_width(0.5)

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]),
            "nbr": np.concatenate([b["b"].to_numpy(), b["a"].to_numpy()]),
        })

    both = edges.map_batches(both_dirs, batch_format="pandas").materialize()

    def min_per_node(ds: rd.Dataset, val_col: str) -> rd.Dataset:
        def add_bk(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["bk"] = (_id_hash(b["node"]) % np.uint64(n_buckets)).astype(np.int64)
            return b

        def mins(g: pd.DataFrame) -> pd.DataFrame:
            m = g.groupby("node", sort=False)[val_col].min().reset_index()
            return m.rename(columns={val_col: "label"})

        return (
            ds.map_batches(add_bk, batch_format="pandas")
            .groupby("bk")
            .map_groups(mins, batch_format="pandas")
            # coalesce schema-less empty groupby blocks before the join
            .repartition(num_partitions)
        )

    def checksum(lab_ds: rd.Dataset) -> int:
        def part(b: pd.DataFrame) -> pd.DataFrame:
            h = _id_hash(b["node"]) ^ _mix64(_id_hash(b["label"]))
            c = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
            return pd.DataFrame({"c": [np.uint64(c).astype(np.int64)]})

        p = lab_ds.map_batches(part, batch_format="pandas").to_pandas()
        if not len(p):
            return 0
        return int(np.bitwise_xor.reduce(p["c"].to_numpy().view(np.uint64)))

    # round 0 folds the first propagation: label = min(node, min nbr)
    init = both.map_batches(
        lambda b: pd.DataFrame({
            "node": b["node"],
            "lab": np.minimum(b["node"].to_numpy(), b["nbr"].to_numpy()),
        }),
        batch_format="pandas",
    )
    labels = min_per_node(init, "lab").materialize()
    prev = checksum(labels)

    from .join import sized_join

    for it in range(max_iters):
        msgs = sized_join(both, labels, "inner", on=("node",),
                          requested_partitions=num_partitions).map_batches(
            lambda b: pd.DataFrame({"node": b["nbr"], "lab": b["label"]}),
            batch_format="pandas",
        )
        # shortcut: follow each node's label to ITS label — L(key=label)
        # ⋈ L(node) gives (node, label(label));  label(y) ≤ y always,
        # so this only ever lowers labels (safe to union into the min)
        by_label = labels.map_batches(
            lambda b: pd.DataFrame({"src": b["node"].to_numpy(),
                                    "node": b["label"].to_numpy()}),
            batch_format="pandas",
        )
        shortcut = sized_join(by_label, labels, "inner", on=("node",),
                              requested_partitions=num_partitions).map_batches(
            lambda b: pd.DataFrame({"node": b["src"], "lab": b["label"]}),
            batch_format="pandas",
        )
        cur = labels.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "lab": b["label"]}),
            batch_format="pandas",
        )
        labels = min_per_node(msgs.union(cur).union(shortcut), "lab").materialize()
        cs = checksum(labels)
        if cs == prev:
            return labels
        prev = cs
    raise RuntimeError(
        f"connected components did not converge in {max_iters} rounds — "
        f"raise max_iters (log2(component diameter) rounds suffice with "
        f"shortcutting)"
    )


def attach_component_labels(ids: rd.Dataset, labels: rd.Dataset,
                            id_col: str = "doc_id",
                            out_col: str = "cluster_id",
                            num_partitions: int | None = None,
                            broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Attach component labels back onto the full id column; ids
    without an edge keep themselves as label.

    Labels exist only for nodes with a near-dup edge — usually far
    smaller than the corpus — so under ``broadcast_threshold`` rows
    the map ships ONE broadcast dict (``ray.put``) instead of
    shuffling the whole corpus through a left-outer join; above it,
    the hash join."""
    import ray

    n_labels = labels.count()
    if n_labels <= broadcast_threshold:
        lab_df = labels.to_pandas()
        if lab_df["node"].dtype == object:
            # string ids: dict map (C path), no numeric round-trip
            ref = ray.put(dict(zip(lab_df["node"], lab_df["label"])))

            def fill_bc(b: pd.DataFrame) -> pd.DataFrame:
                vals = b[id_col]
                mapped = vals.map(ray.get(ref))
                lab = mapped.where(mapped.notna(), vals)
                return pd.DataFrame({id_col: vals.to_numpy(),
                                     out_col: lab.to_numpy()})
        else:
            # numeric ids: sorted-key searchsorted lookup, everything
            # stays in the id dtype — the dict-map path round-trips
            # misses through float64/NaN and corrupts int64 ≥ 2^53
            srt = lab_df.sort_values("node", kind="mergesort")
            ref = ray.put((srt["node"].to_numpy(), srt["label"].to_numpy()))

            def fill_bc(b: pd.DataFrame) -> pd.DataFrame:
                keys, labs = ray.get(ref)
                vals = b[id_col].to_numpy()
                pos = np.searchsorted(keys, vals)
                posc = np.minimum(pos, len(keys) - 1)
                hit = (pos < len(keys)) & (keys[posc] == vals)
                out_arr = vals.copy()
                out_arr[hit] = labs[posc[hit]]
                return pd.DataFrame({id_col: vals, out_col: out_arr})

        return ids.map_batches(fill_bc, batch_format="pandas")

    from .join import sized_join

    out = sized_join(ids, labels, "left_outer", on=(id_col,),
                     right_on=("node",),
                     requested_partitions=num_partitions or _shuffle_width(0.5))

    def fill(t):
        # pyarrow coalesce: null labels (no edge) fall back to the id
        # itself without a pandas float64/NaN round-trip (lossy ≥ 2^53)
        import pyarrow as pa
        import pyarrow.compute as pc

        idc = t.column(id_col)
        lab = t.column("label")
        if lab.type != idc.type:
            lab = lab.cast(idc.type)
        return pa.table({id_col: idc, out_col: pc.coalesce(lab, idc)})

    return out.map_batches(fill, batch_format="pyarrow")


# ---------- MinHash + LSH ----------


class SignatureStage:
    """Actor stage: text → one (doc_id, sig bytes) row per doc."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.mh = MinHasher(num_perm=num_perm)
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized across the batch: concat shingle hashes of many
        # docs, one modular-hash matrix + minimum.reduceat per chunk —
        # chunks sized so the (num_perm × shingles) temp stays
        # L2-resident (measured faster than per-doc calls AND than one
        # giant matrix); identical output to per-doc mh.signature
        per_doc, keep = [], []
        for i, t in zip(batch[self.id_col], batch[self.text_col]):
            # char_shingles returns the unique uint64 array directly —
            # no set→fromiter re-pack (round-4 hot-path fix)
            a = char_shingles(t or "", self.shingle_k)
            if len(a):
                keep.append(i)
                per_doc.append(a)
        if not keep:
            return pd.DataFrame({self.id_col: [], "sig": []})
        lens = np.array([len(a) for a in per_doc])
        max_shingles = 4096
        sig_chunks = []
        i = 0
        while i < len(per_doc):
            j, tot = i, 0
            while j < len(per_doc) and (tot == 0 or tot + lens[j] <= max_shingles):
                tot += lens[j]
                j += 1
            cl = lens[i:j]
            starts = np.concatenate([[0], np.cumsum(cl)[:-1]])
            sig_chunks.append(
                self.mh.signatures_concat(np.concatenate(per_doc[i:j]), starts))
            i = j
        sigs = np.concatenate(sig_chunks, axis=0)
        return pd.DataFrame({self.id_col: keep,
                             "sig": [s.tobytes() for s in sigs]})


def minhash_signature_table(ds: rd.Dataset, num_perm: int = 64, shingle_k: int = 5,
                            id_col: str = "doc_id", text_col: str = "text",
                            concurrency=None) -> rd.Dataset:
    """One heavy pass over the corpus → materialized (id, sig) table
    (512 B/doc at num_perm=64) that feeds both LSH blocking and pair
    verification, so raw text is never re-scanned.

    ``concurrency=None`` (default) → autoscaling actor pool
    ``util.default_actor_pool()``: 2 actors on small inputs, up to
    half the cluster CPUs on backlog (a fixed pool of 2 left 30 of 32
    CPUs idle at 16× volume — round-5 curve)."""
    if concurrency is None:
        concurrency = default_actor_pool()
    return ds.map_batches(
        SignatureStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   id_col=id_col, text_col=text_col),
        batch_format="pandas",
        concurrency=concurrency,
    ).materialize()


def _super_buckets(n_rows: int, rows_per_group: int = 50_000,
                   lo: int = 16, hi: int = 1 << 17) -> int:
    """Pick the super-bucket count for a bounded-group groupby.

    _within_bucket_pairs is vectorized ACROSS raw buckets inside a
    group, so fewer/fatter groups are strictly cheaper until a group
    outgrows worker memory — measured: 4096 near-empty groups cost
    21 s in per-group overhead where 16 fat ones cost 2 s.  Target
    ~rows_per_group rows per group, clamped."""
    return int(max(lo, min(hi, n_rows // rows_per_group + 1)))


def minhash_candidates(sig_ds: rd.Dataset, num_perm: int = 64, num_bands: int = 16,
                       id_col: str = "doc_id", pair_cap: int = 64,
                       n_super_buckets: int | None = None) -> rd.Dataset:
    """LSH blocking from the signature table → distinct candidate
    pairs (a < b).  All within-band pairs for normal buckets (so two
    near-dups are linked even when neither is the bucket's min id);
    star pairs for degenerate buckets."""
    mh = MinHasher(num_perm=num_perm)
    if n_super_buckets is None:
        n_super_buckets = _super_buckets(sig_ds.count() * num_bands)

    def explode_bands(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        n = batch.num_rows
        if n:
            # sigs are fixed num_perm×8 bytes — the Arrow data buffer
            # is already their concatenation; reshape a zero-copy view
            vals, _ = _binary_blob_views(batch.column("sig"), n)
            sigs = vals.reshape(n, num_perm)
            keys = mh.band_keys_matrix(sigs, num_bands)
        else:
            keys = np.zeros((0, num_bands), dtype=np.uint64)
        bk = keys.reshape(-1).view(np.int64).copy()
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands))
        return pa.table({
            "doc_id": batch.column(id_col).take(idx),
            "band_key": pa.array(bk),
            "gk": pa.array(bk % n_super_buckets),
        })

    cand = (
        sig_ds.map_batches(explode_bands, batch_format="pyarrow")
        .repartition(_shuffle_width())  # bound the groupby's B^2 shuffle fan-out
        .groupby("gk")
        .map_groups(
            lambda g: _within_bucket_pairs(g, "band_key", "doc_id", cap=pair_cap),
            batch_format="pandas",
        )
    )
    return _distinct_pairs(cand)


def minhash_edges_inline(sig_ds: rd.Dataset, threshold: float,
                         num_perm: int = 64, num_bands: int = 16,
                         id_col: str = "doc_id", pair_cap: int = 64,
                         n_super_buckets: int | None = None) -> rd.Dataset:
    """LSH banding with the signatures RIDING the band rows; pairs are
    verified (signature agreement ≥ threshold) inside the bucketed
    groupby and only surviving edges leave it — the simhash pattern at
    minhash signature width.

    Traffic trade vs :func:`verify_pairs`'s pair⋈feature double join:
    inline ships ``num_bands × num_perm×8 B`` per doc through ONE
    shuffle (≈ 8 KB/doc at the defaults); the join path ships the sig
    table twice plus ~1 KB per candidate pair.  Inline wins whenever
    candidate density exceeds ~``num_bands/2`` pairs per doc — which
    is the regime LSH dedup is run in (a dup-dense 80k-doc corpus
    measured 56 pairs/doc: verify went from 47.5 s of a 67 s pipeline
    to in-bucket vector work).  A pair colliding in several bands is
    re-verified per band — vectorized XOR-agreement, cheaper than
    deduplicating 4.5M unverified candidates first."""
    mh = MinHasher(num_perm=num_perm)
    if n_super_buckets is None:
        n_super_buckets = _super_buckets(sig_ds.count() * num_bands)

    def explode_bands_sig(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        n = batch.num_rows
        if n:
            vals, _ = _binary_blob_views(batch.column("sig"), n)
            sigs = vals.reshape(n, num_perm)
            keys = mh.band_keys_matrix(sigs, num_bands)
        else:
            keys = np.zeros((0, num_bands), dtype=np.uint64)
        bk = keys.reshape(-1).view(np.int64).copy()
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands))
        return pa.table({
            "doc_id": batch.column(id_col).take(idx),
            "band_key": pa.array(bk),
            "gk": pa.array(bk % n_super_buckets),
            "sig": batch.column("sig").take(idx),
        })

    thr = float(threshold)

    def bucket_edges(group: pd.DataFrame) -> pd.DataFrame:
        m = _within_bucket_pairs(group, "band_key", "doc_id",
                                 extra_cols=("sig",), cap=pair_cap)
        if not len(m):
            return pd.DataFrame({"a": m.get("a", pd.Series(dtype=object)),
                                 "b": m.get("b", pd.Series(dtype=object))})
        # one C-level join per side instead of a frombuffer per row
        A = np.frombuffer(b"".join(m["sig_a"]),
                          dtype=np.uint64).reshape(len(m), num_perm)
        B = np.frombuffer(b"".join(m["sig_b"]),
                          dtype=np.uint64).reshape(len(m), num_perm)
        keep = (A == B).mean(axis=1) >= thr
        return pd.DataFrame({"a": m["a"].to_numpy()[keep],
                             "b": m["b"].to_numpy()[keep]})

    edges = (
        sig_ds.map_batches(explode_bands_sig, batch_format="pyarrow")
        .repartition(_shuffle_width())
        .groupby("gk")
        .map_groups(bucket_edges, batch_format="pandas")
    )
    return _distinct_pairs(edges)


def minhash_cluster_labels(ds: rd.Dataset, threshold: float = 0.7, num_perm: int = 64,
                           num_bands: int = 16, shingle_k: int = 5,
                           id_col: str = "doc_id", text_col: str = "text",
                           concurrency=None, pair_cap: int = 64,
                           small_edges_threshold: int = 2_000_000,
                           verify: str = "inline") -> rd.Dataset:
    """Full near-dup pass → Dataset (id, cluster_id=min id of its
    cluster) — every stage distributed:

      signature table (1 corpus pass, materialized)
      → banded LSH buckets with signatures riding the band rows,
        agreement-verified IN the bucket (``verify="inline"``, the
        default — see :func:`minhash_edges_inline` for the traffic
        trade) or via the pair⋈signature double join
        (``verify="join"``; wins only on dup-sparse corpora)
      → min-label propagation connected components (groupby loop)
      → left join back onto the corpus ids.

    Estimated Jaccard = fraction of agreeing signature positions,
    std ≈ 1/√num_perm — identical under both verify modes
    (pytest-asserted on a randomized corpus).

    The round-1 UNBOUNDED driver-side union-find (to_pandas + Python
    dict of all signatures) is gone.  Near-dup EDGE sets, however, are
    usually tiny relative to the corpus, so — exactly like
    :func:`attach_component_labels`'s broadcast path — edge sets at or
    under ``small_edges_threshold`` rows take a BOUNDED driver
    union-find (identical labels, skips ~6 s of per-iteration join
    overhead); larger sets use the distributed min-label CC loop where
    the driver only sees per-round convergence checksums."""
    sig_ds = minhash_signature_table(ds, num_perm, shingle_k, id_col, text_col,
                                     concurrency)
    if verify == "inline":
        edges = minhash_edges_inline(sig_ds, threshold, num_perm, num_bands,
                                     id_col, pair_cap).materialize()
    else:
        cand = minhash_candidates(sig_ds, num_perm, num_bands, id_col, pair_cap)
        if "doc_id" != id_col:
            sig_feats = sig_ds.map_batches(
                lambda b: pd.DataFrame({"doc_id": b[id_col], "sig": b["sig"]}),
                batch_format="pandas",
            )
        else:
            sig_feats = sig_ds

        def agreement(fa: list, fb: list) -> np.ndarray:
            A = np.stack([np.frombuffer(x, dtype=np.uint64) for x in fa])
            B = np.stack([np.frombuffer(x, dtype=np.uint64) for x in fb])
            return (A == B).mean(axis=1)

        scored = verify_pairs(cand, sig_feats, agreement, id_col="doc_id",
                              feat_col="sig")
        edges = scored.map_batches(
            lambda b: b[b["score"] >= threshold][["a", "b"]] if len(b)
            else pd.DataFrame({"a": [], "b": []}),
            batch_format="pandas",
        ).materialize()
    ids = ds.select_columns([id_col])
    n_edges = edges.count()
    if n_edges == 0:
        return ids.map_batches(
            lambda b: pd.DataFrame({id_col: b[id_col], "cluster_id": b[id_col]}),
            batch_format="pandas",
        )
    if n_edges <= small_edges_threshold:
        labels = _union_find_labels(edges.to_pandas())
    else:
        labels = connected_components_min_label(edges)
    return attach_component_labels(ids, labels, id_col=id_col)


def _union_find_labels(edges: pd.DataFrame) -> rd.Dataset:
    """Driver union-find over a BOUNDED edge set → (node, label=min of
    component) Dataset, identical to
    :func:`connected_components_min_label` (pytest-asserted)."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    av = edges["a"].tolist()
    bv = edges["b"].tolist()
    for a, b in zip(av, bv):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = list(dict.fromkeys(av + bv))
    return rd.from_pandas(pd.DataFrame({
        "node": nodes, "label": [find(n) for n in nodes],
    }))


def minhash_dedup_clusters(ds: rd.Dataset, threshold: float = 0.7, num_perm: int = 64,
                           num_bands: int = 16, shingle_k: int = 5,
                           id_col: str = "doc_id", text_col: str = "text",
                           concurrency=None) -> pd.DataFrame:
    """Collected (small-result) wrapper around
    :func:`minhash_cluster_labels` — at corpus scale, write the
    labels Dataset to parquet instead of collecting."""
    out = minhash_cluster_labels(ds, threshold, num_perm, num_bands, shingle_k,
                                 id_col, text_col, concurrency)
    return out.to_pandas().sort_values(id_col).reset_index(drop=True)


# ---------- SimHash ----------


class SimHashStage:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # batched: one vectorized token-hash pass (hash_tokens, C
        # siphash) then one ±1-bit matrix + add.reduceat over per-doc
        # segments — identical to per-doc simhash64 (bit sums are
        # order-independent)
        toks_per_doc = [(t or "").lower().split() for t in batch[self.text_col]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        sigs = np.zeros(len(toks_per_doc), dtype=np.uint64)
        nz = np.flatnonzero(lens)
        if len(nz):
            flat = hash_tokens([w for toks in toks_per_doc for w in toks])
            bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int32)
            signed = bits * 2 - 1
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            v = np.add.reduceat(signed, starts[nz], axis=0)  # (nnz, 64)
            pow2 = np.uint64(1) << np.arange(64, dtype=np.uint64)
            with np.errstate(over="ignore"):
                sigs[nz] = ((v > 0).astype(np.uint64) * pow2[None, :]).sum(
                    axis=1, dtype=np.uint64)
        # uint64 column, not hex text (round-4 verdict #4): the old
        # f"{s:016x}" emit + int(h, 16) re-parse in the explode were
        # the last per-row Python loops in the dedup family
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col],
                "simhash": sigs,
            }
        )


def simhash_signatures(ds: rd.Dataset, concurrency=None) -> rd.Dataset:
    if concurrency is None:
        concurrency = default_actor_pool()
    return ds.map_batches(SimHashStage, batch_format="pandas", concurrency=concurrency)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(b, axis=1).sum(axis=1).astype(np.int64)


def simhash_near_dup_pairs(ds: rd.Dataset, max_hamming: int = 3,
                           concurrency=None, pair_cap: int = 256,
                           n_super_buckets: int | None = None) -> rd.Dataset:
    """Near-dup pairs by SimHash: 4×16-bit band blocking (pigeonhole:
    any pair with Hamming ≤ 3 shares at least one of 4 bands), verify
    = vectorized XOR + popcount on within-bucket pairs.  Signatures
    ride along with the band rows so verification happens inside the
    bucketed groupby — no driver state, no Python pair loops."""
    sig = simhash_signatures(ds, concurrency).materialize()
    if n_super_buckets is None:
        n_super_buckets = _super_buckets(sig.count() * 4)

    def explode(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        n = batch.num_rows
        v = batch.column("simhash").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        bands = np.arange(4, dtype=np.uint64)
        key = ((v[:, None] >> (bands[None, :] * np.uint64(16)))
               & np.uint64(0xFFFF)).astype(np.int64)
        bk = (key * 4 + bands.astype(np.int64)[None, :]).reshape(-1)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        return pa.table({
            "doc_id": batch.column("doc_id").take(idx),
            "band_key": pa.array(bk),
            "gk": pa.array(bk % n_super_buckets),
            "sim": pa.array(np.repeat(v, 4)),
        })

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        m = _within_bucket_pairs(group, "band_key", "doc_id",
                                 extra_cols=("sim",), cap=pair_cap)
        if not len(m):
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        x = m["sim_a"].to_numpy().astype(np.uint64) ^ m["sim_b"].to_numpy().astype(np.uint64)
        h = _popcount64(x)
        keep = h <= max_hamming
        return pd.DataFrame({"a": m["a"].to_numpy()[keep],
                             "b": m["b"].to_numpy()[keep],
                             "hamming": h[keep]})

    cand = (
        sig.map_batches(explode, batch_format="pyarrow")
        .repartition(_shuffle_width())
        .groupby("gk")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return _distinct_pairs(cand, extra_cols=("hamming",))


def simhash_near_dups(ds: rd.Dataset, max_hamming: int = 3, concurrency=None) -> pd.DataFrame:
    """Collected wrapper around :func:`simhash_near_dup_pairs`."""
    out = simhash_near_dup_pairs(ds, max_hamming, concurrency).to_pandas()
    if not len(out):
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------- n-gram Jaccard ----------


def _gram_weights(n: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        weights = np.empty(n, dtype=np.uint64)
        weights[0] = 1
        for i in range(1, n):
            weights[i] = weights[i - 1] * _SHINGLE_BASE
    return weights


def _gram_hashes_batch(texts, n: int) -> list[np.ndarray]:
    """Per-doc sorted unique 64-bit hashes of word n-grams — exact for
    Jaccard up to 64-bit collisions (~n²/2⁶⁴).

    ONE vectorized token-hash pass (hash_tokens, C siphash) across the
    whole batch; the remaining per-doc loop only slices the flat hash
    array and runs the vectorized rolling-polynomial window combine."""
    toks_per_doc = [(t or "").lower().split() for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    flat = hash_tokens([w for toks in toks_per_doc for w in toks])
    offs = np.concatenate([[0], np.cumsum(lens)])
    weights = _gram_weights(n)[None, ::-1]
    shorts = [" ".join(toks_per_doc[i]) for i in np.flatnonzero(
        (lens > 0) & (lens < n))]
    short_h = iter(hash_tokens(shorts))
    out: list[np.ndarray] = []
    for i, L in enumerate(lens):
        if L == 0:
            out.append(np.zeros(0, dtype=np.uint64))
        elif L < n:
            out.append(np.array([next(short_h)], dtype=np.uint64))
        else:
            th = flat[offs[i]:offs[i + 1]]
            with np.errstate(over="ignore"):
                windows = np.lib.stride_tricks.sliding_window_view(th, n)
                h = _mix64((windows * weights).sum(axis=1, dtype=np.uint64))
            out.append(np.unique(h))
    return out


def _gram_hashes(text: str, n: int) -> np.ndarray:
    """Single-doc wrapper around :func:`_gram_hashes_batch`."""
    return _gram_hashes_batch([text], n)[0]


def ngram_feature_table(ds: rd.Dataset, n: int = 3, id_col: str = "doc_id",
                        text_col: str = "text",
                        pin_threshold_rows: int = 8_000_000) -> rd.Dataset:
    """One pass over the corpus → (id, grams-as-bytes) feature table
    feeding both blocking and verification.

    The grams blob is roughly INPUT-sized (unlike the 512 B/doc
    minhash signatures), so pinning it is the 100 TB anti-pattern —
    a :func:`..util.counted_pin` pins it only while it stays at or
    under ``pin_threshold_rows``; above that the lazy table streams
    and each consumer pays a re-execution of the gram pass (the same
    re-read-beats-pin trade prefix_scan makes)."""

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        per_doc = _gram_hashes_batch(batch[text_col].tolist(), n)
        ids, blobs, sizes = [], [], []
        for i, h in zip(batch[id_col], per_doc):
            if not len(h):
                continue
            ids.append(i)
            blobs.append(h.tobytes())
            sizes.append(len(h))
        return pd.DataFrame({"doc_id": ids, "grams": blobs,
                             "sz": np.asarray(sizes, dtype=np.int64)})

    lazy = ds.map_batches(feats, batch_format="pandas")
    pinned = counted_pin(lazy, pin_threshold_rows)
    return pinned if pinned is not None else lazy


def ngram_jaccard_pair_ds(ds: rd.Dataset, n: int = 3, threshold: float = 0.5,
                          id_col: str = "doc_id", text_col: str = "text",
                          pair_cap: int = 64,
                          n_super_buckets: int | None = None,
                          exact_verify: bool = False) -> rd.Dataset:
    """Near-dup pairs by word n-gram Jaccard, end-to-end distributed.

    Candidate pairs come from shared-gram blocking: within each gram's
    bucket, every co-occurring pair emits one row with a map-side
    combiner, so a pair's multiplicity across grams is a LOWER BOUND
    on |A∩B| (exact when none of the pair's shared grams is shared by
    more than ``pair_cap`` docs).  Over-cap grams contribute star
    edges only (bounded blow-up): pairs that share ONLY such
    ubiquitous grams and include neither bucket hub can be missed,
    and counts for pairs sharing them are undercounted — the standard
    ubiquitous-gram downweighting at corpus scale.  This is NOT
    silent: the pipeline counts over-cap grams in the same shuffle
    (zero extra passes) and emits a ``UserWarning`` with the count
    when any gram exceeded the cap.

    ``exact_verify=True`` instead scores EVERY candidate pair by
    intersecting the two sorted-unique gram-hash arrays from the
    feature table — exact values regardless of the cap (the star-edge
    recall caveat remains), at the cost of shipping candidate pairs'
    gram blobs through the verify joins (measured ~4× the count-based
    wall at sf0.1).  Use it when exact scores matter more than
    throughput; the collected :func:`ngram_jaccard_pairs` wrapper
    keeps the count-based default (pass ``exact_verify=True`` there
    to opt in)."""
    import warnings

    feats = ngram_feature_table(ds, n, id_col, text_col)
    if n_super_buckets is None:
        # gram rows ≈ docs × tokens/doc; 128 is a fair prior for the
        # row blow-up — only the group-count order matters here
        n_super_buckets = _super_buckets(feats.count() * 128)

    def explode(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        n = batch.num_rows
        if not n:
            return pa.table({"doc_id": batch.column("doc_id"),
                             "gram": pa.array([], type=pa.int64()),
                             "gk": pa.array([], type=pa.int64())})
        vals, offs = _binary_blob_views(batch.column("grams"), n)
        counts = np.diff(offs) // 8
        g = vals.view(np.int64)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), counts))
        return pa.table({"doc_id": batch.column("doc_id").take(idx),
                         "gram": pa.array(g),
                         "gk": pa.array(g % n_super_buckets)})

    def bucket_pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        # map-side combiner: collapse this bucket's per-gram pair rows
        # into partial counts before the pair-hash shuffle.  Over-cap
        # grams additionally emit ONE sentinel row (a == b — real
        # pairs are strictly a < b) whose count rides the same shuffle
        # so the driver can report capping without an extra pass.
        m = _within_bucket_pairs(g, "gram", "doc_id", cap=pair_cap)
        parts = []
        if len(m):
            parts.append(m.groupby(["a", "b"], sort=False).size()
                         .reset_index(name="c"))
        uniq = g.drop_duplicates(["gram", "doc_id"])
        n_over = int((uniq.groupby("gram", sort=False).size() > pair_cap).sum())
        if n_over:
            d = g["doc_id"].iloc[0]
            parts.append(pd.DataFrame({"a": [d], "b": [d], "c": [n_over]}))
        if not parts:
            return pd.DataFrame({"a": m.get("a", pd.Series(dtype=object)),
                                 "b": m.get("b", pd.Series(dtype=object)),
                                 "c": pd.Series(dtype="int64")})
        return pd.concat(parts, ignore_index=True)

    cand_all = _pair_counts(
        feats.map_batches(explode, batch_format="pyarrow")
        .repartition(_shuffle_width())  # bound the groupby's B^2 shuffle fan-out
        .groupby("gk")
        .map_groups(bucket_pair_counts, batch_format="pandas"),
        weight_col="c",
    ).materialize()

    def _pairs_where(want_sentinel: bool):
        def f(t):
            import pyarrow.compute as pc

            eq = pc.equal(t.column("a"), t.column("b"))
            return t.filter(eq if want_sentinel else pc.invert(eq))

        return f

    n_capped = sum(
        r["shared"] for r in
        cand_all.map_batches(_pairs_where(True), batch_format="pyarrow")
        .take_all())
    if n_capped:
        warnings.warn(
            f"ngram_jaccard: {n_capped} gram(s) exceeded pair_cap={pair_cap}; "
            f"pair intersection counts involving them are lower bounds and "
            f"pairs sharing only such grams may be missed"
            + ("" if exact_verify else
               " — pass exact_verify=True for exact scores"),
            UserWarning, stacklevel=2)
    # repartition after the filter: join inputs built from filtered
    # blocks otherwise hit the Arrow hash join's FieldRef
    # schema-resolution error ([[ray-local-pitfalls]])
    cand = (cand_all.map_batches(_pairs_where(False), batch_format="pyarrow")
            .repartition(_shuffle_width(0.25)))

    if exact_verify:
        def jac_exact(fa: list, fb: list) -> np.ndarray:
            # blobs are np.unique output → sorted unique
            out = np.empty(len(fa), dtype=np.float64)
            for k, (ba, bb) in enumerate(zip(fa, fb)):
                A = np.frombuffer(ba, dtype=np.uint64)
                B = np.frombuffer(bb, dtype=np.uint64)
                s = np.intersect1d(A, B, assume_unique=True).size
                out[k] = s / (A.size + B.size - s)
            return out

        scored = verify_pairs(cand, feats, jac_exact, id_col="doc_id",
                              feat_col="grams")
    else:
        def jac(fa: list, fb: list, shared: np.ndarray) -> np.ndarray:
            A = np.asarray(fa, dtype=np.float64)
            B = np.asarray(fb, dtype=np.float64)
            S = shared.astype(np.float64)
            return S / (A + B - S)

        scored = verify_pairs(cand, feats, jac, id_col="doc_id", feat_col="sz",
                              pass_cols=("shared",))

    def thresh(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            out = b[["a", "b"]].copy()  # dtype-preserving empty
            out["jaccard"] = pd.Series(dtype="float64")
            return out
        return pd.DataFrame({
            "a": b["a"], "b": b["b"],
            "jaccard": round_half_up(b["score"].to_numpy(), 6),
        })[b["score"].to_numpy() >= threshold]

    return scored.map_batches(thresh, batch_format="pandas")


def ngram_jaccard_pairs(ds: rd.Dataset, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        exact_verify: bool = False) -> pd.DataFrame:
    """Collected wrapper around :func:`ngram_jaccard_pair_ds` (same
    count-based default and capped-gram warning; pass
    ``exact_verify=True`` for exact scores)."""
    out = ngram_jaccard_pair_ds(ds, n, threshold, id_col, text_col,
                                exact_verify=exact_verify).to_pandas()
    if not len(out):
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------- embedding cosine ----------


def cosine_pairs_blocked(ds: rd.Dataset, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         n_blocks: int = 8, chunk: int = 1024) -> rd.Dataset:
    """EXACT all-pairs cosine ≥ threshold, distributed: hash rows into
    ``n_blocks`` row-blocks, replicate each row to the block-pair
    groups it participates in, chunked GEMM per group.

    Shuffle volume is ×n_blocks the embedding table (never the
    driver); group count is bounded at n_blocks(n_blocks+1)/2.  This
    is the exact baseline — compute is O(N²) by definition; at corpus
    scale use :func:`cosine_lsh_pair_ds` (banded sign-LSH candidates +
    exact verify) instead."""

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"grp": [], id_col: [], "src": [], "vecb": []})
        ids = b[id_col].to_numpy()
        g = (_id_hash(ids) % np.uint64(n_blocks)).astype(np.int64)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        M = M / nrm  # float64: float32 truncation shifts the 6th decimal
        blobs = [row.tobytes() for row in M]
        out = []
        for p in range(n_blocks):
            gi = np.minimum(g, p)
            gj = np.maximum(g, p)
            out.append(pd.DataFrame({
                "grp": gi * n_blocks + gj, id_col: ids, "src": g, "vecb": blobs,
            }))
        return pd.concat(out, ignore_index=True)

    def gemm(group: pd.DataFrame) -> pd.DataFrame:
        grp = int(group["grp"].iloc[0])
        gi, gj = divmod(grp, n_blocks)
        A = group[group["src"] == gi]
        if not len(A):
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        ida = A[id_col].to_numpy()
        MA = np.stack([np.frombuffer(v, dtype=np.float64) for v in A["vecb"]])
        if gi == gj:
            idb, MB = ida, MA
        else:
            B = group[group["src"] == gj]
            if not len(B):
                return pd.DataFrame({"a": [], "b": [], "cosine": []})
            idb = B[id_col].to_numpy()
            MB = np.stack([np.frombuffer(v, dtype=np.float64) for v in B["vecb"]])
        outs = []
        for s in range(0, len(ida), chunk):
            S = MA[s:s + chunk] @ MB.T
            hit = S >= threshold
            if gi == gj:
                # only strictly-upper pairs (global index order)
                ii, jj = np.nonzero(hit)
                keep = (s + ii) < jj
                ii, jj = ii[keep], jj[keep]
            else:
                ii, jj = np.nonzero(hit)
            if len(ii):
                a, b = ida[s + ii], idb[jj]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                outs.append(pd.DataFrame({
                    "a": lo, "b": hi,
                    "cosine": round_half_up(S[ii, jj], 6),
                }))
        if not outs:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        return pd.concat(outs, ignore_index=True)

    return (
        ds.select_columns([id_col, vec_col])
        .map_batches(replicate, batch_format="pandas")
        .groupby("grp")
        .map_groups(gemm, batch_format="pandas")
    )


def cosine_near_dup_pairs(ds: rd.Dataset, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_blocks: int = 8) -> pd.DataFrame:
    """Collected wrapper around :func:`cosine_pairs_blocked` (exact)."""
    out = cosine_pairs_blocked(ds, threshold, id_col, vec_col, n_blocks).to_pandas()
    if not len(out):
        return pd.DataFrame({"a": [], "b": [], "cosine": []})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def cosine_lsh_buckets(ds: rd.Dataset, n_bits: int = 10, n_bands: int = 40,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       seed: int = 11) -> rd.Dataset:
    """Banded sign-LSH bucket rows (id, band, bucket) — the scale path
    for cosine near-dup blocking.  Per band: ``n_bits`` random
    hyperplane signs → bucket id.  A pair at cosine c collides in one
    band w.p. (1−θ/π)^n_bits; across bands miss prob is
    (1−p)^n_bands — with the defaults, < 1e-7 at c ≥ 0.95."""
    import ray

    from .similarity import _hyperplanes, _normalize

    # one plane matrix for all bands, broadcast once
    dim = len(ds.take(1)[0][vec_col])
    planes = _hyperplanes(dim, n_bits * n_bands, seed)
    p_ref = ray.put(planes)

    def buckets(b: pd.DataFrame) -> pd.DataFrame:
        P = ray.get(p_ref)
        M = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]]))
        bits = (M @ P.T) > 0  # (B, n_bits*n_bands)
        ids = b[id_col].to_numpy()
        out = []
        pw = (1 << np.arange(n_bits)).astype(np.int64)
        for band in range(n_bands):
            key = bits[:, band * n_bits:(band + 1) * n_bits] @ pw
            out.append(pd.DataFrame({
                id_col: ids, "band": band, "bucket": key * n_bands + band,
            }))
        return pd.concat(out, ignore_index=True)

    return ds.select_columns([id_col, vec_col]).map_batches(
        buckets, batch_format="pandas")


def cosine_lsh_pair_ds(ds: rd.Dataset, threshold: float = 0.95, n_bits: int = 10,
                       n_bands: int = 40, id_col: str = "vec_id",
                       vec_col: str = "embedding", seed: int = 11,
                       pair_cap: int = 128,
                       n_super_buckets: int | None = None) -> rd.Dataset:
    """Scale-path cosine near-dup: banded sign-LSH candidates →
    exact-cosine verify via two hash joins.  Approximate only in
    candidate recall (miss < 1e-7 at the defaults for c ≥ 0.95); every
    emitted pair's cosine is exact."""
    rows = cosine_lsh_buckets(ds, n_bits, n_bands, id_col, vec_col, seed)
    if n_super_buckets is None:
        n_super_buckets = _super_buckets(ds.count() * n_bands)

    def add_gk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["gk"] = b["bucket"] % n_super_buckets
        return b

    cand = _distinct_pairs(
        rows.map_batches(add_gk, batch_format="pandas")
        .repartition(_shuffle_width())
        .groupby("gk")
        .map_groups(
            lambda g: _within_bucket_pairs(g, "bucket", id_col, cap=pair_cap),
            batch_format="pandas",
        )
    )

    def vec_feats(b: pd.DataFrame) -> pd.DataFrame:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]]) \
            if len(b) else np.zeros((0, 1))
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        M = M / nrm  # float64: float32 truncation shifts the 6th decimal
        return pd.DataFrame({"doc_id": b[id_col].to_numpy(),
                             "vecb": [r.tobytes() for r in M]})

    # normalized-vector blobs are input-sized — counted pin, not a
    # corpus materialize (streams + re-executes above the threshold)
    _lazy = ds.select_columns([id_col, vec_col]).map_batches(
        vec_feats, batch_format="pandas")
    _pinned = counted_pin(_lazy, 8_000_000)
    feats = _pinned if _pinned is not None else _lazy

    def cos(fa: list, fb: list) -> np.ndarray:
        A = np.stack([np.frombuffer(x, dtype=np.float64) for x in fa])
        B = np.stack([np.frombuffer(x, dtype=np.float64) for x in fb])
        return (A * B).sum(axis=1)

    scored = verify_pairs(cand, feats, cos, id_col="doc_id", feat_col="vecb")

    def thresh(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            out = b[["a", "b"]].copy()  # dtype-preserving empty
            out["cosine"] = pd.Series(dtype="float64")
            return out
        return pd.DataFrame({
            "a": b["a"], "b": b["b"],
            "cosine": round_half_up(b["score"].to_numpy(), 6),
        })[b["score"].to_numpy() >= threshold]

    return scored.map_batches(thresh, batch_format="pandas")
