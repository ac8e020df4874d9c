"""Vector store — the reference's ChromaDB upsert/query re-expressed
as partitioned idempotent parquet (S6/S7,
``/root/reference/src/core/store.py:45-99``).

* upsert: chunk rows → embed (actor pool) → hash-partition by
  ``chunk_id`` → per-partition atomic write (same manifest machinery
  as the extraction sink).  Deterministic ``chunk_id`` + overwrite-by-
  partition = the reference's idempotent upsert-by-id
  (``store.py:71-76``): re-ingesting a document replaces its rows.
* query: brute-force cosine top-k over the stored table
  (ops/similarity.knn_bruteforce), optional ``kind`` filter — the
  reference's ``chunk_type`` metadata filter (``store.py:93-97``).
  With Lance available this becomes a real ANN index probe.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.hashing import stable_bucket
from ..stages.embed import HashingEmbedder, embed
from ..state.manifest import (
    _plain_arrow,
    partition_dir,
    read_output_ds,
    write_partition,
)


def upsert_chunks(chunks: rd.Dataset, store_dir: str, dim: int = 384,
                  n_partitions: int = 16, concurrency: int = 2) -> list[dict]:
    """Embed + write the vector table partitioned by chunk_id hash.

    SINGLE WRITER PER STORE: the per-partition upsert is a
    read-merge-replace with no lock, so two concurrent upsert runs
    touching the same partition each merge against the old file and
    the last ``os.replace`` wins, dropping the other run's surviving
    rows.  Serialize upserts to one store (the reference's ChromaDB
    client has the same single-writer contract per collection); reads
    stay safe at any time (atomic replace)."""
    # meta first: the dim-mismatch refusal must fire BEFORE any
    # partition is merged (mixed-dim partitions would poison queries);
    # writing intent up front is harmless if the job dies mid-run
    _write_store_meta(store_dir, dim)
    with_vecs = embed(chunks, dim=dim, text_col="structured_text",
                      concurrency=concurrency)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["part"] = [stable_bucket(str(c), n_partitions) for c in batch["chunk_id"]]
        return batch

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        # plain Arrow types up front so the merge with an existing
        # (plain-typed) partition file concat-matches
        data = _plain_arrow(group.drop_columns(["part"])).sort_by("chunk_id")
        # upsert-by-id (reference store.py:71-76): keep existing rows
        # whose chunk_id is NOT incoming — a partial re-ingest (one
        # updated document) must not delete other documents' chunks
        # that hash into the same partition
        existing = os.path.join(partition_dir(store_dir, part), "data.parquet")
        if os.path.isfile(existing):
            old = pq.read_table(existing)
            mask = pc.invert(pc.is_in(
                old["chunk_id"], value_set=data["chunk_id"].combine_chunks()))
            keep = old.filter(mask)
            if keep.num_rows:
                data = pa.concat_tables(
                    [keep.select(data.column_names), data]).sort_by("chunk_id")
        m = write_partition(store_dir, part, data, f"rows={data.num_rows}")
        return pa.Table.from_pylist([{"part": part, "rows": data.num_rows,
                                      "status": m["status"]}])

    out = (
        with_vecs.map_batches(add_part, batch_format="pandas")
        .repartition(n_partitions)
        .groupby("part")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    return out


def _write_store_meta(store_dir: str, dim: int) -> None:
    """Atomic ``_STORE.json``: embedding dim + the token-hash sentinel
    (hash_tokens(["a"]) at write time) so a reader on a different
    installation detects hash drift instead of silently mis-scoring
    queries embedded with a different hash.

    Refuses a re-upsert with a DIFFERENT dim — the merge-upsert keeps
    old rows, so mixed-dim partitions would poison every query — and
    likewise refuses a re-upsert when this installation's token-hash
    sentinel differs from the one the store was written with:
    overwriting the sentinel would mix old-hash and new-hash
    embeddings in one store while destroying the evidence
    ``_check_store_meta`` relies on to catch exactly that."""
    import json

    from ..functions.hashing import token_hash_fingerprint

    existing = os.path.join(store_dir, "_STORE.json")
    if os.path.isfile(existing):
        with open(existing) as f:
            old_meta = json.load(f)
        old_dim = old_meta.get("dim")
        if old_dim is not None and int(old_dim) != int(dim):
            raise ValueError(
                f"store {store_dir} was written with dim={old_dim}; "
                f"re-upserting with dim={dim} would mix embedding widths "
                "— use a new store dir or re-ingest everything")
        old_sentinel = old_meta.get("token_hash_sentinel")
        if (old_sentinel is not None
                and int(old_sentinel) != token_hash_fingerprint()):
            raise ValueError(
                f"store {store_dir} was written with token-hash sentinel "
                f"{old_sentinel}; this installation computes "
                f"{token_hash_fingerprint()} — re-upserting would mix "
                "embeddings from two hash functions. Re-ingest into a new "
                "store dir (or align pandas/hash-key versions)")
    os.makedirs(store_dir, exist_ok=True)
    tmp = os.path.join(store_dir, "_STORE.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"dim": dim,
                   "token_hash_sentinel": token_hash_fingerprint()}, f)
    os.replace(tmp, os.path.join(store_dir, "_STORE.json"))


def _check_store_meta(store_dir: str) -> None:
    import json

    from ..functions.hashing import token_hash_fingerprint

    path = os.path.join(store_dir, "_STORE.json")
    if not os.path.isfile(path):
        return  # pre-sentinel store: nothing to verify against
    with open(path) as f:
        meta = json.load(f)
    want = meta.get("token_hash_sentinel")
    if want is not None and int(want) != token_hash_fingerprint():
        raise RuntimeError(
            f"token-hash mismatch for store {store_dir}: written with "
            f"sentinel {want}, this installation computes "
            f"{token_hash_fingerprint()} — re-ingest (or align pandas/"
            "hash-key versions) before querying")


def build_store_index(store_dir: str, index_dir: str, n_bits: int = 6,
                      seed: int = 11, kind: str = "lsh",
                      n_centroids: int = 64) -> list[dict]:
    """Persist an ANN index of the chunk store, partitioned by bucket
    (``kind="lsh"``, sign-LSH over ``n_bits`` hyperplanes) or by
    nearest centroid (``kind="ivf"``), so queries read only probed
    partitions' files.  ``query_store`` dispatches on the index's own
    metadata — build either kind, query the same way."""
    from ..ops.similarity import build_ivf_index_store, build_lsh_index_store

    # Streaming read of the partition files — the store is never
    # concatenated on the driver (at scale it is itself a large table).
    ds = read_output_ds(store_dir)
    if kind == "ivf":
        return build_ivf_index_store(ds, index_dir, n_centroids=n_centroids,
                                     id_col="chunk_id", vec_col="embedding",
                                     seed=seed)
    if kind != "lsh":
        raise ValueError(f"kind must be 'lsh' or 'ivf'; got {kind!r}")
    return build_lsh_index_store(ds, index_dir, n_bits=n_bits,
                                 id_col="chunk_id", vec_col="embedding",
                                 seed=seed)


def query_store(store_dir: str, question: str, top_k: int = 8,
                dim: int = 384, kind: str | None = None,
                index_dir: str | None = None,
                n_probes: int | None = None) -> pd.DataFrame:
    """Top-k retrieval against a stored vector table.

    With ``index_dir`` (built by :func:`build_store_index`, LSH or
    IVF — dispatched on the index's own metadata) the query reads only
    the probed partitions' parquet files (approximate — recall
    governed by n_bits/n_probes or n_centroids/nprobe); otherwise
    exact brute force over the full store."""
    _check_store_meta(store_dir)
    qv = HashingEmbedder(dim=dim)._encode(question)
    from ..ops.similarity import knn_bruteforce, query_index

    if index_dir is not None:
        # kind-dispatched (LSH or IVF — whatever build wrote): index-
        # type parity, the reference has ONE query surface (store.py:91)
        filt = (lambda b: b[b["kind"] == kind]) if kind is not None else None
        hits, _ = query_index(index_dir, np.asarray(qv), k=top_k,
                              n_probes=n_probes, filter_fn=filt)
        return hits
    ds = read_output_ds(store_dir)
    if kind is not None:
        want = kind
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], want)),
            batch_format="pyarrow")
    return knn_bruteforce(ds, np.asarray(qv), k=top_k, id_col="chunk_id",
                          vec_col="embedding")
