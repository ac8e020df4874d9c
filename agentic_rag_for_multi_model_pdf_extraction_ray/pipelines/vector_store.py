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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import stable_bucket
from ..stages.embed import HashingEmbedder, embed
from ..state.manifest import read_output, write_partition


def upsert_chunks(chunks: rd.Dataset, store_dir: str, dim: int = 384,
                  n_partitions: int = 16, concurrency: int = 2) -> list[dict]:
    """Embed + write the vector table partitioned by chunk_id hash."""
    with_vecs = embed(chunks, dim=dim, text_col="structured_text",
                      concurrency=concurrency)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["part"] = [stable_bucket(str(c), n_partitions) for c in batch["chunk_id"]]
        return batch

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        data = group.drop_columns(["part"]).sort_by("chunk_id")
        m = write_partition(store_dir, part, data, f"rows={data.num_rows}")
        return pa.Table.from_pylist([{"part": part, "rows": data.num_rows,
                                      "status": m["status"]}])

    return (
        with_vecs.map_batches(add_part, batch_format="pandas")
        .repartition(n_partitions)
        .groupby("part")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )


def query_store(store_dir: str, question: str, top_k: int = 8,
                dim: int = 384, kind: str | None = None) -> pd.DataFrame:
    """Top-k retrieval against a stored vector table."""
    table = read_output(store_dir)
    ds = rd.from_arrow(table)
    if kind is not None:
        import pyarrow.compute as pc

        ds = rd.from_arrow(table.filter(pc.equal(table["kind"], kind)))
    qv = HashingEmbedder(dim=dim)._encode(question)
    from ..ops.similarity import knn_bruteforce

    return knn_bruteforce(ds, np.asarray(qv), k=top_k, id_col="chunk_id",
                          vec_col="embedding")
