"""Vector store: idempotent upsert + top-k query (+kind filter)."""

import pandas as pd
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.vector_store import (
    query_store,
    upsert_chunks,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.state.manifest import read_output


def _chunks():
    return rd.from_pandas(pd.DataFrame({
        "chunk_id": [f"c{i}" for i in range(8)],
        "kind": ["text"] * 6 + ["figure"] * 2,
        "structured_text": [
            "ray data dataset streaming", "arrow zero copy blocks",
            "actor pool stateful stage", "groupby shuffle partition",
            "parquet manifest resume", "cosine similarity search",
            "figure: scaling chart", "figure: architecture diagram",
        ],
    }))


def test_upsert_and_query(tmp_path):
    store = str(tmp_path / "store")
    manifests = upsert_chunks(_chunks(), store, dim=64, n_partitions=4,
                              concurrency=1)
    assert sum(m["rows"] for m in manifests) == 8

    hits = query_store(store, "streaming dataset ray", top_k=3, dim=64)
    assert len(hits) == 3
    assert "c0" in set(hits["chunk_id"])

    fig_hits = query_store(store, "architecture diagram", top_k=2, dim=64,
                           kind="figure")
    assert set(fig_hits["chunk_id"]) <= {"c6", "c7"}


def test_store_paths_stream_not_driver(tmp_path, monkeypatch):
    """Index build + brute query must never concat the store on the
    driver — both go through read_output_ds (rd.read_parquet over the
    partition files), so poisoning read_output proves it."""
    from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.vector_store import (
        build_store_index,
    )
    from agentic_rag_for_multi_model_pdf_extraction_ray.state import manifest

    store = str(tmp_path / "store3")
    upsert_chunks(_chunks(), store, dim=64, n_partitions=4, concurrency=1)

    def _boom(out_dir):
        raise AssertionError("driver-side read_output called on the store")

    monkeypatch.setattr(manifest, "read_output", _boom)

    hits = query_store(store, "streaming dataset ray", top_k=3, dim=64)
    assert len(hits) == 3
    fig_hits = query_store(store, "architecture diagram", top_k=2, dim=64,
                           kind="figure")
    assert set(fig_hits["chunk_id"]) <= {"c6", "c7"}

    idx = str(tmp_path / "idx3")
    manifests = build_store_index(store, idx, n_bits=4)
    assert sum(m["rows"] for m in manifests) == 8
    ihits = query_store(store, "streaming dataset ray", top_k=3, dim=64,
                        index_dir=idx, n_probes=4)
    assert len(ihits) >= 1


def test_upsert_is_idempotent(tmp_path):
    store = str(tmp_path / "store2")
    upsert_chunks(_chunks(), store, dim=64, n_partitions=4, concurrency=1)
    first = read_output(store).sort_by("chunk_id")
    upsert_chunks(_chunks(), store, dim=64, n_partitions=4, concurrency=1)
    second = read_output(store).sort_by("chunk_id")
    assert first.num_rows == second.num_rows == 8
    assert first.column("chunk_id").equals(second.column("chunk_id"))
