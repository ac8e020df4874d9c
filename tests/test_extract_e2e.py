"""End-to-end span-sequence equality: distributed pipeline vs oracle.

The north rule's correctness gate — exact (kind, text, media_ref,
order) per document — plus resume-at-partition-granularity behavior.
"""

import os
import shutil

import pyarrow as pa
import pytest
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.oracle import (
    oracle_documents_interleaved,
    oracle_spans_rows,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.extract import (
    run_extraction,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.stages.parse import PayloadParser
from agentic_rag_for_multi_model_pdf_extraction_ray.stages.reassemble import (
    explode_spans_batch,
    reassemble_documents,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.state.manifest import (
    completed_partitions,
    read_output,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.synth import generate_corpus


@pytest.fixture(scope="module")
def corpus() -> pa.Table:
    return generate_corpus(n_docs=120, seed=42)


def _spans_by_doc(table: pa.Table) -> dict:
    out = {}
    for row in table.to_pylist():
        spans = sorted(row["spans"], key=lambda s: s["offset"])
        out[row["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
        ]
    return out


def test_corpus_has_interesting_shape(corpus):
    oracle_rows = oracle_spans_rows(corpus)
    kinds = set(oracle_rows.column("kind").to_pylist())
    assert kinds == {"text", "table", "figure"}
    assert oracle_rows.num_rows > 200


@pytest.mark.parametrize("packed", [True, False])
def test_pipeline_matches_oracle_span_for_span(corpus, tmp_path, packed):
    out_dir = str(tmp_path / f"out_{packed}")
    ds = rd.from_arrow(corpus).repartition(7)  # odd layout on purpose
    manifests = run_extraction(ds, out_dir, n_partitions=8, batch_size=16, packed=packed)
    assert {m["part"] for m in manifests} == completed_partitions(out_dir)

    got = _spans_by_doc(read_output(out_dir))
    want = _spans_by_doc(oracle_documents_interleaved(corpus))
    if packed:
        # packed mode emits zero-span docs with an empty list — full
        # per-doc lineage, exactly the oracle's doc set
        assert got == want
    else:
        # span-row mode can't represent a doc with no rows
        assert got == {k: v for k, v in want.items() if v}


def test_resume_skips_completed_partitions(corpus, tmp_path):
    out_dir = str(tmp_path / "out2")
    ds = rd.from_arrow(corpus)
    first = run_extraction(ds, out_dir, n_partitions=8)
    assert len(first) > 0
    # sabotage one partition: remove it → only that one is redone
    victim = first[0]["part"]
    shutil.rmtree(os.path.join(out_dir, f"part={victim}"))
    second = run_extraction(ds, out_dir, n_partitions=8)
    assert [m["part"] for m in second] == [victim]
    # full output intact afterwards
    got = _spans_by_doc(read_output(out_dir))
    want = _spans_by_doc(oracle_documents_interleaved(corpus))
    assert got == want


def test_reassemble_roundtrip_per_doc_operator(corpus):
    """The generic groupby(doc_id).map_groups reassembly operator."""
    sub = corpus.slice(0, 30)
    span_rows = rd.from_arrow(sub).map_batches(
        PayloadParser, batch_format="pyarrow", batch_size=8, concurrency=2
    )
    docs = reassemble_documents(span_rows)
    got = _spans_by_doc(pa.concat_tables([b for b in docs.iter_batches(batch_format="pyarrow")]))
    want = {k: v for k, v in _spans_by_doc(oracle_documents_interleaved(sub)).items() if v}
    assert got == want


def test_explode_is_inverse_of_pack(corpus):
    packed = oracle_documents_interleaved(corpus.slice(0, 20))
    exploded = explode_spans_batch(packed)
    want = oracle_spans_rows(corpus.slice(0, 20)).drop_columns(["page_num"])
    assert exploded.select(["doc_id", "kind", "text", "media_ref", "offset"]).equals(
        want.select(["doc_id", "kind", "text", "media_ref", "offset"])
    )
