"""Record-shape contracts — the engine's analogue of the reference's
models suite (reference tests/test_models.py: ChunkType values,
RawChunk/ProcessedChunk fields, RAGAnswer defaults, validation result
shapes)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.schema import (
    DOCUMENTS_INTERLEAVED_SCHEMA,
    KINDS,
    PROCESSED_CHUNKS_SCHEMA,
    SPAN_STRUCT,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.stages.validate import (
    ACCEPT,
    CORRECTED,
    DISCARDED,
    ground_answer,
)


def test_kind_values_match_reference_chunk_types():
    # reference ChunkType: TEXT / TABLE / FIGURE (models.py:21-27)
    assert KINDS == ("text", "table", "figure")


def test_span_struct_fields():
    # input_hint: spans:array<struct<kind,text,media_ref,offset:int32>>
    assert [f.name for f in SPAN_STRUCT] == ["kind", "text", "media_ref", "offset"]
    assert SPAN_STRUCT.field("offset").type == pa.int32()
    assert DOCUMENTS_INTERLEAVED_SCHEMA.names == ["doc_id", "spans"]
    assert DOCUMENTS_INTERLEAVED_SCHEMA.field("spans").type == pa.list_(SPAN_STRUCT)


def test_processed_chunk_schema_covers_reference_fields():
    # reference ProcessedChunk (models.py:104-137): chunk_type,
    # structured_text, intuition_summary, key_concepts, confidence,
    # agent_notes + identity/position
    names = set(PROCESSED_CHUNKS_SCHEMA.names)
    assert {"chunk_id", "doc_id", "kind", "structured_text",
            "intuition_summary", "key_concepts", "confidence",
            "agent_notes"} <= names
    assert PROCESSED_CHUNKS_SCHEMA.field("confidence").type == pa.float32()
    assert PROCESSED_CHUNKS_SCHEMA.field("key_concepts").type == pa.list_(pa.string())


def test_validation_outcome_values():
    # reference accept/correct/discard loop (pipeline.py:255-319)
    assert (ACCEPT, CORRECTED, DISCARDED) == ("accepted", "corrected", "discarded")


def test_answer_validation_result_shape():
    # reference AnswerValidationResult (models.py:77-96)
    v = ground_answer("alpha beta", ["alpha beta gamma"])
    assert set(v) == {"is_grounded", "hallucinations", "verdict_score", "notes"}
    assert v["is_grounded"] is True and v["verdict_score"] == 1.0


def test_rag_answer_shape():
    # reference RAGAnswer (models.py:168-211): question, answer,
    # reasoning_trace, source_chunks, validation_summary
    from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.query import (
        answer_question,
        answer_question_routed,
    )
    from agentic_rag_for_multi_model_pdf_extraction_ray.stages.embed import embed

    chunks = rd.from_pandas(pd.DataFrame({
        "chunk_id": ["c0", "c1"],
        "kind": ["text", "text"],
        "structured_text": ["ray data streaming pipeline",
                            "arrow zero copy batches"],
    }))
    with_vecs = embed(chunks, dim=32, concurrency=1)
    ans = answer_question(with_vecs, "ray data", dim=32)
    assert {"question", "answer", "reasoning_trace", "source_chunks",
            "validation_summary"} <= set(ans)
    assert all({"chunk_id", "kind", "score"} == set(s)
               for s in ans["source_chunks"])
    routed = answer_question_routed(with_vecs, "ray data", dim=32)
    assert {"route", "warnings", "insufficient_context"} <= set(routed)
