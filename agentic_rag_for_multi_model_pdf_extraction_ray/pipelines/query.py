"""Query-side pipeline — the reference's ``app.py query`` path
(SURVEY.md §3.2) with deterministic stand-ins for the LLM stages.

    retrieve (cosine top-k over the chunk embeddings, with the
              figure-boost union + exact-text dedup J2)
    → build context (M13 numbered 800-char blocks)
    → "generate" (deterministic extractive answer: the top-scoring
       retrieved chunk texts — no model weights exist in this
       container; the stage boundary, record shapes and validation
       flow match the reference RAGAnswer, models.py:168-211)
    → Checkpoint B grounding validation (stages/validate.ground_answer)

Retrieval needs no model (reference ``orchestrator.py:96-135``
deliberately embeds with the embedder only) — here the query is
embedded with the same HashingEmbedder the ingest side used.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..functions.llmtext import build_context
from ..ops.similarity import knn_bruteforce, retrieval_with_figure_boost
from ..stages.embed import HashingEmbedder
from ..stages.validate import ground_answer

TOP_K = 8
FIGURE_TOP_K = 3


def retrieve(chunks_with_embeddings: rd.Dataset | None, question: str,
             top_k: int = TOP_K, figure_top_k: int = FIGURE_TOP_K,
             dim: int = 384, index_dir: str | None = None,
             n_probes: int | None = None,
             stats_out: dict | None = None) -> pd.DataFrame:
    """Top-k retrieval with the reference's figure boost + text dedup
    (J2, orchestrator.py:120-127).

    Default: exact brute force over the full chunk dataset (2–3 corpus
    passes — the oracle path).  With ``index_dir`` (a persisted LSH
    index built by ``pipelines.vector_store.build_store_index`` over
    the chunk store) every pass — general top-k, figure top-k, and the
    text lookup — touches ONLY the probed buckets' parquet files; pass
    a dict as ``stats_out`` to receive the pruning evidence
    (buckets_probed / files_read).  ``chunks_with_embeddings`` may be
    None in that mode."""
    enc = HashingEmbedder(dim=dim, text_col="structured_text")
    qv = enc._encode(question)
    visual = any(w in question.lower() for w in ("figure", "image", "chart", "diagram"))

    if index_dir is not None:
        # kind-dispatched on the index's own metadata (LSH or IVF)
        from ..ops.similarity import query_index

        hits, stats = query_index(index_dir, qv, k=top_k, n_probes=n_probes)
        if visual:
            fig_hits, _ = query_index(
                index_dir, qv, k=figure_top_k, n_probes=n_probes,
                filter_fn=lambda b: b[b["kind"] == "figure"])
        else:
            fig_hits = hits.head(0)
        if stats_out is not None:
            stats_out.update(stats)
        lookup = rd.read_parquet(stats["paths"]) if stats["paths"] else None
    else:
        hits = knn_bruteforce(
            chunks_with_embeddings, qv, k=top_k, id_col="chunk_id", vec_col="embedding"
        )
        if visual:
            figs = chunks_with_embeddings.map_batches(
                lambda b: b[b["kind"] == "figure"], batch_format="pandas"
            )
            fig_hits = knn_bruteforce(
                figs, qv, k=figure_top_k, id_col="chunk_id", vec_col="embedding"
            )
        else:
            fig_hits = hits.head(0)
        lookup = chunks_with_embeddings

    # join back chunk text for the merged hits (tiny driver-side lookup)
    want = set(hits["chunk_id"]) | set(fig_hits["chunk_id"])
    if not want or lookup is None:  # empty corpus/retrieval: no lookup
        return pd.DataFrame({"chunk_id": pd.Series(dtype=object),
                             "score": pd.Series(dtype="float64"),
                             "kind": pd.Series(dtype=object),
                             "text": pd.Series(dtype=object)})
    texts = (
        lookup.map_batches(
            lambda b: b[b["chunk_id"].isin(want)][["chunk_id", "kind", "structured_text"]],
            batch_format="pandas",
        ).to_pandas()
    )
    hits = hits.merge(texts, on="chunk_id").rename(columns={"structured_text": "text"})
    fig_hits = fig_hits.merge(texts, on="chunk_id").rename(columns={"structured_text": "text"})
    return retrieval_with_figure_boost(hits, fig_hits, text_col="text")


def _extractive_answer(hit_dicts: list[dict]) -> str:
    """Deterministic extractive "generation": top chunks verbatim."""
    return "\n".join((h["text"] or "")[:400] for h in hit_dicts[:3]).strip()


def answer_question(chunks_with_embeddings: rd.Dataset, question: str,
                    top_k: int = TOP_K, dim: int = 384, validate: bool = True) -> dict:
    """Full query flow → RAGAnswer-shaped dict (linear path)."""
    hits = retrieve(chunks_with_embeddings, question, top_k=top_k, dim=dim)
    hit_dicts = hits.to_dict("records")
    context = build_context(hit_dicts, text_key="text")
    answer = _extractive_answer(hit_dicts)
    result = {
        "question": question,
        "answer": answer,
        "reasoning_trace": context,
        "source_chunks": [
            {"chunk_id": h["chunk_id"], "kind": h["kind"], "score": float(h["score"])}
            for h in hit_dicts
        ],
        "validation_summary": None,
    }
    if validate:
        result["validation_summary"] = ground_answer(
            answer, [h["text"] or "" for h in hit_dicts]
        )
    return result


def answer_question_routed(chunks_with_embeddings: rd.Dataset | None, question: str,
                           top_k: int = TOP_K, dim: int = 384,
                           validate: bool = True, min_score: float = 0.0,
                           widen_factor: int = 3,
                           answer_fn=None, index_dir: str | None = None,
                           n_probes: int | None = None) -> dict:
    """Conditionally-routed query flow — the reference's LangGraph
    graph (``langgraph_pipeline.py:387-405``, conditional edges
    ``route_after_quality_check`` / ``route_after_decide_validate`` /
    ``route_after_grounding_check``) with deterministic gates:

      retrieve → check_quality
        · no hits, or best score < min_score → ONE widened re-retrieve
          (top_k × widen_factor); still failing → finalize with an
          "insufficient context" warning, generation skipped
          (reference check_retrieval_quality_node, ``:85-115``)
      → generate (answer_fn, default extractive)
      → decide_validate (the ``validates`` flag)
      → validate (Checkpoint B grounding) → check_grounding
        · not grounded and a grounded revision exists → revise:
          substitute the extractive answer (grounded by construction)
          and re-validate (reference revise_answer_node, ``:263-275``)
      → finalize.

    ``route`` in the result records the phases taken, mirroring the
    reference's ``current_phase`` trace.

    With ``index_dir`` retrieval probes the persisted LSH index
    (bucket-pruned reads — the scale default); the result then carries
    ``retrieval_stats`` with the pruning evidence.  Brute force over
    ``chunks_with_embeddings`` remains the exact oracle path."""
    answer_fn = answer_fn or _extractive_answer
    route = ["retrieve", "check_quality"]
    warnings: list[str] = []
    rstats: dict = {}

    hits = retrieve(chunks_with_embeddings, question, top_k=top_k, dim=dim,
                    index_dir=index_dir, n_probes=n_probes, stats_out=rstats)
    if len(hits) == 0 or float(hits["score"].max()) < min_score:
        # low-quality first pass → ONE widened re-retrieve (more
        # context for generation; a bigger k cannot raise the max
        # score, so the widened pass is judged on hit count only)
        route.append("re_retrieve_widened")
        hits = retrieve(chunks_with_embeddings, question,
                        top_k=top_k * widen_factor, dim=dim,
                        index_dir=index_dir, n_probes=n_probes,
                        stats_out=rstats)
        if len(hits) and float(hits["score"].max()) < min_score:
            warnings.append(
                "low retrieval confidence; proceeding with widened context")
    # the hard gate matches the reference exactly: finalize-without-
    # generation only when NOTHING was retrieved
    # (check_retrieval_quality_node, langgraph_pipeline.py:104-113)
    insufficient = len(hits) == 0
    base = {
        "question": question,
        "answer": None,
        "reasoning_trace": None,
        "source_chunks": [],
        "validation_summary": None,
        "warnings": warnings,
        "insufficient_context": insufficient,
    }
    if rstats:
        # drop the raw file list from the result shape; keep counts
        base["retrieval_stats"] = {k: v for k, v in rstats.items()
                                   if k != "paths"}
    if insufficient:
        warnings.append("No relevant context found for question")
        route.append("finalize")
        base["route"] = route
        return base

    hit_dicts = hits.to_dict("records")
    route.append("generate")
    answer = answer_fn(hit_dicts)
    source_texts = [h["text"] or "" for h in hit_dicts]
    base.update(
        answer=answer,
        reasoning_trace=build_context(hit_dicts, text_key="text"),
        source_chunks=[
            {"chunk_id": h["chunk_id"], "kind": h["kind"], "score": float(h["score"])}
            for h in hit_dicts
        ],
    )
    route.append("decide_validate")
    if validate:
        route.append("validate")
        verdict = ground_answer(answer, source_texts)
        route.append("check_grounding")
        if not verdict["is_grounded"]:
            revised = _extractive_answer(hit_dicts)
            revised_verdict = ground_answer(revised, source_texts)
            if revised_verdict["is_grounded"]:
                # needs_revision = not grounded AND a grounded revision
                # exists (reference langgraph_pipeline.py:241)
                route.append("revise")
                warnings.append("answer revised: hallucinations detected")
                base["answer"] = revised
                verdict = revised_verdict
        base["validation_summary"] = verdict
    route.append("finalize")
    base["route"] = route
    return base
