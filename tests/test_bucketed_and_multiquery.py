"""Size-bucketed parse path + batched multi-query ANN."""

import numpy as np
import pandas as pd
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.oracle import oracle_spans_rows
from agentic_rag_for_multi_model_pdf_extraction_ray.ops.similarity import (
    knn_multi_query,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.extract import (
    parse_to_span_rows,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.synth import generate_corpus


def test_bucketed_parse_same_spans_as_single_pass():
    corpus = generate_corpus(60, seed=9)
    ds = rd.from_arrow(corpus)
    single = parse_to_span_rows(ds, n_partitions=8, concurrency=1).to_pandas()
    bucketed = parse_to_span_rows(
        rd.from_arrow(corpus), n_partitions=8, concurrency=1, bucketed=True
    ).to_pandas()
    cols = ["doc_id", "offset", "kind", "text", "media_ref", "part"]
    a = single[cols].sort_values(["doc_id", "offset"]).reset_index(drop=True)
    b = bucketed[cols].sort_values(["doc_id", "offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # and both match the oracle
    want = oracle_spans_rows(corpus).to_pandas()
    want = want[want["doc_id"].isin(a["doc_id"])]
    assert len(a) == len(want)


def test_knn_multi_query_matches_per_query_bruteforce():
    rng = np.random.RandomState(5)
    M = rng.normal(size=(150, 12))
    rows = [{"vec_id": i, "embedding": M[i].tolist()} for i in range(150)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    Q = M[[3, 77]]
    out = knn_multi_query(ds, Q, k=5)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qi, qrow in enumerate(Q):
        s = Mn @ (qrow / np.linalg.norm(qrow))
        want = set(np.argsort(-s)[:5].tolist())
        got = set(out[out["query_idx"] == qi]["vec_id"])
        assert got == want
