"""CLI — the engine's ``app.py`` analogue (reference
``/root/reference/app.py:571-592``: ingest / query / pipeline
subcommands).

    python -m agentic_rag_for_multi_model_pdf_extraction_ray ingest \
        --input <documents_raw parquet dir> --out /tmp/out [--resume]
    python -m agentic_rag_for_multi_model_pdf_extraction_ray synth \
        --n-docs 1000 --out /tmp/corpus
    python -m agentic_rag_for_multi_model_pdf_extraction_ray index \
        --chunks <extraction out dir> --out /tmp/idx --kind ivf --tune 16
    python -m agentic_rag_for_multi_model_pdf_extraction_ray query \
        --chunks <extraction out dir> "question text" [--routed --index /tmp/idx]
    python -m agentic_rag_for_multi_model_pdf_extraction_ray pipeline \
        --input <corpus> --out /tmp/out "question text"

Owns its Ray session (the library never calls ray.init — driver
contract)."""

from __future__ import annotations

import argparse
import json
import os


def _ray_session():
    import ray

    if not ray.is_initialized():
        # honor a cluster address (ray job submit sets RAY_ADDRESS) —
        # hard-coding "local" inside a job would start a private
        # single-node cluster instead of joining the real one
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(
            address=addr,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if addr == "local":
            kwargs["num_cpus"] = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_synth(args) -> None:
    import pyarrow.parquet as pq

    from .synth import generate_corpus

    table = generate_corpus(args.n_docs, seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    pq.write_table(table, os.path.join(args.out, "documents_raw.parquet"))
    print(json.dumps({"docs": table.num_rows, "out": args.out}))


def cmd_ingest(args) -> None:
    ray = _ray_session()
    import ray.data as rd

    from .pipelines.extract import run_extraction
    from .state.manifest import completed_partitions

    if not args.resume:
        import shutil

        shutil.rmtree(args.out, ignore_errors=True)
    ds = rd.read_parquet(args.input, columns=["doc_id", "payload"])
    manifests = run_extraction(
        ds, args.out, n_partitions=args.partitions, batch_size=args.batch_size
    )
    print(json.dumps({
        "partitions_written": len(manifests),
        "partitions_complete": len(completed_partitions(args.out)),
        "docs": sum(m["num_docs"] for m in manifests),
        "spans": sum(m["num_spans"] for m in manifests),
    }))
    ray.shutdown()


def cmd_query(args) -> None:
    ray = _ray_session()
    import ray.data as rd

    from .pipelines.query import answer_question, answer_question_routed
    from .sources.sinks import save_answer_json
    from .stages.chunk import transform_chunks
    from .stages.embed import embed
    from .stages.reassemble import explode_spans_batch
    from .state.manifest import read_output

    docs = read_output(args.chunks)
    span_rows = explode_spans_batch(docs)
    # page_num is not persisted in the packed layout; chunk transform
    # tolerates its absence
    chunks = transform_chunks(rd.from_arrow(span_rows), mode="direct")
    with_vecs = embed(chunks, dim=args.dim)
    if getattr(args, "routed", False):
        ans = answer_question_routed(with_vecs, args.question, dim=args.dim,
                                     validate=not args.no_validate,
                                     index_dir=getattr(args, "index", None))
    else:
        ans = answer_question(with_vecs, args.question, dim=args.dim,
                              validate=not args.no_validate)
    if args.save:
        save_answer_json(ans, args.save)
    print(json.dumps(ans, ensure_ascii=False)[:2000])
    ray.shutdown()


def cmd_index(args) -> None:
    """Build a persisted ANN index (LSH or IVF) over an extraction
    output, so ``query --routed --index`` probes only bucket
    partitions.  The chunk/embedding recompute is the same
    deterministic path ``cmd_query`` uses, so ids and vectors match.
    ``--tune N`` runs the recall@k probe-knob sweep (IVF nprobe /
    LSH Hamming radius) with N corpus vectors as queries and persists
    the recommendation the query dispatcher picks up."""
    ray = _ray_session()
    import numpy as np
    import ray.data as rd

    from .ops.similarity import (
        build_ivf_index_store,
        build_lsh_index_store,
        tune_ivf_nprobe,
        tune_lsh_nprobes,
    )
    from .stages.chunk import transform_chunks
    from .stages.embed import embed
    from .stages.reassemble import explode_spans_batch
    from .state.manifest import read_output

    docs = read_output(args.chunks)
    chunks = transform_chunks(rd.from_arrow(explode_spans_batch(docs)),
                              mode="direct")
    with_vecs = embed(chunks, dim=args.dim)
    if args.tune:
        # the tuner's ground-truth pass re-reads the dataset; pin the
        # embedded blocks once instead of re-running the embed stage
        with_vecs = with_vecs.materialize()
    if args.kind == "ivf":
        parts = build_ivf_index_store(with_vecs, args.out,
                                      n_centroids=args.n_centroids,
                                      id_col="chunk_id",
                                      vec_col="embedding")
    else:
        parts = build_lsh_index_store(with_vecs, args.out,
                                      n_bits=args.n_bits,
                                      id_col="chunk_id",
                                      vec_col="embedding")
    info = {"kind": args.kind, "partitions": len(parts),
            "rows": int(sum(r["rows"] for r in parts)), "out": args.out}
    if args.tune:
        Q = np.stack(with_vecs.limit(args.tune)
                     .to_pandas()["embedding"].to_numpy())
        if args.kind == "ivf":
            tune_ivf_nprobe(with_vecs, args.out, Q, k=args.k,
                            id_col="chunk_id", vec_col="embedding")
            rec_key = "recommended_nprobe"
        else:
            tune_lsh_nprobes(with_vecs, args.out, Q, k=args.k,
                             id_col="chunk_id", vec_col="embedding")
            rec_key = "recommended_n_probes"
        with open(os.path.join(args.out, "_TUNING.json")) as f:
            info[rec_key] = json.load(f)[rec_key]
    print(json.dumps(info))
    ray.shutdown()


def cmd_pipeline(args) -> None:
    ns = argparse.Namespace(
        input=args.input, out=args.out, partitions=args.partitions,
        batch_size=args.batch_size, resume=False,
    )
    cmd_ingest(ns)
    ns2 = argparse.Namespace(
        chunks=args.out, question=args.question, dim=args.dim,
        no_validate=args.no_validate, save=args.save,
    )
    cmd_query(ns2)


def cmd_analyze(args) -> None:
    """Corpus analysis over an extraction output dir or any parquet:
    token heavy hitters via the candidates-then-verify CMS pipeline
    (one fused zero-shuffle pass + a broadcast-filtered exact count of
    the k winners; rows carry their own e/width·N error envelope)."""
    _ray_session()

    from .ops.sketch import cms_heavy_hitters
    from .sources.corpus import read_any
    from .state.manifest import read_output_ds

    if os.path.isdir(args.input) and (
            os.path.isfile(os.path.join(args.input, "_RUN_METRICS.json"))
            or os.path.isdir(os.path.join(args.input, "part=0"))):
        # extraction output: (doc_id, spans) — explode to span rows
        # (vectorized Arrow offsets) so the text column is flat
        from .stages.reassemble import explode_spans_batch

        ds = read_output_ds(args.input).map_batches(
            explode_spans_batch, batch_format="pyarrow")
        col = args.col or "text"
    else:
        col = args.col or "text"
        ds = read_any(args.input, columns=[col])
    out = cms_heavy_hitters(ds, col, k=args.k, width=args.width,
                            depth=args.depth, verify=not args.no_verify)
    print(out.to_json(orient="records"))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="agentic_rag_for_multi_model_pdf_extraction_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth", help="generate a deterministic corpus")
    ps.add_argument("--n-docs", type=int, default=1000)
    ps.add_argument("--seed", type=int, default=42)
    ps.add_argument("--out", required=True)
    ps.set_defaults(fn=cmd_synth)

    pi = sub.add_parser("ingest", help="extraction pipeline (resumable)")
    pi.add_argument("--input", required=True)
    pi.add_argument("--out", required=True)
    pi.add_argument("--partitions", type=int, default=64)
    pi.add_argument("--batch-size", type=int, default=128)
    pi.add_argument("--resume", action="store_true")
    pi.set_defaults(fn=cmd_ingest)

    pq_ = sub.add_parser("query", help="retrieve + answer over extracted chunks")
    pq_.add_argument("question")
    pq_.add_argument("--chunks", required=True)
    pq_.add_argument("--dim", type=int, default=384)
    pq_.add_argument("--no-validate", action="store_true")
    pq_.add_argument("--save", default=None)
    pq_.add_argument("--routed", action="store_true",
                     help="conditionally-routed flow (quality gate, "
                          "widened re-retrieve, grounding-gate revise)")
    pq_.add_argument("--index", default=None,
                     help="persisted ANN index dir (build_store_index, "
                          "LSH or IVF — dispatched on the index's own "
                          "metadata): routed retrieval probes only its "
                          "partitions")
    pq_.set_defaults(fn=cmd_query)

    px = sub.add_parser("index", help="build a persisted ANN index "
                                      "(LSH or IVF) over extracted chunks")
    px.add_argument("--chunks", required=True,
                    help="extraction output dir (ingest --out)")
    px.add_argument("--out", required=True, help="index dir to write")
    px.add_argument("--kind", choices=("lsh", "ivf"), default="lsh")
    px.add_argument("--dim", type=int, default=384)
    px.add_argument("--n-bits", type=int, default=6, help="LSH hyperplanes")
    px.add_argument("--n-centroids", type=int, default=64, help="IVF lists")
    px.add_argument("--tune", type=int, default=0, metavar="N",
                    help="sweep the probe knob (IVF nprobe / LSH "
                         "Hamming radius) with N corpus vectors as "
                         "queries; persists the recommendation the "
                         "query dispatcher picks up")
    px.add_argument("--k", type=int, default=10, help="recall@k for --tune")
    px.set_defaults(fn=cmd_index)

    pa_ = sub.add_parser("analyze", help="token heavy hitters over a "
                                         "corpus (CMS candidates-then-"
                                         "verify; self-reported error "
                                         "envelope)")
    pa_.add_argument("--input", required=True,
                     help="extraction output dir, or a parquet file/dir")
    pa_.add_argument("--col", default=None,
                     help="text column (default: text; extraction "
                          "output uses its span text column)")
    pa_.add_argument("--k", type=int, default=20)
    pa_.add_argument("--width", type=int, default=8192)
    pa_.add_argument("--depth", type=int, default=4)
    pa_.add_argument("--no-verify", action="store_true",
                     help="skip the exact-count verify pass")
    pa_.set_defaults(fn=cmd_analyze)

    pp = sub.add_parser("pipeline", help="ingest then query")
    pp.add_argument("question")
    pp.add_argument("--input", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--partitions", type=int, default=64)
    pp.add_argument("--batch-size", type=int, default=128)
    pp.add_argument("--dim", type=int, default=384)
    pp.add_argument("--no-validate", action="store_true")
    pp.add_argument("--save", default=None)
    pp.set_defaults(fn=cmd_pipeline)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
