"""Classifier stages + CLI smoke."""

import json
import subprocess
import sys

import pandas as pd
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.stages.classify import (
    LayoutClassifier,
    TableStructureClassifier,
    classify_spans,
    infer_table_schema,
)


def test_infer_table_schema():
    md = "| name | qty | price | when |\n| --- | --- | --- | --- |\n" \
         "| ab | 3 | 1.5 | 2024-01-02 |\n| cd | 7 | 2.25 | 2024-02-03 |"
    s = infer_table_schema(md)
    assert s["columns"] == ["name", "qty", "price", "when"]
    assert s["types"] == ["text", "int", "float", "date"]
    assert infer_table_schema("") == {"columns": [], "types": []}


def test_layout_classifier_rules():
    c = LayoutClassifier()
    batch = pd.DataFrame({
        "kind": ["text", "text", "figure", "table"],
        "text": [
            "Short Title Here",
            "- item one\n- item two\n- item three",
            "",
            "| a |",
        ],
        "media_ref": ["", "", "crop://d/0", ""],
    })
    out = c(batch)
    assert out["layout_class"].tolist()[0] == "heading"
    assert out["layout_class"].tolist()[1] == "list"
    assert out["layout_class"].tolist()[3] == "table"
    assert out["layout_class"].tolist()[2] in (
        "chart", "diagram", "photo", "screenshot", "map"
    )


def test_classify_spans_actor_pools():
    ds = rd.from_pandas(pd.DataFrame({
        "kind": ["table", "text"],
        "text": ["| h | n |\n| --- | --- |\n| x | 4 |", "A paragraph of plain prose."],
        "media_ref": ["", ""],
    }))
    out = classify_spans(ds).to_pandas()
    schema = json.loads(out[out["kind"] == "table"]["table_schema"].iloc[0])
    assert schema["types"] == ["text", "int"]
    assert out[out["kind"] == "text"]["layout_class"].iloc[0] == "paragraph"


def test_table_classifier_only_touches_tables():
    c = TableStructureClassifier()
    batch = pd.DataFrame({
        "kind": ["text"], "text": ["not a table"], "media_ref": [""],
    })
    out = c(batch)
    assert json.loads(out["table_schema"].iloc[0]) == {"columns": [], "types": []}


def test_cli_synth_ingest_resume(tmp_path):
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    env = {"RAY_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin", "HOME": "/root"}
    r = subprocess.run(
        [sys.executable, "-m", "agentic_rag_for_multi_model_pdf_extraction_ray",
         "synth", "--n-docs", "40", "--out", corpus],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["docs"] == 40

    r = subprocess.run(
        [sys.executable, "-m", "agentic_rag_for_multi_model_pdf_extraction_ray",
         "ingest", "--input", corpus, "--out", out, "--partitions", "8"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["partitions_complete"] == 8

    # resume over a complete output re-parses nothing
    r = subprocess.run(
        [sys.executable, "-m", "agentic_rag_for_multi_model_pdf_extraction_ray",
         "ingest", "--input", corpus, "--out", out, "--partitions", "8", "--resume"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    res2 = json.loads(r.stdout.strip().splitlines()[-1])
    assert res2["partitions_written"] == 0
    assert res2["partitions_complete"] == 8

    # build + tune an IVF index over the extraction, then query through it
    idx = str(tmp_path / "idx")
    r = subprocess.run(
        [sys.executable, "-m", "agentic_rag_for_multi_model_pdf_extraction_ray",
         "index", "--chunks", out, "--out", idx, "--kind", "ivf",
         "--dim", "64", "--n-centroids", "8", "--tune", "4", "--k", "5"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    built = json.loads(r.stdout.strip().splitlines()[-1])
    assert built["rows"] > 0 and built["recommended_nprobe"] >= 1

    r = subprocess.run(
        [sys.executable, "-m", "agentic_rag_for_multi_model_pdf_extraction_ray",
         "query", "alpha beta table", "--chunks", out, "--dim", "64",
         "--routed", "--index", idx],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    # stdout is the answer JSON truncated to 2000 chars (display sink)
    assert '"answer"' in r.stdout

    # analyze: CMS heavy hitters over the extraction output, with the
    # self-reported envelope honored (est >= exact, diff <= envelope)
    r = subprocess.run(
        [sys.executable, "-m", "agentic_rag_for_multi_model_pdf_extraction_ray",
         "analyze", "--input", out, "--k", "5"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    rows = json.loads(r.stdout.strip().splitlines()[-1])
    assert len(rows) == 5
    for row in rows:
        assert row["est_count"] >= row["exact_count"]
        assert row["est_count"] - row["exact_count"] <= row["envelope"]
