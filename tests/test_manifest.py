"""Manifest/resume unit semantics: atomicity, invalid manifests."""

import json
import os

import pyarrow as pa

from agentic_rag_for_multi_model_pdf_extraction_ray.state.manifest import (
    completed_partitions,
    partition_dir,
    read_output,
    write_partition,
)


def _table(n=3):
    return pa.table({"doc_id": [f"d{i}" for i in range(n)]})


def test_interrupted_write_is_invisible(tmp_path):
    out = str(tmp_path / "o")
    write_partition(out, 0, _table(), "fp")
    # simulate a kill mid-write: a tmp sibling left behind
    os.makedirs(os.path.join(out, "part=1.tmp-dead"), exist_ok=True)
    with open(os.path.join(out, "part=1.tmp-dead", "data.parquet"), "wb") as f:
        f.write(b"garbage")
    assert completed_partitions(out) == {0}
    assert read_output(out).num_rows == 3


def test_manifest_without_complete_status_ignored(tmp_path):
    out = str(tmp_path / "o")
    write_partition(out, 0, _table(), "fp")
    d = partition_dir(out, 1)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "_MANIFEST.json"), "w") as f:
        json.dump({"status": "writing"}, f)
    assert completed_partitions(out) == {0}
    # corrupt json also ignored
    d2 = partition_dir(out, 2)
    os.makedirs(d2, exist_ok=True)
    with open(os.path.join(d2, "_MANIFEST.json"), "w") as f:
        f.write("{not json")
    assert completed_partitions(out) == {0}


def test_rewrite_replaces_partition(tmp_path):
    out = str(tmp_path / "o")
    write_partition(out, 0, _table(3), "a")
    write_partition(out, 0, _table(5), "b")
    assert read_output(out).num_rows == 5
    with open(os.path.join(partition_dir(out, 0), "_MANIFEST.json")) as f:
        assert json.load(f)["fingerprint"] == "b"
