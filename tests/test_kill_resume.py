"""Chaos test: SIGKILL an extraction run mid-flight, then resume in a
fresh session — the output must be byte-identical to an uninterrupted
run (atomic partition renames mean a kill can never leave a partition
that looks complete)."""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow as pa
import pytest
import ray.data as rd

from agentic_rag_for_multi_model_pdf_extraction_ray.oracle import (
    oracle_documents_interleaved,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.extract import (
    run_extraction,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.state.manifest import (
    completed_partitions,
    read_output,
)
from agentic_rag_for_multi_model_pdf_extraction_ray.synth import synthesize_raw_batch

_CHILD = """
import sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd
import pandas as pd
from agentic_rag_for_multi_model_pdf_extraction_ray.synth import synthesize_raw_batch
from agentic_rag_for_multi_model_pdf_extraction_ray.pipelines.extract import run_extraction

n = int(sys.argv[1]); out = sys.argv[2]
base = rd.from_pandas(pd.DataFrame({
    "doc_id": list(range(n)),
    "text": [f"doc {i} " + "alpha beta gamma delta epsilon zeta " * 10
             for i in range(n)],
}))
raw = base.map_batches(synthesize_raw_batch, batch_format="pyarrow")
print("READY", flush=True)
run_extraction(raw, out, n_partitions=16, batch_size=32, concurrency=1)
print("DONE", flush=True)
"""


def _raw(n):
    import pandas as pd

    base = rd.from_pandas(pd.DataFrame({
        "doc_id": list(range(n)),
        "text": [f"doc {i} " + "alpha beta gamma delta epsilon zeta " * 10
                 for i in range(n)],
    }))
    return base.map_batches(synthesize_raw_batch, batch_format="pyarrow")


def test_sigkill_mid_run_then_resume(tmp_path):
    out = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, "600", out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    # wait until the pipeline is actually running, then kill it hard
    assert proc.stdout.readline().strip() == "READY"
    deadline = time.time() + 60
    while time.time() < deadline and not completed_partitions(out):
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid resume test
        time.sleep(0.5)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()

    done_before = completed_partitions(out)
    # no partially-written partition may ever look complete: every
    # manifest that exists must load and self-report complete
    for p in done_before:
        with open(os.path.join(out, f"part={p}", "_MANIFEST.json")) as f:
            assert json.load(f)["status"] == "complete"

    # resume in this session; only missing partitions re-run
    run_extraction(_raw(600), out, n_partitions=16, batch_size=32,
                   concurrency=1)
    assert len(completed_partitions(out)) == 16

    got = read_output(out).sort_by("doc_id")
    corpus = pa.concat_tables(_collect(_raw(600)))
    want = oracle_documents_interleaved(corpus).sort_by("doc_id")
    assert got.column("doc_id").equals(want.column("doc_id"))
    assert got.column("spans").equals(want.column("spans"))


def _collect(ds: rd.Dataset):
    import ray

    return [ray.get(r) for r in ds.to_arrow_refs()]
