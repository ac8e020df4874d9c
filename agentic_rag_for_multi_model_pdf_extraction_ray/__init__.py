"""Ray-Data-native multimodal document-extraction engine.

A brand-new engine (NOT a port) with the query / data-processing
capabilities of the reference repo
``Mr-Kondo/agentic_rag_for_multi_model_pdf_extraction`` (surveyed in
``SURVEY.md``): PDF/HTML-style interleaved documents are parsed into
ordered typed spans (text / table / figure), transformed per kind,
validated, deduplicated, embedded and written back — all expressed as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches with actor
pools for stateful stages.

Layout:
    schema       Arrow schemas + the frozen extraction constants
    parsing      pure deterministic payload→span parse (the contract)
    synth        seeded synthetic interleaved corpus generator
    oracle       single-process reference implementation (test oracle)
    stages/      Ray Data batch transforms (parse, classify, chunk, embed, media)
    sources/     readers/writers (parquet primary, Lance gated)
    functions/   vectorized scalar/text/hash kernels
    ops/         relational + training-data operators (dedup, ANN, windows, joins)
    pipelines/   end-to-end composed pipelines (flagship extraction)
    state/       partition manifests, checkpointed resume
"""

__version__ = "0.1.0"
