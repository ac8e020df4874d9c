"""Run state: per-partition lineage manifests and checkpointed resume."""
