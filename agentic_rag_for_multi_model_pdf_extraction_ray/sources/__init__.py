"""Readers / writers. Parquet is the primary format; Lance is gated
behind an import-try (the package is not available in this container —
the north rule's Lance tables are represented by the same Arrow schema
on parquet, switching to ``ray.data.read_lance`` when ``lance`` is
importable)."""
