"""Relational + training-data operators (dedup families, similarity
search, windows, joins, partial aggregation)."""
