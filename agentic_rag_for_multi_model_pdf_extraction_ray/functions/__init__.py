"""Vectorized scalar / text / hash kernels used inside ``map_batches``."""
