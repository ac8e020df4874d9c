"""Cross-engine deterministic numerics.

Floating-point SUMs are order-dependent; a distributed engine and a
single-pass SQL engine will not produce bit-identical sums of doubles,
and ``round(sum, k)`` then flips near boundaries.  Two rules make
results exactly comparable:

* **exact integer units**: money-like 2-decimal columns are converted
  per row to integer cents — ``floor(x*100 + 0.5)`` (identical double
  arithmetic in both engines) — and summed as int64: integer addition
  is order-independent and exact.
* **half-up floor rounding**: ``floor(x*10^k + 0.5)/10^k`` applied to
  *identical* inputs on both sides, instead of ``round()`` whose
  half-even/half-away rule differs between numpy and DuckDB.

The SQL mirror of ``cents(col)`` is
``CAST(floor(col*100 + 0.5) AS BIGINT)`` and of ``round_half_up(x,6)``
is ``floor(x*1000000 + 0.5)/1000000``.
"""

from __future__ import annotations

import numpy as np


def cents(x) -> np.ndarray:
    """Per-row 2-decimal double → exact int64 cents."""
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5).astype(np.int64)


def micro_units(x) -> np.ndarray:
    """Per-row double → int64 micro-units (6 decimals)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)


def round_half_up(x, k: int = 6):
    """floor(x*10^k + 0.5)/10^k — elementwise, numpy or scalar."""
    scale = 10.0 ** k
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5) / scale


def sql_cents(col: str) -> str:
    # explicit DOUBLE cast: a DECIMAL-typed expression would otherwise
    # hit DuckDB's decimal-multiplication overflow and round decimally
    return f"CAST(floor(CAST({col} AS DOUBLE) * 100 + 0.5) AS BIGINT)"


def sql_round6(expr: str) -> str:
    return f"floor(CAST(({expr}) AS DOUBLE) * 1000000 + 0.5) / 1000000"
