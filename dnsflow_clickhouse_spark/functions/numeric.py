"""Engine-portable numeric rounding.

Spark's ``round(x, d)`` with ``d > 0`` applies HALF_UP to the SHORTEST
DECIMAL STRING of the double (java BigDecimal.valueOf): a value whose
shortest representation lands exactly on a (d+1)-th-decimal 5 — e.g.
"0.5006875" at d=6 — rounds UP, while DuckDB/python round the actual
double (0.50068749999…) DOWN. Caught live in round 5 by a full-catalog
oracle sweep at sf0.1 (three quality scores hashed 0.500688 vs
0.500687); the same hazard is latent in EVERY fractional-digit round of
a computed double (ratios, averages, e6-unit sums rounded to 2).

``portable_round`` computes floor(x * 10^d + 0.5) / 10^d: no string
detour, every step an IEEE double op both engines perform identically.
For NONNEGATIVE inputs (every use in this repo — ratios, revenues,
scores) it implements round-half-up exactly; callers with possibly
negative inputs must handle sign explicitly (floor is toward -inf).
The SQL replay is the literal same formula:
``floor((expr) * 1000000 + 0.5) / 1000000``.

Integer-target rounding (``round(x)`` / ``round(x, 0)`` / the
cents/1e4-unit conversions) is NOT affected: any mid-range "x.5" double
is exactly representable, so the string and the value agree and both
engines round it away from zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(x: Column, digits: int) -> Column:
    """floor(x * 10^digits + 0.5) / 10^digits — see module docstring.
    Correct (HALF_UP-equivalent) for nonnegative x only. Signed
    callers (e.g. cosine similarity in operators/similarity.py) get
    half-toward-+inf on negative exact halves instead of
    half-away-from-zero — acceptable by design, because the DuckDB
    oracles replay this IDENTICAL floor form (sql_portable_round), so
    cross-engine parity holds for any sign; only the HALF_UP label is
    nonnegative-specific."""
    scale = float(10**digits)
    return F.floor(x * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_portable_round(expr: str, digits: int) -> str:
    """The DuckDB replay of :func:`portable_round`."""
    scale = 10**digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
