"""Cross-engine (Spark ↔ DuckDB) numeric parity helpers.

The driver's correctness gate is an **exact order-insensitive value
hash** of query output vs a DuckDB oracle.  Floating-point sums are
order-dependent, and Spark (parallel partial aggregation) and DuckDB
(row-group sequential) sum in different orders, so ``SUM(double)`` can
differ by ~1e-8·|Σ| — enough to flip a ROUND(x, 6).

Two techniques make results bit-identical instead of merely close:

1. **Fixed-point integer sums** for the money/measure columns.  Every
   numeric measure in the driver's testdata is exact 2-decimal fixed
   point (verified: l_quantity, l_extendedprice, l_discount, l_tax,
   events.value, *_acctbal, p_retailprice; o_totalprice is 4-decimal).
   ``round(x*100)`` recovers the exact integer; BIGINT sums are
   associative → identical in any order; one final double division by
   the scale is a single identical fp op on both engines.

2. **Shared expression text** for per-row double math (Gaussian
   densities etc.): the same SQL fragment is parsed by both engines, so
   each row's value is computed by the same sequence of IEEE-754 double
   ops (exp/ln differ by ≤1 ulp between libm and java.lang.Math — far
   below the ROUND(…, 6) we apply to per-row outputs).

Scale note: fixed-point BIGINT aggregation is also *faster* at 100 TB
(integer adds, no Kahan needed) — the same trick production engines use
for money types.  Overflow headroom: |x|≤1e6 scaled ×100 summed over
1e10 rows ≈ 1e18 < 2^63; beyond that, sum in DECIMAL(38,0).

Non-finite gate (r8): a NaN/±Inf measure used to HARD-ERROR the snap
(ANSI ``CAST(NaN AS BIGINT)`` → CAST_OVERFLOW on Spark, conversion
error on DuckDB) — at 100 TB one corrupt double killed the whole job
mid-stage.  ``cents``/``sql_cents`` now wrap the input in the shared
finite gate (``CASE WHEN abs(x) <= DBL_MAX THEN x END`` — NaN and
±Inf compare greater than DBL_MAX on BOTH engines, so the text is
engine-identical), making the declared semantics: **non-finite
measures are ignored by the statistic** (NULL → skipped by
SUM/AVG/COUNT like any NULL).  Identity for every finite input, so
no result changes on well-formed data.  Finite values beyond the
snap headroom above remain the documented fail-fast domain.  Pinned
by tests/test_nonfinite_values.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dlit(v: float) -> str:
    """SQL double literal via ``repr`` — safe where SPARK alone parses
    it (BigDecimal, correctly rounded).  DuckDB 1.0's literal parser
    is 1 ulp off for some 17-digit reprs, so any literal an ORACLE
    text will parse must use ``functions.xmath.dlit_exact``
    (mantissa×2^k) instead — see gaussian.py, which switched in r6."""
    return f"CAST({v!r} AS DOUBLE)"


#: largest finite double — the shared finite-gate bound (module
#: docstring; NaN/±Inf > this on both engines, NULL propagates)
DBL_MAX = 1.7976931348623157e308


# ---- Spark side ----------------------------------------------------------


def finite(col: str | Column) -> Column:
    """``col`` when finite, else NULL (module-docstring gate)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.abs(c) <= F.lit(DBL_MAX), c)


def cents(col: str | Column, scale: int = 100) -> Column:
    """Exact scaled-integer representation of a fixed-point double col
    (non-finite → NULL, module docstring)."""
    return F.round(finite(col) * scale, 0).cast("long")


def sum_fixed(col: str | Column, scale: int = 100) -> Column:
    """Bit-exact SUM of a fixed-point double column (result: double)."""
    return F.sum(cents(col, scale)).cast("double") / F.lit(float(scale))


def avg_fixed(col: str | Column, scale: int = 100) -> Column:
    """Bit-exact AVG of a fixed-point double column (result: double).

    Formula text must match :func:`sql_avg_fixed` exactly:
    ``(CAST(SUM(int) AS DOUBLE) / COUNT(gated)) / scale``.  The count
    is of the FINITE-gated value (module docstring) so a NaN row
    neither crashes the snap nor inflates the denominator.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(cents(c, scale)).cast("double") / F.count(finite(c))
    ) / F.lit(float(scale))


# ---- DuckDB side (SQL text) ---------------------------------------------


def sql_finite(col: str) -> str:
    """Oracle text of :func:`finite` — identical gate semantics."""
    return f"(CASE WHEN abs({col}) <= {DBL_MAX!r} THEN {col} END)"


def sql_cents(col: str, scale: int = 100) -> str:
    return f"CAST(round({sql_finite(col)} * {scale}) AS BIGINT)"


def sql_sum_fixed(col: str, scale: int = 100) -> str:
    return f"(CAST(sum({sql_cents(col, scale)}) AS DOUBLE) / {float(scale)!r})"


def sql_avg_fixed(col: str, scale: int = 100) -> str:
    return (
        f"((CAST(sum({sql_cents(col, scale)}) AS DOUBLE)"
        f" / count({sql_finite(col)})) / {float(scale)!r})"
    )
