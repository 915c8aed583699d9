"""Decimal-exact money arithmetic (cross-engine deterministic).

Sums of doubles are not associative, so a double SUM differs between
engines (and between *runs* on a cluster, since Spark's partial
aggregation order is nondeterministic). The reference keeps prices
as ``Numeric`` (db.py:96-98) for the same reason. Pattern used
everywhere here:

    CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)

Decimal sums are exact and order-independent; the final double cast
yields the identical bit pattern on any engine. Rates (discount,
tax) are DECIMAL(4,2) so products stay well inside 38 digits of
precision in both Spark and DuckDB (no overflow-driven rescaling).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def money(col: Column | str) -> Column:
    return dec(col, MONEY)


def rate(col: Column | str) -> Column:
    return dec(col, RATE)


def exact_sum(col: Column | str, typ: str = MONEY) -> Column:
    """Order-independent SUM: decimal-exact, emitted as DOUBLE."""
    return F.sum(dec(col, typ)).cast("double")


def exact_avg(col: Column | str, typ: str = MONEY) -> Column:
    """AVG as exact-SUM / COUNT in double space.

    Both engines divide the *same* two doubles, so the quotient is
    bitwise identical (IEEE 754 division is deterministic).
    """
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, typ) / F.count(c)
