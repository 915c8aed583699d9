"""Price segmentation (reference parity: sql.py:14-16 CASE expr)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def price_segment(
    avg_price: Column,
    normal_below: float = 52000.0,
    high_end_upto: float = 56000.0,
) -> Column:
    """CASE segmentation of an average price.

    Reference (sql.py): <100 Normal, 100..200 High End, else Very
    High End over sneaker offers; thresholds here are calibrated to
    the lineitem price scale, semantics identical (inclusive BETWEEN
    on the middle band).
    """
    return (
        F.when(avg_price < normal_below, F.lit("Normal"))
        .when(avg_price.between(normal_below, high_end_upto), F.lit("High End"))
        .otherwise(F.lit("Very High End"))
    )
