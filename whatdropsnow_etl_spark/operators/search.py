"""Case-insensitive search.

Reference parity: wdn_api.py:20-30 ``get_brand`` (case-insensitive
exact match) and etl.py:40 (``ilike``). Expressed as predicates that
Catalyst can push into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ilike_search(df: DataFrame, col: str, needle: str) -> DataFrame:
    """SQL ILIKE '%needle%' (substring, case-insensitive)."""
    return df.where(F.lower(F.col(col)).like(f"%{needle.lower()}%"))


def ilike_exact(df: DataFrame, col: str, value: str) -> DataFrame:
    """Case-insensitive exact match (the reference's brand lookup)."""
    return df.where(F.lower(F.col(col)) == value.lower())
