"""Scalar numeric helpers shared by query plans and operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor_div(col: Column, divisor: int) -> Column:
    """Exact integer floor division, matching SQL `//` in the DuckDB oracles.

    `(x / d).cast("bigint")` truncates toward zero (wrong for negative
    epochs) and `F.floor(x / d)` routes through double division (boundary
    rounding risk at large epoch-micros). Subtracting the positive modulus
    first makes the quotient an exact multiple, so the division is exact and
    truncation equals floor for every sign. Pure codegen arithmetic."""
    return ((col - F.pmod(col, F.lit(divisor))) / divisor).cast("bigint")
