"""Scalar numeric helpers shared by query plans and operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor_div(col: Column, divisor: int) -> Column:
    """Exact integer floor division, matching SQL `//` in the DuckDB oracles.

    `(x / d).cast("bigint")` truncates toward zero (wrong for negative
    epochs) and `F.floor(x / d)` routes through double division (boundary
    rounding risk at large epoch-micros). The earlier subtract-the-modulus
    formula stayed integral but (a) its final `/` still promoted to double
    (off-by-one possible past 2^53) and (b) `x - pmod(x, d)` overflows under
    ANSI mode for x near long-min. Integral `div` truncates toward zero in
    pure long arithmetic; adjusting by 1 when the division is inexact and
    the dividend is negative yields floor — exact for every int64, no
    intermediate can overflow. Pure codegen arithmetic."""
    if divisor <= 0:
        raise ValueError(f"floor_div requires a positive divisor, got {divisor}")
    trunc = F.call_function("div", col, F.lit(divisor))
    adjust = F.when((col % divisor != 0) & (col < 0), F.lit(1)).otherwise(F.lit(0))
    return (trunc - adjust).cast("bigint")
