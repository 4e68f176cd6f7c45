"""Shared exact-integer math for cross-engine bit-reproducible operators.

The repo's determinism contract (parity.py docstring) bans float
accumulation in compared outputs. Operators that need real-valued inputs
(anomaly, trend fit, matview averages) first encode them as exact
integer *micro-units* — floor(value·10⁶) is one IEEE multiply + floor,
identical on every engine — and then do all algebra in DECIMAL(38,0)
(Spark) ≡ HUGEINT/int128 (DuckDB), both exact up to ~10³⁸.

Two division contracts, both engine-identical:

- `frac6_half_up` (text_analysis) — half-up 6-decimal fraction of SMALL
  integers (|2·num·10⁶ + den| must stay ≤ int64; beyond 2^53 the shared
  double division is still bit-identical cross-engine but no longer
  exactly half-up).
- `halfup_micro_div` (here) — the same half-up-to-micro-units intent for
  BIG integers: all products in DECIMAL(38,0), the final division a
  truncating integer divide (Spark `div` ≡ DuckDB `//`, both toward
  zero — verified on negatives). For positive denominators and positive
  numerators this is exactly floor((2n·10⁶+d)/(2d)) = half-up; for
  negative numerators the tie rounds toward zero instead of away —
  documented, and identical on both engines, which is what parity needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D38 = "decimal(38,0)"


def micro_units(col: Column | str, micro: int = 1_000_000) -> Column:
    """floor(value·micro) as DECIMAL(38,0): the engine-neutral exact
    encoding of a double. NULL passes through."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(micro)).cast(D38)


def halfup_micro_div_cols(num_name: str, den_name: str) -> Column:
    """(num/den) in micro-units (·10⁶) over two NAMED columns:
    (2·num·10⁶ + den) div (2·den), returned as BIGINT (the ratio must
    fit int64; the inputs need not fit int64 — but |num| must stay
    below ~5·10³¹ so 2·num·10⁶ fits DECIMAL(38,0); past that Spark
    with ANSI off NULLs silently while the HUGEINT mirror errors).
    Caller guards den != 0 and the magnitude bound."""
    return F.expr(
        f"CAST((CAST({num_name} AS DECIMAL(38,0)) * 2000000 "
        f"+ CAST({den_name} AS DECIMAL(38,0))) div "
        f"(CAST({den_name} AS DECIMAL(38,0)) * 2) AS BIGINT)"
    )


def halfup_micro_div_sql(num_expr: str, den_expr: str) -> str:
    """DuckDB mirror of `halfup_micro_div` in HUGEINT (int128) — `//`
    truncates toward zero exactly like Spark's `div`."""
    return (
        f"CAST((CAST({num_expr} AS HUGEINT) * 2000000 + CAST({den_expr} AS HUGEINT)) "
        f"// (CAST({den_expr} AS HUGEINT) * 2) AS BIGINT)"
    )


def guarded(condition: Column, message: Column | str):
    """Factory for the repo's IN-PLAN overflow/cardinality guard: returns
    ``guard(expr, typ=None)`` which folds ``raise_error(message)`` into
    an output column when ``condition`` holds for that row, else the
    expression (cast to ``typ`` when given).

    Two rules this encodes (learned the hard way — linfit r5, matview
    r4):

    - the guard must ride EVERY output column, not just one: Catalyst
      column pruning drops an un-referenced guard column when a caller
      selects only the others, and the out-of-contract row silently
      NULLs — the exact failure the guard exists to prevent. With a
      factory, attaching it everywhere is one call per column.
    - the guard is LAZY (evaluated inside the plan, per row), never an
      eager count()/collect() probe: probes run the upstream scan twice
      and make a lazy API eager.

    ``message`` may be a Column (e.g. concat with the offending key) or
    a plain string."""
    msg = F.lit(message) if isinstance(message, str) else message

    def guard(expr: Column, typ: str | None = None) -> Column:
        err = F.raise_error(msg)
        if typ:
            err = err.cast(typ)
        return F.when(condition, err).otherwise(expr.cast(typ) if typ else expr)

    return guard
