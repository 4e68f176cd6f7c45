"""Wide↔long reshape operators.

`melt` (unpivot) turns metric columns into (metric, value) rows — the
long form feeds per-metric aggregation, drift monitors (one histogram
per metric via a single groupBy("metric", bin)), and sparse storage.
Spark's native `DataFrame.unpivot` is zero-shuffle (each row expands in
place, codegen'd), but multiplies row count by len(value_cols): at
100 TB melt AFTER filtering/aggregating, not before.

The inverse (long→wide) is `pivot`, already covered by the crosstab
aggregate (operators/aggregates.crosstab, A7): pivot is an aggregation,
melt is a projection — they are not symmetric costs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Unpivot ``value_cols`` (must share a least-common type — cast
    first if mixing) into (*id_cols, var_name, value_name) rows."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)
