"""UDF escape hatch (SURVEY §2.11).

The reference's row lambdas (`df.apply(axis=1)`) all reduced to native
column expressions here — nothing in the engine's hot paths runs Python.
This module is the sanctioned escape hatch for semantics the built-ins
genuinely cannot express: Arrow-batched pandas UDFs only (vectorized,
~10-100x over row-at-a-time Python UDFs), never `F.udf`.

`vectorized` wraps a pandas Series->Series function; `grouped_transform`
wraps a per-group pandas DataFrame->DataFrame for applyInPandas. Both
keep the declared schema explicit so plans stay analyzable.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def vectorized(return_type) -> Callable:
    """Decorator: pandas Series(->Series) function -> Arrow-batched column
    function usable in select/withColumn.

    >>> @vectorized("double")
    ... def log1p_len(s: pd.Series) -> pd.Series:
    ...     import numpy as np
    ...     return np.log1p(s.str.len())
    """

    def deco(fn: Callable[..., pd.Series]):
        return pandas_udf(return_type)(fn)

    return deco


def grouped_transform(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """applyInPandas with explicit output schema: per-group pandas logic
    (the escape hatch for stateful/per-group algorithms Spark's built-ins
    can't express). Groups must fit in executor memory — callers own the
    key cardinality."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


# A worked example kept as live API surface (and exercised in tests).
# NB: a DDL-string return type would require an active SparkSession at
# import time; an explicit DataType object does not.
from pyspark.sql.types import IntegerType  # noqa: E402


@vectorized(IntegerType())
def utf8_byte_length(s: pd.Series) -> pd.Series:
    """Bytes-on-disk length — str.len() counts codepoints, this counts
    encoded bytes (a real case where no built-in expression exists)."""
    return s.fillna("").str.encode("utf-8").str.len().astype("int32")
