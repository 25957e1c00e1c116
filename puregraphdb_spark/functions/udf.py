"""User-extension surface: Arrow-vectorized UDF passthrough.

The engine itself needs no Python UDFs (every built-in operator is
JVM-side — SURVEY §2.2), but users extending it get the sanctioned
slow path: ``pandas_udf`` (Arrow batch transfer, ~10-100× faster than
row-at-a-time Python UDFs). ``vectorized`` is a thin alias so user
code imports the engine, not pyspark internals; ``register`` exposes a
vectorized function to the SQL door (EP2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def vectorized(return_type: str) -> Callable:
    """Decorator: make an Arrow-vectorized UDF.

    >>> @vectorized("double")
    ... def fahrenheit(c: pd.Series) -> pd.Series:
    ...     return c * 9 / 5 + 32
    >>> df.select(fahrenheit("temp_c"))
    """
    return pandas_udf(return_type)


def register(spark: SparkSession, name: str, fn, return_type: str | None = None):
    """Register a (vectorized) function for SQL use:
    ``engine.sql("select my_fn(col) from t")``."""
    udf = pandas_udf(return_type)(fn) if return_type is not None else fn
    spark.udf.register(name, udf)
    return udf
