"""Query registry: every operator module registers (key -> callable, key -> oracle SQL).

The driver contract (``__spark_entry__.py``) aggregates these. Each callable
has signature ``(spark, sf_dir) -> DataFrame``; each oracle is ANSI SQL that
DuckDB 1.0 runs over the same parquet tables (pre-registered views).

Conventions enforced here (SURVEY.md §2 header):
- every float output rounded (6dp; money 2dp) on BOTH sides;
- every computed integral output cast to BIGINT on BOTH sides (Spark's
  row_number/size/year/... return INT while DuckDB returns BIGINT);
- every ordering ends in a unique tiebreak key;
- aliases identical between the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(key: str, oracle: str | None = None):
    """Decorator: register a query callable and (optionally) its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run."""
    from .sources import scans  # noqa: F401
    from .operators import filters, joins, aggregates, windows, setops, advanced  # noqa: F401
    from .functions import strings, dates, maths, arrays, jsonmap  # noqa: F401
    from .recommender import core, als, rdd_mr  # noqa: F401
    from .llm import text, vectors, dedup, multimodal  # noqa: F401
    from .streaming import stream_windows, stateful  # noqa: F401
    from .udfs import surface  # noqa: F401
