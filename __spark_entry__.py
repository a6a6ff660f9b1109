"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline (SURVEY.md §2
B1-B25) over a corpus derived from the sf0.001 documents table;
``queries``/``oracle_sql`` expose every implemented operator shape with
DuckDB differential oracles (see scoobie_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from scoobie_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full triple-extraction pipeline at sf0.001."""
    return _q.q_flagship_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
