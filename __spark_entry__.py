"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``cassaforte_meter_transmission_gen_spark``
package; this module only adapts its query registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassaforte_meter_transmission_gen_spark.plans import REGISTRY  # noqa: E402
from cassaforte_meter_transmission_gen_spark.session import configure  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §3.3): energy report for a set of meters
    over a time period, served from the pre-aggregated rollup chain.
    Also scans the sf0.001 corpus (lineitem) and stamps its row count so
    the smoke check covers both the generator path and the parquet-read
    path in one stable-schema DataFrame."""
    configure(spark)
    report = REGISTRY["meter_daily_report"].fn(spark, _SF0001)
    corpus_rows = (
        spark.read.parquet(f"{_SF0001}/lineitem.parquet")
        .agg(F.count("*").alias("corpus_lineitem_rows"))
    )
    return report.crossJoin(F.broadcast(corpus_rows))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query; omitted
    for ops the driver should rows-only check (LSH, streaming state)."""
    return {name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle}
