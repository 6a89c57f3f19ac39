"""Fixed schemas.

Group A mirrors the reference DDL (setup_and_notes.txt:16-44): five
tables all keyed (said, datetime). Cassandra COUNTER columns become
LongType maintained by grouped sums (SURVEY §1.2). Group B is the
driver-provided corpus (TESTDATA.md / FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- Group A: meter domain (reference setup_and_notes.txt:16-44) ---

METER_SAMPLES = T.StructType(
    [
        T.StructField("said", T.IntegerType(), False),
        T.StructField("datetime", T.TimestampType(), False),
        T.StructField("watts", T.ArrayType(T.FloatType(), False), False),
    ]
)

METER_SAMPLES_SECOND = T.StructType(
    [
        T.StructField("said", T.IntegerType(), False),
        T.StructField("datetime", T.TimestampType(), False),
        T.StructField("joules", T.IntegerType(), False),
    ]
)

# minute / hour / day share one shape; COUNTER → LongType sum.
METER_SAMPLES_GRAIN = T.StructType(
    [
        T.StructField("said", T.IntegerType(), False),
        T.StructField("datetime", T.TimestampType(), False),
        T.StructField("joules", T.LongType(), False),
    ]
)

# --- Group B: driver corpus ---

CORPUS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Parquet scan → Catalyst pushes filters and
    prunes columns; at cluster scale these would be partitioned/bucketed
    layouts but the read API is identical.

    ``events.ts`` has been observed in three physical flavors across
    corpus regenerations — TIMESTAMP(NANOS) (arrives as a nanos long
    under ``spark.sql.legacy.parquet.nanosAsLong``), ``timestamp[us]``
    with no timezone (arrives as TIMESTAMP_NTZ), and plain TIMESTAMP.
    All are normalized to TimestampType here, losslessly under the
    session's pinned UTC, so every downstream plan (`unix_micros`,
    windowing, session gaps) sees one stable type regardless of how the
    driver last wrote the file. DuckDB reads the same file natively, so
    the oracle side agrees by construction."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_corpus(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for SQL-form plans)."""
    for name in CORPUS_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
