"""Local mirror of the driver's correctness gate (__spark_entry__.py
docstring): run a registry query on Spark and its oracle SQL on DuckDB
over the same parquet tables; compare row count, column names, and an
order-insensitive value multiset. Stricter than the driver (exact value
string equality) so anything passing here should pass the driver."""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from cassaforte_meter_transmission_gen_spark.schemas import CORPUS_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in CORPUS_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> list[str]:
    """Returns a list of problems (empty = parity)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(oracle_sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sc = _canon_rows(s_cols, s_rows)
    dc = _canon_rows(list(d_cols), d_rows)
    if sc != dc:
        s_only = [r for r in sc if r not in set(dc)][:5]
        d_only = [r for r in dc if r not in set(sc)][:5]
        problems.append(
            f"values differ ({len(s_only)}+ spark-only / {len(d_only)}+ duck-only shown)\n"
            + "\n".join(f"  spark: {r}" for r in s_only)
            + "\n"
            + "\n".join(f"  duck:  {r}" for r in d_only)
        )
    return problems
