"""Batch ingest pipeline (operators.ingest): the reference's five-table
write fan-out (core.clj:100-153) materialized as parquet and read back."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cassaforte_meter_transmission_gen_spark.functions.energy import TICK_JOULES
from cassaforte_meter_transmission_gen_spark.operators.ingest import (
    TABLES,
    ingest_batch,
    read_table,
)


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ingest"))
    paths = ingest_batch(spark, out, num_meters=2, seconds=3700)
    return paths


def test_all_tables_written(spark, ingested):
    assert set(ingested) == set(TABLES)
    for t in TABLES:
        assert read_table(spark, ingested, t).count() > 0


def test_raw_roundtrip(spark, ingested):
    raw = read_table(spark, ingested, "meter_samples")
    assert raw.columns == ["said", "datetime", "watts"]
    assert raw.count() == 2 * 3700
    row = raw.filter(F.col("said") == 42000).orderBy("datetime").first()
    assert len(row.watts) == 15000
    assert row.watts[:5] == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_grain_row_counts(spark, ingested):
    # 3700 s spans 62 distinct minutes, 2 hours, 1 day — per meter
    assert read_table(spark, ingested, "meter_samples_second").count() == 2 * 3700
    assert read_table(spark, ingested, "meter_samples_minute").count() == 2 * 62
    assert read_table(spark, ingested, "meter_samples_hour").count() == 2 * 2
    assert read_table(spark, ingested, "meter_samples_day").count() == 2 * 1


def test_write_accounting_via_observation(spark, tmp_path):
    """A5 (core.clj:68-85): the write pipeline reports how many rows
    each sink accepted, collected by Observation from the write jobs
    themselves — the reference's counted success callbacks."""
    report: dict[str, int] = {}
    ingest_batch(
        spark, str(tmp_path), num_meters=2, seconds=120, report=report
    )
    assert report == {
        "meter_samples": 240,
        "meter_samples_second": 240,
        "meter_samples_minute": 4,
        "meter_samples_hour": 2,
        "meter_samples_day": 2,
    }


def test_energy_conservation(spark, ingested):
    """Every grain must carry the same total energy (sums are exact
    ints) — the reference's counter tables agree with raw by
    construction; our chain must too."""
    totals = {
        t: read_table(spark, ingested, t).agg(F.sum("joules")).collect()[0][0]
        for t in TABLES
        if t != "meter_samples"
    }
    assert len(set(totals.values())) == 1, totals
    assert totals["meter_samples_second"] == 2 * 3700 * TICK_JOULES
