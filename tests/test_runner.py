"""The unbounded runner (reference -main, core.clj:163-176) and the
sink seam (reference Cassandra table family, core.clj:100-153)."""

from __future__ import annotations

import time

import pytest

from cassaforte_meter_transmission_gen_spark.io import CassandraSink, ParquetSink
from cassaforte_meter_transmission_gen_spark.operators.ingest import (
    TABLES,
    ingest_batch,
)
from cassaforte_meter_transmission_gen_spark.runner import run_unbounded


def test_unbounded_runner_maintains_rollups(spark, tmp_path):
    """Run the reference's program shape live for a few triggers: raw
    rows and all rollup grains must appear and the minute rollup must
    equal a re-aggregation of the second table at the time of check."""
    out = str(tmp_path / "run")
    from cassaforte_meter_transmission_gen_spark.streaming.pipeline import (
        read_stream_table,
    )

    q = run_unbounded(
        spark, out, num_meters=2, start_said=77, trigger_seconds=1.0
    )
    paths = {t: f"{out}/{t}" for t in TABLES}
    commits = f"{out}/_commits"
    try:
        deadline = time.time() + 120
        minute_rows = 0
        # poll for a COMMITTED batch (the marker is the last step of a
        # batch) so stop() can't interrupt before a full fan-out landed
        while time.time() < deadline:
            time.sleep(1.0)
            try:
                minute_rows = read_stream_table(
                    spark, paths, "meter_samples_minute", commits
                ).count()
            except Exception:  # nothing committed yet
                continue
            if minute_rows >= 1:
                break
        assert minute_rows >= 1, "no committed five-table fan-out in 120s"
    finally:
        q.stop()
    # after stop: reads resolve through the commit log, so even if
    # stop() interrupted a batch mid-write, every table reflects the
    # SAME committed prefix — the totals agree exactly
    second = read_stream_table(spark, paths, "meter_samples_second", commits)
    minute = read_stream_table(spark, paths, "meter_samples_minute", commits)
    assert minute.count() >= 1
    second_sum = second.groupBy().sum("joules").first()[0]
    minute_sum = minute.groupBy().sum("joules").first()[0]
    assert 0 < minute_sum == second_sum
    # checkpoint exists → restart would resume offsets
    assert (tmp_path / "run" / "_checkpoint").exists()


def test_ingest_through_explicit_sink_seam(spark, tmp_path):
    """ingest_batch routed through a caller-provided TableSink produces
    the same five tables as the default path."""
    out = str(tmp_path / "seam")
    paths = ingest_batch(
        spark,
        out,
        num_meters=2,
        seconds=120,
        sink=ParquetSink(out),
    )
    sink = ParquetSink(out)
    assert set(paths) == set(TABLES)
    for t in TABLES:
        assert sink.exists(t), t
    assert sink.read(spark, "meter_samples_second").count() == 2 * 120
    assert sink.read(spark, "meter_samples_minute").count() == 2 * 2


def test_cassandra_sink_unavailable_raises_clearly(spark):
    """Without the connector jar the seam fails fast with guidance (the
    documented option path), not at .save() time."""
    with pytest.raises(RuntimeError, match="Cassandra Connector"):
        CassandraSink(spark)


def test_streaming_accounting_listener_counts_writes(spark, tmp_path):
    """A5's streaming dual: the query listener must observe the
    runner's micro-batches and input rows (the reference's counted
    success callbacks), with no terminating errors on a clean stop."""
    from cassaforte_meter_transmission_gen_spark.runner import (
        make_accounting_listener,
        run_unbounded,
    )
    from cassaforte_meter_transmission_gen_spark.streaming.pipeline import (
        read_stream_table,
    )

    listener, counters = make_accounting_listener()
    spark.streams.addListener(listener)
    out = str(tmp_path / "acct")
    q = run_unbounded(
        spark, out, num_meters=2, start_said=55, trigger_seconds=1.0
    )
    paths = {t: f"{out}/{t}" for t in TABLES}
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            time.sleep(1.0)
            try:
                if (
                    read_stream_table(
                        spark, paths, "meter_samples_minute", f"{out}/_commits"
                    ).count()
                    >= 1
                ):
                    break
            except Exception:
                continue
    finally:
        q.stop()
        # listener events are delivered async; give the bus a moment
        time.sleep(2.0)
        spark.streams.removeListener(listener)
    assert counters["batches"] >= 1
    assert counters["rows"] >= 1
    assert counters["errors"] == []
