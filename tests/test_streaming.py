"""Streaming ≡ batch equivalence (SURVEY §5.2): the windowed stateful
rollup over a bounded stream must equal the batch grouped sum on the
same inputs — the correctness argument for replacing the reference's
counter tables with Structured Streaming aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassaforte_meter_transmission_gen_spark.operators.rollups import rollup_chain
from cassaforte_meter_transmission_gen_spark.sources.meter_generator import (
    meter_samples_second,
)
from cassaforte_meter_transmission_gen_spark.streaming.pipeline import (
    run_bounded_rollup,
)


def _rows(df):
    return sorted((r["said"], r["datetime"], r["joules"]) for r in df.collect())


def test_streaming_minute_rollup_equals_batch(spark):
    streamed = run_bounded_rollup(spark, "1 minute", num_meters=2, seconds=1800)
    batch = rollup_chain(meter_samples_second(spark, num_meters=2, seconds=1800))[
        "minute"
    ]
    assert _rows(streamed) == _rows(batch)


def test_streaming_hour_rollup_equals_batch(spark):
    streamed = run_bounded_rollup(spark, "1 hour", num_meters=2, seconds=7200)
    batch = rollup_chain(meter_samples_second(spark, num_meters=2, seconds=7200))[
        "hour"
    ]
    assert _rows(streamed) == _rows(batch)


def test_rate_source_production_path(spark):
    """T1 (core.clj:173-176): the production-shaped unbounded source —
    ``rate`` paced at one row per meter per second, mapped to
    (said, datetime, watts). Run a few real micro-batches against the
    wall clock and check cadence invariants (schema, said range, 15k
    samples per transmission, golden joules value)."""
    import time

    from cassaforte_meter_transmission_gen_spark.functions.energy import (
        TICK_JOULES,
        joules_over_second,
    )
    from cassaforte_meter_transmission_gen_spark.streaming.pipeline import (
        rate_transmission_stream,
    )

    stream = rate_transmission_stream(spark, num_meters=3, start_said=42000)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table("rate_smoke").count() < 6:
            time.sleep(0.5)
        got = spark.table("rate_smoke")
        rows = got.select(
            "said",
            F.size("watts").alias("n"),
            joules_over_second(F.col("watts")).alias("joules"),
        ).collect()
        assert len(rows) >= 6
        assert {r["said"] for r in rows} == {42000, 42001, 42002}
        assert all(r["n"] == 15000 for r in rows)
        assert all(r["joules"] == TICK_JOULES for r in rows)
    finally:
        q.stop()


def test_stateful_cumulative_counter_equals_batch_total(spark):
    from cassaforte_meter_transmission_gen_spark.streaming.pipeline import (
        run_bounded_cumulative,
    )

    emitted = run_bounded_cumulative(spark, num_meters=3, seconds=1800).collect()
    # one checkpoint per meter per micro-batch; micro-batch file order
    # is not event-time order, so "final" = the max counter value
    final: dict[int, int] = {}
    for r in emitted:
        final[r["said"]] = max(final.get(r["said"], 0), r["cumulative_joules"])
    batch = {
        r["said"]: r["total"]
        for r in meter_samples_second(spark, num_meters=3, seconds=1800)
        .groupBy("said")
        .agg(F.sum("joules").cast("long").alias("total"))
        .collect()
    }
    assert final == batch
    # multiple micro-batches actually exercised state carry-over
    assert len(emitted) > len(final)
