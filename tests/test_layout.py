"""Physical-layout behavior (SURVEY §4 O5): partition pruning actually
prunes, and bucketed joins plan without an Exchange — the properties
that make the 100 TB design work, asserted on the real plans."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from cassaforte_meter_transmission_gen_spark.sources.layout import (
    read_time_partitioned,
    write_bucketed,
    write_time_partitioned,
)
from cassaforte_meter_transmission_gen_spark.sources.meter_generator import (
    T0_EPOCH,
    meter_samples_second,
)


def test_time_partitioned_write_prunes(spark):
    second = meter_samples_second(spark, num_meters=2, seconds=2 * 86400)
    with tempfile.TemporaryDirectory(prefix="layout_") as d:
        path = f"{d}/second"
        write_time_partitioned(second, path)
        back = read_time_partitioned(spark, path)
        # day-2 only → partition filter prunes day 1's directory
        q = back.filter(
            F.col("datetime") >= F.timestamp_seconds(F.lit(T0_EPOCH + 86400))
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "p_day" in plan  # partition column participates in pruning
        assert q.count() == 2 * 86400  # exactly one day × two meters
        # full-fidelity roundtrip
        assert back.count() == 2 * 2 * 86400


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        second = meter_samples_second(spark, num_meters=4, seconds=3600)
        write_bucketed(second, "t_bucketed_second", n_buckets=8)
        write_bucketed(
            second.groupBy("said").agg(F.sum("joules").alias("total")),
            "t_bucketed_totals",
            n_buckets=8,
            sort="said",
        )
        a = spark.table("t_bucketed_second")
        b = spark.table("t_bucketed_totals")
        joined = a.join(b, "said")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 4 * 3600
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_second")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_totals")


def test_ivf_partitioned_layout_prunes_cells(spark, sf_med):
    """The IVF storage layout: writing embeddings partitioned by
    k-means cell and probing 4 of 16 cells must (a) partition-prune the
    scan and (b) return exactly the rows the in-plan assignment gives
    those cells."""
    from cassaforte_meter_transmission_gen_spark.operators.similarity import (
        assign_to_centroid,
        kmeans_centroids,
    )
    from cassaforte_meter_transmission_gen_spark.schemas import load_table
    from cassaforte_meter_transmission_gen_spark.sources.layout import (
        read_ivf_partitioned,
        write_ivf_partitioned,
    )

    e = load_table(spark, sf_med, "embeddings")
    cents = kmeans_centroids(e, n_clusters=16)
    with tempfile.TemporaryDirectory(prefix="ivf_layout_") as d:
        path = f"{d}/ivf"
        write_ivf_partitioned(e, path, cents)
        back = read_ivf_partitioned(spark, path)
        probes = [0, 3, 7, 11]
        probed = back.filter(F.col("cluster_id").isin(probes))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "cluster_id" in plan
        expected = (
            assign_to_centroid(e, cents)
            .filter(F.col("cluster_id").isin(probes))
            .count()
        )
        assert probed.count() == expected
        # full roundtrip: nothing lost across cells
        assert back.count() == e.count()
