"""Golden-value tests for the reference semantics (BASELINE.md):
sawtooth sum = 892,500 per tick → joules = 59 per meter-second;
minute rows = 3,540; hour rows = 212,400."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassaforte_meter_transmission_gen_spark.functions.energy import TICK_JOULES
from cassaforte_meter_transmission_gen_spark.functions.hashing import host_hash
from cassaforte_meter_transmission_gen_spark.operators.rollups import rollup_chain
from cassaforte_meter_transmission_gen_spark.sources.meter_generator import (
    meter_samples_second,
    transmissions,
)


def test_transmission_shape(spark):
    df = transmissions(spark, num_meters=2, seconds=3)
    rows = df.orderBy("said", "datetime").collect()
    assert len(rows) == 6
    assert rows[0]["said"] == 42000 and rows[-1]["said"] == 42001
    watts = rows[0]["watts"]
    assert len(watts) == 15000
    assert watts[:5] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert watts[119] == 119.0 and watts[120] == 0.0  # sawtooth wraps


def test_joules_golden(spark):
    sec = meter_samples_second(spark, num_meters=1, seconds=5)
    vals = [r["joules"] for r in sec.collect()]
    assert vals == [TICK_JOULES] * 5  # int(892500/15000) = 59


def test_rollup_chain_golden(spark):
    sec = meter_samples_second(spark, num_meters=2, seconds=3600)
    chain = rollup_chain(sec)
    minute = chain["minute"].collect()
    assert len(minute) == 120  # 2 meters x 60 minutes
    assert all(r["joules"] == TICK_JOULES * 60 for r in minute)  # 3540
    hour = chain["hour"].collect()
    assert len(hour) == 2
    assert all(r["joules"] == TICK_JOULES * 3600 for r in hour)  # 212400
    # grain consistency: sum conserved across grains
    total = sec.agg(F.sum("joules")).collect()[0][0]
    assert total == sum(r["joules"] for r in hour)


def test_host_hash_stable():
    assert host_hash("abc") == host_hash("abc")
    assert 0 <= host_hash("anything") < 100000
    assert host_hash("host-a") != host_hash("host-b")


def test_grain_routing_chooser():
    from cassaforte_meter_transmission_gen_spark.operators.rollups import (
        choose_source_grain,
    )

    day = 86400
    # aligned ranges route to the coarsest dividing grain
    assert choose_source_grain("day", 0, 7 * day) == "day"
    assert choose_source_grain("hour", 0, day) == "hour"
    # misaligned boundaries force a finer source
    assert choose_source_grain("day", 1800, 7 * day) == "minute"
    assert choose_source_grain("hour", 0, day + 30 * 60) == "minute"
    assert choose_source_grain("minute", 59, 120) == "second"
    # unconstrained range → grain itself
    assert choose_source_grain("day") == "day"


def test_routed_report_equals_raw_derivation(spark):
    from cassaforte_meter_transmission_gen_spark.operators.rollups import (
        routed_energy_report,
        rollup_chain,
    )
    from cassaforte_meter_transmission_gen_spark.sources.meter_generator import (
        T0_EPOCH,
        meter_samples_second,
    )
    from pyspark.sql import functions as F

    second = meter_samples_second(spark, num_meters=2, seconds=7200)
    chain = rollup_chain(second)
    routed = routed_energy_report(
        chain, "hour", t0_epoch=T0_EPOCH, t1_epoch=T0_EPOCH + 7200
    )
    raw = (
        second.filter(
            (F.col("datetime") >= F.timestamp_seconds(F.lit(T0_EPOCH)))
            & (F.col("datetime") < F.timestamp_seconds(F.lit(T0_EPOCH + 7200)))
        )
        .groupBy("said", F.date_trunc("hour", "datetime").alias("datetime"))
        .agg(F.sum("joules").cast("long").alias("joules"))
    )
    key = lambda df: sorted((r["said"], r["datetime"], r["joules"]) for r in df.collect())
    assert key(routed) == key(raw)


def test_gapfill_locf_semantics(spark):
    """gapfill_locf on crafted holes: leading gap stays NULL (nothing
    to carry), interior runs of gaps all carry the last observation,
    observed buckets pass through unflagged, and every meter gets
    exactly n_buckets rows."""
    from pyspark.sql import functions as F

    from cassaforte_meter_transmission_gen_spark.operators.rollups import (
        gapfill_locf,
    )

    t0 = 1356998400
    # meter 1: observations at buckets 1 and 3 (leading gap, gap at 2);
    # meter 2: observation only at bucket 0 (everything after carries)
    obs = spark.createDataFrame(
        [
            (1, t0 + 60, 10),
            (1, t0 + 180, 30),
            (2, t0 + 0, 7),
        ],
        "said int, epoch long, joules long",
    ).select("said", F.timestamp_seconds("epoch").alias("datetime"), "joules")
    saids = spark.createDataFrame([(1,), (2,)], "said int")
    got = {
        (r["said"], r["datetime"].minute): (r["joules_locf"], r["was_filled"])
        for r in gapfill_locf(obs, saids, t0, 5).collect()
    }
    assert len(got) == 10
    assert got[(1, 0)] == (None, True)      # leading gap: nothing to carry
    assert got[(1, 1)] == (10, False)
    assert got[(1, 2)] == (10, True)        # carried
    assert got[(1, 3)] == (30, False)
    assert got[(1, 4)] == (30, True)
    assert got[(2, 0)] == (7, False)
    for b in range(1, 5):
        assert got[(2, b)] == (7, True)     # long carry run


def test_gapfill_interpolate_semantics(spark):
    """Linear interpolation fills interior holes on the straight line
    between nearest observations (two consecutive holes get 1/3 and
    2/3 of the way), passes observed values through, and leaves edges
    NULL (no extrapolation)."""
    from pyspark.sql import functions as F

    from cassaforte_meter_transmission_gen_spark.operators.rollups import (
        gapfill_interpolate,
    )

    t0 = 1356998400
    # observations at buckets 1 and 4: holes at 2, 3 interpolate to
    # 10 + (40-10)*1/3 = 20 and 10 + (40-10)*2/3 = 30
    obs = spark.createDataFrame(
        [(1, t0 + 60, 10), (1, t0 + 240, 40)],
        "said int, epoch long, joules long",
    ).select("said", F.timestamp_seconds("epoch").alias("datetime"), "joules")
    saids = spark.createDataFrame([(1,)], "said int")
    got = {
        r["datetime"].minute: (r["joules_interp"], r["was_observed"])
        for r in gapfill_interpolate(obs, saids, t0, 6).collect()
    }
    assert got[0] == (None, False)       # leading edge: no extrapolation
    assert got[1] == (10.0, True)
    assert got[2] == (20.0, False)
    assert got[3] == (30.0, False)
    assert got[4] == (40.0, True)
    assert got[5] == (None, False)       # trailing edge
