"""Corpus type-drift defense: every table, at every available scale
factor, must arrive from schemas.load_table with exactly the canonical
FIXTURES.md §B schema.

Why this exists: the driver regenerates the testdata parquet between
rounds and has changed physical types while doing so (events.ts went
from TIMESTAMP(NANOS) to timezone-less timestamp[us], which Spark reads
as TIMESTAMP_NTZ — an AnalysisException two plans downstream). The
load_table normalization pass absorbs any such drift it can coerce;
this test makes the NEXT silent regeneration fail loudly in the repo's
own suite — naming the table, column, and type — instead of surfacing
as a cryptic failure in the external bench.
"""

from __future__ import annotations

import os

import pytest

from cassaforte_meter_transmission_gen_spark.schemas import (
    CORPUS_SCHEMAS,
    CORPUS_TABLES,
    load_table,
)

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


def test_all_corpus_tables_have_canonical_schemas():
    assert set(CORPUS_SCHEMAS) == set(CORPUS_TABLES)


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=lambda d: d.rsplit("/", 1)[-1])
@pytest.mark.parametrize("name", CORPUS_TABLES)
def test_corpus_schema_is_canonical(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == CORPUS_SCHEMAS[name], (
        f"corpus drift in {sf_dir}/{name}.parquet: load_table returned {got}, "
        f"canonical is {CORPUS_SCHEMAS[name]} — if the coercion in "
        "schemas.load_table cannot absorb the new physical type, extend it"
    )


def test_epoch_unit_inference_covers_all_units_and_refuses_garbage():
    """ADVICE r3: the long→timestamp coercion must not assume nanos —
    it infers the epoch unit from value magnitude and refuses values
    outside every plausible band instead of silently scaling wrong."""
    from cassaforte_meter_transmission_gen_spark.schemas import _infer_epoch_unit

    t_2013 = 1356998400  # the fixture t0, well inside 1990..2130
    assert _infer_epoch_unit("events", "ts", t_2013, t_2013 + 86400) == "s"
    assert _infer_epoch_unit("events", "ts", t_2013 * 10**3, t_2013 * 10**3) == "ms"
    assert _infer_epoch_unit("events", "ts", t_2013 * 10**6, t_2013 * 10**6) == "us"
    assert _infer_epoch_unit("events", "ts", t_2013 * 10**9, t_2013 * 10**9) == "ns"
    assert _infer_epoch_unit("events", "ts", None, None) == "us"  # empty table
    with pytest.raises(ValueError, match="corpus drift"):
        _infer_epoch_unit("events", "ts", 12345, 12345)  # 1970 in any unit
    with pytest.raises(ValueError, match="corpus drift"):
        # min in seconds-band but max in millis-band → ambiguous, refuse
        _infer_epoch_unit("events", "ts", t_2013, t_2013 * 10**3)


def test_nanos_long_column_roundtrips_to_timestamp(spark, tmp_path):
    """End-to-end drift absorption: a table whose ts column is stored
    as an epoch-long (any unit) must load as the canonical timestamp
    with the exact original instants."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1356998400
    for unit, scale in (("s", 1), ("ms", 10**3), ("us", 10**6), ("ns", 10**9)):
        d = str(tmp_path / unit)
        os.makedirs(d)
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([base * scale, (base + 61) * scale], pa.int64()),
                "user_id": pa.array([7, 8], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array(["{}", "{}"]),
            }
        )
        pq.write_table(tbl, f"{d}/events.parquet")
        got = load_table(spark, d, "events")
        assert got.schema["ts"].dataType.simpleString() == "timestamp", unit
        vals = sorted(r["ts"] for r in got.select("ts").collect())
        want = [
            dt.datetime.fromtimestamp(base, dt.timezone.utc).replace(tzinfo=None),
            dt.datetime.fromtimestamp(base + 61, dt.timezone.utc).replace(
                tzinfo=None
            ),
        ]
        assert vals == want, unit


def test_catalog_rejects_duplicate_registration():
    """latest-wins registration once silently shadowed a shipped query
    behind a re-implementation; the catalog now fails at import time."""
    import pytest

    from cassaforte_meter_transmission_gen_spark.plans.catalog import register

    with pytest.raises(ValueError, match="duplicate catalog registration"):
        @register("q01_pricing_summary")
        def dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError
