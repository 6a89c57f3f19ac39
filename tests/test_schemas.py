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
