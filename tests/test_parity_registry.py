"""The load-bearing test: every registered query with an oracle must
hash-match DuckDB at sf0.001 (fast) — the same gate the driver runs at
sf0.01. Queries without an oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from cassaforte_meter_transmission_gen_spark.plans import REGISTRY

from .parity import compare, duck_connection


def _names():
    return sorted(REGISTRY)


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duck_connection(sf_small)
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_query_parity(name, spark, sf_small, duck):
    q = REGISTRY[name]
    df = q.fn(spark, sf_small)
    if q.oracle is None:
        assert df.count() >= 0  # smoke: plan executes
        return
    problems = compare(df, duck, q.oracle)
    assert not problems, f"{name}:\n" + "\n".join(problems)
