"""The scale-growth corpus amplifier (sources/scaling.py) — the
SCALING_r{N}.json evidence chain is only as good as the staged corpus,
so its invariants are gated: replicas must be disjoint where
cross-replica collisions would fake quadratic growth, and identical
within a replica so per-replica work matches the base corpus."""

from __future__ import annotations

import duckdb
import pytest

from cassaforte_meter_transmission_gen_spark.sources.scaling import (
    ALL_TABLES,
    KEY_SHIFT,
    replica_permutation,
    stage_scaled_corpus,
)

BASE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "x3")
    manifest = stage_scaled_corpus(BASE, out, 3)
    return out, manifest


def test_staging_row_counts_and_idempotence(staged):
    out, manifest = staged
    con = duckdb.connect()
    base_rows = {
        t: con.execute(
            f"SELECT count(*) FROM read_parquet('{BASE}/{t}.parquet')"
        ).fetchone()[0]
        for t in ALL_TABLES
    }
    dims = {"region", "nation", "customer", "supplier", "part"}
    for t in ALL_TABLES:
        want = base_rows[t] * (1 if t in dims else 3)
        assert manifest["rows"][t] == want, t
    # idempotent: a second call returns the manifest without restaging
    again = stage_scaled_corpus(BASE, out, 3)
    assert again["rows"] == manifest["rows"]


def test_staging_fact_join_edges_preserved(staged):
    out, _ = staged
    con = duckdb.connect()
    orphans = con.execute(f"""
        SELECT count(*) FROM read_parquet('{out}/lineitem.parquet') l
        LEFT JOIN read_parquet('{out}/orders.parquet') o
          ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IS NULL""").fetchone()[0]
    assert orphans == 0


def test_staging_documents_shingle_spaces_disjoint(staged):
    """Replica-0 text is verbatim; replicas > 0 are token-salted, so
    word-shingle near-dup candidates can never cross replicas (a
    cross-replica collision would turn linear data growth into
    quadratic candidate growth and poison the exponent)."""
    out, _ = staged
    con = duckdb.connect()
    shared = con.execute(f"""
        WITH tok AS (
          SELECT doc_id // {KEY_SHIFT} AS r,
                 unnest(string_split(text, ' ')) AS w
          FROM read_parquet('{out}/documents.parquet')
        )
        SELECT count(*) FROM (
          SELECT w FROM tok GROUP BY w HAVING count(DISTINCT r) > 1
        )""").fetchone()[0]
    assert shared == 0
    # and replica 0 matches the base corpus exactly
    diff = con.execute(f"""
        SELECT count(*) FROM (
          SELECT doc_id, text FROM read_parquet('{out}/documents.parquet')
          WHERE doc_id < {KEY_SHIFT}
          EXCEPT
          SELECT doc_id, text FROM read_parquet('{BASE}/documents.parquet')
        )""").fetchone()[0]
    assert diff == 0


def test_staging_embedding_permutation_cosine_invariant(staged):
    """Per-replica dimension permutation: within-replica cosine
    structure is EXACTLY the base corpus's (permutation-invariant dot
    products), while a vector and its replica twin decorrelate."""
    out, _ = staged
    con = duckdb.connect()
    # within-replica pair cosine identical to base for a sample of pairs
    mism = con.execute(f"""
        WITH b AS (SELECT vec_id, embedding
                   FROM read_parquet('{BASE}/embeddings.parquet')
                   WHERE vec_id < 20),
        s AS (SELECT vec_id - {KEY_SHIFT} AS vec_id, embedding
              FROM read_parquet('{out}/embeddings.parquet')
              WHERE vec_id >= {KEY_SHIFT} AND vec_id < {KEY_SHIFT} + 20)
        SELECT count(*) FROM b b1 JOIN b b2 ON b1.vec_id < b2.vec_id
        JOIN s s1 ON s1.vec_id = b1.vec_id
        JOIN s s2 ON s2.vec_id = b2.vec_id
        WHERE abs(list_cosine_similarity(b1.embedding, b2.embedding)
                  - list_cosine_similarity(s1.embedding, s2.embedding))
              > 1e-6""").fetchone()[0]
    assert mism == 0
    # twin decorrelation: |avg cosine| across replicas well below 1
    avg = con.execute(f"""
        SELECT avg(list_cosine_similarity(a.embedding, b.embedding))
        FROM read_parquet('{out}/embeddings.parquet') a
        JOIN read_parquet('{out}/embeddings.parquet') b
          ON b.vec_id = a.vec_id + {KEY_SHIFT}""").fetchone()[0]
    assert abs(avg) < 0.2


def test_replica_permutation_deterministic_identity_for_zero():
    assert replica_permutation(0) == list(range(1, 65))
    p1 = replica_permutation(1)
    assert sorted(p1) == list(range(1, 65)) and p1 != replica_permutation(2)
    assert p1 == replica_permutation(1)  # stable across calls


def test_staging_documents_n_chars_matches_text(staged):
    """n_chars must equal length(text) on EVERY replica (ADVICE r11:
    salted replicas used to keep the base row's n_chars, understating
    replica lengths by ~4 chars per token and skewing any family that
    correlates n_chars with actual text length)."""
    out, _ = staged
    con = duckdb.connect()
    bad = con.execute(f"""
        SELECT count(*) FROM read_parquet('{out}/documents.parquet')
        WHERE n_chars <> length(text)""").fetchone()[0]
    assert bad == 0
