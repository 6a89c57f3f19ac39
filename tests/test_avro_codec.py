"""The pure-Python Avro OCF codec (sources/avro_codec.py): exact
round-trips over the supported type subset, multi-block and deflate
framing, and the reject-bad-container contract every codec in the
engine follows (BMP/WAV/PNG/GIF pattern)."""

from __future__ import annotations

import json
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cassaforte_meter_transmission_gen_spark.sources.avro_codec import (
    MAGIC,
    ocf_decode,
    ocf_encode,
    parse_schema,
    read_long,
    record_schema,
    write_long,
)

SCHEMA = record_schema(
    "row",
    [
        ("k", "long"),
        ("name", "string"),
        ("x", "double"),
        ("ok", "boolean"),
        ("maybe", ["null", "long"]),
        ("ts", "timestamp-micros"),
    ],
)

ROWS = [
    (1, "alpha", 1.5, True, None, 1_356_998_400_000_000),
    (-2, "βeta", -0.0, False, 7, 0),
    (2**62, "", float("inf"), True, -(2**40), -1),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_exact(codec):
    blob = ocf_encode(SCHEMA, ROWS, codec=codec)
    schema_json, back = ocf_decode(blob)
    assert json.loads(schema_json) == json.loads(SCHEMA)
    assert back == ROWS


def test_container_framing_is_spec_shaped():
    """Magic, metadata map with avro.schema/avro.codec, sync marker
    repeated after every block — the fields any conformant Avro reader
    keys on."""
    blob = ocf_encode(SCHEMA, ROWS, codec="deflate")
    assert blob[:4] == MAGIC
    n, pos = read_long(blob, 4)
    assert n == 2  # two metadata entries
    sync_head = None
    # walk the metadata map the same way the decoder does
    schema_json, rows = ocf_decode(blob)
    assert rows == ROWS
    assert b"avro.schema" in blob and b"avro.codec" in blob
    # header sync == block trailer sync (deterministic, content-derived)
    assert blob.count(blob[-16:]) >= 2
    assert sync_head is None or sync_head == blob[-16:]


def test_multi_block_encoding_decodes_all_rows():
    rows = [(i, f"s{i}", i / 3.0, i % 2 == 0, None, i) for i in range(1000)]
    blob = ocf_encode(SCHEMA, rows, codec="deflate", block_rows=64)
    _, back = ocf_decode(blob)
    assert back == rows


def test_rejects_bad_containers():
    blob = ocf_encode(SCHEMA, ROWS)
    with pytest.raises(ValueError, match="bad magic"):
        ocf_decode(b"PAR1" + blob[4:])
    with pytest.raises(ValueError, match="truncated|sync"):
        ocf_decode(blob[:-10])  # chop inside the final block
    corrupted = bytearray(blob)
    corrupted[-1] ^= 0xFF  # flip a sync-marker byte
    with pytest.raises(ValueError, match="sync marker mismatch"):
        ocf_decode(bytes(corrupted))
    with pytest.raises(ValueError, match="unsupported codec"):
        ocf_encode(SCHEMA, ROWS, codec="snappy")


def test_parse_schema_rejects_unsupported():
    with pytest.raises(ValueError, match="only record"):
        parse_schema('"long"')
    with pytest.raises(ValueError, match="unsupported type"):
        parse_schema(
            '{"type":"record","name":"r","fields":'
            '[{"name":"a","type":"bytes"}]}'
        )
    with pytest.raises(ValueError, match="unsupported union"):
        parse_schema(
            '{"type":"record","name":"r","fields":'
            '[{"name":"a","type":["long","string"]}]}'
        )


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_zigzag_roundtrip(n):
    buf = write_long(n)
    val, pos = read_long(buf, 0)
    assert val == n and pos == len(buf)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.text(max_size=12),
            st.floats(allow_nan=False),
            st.booleans(),
            st.one_of(st.none(), st.integers(-(2**40), 2**40)),
            st.integers(min_value=-(2**50), max_value=2**50),
        ),
        max_size=30,
    )
)
def test_roundtrip_property(rows):
    blob = ocf_encode(SCHEMA, rows, codec="deflate", block_rows=7)
    _, back = ocf_decode(blob)
    assert back == rows


def test_double_bits_roundtrip_exactly():
    """binary64 payloads survive bit-for-bit (incl. -0.0 and inf)."""
    vals = [-0.0, 1e-308, float("inf"), 3.141592653589793]
    rows = [(0, "", v, False, None, 0) for v in vals]
    _, back = ocf_decode(ocf_encode(SCHEMA, rows))
    assert [struct.pack("<d", r[2]) for r in back] == [
        struct.pack("<d", v) for v in vals
    ]
