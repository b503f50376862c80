"""operators/avrowire.py — golden bytes from the public Avro spec
(https://avro.apache.org/docs/current/specification/), hand-computed,
so the codec is checked against the SPEC and not just against its own
decoder."""

import json
import struct
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from etlalchemy_spark.operators.avrowire import (
    MAGIC,
    decode_long,
    decode_record,
    encode_long,
    encode_record,
    parse_schema,
    read_ocf,
    schema_json,
    write_ocf,
    zigzag_decode,
    zigzag_encode,
)

SPEC = [
    ("s_suppkey", "long"),
    ("s_name", "string"),
    ("s_nationkey", "long"),
    ("s_acctbal", "double"),
]


def test_zigzag_spec_table():
    # the spec's own mapping table
    for n, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294),
                 (-2147483648, 4294967295)]:
        assert zigzag_encode(n) == z
        assert zigzag_decode(z) == n


def test_long_golden():
    # zigzag+varint: 1 -> 02, -1 -> 01, -64 -> 7f, 64 -> 80 01
    assert encode_long(1) == bytes([0x02])
    assert encode_long(-1) == bytes([0x01])
    assert encode_long(-64) == bytes([0x7F])
    assert encode_long(64) == bytes([0x80, 0x01])
    assert decode_long(bytes([0x80, 0x01]), 0) == (64, 2)


def test_record_golden():
    row = {"s_suppkey": 1, "s_name": "A", "s_nationkey": 3, "s_acctbal": 1.5}
    expect = (
        bytes([0x02])                       # long 1
        + bytes([0x02, 0x41])               # string len 1, "A"
        + bytes([0x06])                     # long 3
        + struct.pack("<d", 1.5)            # IEEE LE double
    )
    assert encode_record(row, SPEC) == expect
    out, pos = decode_record(expect, 0, SPEC)
    assert out == row and pos == len(expect)


def test_nullable_union_branches():
    spec = [("x", "long?")]
    assert encode_record({"x": None}, spec) == bytes([0x00])  # branch 0 = null
    assert encode_record({"x": 5}, spec) == bytes([0x02, 0x0A])  # branch 1, long 5
    assert decode_record(bytes([0x00]), 0, spec)[0] == {"x": None}
    assert decode_record(bytes([0x02, 0x0A]), 0, spec)[0] == {"x": 5}


def test_schema_json_roundtrip():
    js = schema_json("supplier", SPEC)
    sch = json.loads(js)
    assert sch["type"] == "record" and sch["name"] == "supplier"
    assert parse_schema(js) == SPEC
    # nullable form emits the union and parses back
    spec2 = [("a", "string?"), ("b", "boolean")]
    assert parse_schema(schema_json("r", spec2)) == spec2
    # int widens to long on read
    assert parse_schema('{"type":"record","name":"r","fields":'
                        '[{"name":"a","type":"int"}]}') == [("a", "long")]


def test_ocf_header_layout():
    buf = write_ocf(iter([]), SPEC)
    assert buf[:4] == MAGIC == b"Obj\x01"
    # metadata map: block count 2 (zigzag -> 0x04), sorted keys
    assert buf[4] == 0x04
    meta, rows = read_ocf(buf)
    assert rows == [] and meta["avro.codec"] == b"null"
    assert json.loads(meta["avro.schema"])["name"] == "row"
    # header = magic + meta + 16-byte sync; empty file has no blocks
    # deterministic bytes: same input -> same file (golden stability)
    assert write_ocf(iter([]), SPEC) == buf


def test_ocf_roundtrip_both_codecs():
    rows = [
        {"s_suppkey": i, "s_name": f"sup{i}", "s_nationkey": i % 5,
         "s_acctbal": i * 0.125 - 3}
        for i in range(300)
    ]
    for codec in ("null", "deflate"):
        buf = write_ocf(iter(rows), SPEC, codec=codec, block_rows=64)
        meta, out = read_ocf(buf, SPEC)
        assert out == rows
        assert meta["avro.codec"].decode() == codec


def test_deflate_is_raw_rfc1951():
    rows = [{"s_suppkey": 1, "s_name": "x" * 100, "s_nationkey": 0,
             "s_acctbal": 0.0}]
    buf = write_ocf(iter(rows), SPEC, codec="deflate")
    # find the single data block: after header sync, long count, long size
    js = schema_json("row", SPEC)
    import hashlib
    sync = hashlib.md5(js.encode()).digest()
    hdr_end = buf.index(sync) + 16
    cnt, p = decode_long(buf, hdr_end)
    size, p = decode_long(buf, p)
    body = buf[p:p + size]
    # raw deflate (no zlib header) must inflate with -15 window bits
    raw = zlib.decompress(body, -15)
    assert decode_record(raw, 0, SPEC)[0]["s_name"] == "x" * 100
    with pytest.raises(zlib.error):
        zlib.decompress(body)  # zlib-wrapped inflate must FAIL — proves raw form


def test_corruption_refuses_loudly():
    rows = [{"s_suppkey": 1, "s_name": "a", "s_nationkey": 2, "s_acctbal": 0.5}]
    buf = bytearray(write_ocf(iter(rows), SPEC))
    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"NOPE" + bytes(buf[4:]))
    bad = bytes(buf[:-1])  # truncated trailing sync
    with pytest.raises(ValueError):
        read_ocf(bad)
    flipped = bytes(buf[:-8]) + b"\x00" * 8  # corrupt sync marker
    with pytest.raises(ValueError, match="sync"):
        read_ocf(flipped)
    with pytest.raises(ValueError, match="schema mismatch"):
        read_ocf(bytes(buf), [("other", "long")])


def test_unsupported_types_refuse_by_name():
    with pytest.raises(NotImplementedError, match="codec"):
        write_ocf(iter([]), SPEC, codec="snappy")
    with pytest.raises(NotImplementedError, match="union"):
        parse_schema('{"type":"record","name":"r","fields":'
                     '[{"name":"a","type":["long","string"]}]}')
    with pytest.raises(NotImplementedError, match="field type"):
        parse_schema('{"type":"record","name":"r","fields":'
                     '[{"name":"a","type":{"type":"array","items":"long"}}]}')


@settings(deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.text(max_size=20),
            st.floats(allow_nan=False),
            st.booleans(),
            st.one_of(st.none(), st.text(max_size=8)),
        ),
        max_size=40,
    ),
    st.sampled_from(["null", "deflate"]),
)
def test_ocf_property_roundtrip(tuples, codec):
    spec = [("k", "long"), ("s", "string"), ("d", "double"),
            ("b", "boolean"), ("opt", "string?")]
    rows = [dict(zip(("k", "s", "d", "b", "opt"), tp)) for tp in tuples]
    _, out = read_ocf(write_ocf(iter(rows), spec, codec=codec, block_rows=7), spec)
    assert out == rows


@settings(deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_property_roundtrip(n):
    assert decode_long(encode_long(n), 0)[0] == n
