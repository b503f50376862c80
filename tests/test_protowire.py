"""operators/protowire.py — golden bytes from the public protobuf
encoding spec (https://protobuf.dev/programming-guides/encoding/),
hand-computed, so the codec is checked against the SPEC and not just
against its own decoder."""

import struct

import pytest
from hypothesis import given, strategies as st

from etlalchemy_spark.operators.protowire import (
    decode_delimited_stream,
    decode_message,
    decode_varint,
    encode_delimited_stream,
    encode_message,
    encode_varint,
)

SPEC = [
    (1, "s_suppkey", "int64"),
    (2, "s_name", "string"),
    (3, "s_nationkey", "int64"),
    (4, "s_acctbal", "double"),
]


def test_varint_golden():
    # spec examples: 1 -> 01, 150 -> 96 01, 300 -> AC 02
    assert encode_varint(1) == bytes([0x01])
    assert encode_varint(150) == bytes([0x96, 0x01])
    assert encode_varint(300) == bytes([0xAC, 0x02])
    assert decode_varint(bytes([0x96, 0x01]), 0) == (150, 2)


def test_message_golden():
    row = {"s_suppkey": 1, "s_name": "A", "s_nationkey": 3, "s_acctbal": 1.5}
    expect = (
        bytes([0x08, 0x01])  # field 1 varint 1
        + bytes([0x12, 0x01, 0x41])  # field 2 len-delimited "A"
        + bytes([0x18, 0x03])  # field 3 varint 3
        + bytes([0x21]) + struct.pack("<d", 1.5)  # field 4 fixed64
    )
    assert encode_message(row, SPEC) == expect
    assert decode_message(expect, SPEC) == row


def test_unknown_field_skipped():
    # field 9 varint then field 1: decoder must skip the unknown
    buf = bytes([0x48, 0x2A, 0x08, 0x07])
    out = decode_message(buf, SPEC)
    assert out["s_suppkey"] == 7


def test_negative_varint_refuses():
    with pytest.raises(NotImplementedError):
        encode_varint(-1)


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "s_suppkey": st.integers(min_value=0, max_value=2**62),
                "s_name": st.text(max_size=40),
                "s_nationkey": st.integers(min_value=0, max_value=10**9),
                "s_acctbal": st.floats(allow_nan=False, allow_infinity=False),
            }
        ),
        max_size=20,
    )
)
def test_delimited_stream_roundtrip(rows):
    buf = encode_delimited_stream(iter(rows), SPEC)
    back = list(decode_delimited_stream(buf, SPEC))
    assert back == rows
