"""Protocol-buffers wire-format codec, from the public spec, pure
Python (no protobuf library in the sandbox — the wire format is 4
primitives: varints, tags, length-delimited bytes, fixed64).

Encoding reference: https://protobuf.dev/programming-guides/encoding/
— varint = 7-bit little-endian groups with continuation MSB; tag =
(field_number << 3) | wire_type; wire types used here: 0 = varint
(int64), 1 = fixed64 (double, IEEE little-endian), 2 = length-delimited
(UTF-8 string). Streams are the standard length-delimited framing
(varint message length + body) that `writeDelimitedTo` produces, so
files interchange with real protobuf tooling for matching schemas.

Scale shape: encode/decode run INSIDE Arrow `mapInPandas` batches —
partition-local CPU, bytes never hit the driver. The message schema is
a plain python list of (field_number, name, kind) so the codec is
schema-driven, not generated."""

from __future__ import annotations

import struct
from typing import Iterator

# kind: "int64" (wire 0), "double" (wire 1), "string" (wire 2)
FieldSpec = tuple[int, str, str]

_WIRE = {"int64": 0, "double": 1, "string": 2}


def encode_varint(n: int) -> bytes:
    """Unsigned LEB128 varint (spec: negative int64 would take the
    10-byte two's-complement form; this codec refuses it loudly
    instead of silently corrupting — the callers' keys are
    non-negative)."""
    if n < 0:
        raise NotImplementedError("protowire: negative varint (use sint64/zigzag)")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, next_pos). Accepts the 10-byte form real
    protobuf writers emit for negative int64: the raw LEB128 value is
    masked to 64 bits and reinterpreted as signed two's-complement,
    so a wire-encoded -1 decodes as -1, not 2**64-1 (encode_varint
    still refuses negatives — this codec never WRITES that form, but
    must not misread third-party streams). Truncated buffers raise
    ValueError, not IndexError."""
    shift = 0
    val = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("protowire: truncated varint")
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            val &= (1 << 64) - 1
            if val >= 1 << 63:
                val -= 1 << 64
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("protowire: varint longer than 64 bits")


def encode_message(row: dict, spec: list[FieldSpec]) -> bytes:
    """One message body in canonical (spec) field order. None fields
    are omitted — proto3 default semantics."""
    out = bytearray()
    for num, name, kind in spec:
        v = row.get(name)
        if v is None:
            continue
        tag = (num << 3) | _WIRE[kind]
        out += encode_varint(tag)
        if kind == "int64":
            out += encode_varint(int(v))
        elif kind == "double":
            out += struct.pack("<d", float(v))
        else:
            b = str(v).encode("utf-8")
            out += encode_varint(len(b)) + b
    return bytes(out)


def decode_message(buf: bytes, spec: list[FieldSpec]) -> dict:
    """Decode one message body. Unknown fields are skipped by wire
    type (spec behavior); missing fields decode as None."""
    by_num = {num: (name, kind) for num, name, kind in spec}
    row: dict = {name: None for _, name, _ in spec}
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        num, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = decode_varint(buf, pos)
            if num in by_num:
                row[by_num[num][0]] = val
        elif wt == 1:
            raw = buf[pos : pos + 8]
            pos += 8
            if num in by_num:
                row[by_num[num][0]] = struct.unpack("<d", raw)[0]
        elif wt == 2:
            ln, pos = decode_varint(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
            if num in by_num:
                name, kind = by_num[num]
                row[name] = raw.decode("utf-8") if kind == "string" else raw
        elif wt == 5:  # fixed32 — skippable unknown
            pos += 4
        else:
            raise NotImplementedError(f"protowire: wire type {wt} (groups)")
    return row


def encode_delimited_stream(rows: Iterator[dict], spec: list[FieldSpec]) -> bytes:
    """Standard writeDelimitedTo framing: varint body length + body."""
    out = bytearray()
    for row in rows:
        body = encode_message(row, spec)
        out += encode_varint(len(body)) + body
    return bytes(out)


def decode_delimited_stream(buf: bytes, spec: list[FieldSpec]) -> Iterator[dict]:
    pos = 0
    while pos < len(buf):
        ln, pos = decode_varint(buf, pos)
        yield decode_message(buf[pos : pos + ln], spec)
        pos += ln
