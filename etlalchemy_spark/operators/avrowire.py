"""Avro Object Container File codec, from the public spec, pure
Python (no avro/fastavro library in the sandbox — the OCF format is a
small composition of primitives: zigzag varint longs, length-prefixed
bytes, IEEE little-endian doubles, a metadata map, sync-marker-framed
data blocks, and optional raw-deflate block compression).

Format reference: https://avro.apache.org/docs/current/specification/
— file = magic ``Obj\\x01`` + metadata map (must contain
``avro.schema`` JSON; ``avro.codec`` defaults to ``null``) + 16-byte
sync marker, then data blocks of (object count: long, serialized size
AFTER codec: long, bytes, sync marker). Primitives: int/long =
zigzag + LEB128 varint (7-bit little-endian groups, continuation MSB);
string/bytes = long length + payload; double = 8-byte IEEE LE;
boolean = 1 byte; null = zero bytes. A record is its fields in schema
order; a ``["null", T]`` union is a long branch index then the value.
``deflate`` codec is RFC-1951 raw deflate (zlib with -15 window bits,
no zlib header/checksum) — stdlib ``zlib`` covers it.

Files written here interchange with real Avro tooling for matching
schemas (the schema JSON is embedded, readers are schema-driven), and
`read_ocf` reads third-party files over the supported type subset,
refusing loudly by type name on anything else.

Scale shape (mirrors operators/protowire.py): encode/decode run INSIDE
Arrow `mapInPandas` batches — partition-local CPU, bytes never hit the
driver; one .avro file per partition, reads parallelize the file list.
The record schema is a plain python list of (name, kind) so the codec
is schema-driven, not generated. Upstream parity: etlalchemy's file
interchange surface (ETLAlchemySource.py ≈L750–800 dump/load legs).
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Iterator

MAGIC = b"Obj\x01"

# kind: "long" | "double" | "string" | "boolean" | "bytes",
# with a "?" suffix for the nullable ["null", T] union form.
FieldSpec = tuple[str, str]

_AVRO_TYPE = {
    "long": "long",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "bytes": "bytes",
}
_FROM_AVRO = {v: k for k, v in _AVRO_TYPE.items()}
_FROM_AVRO["int"] = "long"  # int widens losslessly into the long lane
_FROM_AVRO["float"] = "float32"  # read-only: decoded to python float


# ---------------------------------------------------------------- primitives


def zigzag_encode(n: int) -> int:
    """Signed → unsigned zigzag mapping (0,-1,1,-2,... → 0,1,2,3,...)."""
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_long(n: int) -> bytes:
    """Avro long: zigzag then LEB128 varint."""
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError(f"avro long out of 64-bit range: {n}")
    u = zigzag_encode(n) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, next_pos); bounds-checked (truncation raises
    ValueError, never IndexError)."""
    shift = 0
    u = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("avro: truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(u & ((1 << 64) - 1)), pos
        shift += 7
        if shift > 63:
            raise ValueError("avro: varint longer than 64 bits")


def _encode_bytes(b: bytes) -> bytes:
    return encode_long(len(b)) + b


def _decode_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = decode_long(buf, pos)
    if ln < 0 or pos + ln > len(buf):
        raise ValueError("avro: truncated bytes/string")
    return buf[pos : pos + ln], pos + ln


# ---------------------------------------------------------------- schema


def schema_json(name: str, spec: list[FieldSpec]) -> str:
    """Record schema JSON for the embedded ``avro.schema`` metadata
    entry; ``T?`` kinds emit the ``["null", T]`` union form."""
    fields = []
    for fname, kind in spec:
        nullable = kind.endswith("?")
        base = kind.rstrip("?")
        if base not in _AVRO_TYPE:
            raise NotImplementedError(f"avro: unsupported kind {kind!r}")
        t: object = _AVRO_TYPE[base]
        if nullable:
            t = ["null", t]
        fields.append({"name": fname, "type": t})
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}, separators=(",", ":")
    )


def parse_schema(js: str) -> list[FieldSpec]:
    """Parse an embedded record schema back into a FieldSpec list.
    Supports the flat-record subset this codec writes (plus int/float
    widening on read); anything deeper refuses by type name."""
    sch = json.loads(js)
    if not isinstance(sch, dict) or sch.get("type") != "record":
        raise NotImplementedError(f"avro: top-level schema {sch!r} (only record)")
    spec: list[FieldSpec] = []
    for f in sch["fields"]:
        t = f["type"]
        suffix = ""
        if isinstance(t, list):
            if len(t) == 2 and "null" in t:
                t = t[0] if t[1] == "null" else t[1]
                suffix = "?"
            else:
                raise NotImplementedError(f"avro: union {t!r} (only [null, T])")
        if not isinstance(t, str) or t not in _FROM_AVRO:
            raise NotImplementedError(f"avro: field type {t!r}")
        spec.append((f["name"], _FROM_AVRO[t] + suffix))
    return spec


# ---------------------------------------------------------------- records


def encode_record(row: dict, spec: list[FieldSpec]) -> bytes:
    out = bytearray()
    for name, kind in spec:
        v = row.get(name)
        nullable = kind.endswith("?")
        base = kind.rstrip("?")
        if nullable:
            if v is None:
                out += encode_long(0)  # union branch 0 = null
                continue
            out += encode_long(1)
        elif v is None:
            raise ValueError(f"avro: None in non-nullable field {name}")
        if base == "long":
            out += encode_long(int(v))
        elif base == "double":
            out += struct.pack("<d", float(v))
        elif base == "string":
            out += _encode_bytes(str(v).encode("utf-8"))
        elif base == "bytes":
            out += _encode_bytes(bytes(v))
        elif base == "boolean":
            out += b"\x01" if v else b"\x00"
        else:
            raise NotImplementedError(f"avro: encode kind {kind!r}")
    return bytes(out)


def decode_record(buf: bytes, pos: int, spec: list[FieldSpec]) -> tuple[dict, int]:
    row: dict = {}
    for name, kind in spec:
        nullable = kind.endswith("?")
        base = kind.rstrip("?")
        if nullable:
            branch, pos = decode_long(buf, pos)
            if branch == 0:
                row[name] = None
                continue
            if branch != 1:
                raise ValueError(f"avro: union branch {branch} in {name}")
        if base == "long":
            row[name], pos = decode_long(buf, pos)
        elif base == "double":
            if pos + 8 > len(buf):
                raise ValueError("avro: truncated double")
            row[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif base == "float32":
            if pos + 4 > len(buf):
                raise ValueError("avro: truncated float")
            row[name] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif base == "string":
            b, pos = _decode_bytes(buf, pos)
            row[name] = b.decode("utf-8")
        elif base == "bytes":
            row[name], pos = _decode_bytes(buf, pos)
        elif base == "boolean":
            if pos >= len(buf):
                raise ValueError("avro: truncated boolean")
            row[name] = buf[pos] != 0
            pos += 1
        else:
            raise NotImplementedError(f"avro: decode kind {kind!r}")
    return row, pos


# ---------------------------------------------------------------- metadata map


def _encode_meta(meta: dict[str, bytes]) -> bytes:
    """File metadata map: one block of all entries, then the 0 count
    terminator (the spec's simplest legal shape)."""
    out = bytearray()
    if meta:
        out += encode_long(len(meta))
        for k in sorted(meta):  # deterministic bytes for golden pins
            out += _encode_bytes(k.encode("utf-8"))
            out += _encode_bytes(meta[k])
    out += encode_long(0)
    return bytes(out)


def _decode_meta(buf: bytes, pos: int) -> tuple[dict[str, bytes], int]:
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = decode_long(buf, pos)
        if cnt == 0:
            return meta, pos
        if cnt < 0:  # negative count form: abs count + block byte size
            cnt = -cnt
            _, pos = decode_long(buf, pos)
        for _ in range(cnt):
            k, pos = _decode_bytes(buf, pos)
            v, pos = _decode_bytes(buf, pos)
            meta[k.decode("utf-8")] = v


# ---------------------------------------------------------------- container file


def _sync_marker(schema_js: str) -> bytes:
    """Deterministic 16-byte sync marker (md5 of the schema JSON):
    the spec only requires it be consistent within a file; a
    content-derived marker keeps written bytes reproducible for
    golden tests (real writers use random markers — readers never
    care, they just match the header's)."""
    import hashlib

    return hashlib.md5(schema_js.encode("utf-8")).digest()


def write_ocf(
    rows: Iterator[dict],
    spec: list[FieldSpec],
    codec: str = "null",
    record_name: str = "row",
    block_rows: int = 4096,
) -> bytes:
    """Serialize rows into one Avro Object Container File (bytes).
    ``codec``: ``null`` or ``deflate`` (raw RFC-1951)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} (null|deflate)")
    js = schema_json(record_name, spec)
    sync = _sync_marker(js)
    out = bytearray()
    out += MAGIC
    out += _encode_meta(
        {"avro.schema": js.encode("utf-8"), "avro.codec": codec.encode("utf-8")}
    )
    out += sync

    block: list[bytes] = []

    def flush():
        if not block:
            return
        body = b"".join(block)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        out.extend(encode_long(len(block)))
        out.extend(encode_long(len(body)))
        out.extend(body)
        out.extend(sync)
        block.clear()

    for row in rows:
        block.append(encode_record(row, spec))
        if len(block) >= block_rows:
            flush()
    flush()
    return bytes(out)


def read_ocf(buf: bytes, spec: list[FieldSpec] | None = None) -> tuple[dict, list[dict]]:
    """Parse one OCF byte string → (meta, rows). The embedded
    ``avro.schema`` drives decoding (so third-party files over the
    supported subset read without a caller-side spec); pass ``spec``
    to additionally assert the schema matches expectations."""
    if buf[:4] != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    meta_b, pos = _decode_meta(buf, 4)
    js = meta_b.get("avro.schema")
    if js is None:
        raise ValueError("avro: missing avro.schema metadata")
    file_spec = parse_schema(js.decode("utf-8"))
    if spec is not None and [
        (n, k.replace("float32", "double")) for n, k in file_spec
    ] != list(spec):
        raise ValueError(f"avro: schema mismatch: file has {file_spec}, want {spec}")
    codec = meta_b.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} (null|deflate)")
    sync = buf[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("avro: truncated header sync marker")
    pos += 16

    rows: list[dict] = []
    n = len(buf)
    while pos < n:
        cnt, pos = decode_long(buf, pos)
        size, pos = decode_long(buf, pos)
        if cnt < 0 or size < 0 or pos + size + 16 > n:
            raise ValueError("avro: truncated data block")
        body = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        bpos = 0
        for _ in range(cnt):
            row, bpos = decode_record(body, bpos, file_spec)
            rows.append(row)
        if bpos != len(body):
            raise ValueError("avro: trailing bytes in data block")
    return {k: v for k, v in meta_b.items()}, rows


# ------------------------------------------------- generic (full-schema) codec
#
# The flat-record subset above is the interchange surface the fmt_avro_*
# gates exercise. Iceberg's metadata layer (r13) needs the FULL type
# system — nested records, arrays, maps, fixed, enums, arbitrary unions
# — so this generic codec walks the parsed schema JSON recursively
# (Avro 1.11 spec "Binary encoding"): blocked arrays/maps (negative
# counts carry a skippable byte size), union = branch index + value,
# enum = symbol index, named-type references resolved through a
# registry populated in definition order. decode and encode traverse
# identically, so a write_ocf_any round trip is byte-stable.


def _register_named(schema: dict, names: dict) -> None:
    nm = schema.get("name")
    if nm:
        ns = schema.get("namespace")
        names[nm] = schema
        if ns:
            names[f"{ns}.{nm}"] = schema


def decode_value(schema, buf: bytes, pos: int, names: dict) -> tuple[object, int]:
    if isinstance(schema, str):
        if schema in names:
            return decode_value(names[schema], buf, pos, names)
        if schema == "null":
            return None, pos
        if schema == "boolean":
            return buf[pos] != 0, pos + 1
        if schema in ("int", "long"):
            return decode_long(buf, pos)
        if schema == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        if schema == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if schema in ("bytes", "string"):
            b, pos = _decode_bytes(buf, pos)
            return (b.decode("utf-8") if schema == "string" else b), pos
        raise NotImplementedError(f"avro: unknown type {schema!r}")
    if isinstance(schema, list):  # union: branch index then value
        branch, pos = decode_long(buf, pos)
        if not 0 <= branch < len(schema):
            raise ValueError(f"avro: union branch {branch} of {len(schema)}")
        return decode_value(schema[branch], buf, pos, names)
    t = schema["type"]
    if t == "record":
        _register_named(schema, names)
        row = {}
        for f in schema["fields"]:
            row[f["name"]], pos = decode_value(f["type"], buf, pos, names)
        return row, pos
    if t == "enum":
        _register_named(schema, names)
        idx, pos = decode_long(buf, pos)
        return schema["symbols"][idx], pos
    if t == "fixed":
        _register_named(schema, names)
        size = schema["size"]
        return bytes(buf[pos : pos + size]), pos + size
    if t == "array":
        out = []
        while True:
            cnt, pos = decode_long(buf, pos)
            if cnt == 0:
                return out, pos
            if cnt < 0:  # block byte-size prefix (skippable form)
                _, pos = decode_long(buf, pos)
                cnt = -cnt
            for _ in range(cnt):
                v, pos = decode_value(schema["items"], buf, pos, names)
                out.append(v)
    if t == "map":
        out = {}
        while True:
            cnt, pos = decode_long(buf, pos)
            if cnt == 0:
                return out, pos
            if cnt < 0:
                _, pos = decode_long(buf, pos)
                cnt = -cnt
            for _ in range(cnt):
                kb, pos = _decode_bytes(buf, pos)
                out[kb.decode("utf-8")], pos = decode_value(
                    schema["values"], buf, pos, names
                )
    # {"type": "long", "logicalType": ...} and similar wrappers
    return decode_value(t, buf, pos, names)


def encode_value(schema, value, names: dict) -> bytes:
    if isinstance(schema, str):
        if schema in names:
            return encode_value(names[schema], value, names)
        if schema == "null":
            return b""
        if schema == "boolean":
            return b"\x01" if value else b"\x00"
        if schema in ("int", "long"):
            return encode_long(int(value))
        if schema == "float":
            return struct.pack("<f", float(value))
        if schema == "double":
            return struct.pack("<d", float(value))
        if schema == "string":
            return _encode_bytes(str(value).encode("utf-8"))
        if schema == "bytes":
            return _encode_bytes(bytes(value))
        raise NotImplementedError(f"avro: unknown type {schema!r}")
    if isinstance(schema, list):  # union: null branch for None, else first other
        for i, b in enumerate(schema):
            if value is None and b == "null":
                return encode_long(i)
            if value is not None and b != "null":
                return encode_long(i) + encode_value(b, value, names)
        raise ValueError(f"avro: no union branch for {value!r} in {schema!r}")
    t = schema["type"]
    if t == "record":
        _register_named(schema, names)
        out = bytearray()
        for f in schema["fields"]:
            out += encode_value(f["type"], value[f["name"]], names)
        return bytes(out)
    if t == "enum":
        _register_named(schema, names)
        return encode_long(schema["symbols"].index(value))
    if t == "fixed":
        _register_named(schema, names)
        if len(value) != schema["size"]:
            raise ValueError(f"avro: fixed size {len(value)} != {schema['size']}")
        return bytes(value)
    if t == "array":
        out = bytearray()
        if value:
            out += encode_long(len(value))
            for v in value:
                out += encode_value(schema["items"], v, names)
        out += encode_long(0)
        return bytes(out)
    if t == "map":
        out = bytearray()
        if value:
            out += encode_long(len(value))
            for k, v in value.items():
                out += _encode_bytes(str(k).encode("utf-8"))
                out += encode_value(schema["values"], v, names)
        out += encode_long(0)
        return bytes(out)
    return encode_value(t, value, names)


def read_ocf_any(buf: bytes) -> tuple[dict, list[dict]]:
    """Parse ANY Object Container File through the generic codec —
    (meta, nested-dict rows). Same framing walk as read_ocf; the
    embedded schema may use the full Avro type system."""
    import json as _json

    if buf[:4] != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    meta_b, pos = _decode_meta(buf, 4)
    js = meta_b.get("avro.schema")
    if js is None:
        raise ValueError("avro: missing avro.schema metadata")
    schema = _json.loads(js.decode("utf-8"))
    codec = meta_b.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} (null|deflate)")
    sync = buf[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("avro: truncated header sync marker")
    pos += 16
    rows: list[dict] = []
    n = len(buf)
    while pos < n:
        cnt, pos = decode_long(buf, pos)
        size, pos = decode_long(buf, pos)
        if cnt < 0 or size < 0 or pos + size + 16 > n:
            raise ValueError("avro: truncated data block")
        body = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        bpos = 0
        names: dict = {}
        for _ in range(cnt):
            row, bpos = decode_value(schema, body, bpos, names)
            rows.append(row)
        if bpos != len(body):
            raise ValueError("avro: trailing bytes in data block")
    return {k: v for k, v in meta_b.items()}, rows


def write_ocf_any(rows, schema_js: str, codec: str = "null") -> bytes:
    """Serialize nested-dict rows under a full Avro schema JSON string
    — the fixture writer for metadata layers whose schemas exceed the
    flat subset (Iceberg manifests)."""
    import json as _json

    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} (null|deflate)")
    schema = _json.loads(schema_js)
    sync = _sync_marker(schema_js)
    out = bytearray()
    out += MAGIC
    out += _encode_meta(
        {"avro.schema": schema_js.encode("utf-8"), "avro.codec": codec.encode("utf-8")}
    )
    out += sync
    names: dict = {}
    body = bytearray()
    cnt = 0
    for row in rows:
        body += encode_value(schema, row, names)
        cnt += 1
    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    if cnt:
        out.extend(encode_long(cnt))
        out.extend(encode_long(len(payload)))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)
