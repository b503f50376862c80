"""JPEG (ITU-T T.81, public spec) encoder + decoder — pure stdlib +
numpy, same discipline as the r8 PNG/GIF/ADPCM/AVI codecs (no codec
libraries exist in this container; on a real cluster you'd swap PIL
in, but the Spark-side plumbing is what this engine owns).

Supported (the format's two dominant profiles):

- BASELINE SEQUENTIAL (SOF0) and PROGRESSIVE (SOF2 — r10: spectral
  selection, successive approximation, interleaved DC scans,
  single-component AC scans, EOB runs, correction bits, per-scan
  DHT/DQT/DRI between scans)
- markers SOI/APPn/COM/DQT/DHT/SOF0/SOF2/DRI/SOS/EOI; 8-bit quant
- 1-component (grayscale) and 3-component YCbCr scans
- 4:4:4 (all 1x1), 4:2:0 (luma 2x2), and 4:2:2 (luma 2x1 — r10)
- restart intervals (DRI + RST0..7, modulo-sequence-checked, DC
  predictor + EOB-run resets — r10)
- DC prediction, AC run-length with ZRL/EOB, byte stuffing
- Huffman tables are read FROM THE FILE's DHT segments, so decode is
  self-contained; the encoder writes the Annex-K standard tables
- 16-bit (Pq=1) quantization tables, read AND written (r11)
- LOSSLESS (SOF3, r11): T.81 Annex-H predictors 1-7, point transform,
  2..16-bit precision, 1/3 components — bit-exact, no DCT
  (decode_jpeg routes SOF3 scans; encode_jpeg_lossless is the twin)

Refused LOUDLY with the exact unsupported field (honest boundaries):
hierarchical/extended-sequential SOFs, arithmetic coding, other
subsampling geometries, lossless restart intervals.

IDCT/DCT are float64 matrix products; block reconstruction rounds via
floor(x + 0.5) and clamps — for DC-only blocks (each 8x8 block a
single constant) the decode is EXACT at quality 100 (all-ones quant
tables), which is what makes a lossy codec oracle-checkable: the gate
fixture synthesizes block-constant images whose decoded sums DuckDB
recomputes formula-side, while general-image loss is bounded and
golden-pinned in tests/test_jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex-K Huffman specs: (bits[1..16], values). Decode never relies on
# these (tables come from the file's DHT); they define what we EMIT.
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


_M = _dct_matrix()


def _scaled_quant(base: list[int], quality: int) -> np.ndarray:
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = [(v * scale + 50) // 100 for v in base]
    return np.array([min(255, max(1, v)) for v in q], dtype=np.int32)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """Emit RSTn (T.81 §B.2.1.2): pad the entropy stream to a byte
        boundary with 1-bits (stuffed if the pad byte is 0xFF), then
        the marker bytes RAW — markers are the one thing byte stuffing
        must never mangle."""
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (n & 7)])


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, ssss: int) -> int:
    return v if v >= 0 else v + (1 << ssss) - 1


def _encode_block(
    w: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
    dc: dict, ac: dict,
) -> int:
    coef = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    flat = coef.reshape(64)[ZIGZAG]
    scaled = flat / q
    # round half away from zero, T.81 convention
    zz = np.where(scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)).astype(
        np.int32
    )
    diff = int(zz[0]) - pred
    ssss = _category(diff)
    code, length = dc[ssss]
    w.put(code, length)
    if ssss:
        w.put(_value_bits(diff, ssss), ssss)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac[(run << 4) | s]
        w.put(c, ln)
        w.put(_value_bits(v, s), s)
        run = 0
    if last_nz < 63:
        c, ln = ac[0x00]  # EOB
        w.put(c, ln)
    return int(zz[0])


def _dht_segment(tc: int, th: int, spec: tuple[list[int], list[int]]) -> bytes:
    bits, values = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, q: np.ndarray, pq: int = 0) -> bytes:
    """Pq=0: 8-bit entries; Pq=1: 16-bit big-endian entries (T.81
    B.2.4.1 — what 12-bit-era and some 8-bit-stream encoders emit)."""
    if pq:
        body = bytes([0x10 | tid]) + b"".join(
            struct.pack(">H", int(v)) for v in q
        )
    else:
        body = bytes([tid]) + bytes(int(v) for v in q)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    quality: int = 100,
    subsampling: str = "444",
    restart_interval: int = 0,
    dqt_16bit: bool = False,
) -> bytes:
    """Baseline JPEG from YCbCr planes (grayscale when cb/cr omitted).
    Planes must be uint8 2-D; luma dims must be multiples of 8 (444 /
    gray), 16 (420), or 16 wide x 8 tall (422); 420 chroma planes are
    half-size, 422 half-WIDTH. ``restart_interval`` > 0 emits a DRI
    segment and RST0..7 markers every that-many MCUs with DC-predictor
    resets (r10 — what virtually every camera JPEG carries for error
    resilience). The encoder works on planes (not RGB) so a
    block-constant fixture can pin exact DC-only round-trips at
    quality 100."""
    h, w = y.shape
    color = cb is not None
    if color and (cr is None or cb.shape != cr.shape):
        raise ValueError("cb/cr must both be given with identical shapes")
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if not color or subsampling == "444":
        mcu_h = mcu_w = 8
    elif subsampling == "420":
        mcu_h = mcu_w = 16
    else:  # 422: 2 luma blocks wide, 1 tall
        mcu_h, mcu_w = 8, 16
    if h % mcu_h or w % mcu_w:
        raise ValueError(f"dims must be multiples of {mcu_w}x{mcu_h} for {subsampling}")
    if color and subsampling == "420" and cb.shape != (h // 2, w // 2):
        raise ValueError("420 chroma planes must be half-size")
    if color and subsampling == "422" and cb.shape != (h, w // 2):
        raise ValueError("422 chroma planes must be half-width")
    if color and subsampling == "444" and cb.shape != (h, w):
        raise ValueError("444 chroma planes must be full-size")

    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    dcl = _canonical_codes(*DC_LUMA_SPEC)
    acl = _canonical_codes(*AC_LUMA_SPEC)
    dcc = _canonical_codes(*DC_CHROMA_SPEC)
    acc = _canonical_codes(*AC_CHROMA_SPEC)

    out = bytearray(b"\xff\xd8")  # SOI
    pq = 1 if dqt_16bit else 0
    out += _dqt_segment(0, ql, pq=pq)
    if color:
        out += _dqt_segment(1, qc, pq=pq)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0
    ncomp = 3 if color else 1
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    sampling = {"420": (2, 2), "422": (2, 1)}.get(subsampling if color else "", (1, 1))
    sof += bytes([1, (sampling[0] << 4) | sampling[1], 0])
    if color:
        sof += bytes([2, 0x11, 1])
        sof += bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, DC_LUMA_SPEC)
    out += _dht_segment(1, 0, AC_LUMA_SPEC)
    if color:
        out += _dht_segment(0, 1, DC_CHROMA_SPEC)
        out += _dht_segment(1, 1, AC_CHROMA_SPEC)
    # SOS
    sos = bytearray([ncomp])
    sos += bytes([1, 0x00])
    if color:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)

    wtr = _BitWriter()
    preds = [0, 0, 0]
    fh, fv = sampling  # luma blocks per MCU (horizontal, vertical)
    mcu_i = 0
    for my in range(h // mcu_h):
        for mx in range(w // mcu_w):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.restart((mcu_i // restart_interval - 1) % 8)
                preds = [0, 0, 0]  # RST resets every DC predictor
            for sy in range(fv):
                for sx in range(fh):
                    y0, x0 = my * mcu_h + sy * 8, mx * mcu_w + sx * 8
                    blk = y[y0:y0 + 8, x0:x0 + 8]
                    preds[0] = _encode_block(wtr, blk, ql, preds[0], dcl, acl)
            if color:
                slc = np.s_[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                preds[1] = _encode_block(wtr, cb[slc], qc, preds[1], dcc, acc)
                preds[2] = _encode_block(wtr, cr[slc], qc, preds[2], dcc, acc)
            mcu_i += 1
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif nxt == 0xD9:  # EOI reached with bits still requested
                raise ValueError("truncated JPEG entropy stream")
            else:
                # RST markers are consumed at MCU boundaries by
                # restart(); one showing up mid-fill means the stream
                # disagrees with the declared restart interval
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self, n: int) -> None:
        """Consume RSTn at an MCU boundary (T.81 §E.2.4): discard the
        partial byte's padding bits, then require exactly the expected
        modulo-8 marker — a skipped or out-of-order RST is corruption
        the modulo sequence exists to catch."""
        self.acc = 0
        self.n = 0
        got = self.data[self.pos:self.pos + 2]
        if got != bytes([0xFF, 0xD0 + (n & 7)]):
            raise ValueError(
                f"expected RST{n & 7} at offset {self.pos}, got {got.hex()}"
            )
        self.pos += 2


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, ssss: int) -> int:
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _parse_dqt(seg: bytes, qtabs: dict) -> None:
    """DQT body: one or more (PqTq, entries) tables. Pq=0: 64 8-bit
    entries; Pq=1: 64 16-bit big-endian entries (T.81 B.2.4.1)."""
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 0xF
        if pq == 1:
            if len(seg) - p - 1 < 128:
                raise ValueError("DQT Pq=1 table truncated")
            qtabs[tq] = np.frombuffer(seg[p + 1:p + 129], dtype=">u2").astype(
                np.int32
            )
            p += 129
        elif pq == 0:
            qtabs[tq] = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8).astype(
                np.int32
            )
            p += 65
        else:
            raise ValueError(f"DQT precision field Pq={pq} (0 or 1)")


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline sequential JPEG. Returns format/width/height/
    n_pixels, subsampling, per-plane stored sums (sum_y/sum_cb/sum_cr
    over the decoded planes cropped to nominal size, BEFORE chroma
    upsampling), and sum_r/sum_g/sum_b over the reconstructed RGB
    (grayscale replicates Y). Lossless (SOF3) results additionally
    carry ``precision``/``predictor``/``point_transform``; for Pt > 0
    the sums are over the point-transformed samples (multiply by
    ``1 << point_transform`` for nominal range — see
    _decode_lossless). All refusals name the exact field."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    ri = 0  # restart interval in MCUs; 0 = no DRI seen
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            _parse_dqt(seg, qtabs)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17:p + 17 + nvals])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = values[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tc, th)] = table
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"sample precision {prec} (only 8)")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:  # SOF2 progressive (r10)
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"sample precision {prec} (only 8)")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": True}
        elif marker == 0xC3:  # SOF3 lossless sequential (r11)
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if not 2 <= prec <= 16:
                raise ValueError(f"lossless sample precision {prec} (2..16)")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "lossless": True,
                     "prec": prec}
        elif marker in (0xC1, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            kinds = {0xC1: "extended sequential (SOF1)"}
            raise NotImplementedError(
                f"{kinds.get(marker, f'SOF marker 0xFF{marker:02X}')} not "
                "supported — baseline (SOF0), progressive (SOF2) and "
                "lossless (SOF3) only"
            )
        elif marker == 0xDD:  # DRI (r10): RSTn every ri MCUs in the scan
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if frame.get("progressive"):
                # take over the remaining marker walk: progressive
                # frames carry MANY scans with DHT/DRI between them
                return _decode_progressive(
                    payload, pos - 2, frame, qtabs, htabs, ri
                )
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tds >> 4, tds & 0xF)
            if frame.get("lossless"):
                sel = seg[1 + 2 * ns]  # Ss = predictor selector 1..7
                pt = seg[3 + 2 * ns] & 0xF  # Al = point transform
                return _decode_lossless(
                    payload, pos + seg_len, frame, scan, htabs, ri, sel, pt
                )
            return _decode_scan(payload, pos + seg_len, frame, scan, qtabs, htabs, ri)
        pos += seg_len
    raise ValueError("no scan (SOS) found")


def _sub_geometry(comps):
    """(sub, hmax, vmax) for a frame's components — shared by the
    baseline and progressive paths so geometry support can't drift."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        if (comps[0]["h"], comps[0]["v"]) != (1, 1):
            raise NotImplementedError("grayscale sampling factors must be 1x1")
        sub = "gray"
    elif len(comps) == 3:
        factors = [(c["h"], c["v"]) for c in comps]
        if factors == [(1, 1), (1, 1), (1, 1)]:
            sub = "444"
        elif factors == [(2, 2), (1, 1), (1, 1)]:
            sub = "420"
        elif factors == [(2, 1), (1, 1), (1, 1)]:
            sub = "422"  # r10: half-width chroma, full-height
        else:
            raise NotImplementedError(f"subsampling geometry {factors} not supported")
    else:
        raise NotImplementedError(f"{len(comps)}-component scans not supported")
    return sub, hmax, vmax


def _planes_to_stats(h, w, comps, planes, sub, hmax, vmax) -> dict:
    """Crop decoded planes to nominal size, upsample chroma, convert to
    RGB, and emit the stats dict — the shared tail of the baseline and
    progressive decoders."""
    crops = []
    for c, plane in zip(comps, planes):
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        crops.append(plane[:ch, :cw])

    yp = crops[0]
    out = {
        "format": "jpeg",
        "width": w,
        "height": h,
        "subsampling": sub,
        "n_pixels": int(w) * int(h),
        "sum_y": int(yp.sum()),
        "sum_cb": int(crops[1].sum()) if len(crops) == 3 else 0,
        "sum_cr": int(crops[2].sum()) if len(crops) == 3 else 0,
    }
    if len(crops) == 1:
        out["sum_r"] = out["sum_g"] = out["sum_b"] = out["sum_y"]
        out["planes"] = crops
        return out
    cbp, crp = crops[1], crops[2]
    if sub == "420":
        cbp = cbp.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
        crp = crp.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
    elif sub == "422":  # half-width only: replicate horizontally
        cbp = cbp.repeat(2, axis=1)[:h, :w]
        crp = crp.repeat(2, axis=1)[:h, :w]
    yf = yp.astype(np.float64)
    cbf = cbp.astype(np.float64) - 128.0
    crf = crp.astype(np.float64) - 128.0
    # floor(x + 0.5) rounding — the formula the DuckDB oracle mirrors
    r = np.clip(np.floor(yf + 1.402 * crf + 0.5), 0, 255)
    g = np.clip(np.floor(yf - 0.344136 * cbf - 0.714136 * crf + 0.5), 0, 255)
    b = np.clip(np.floor(yf + 1.772 * cbf + 0.5), 0, 255)
    out["sum_r"] = int(r.sum())
    out["sum_g"] = int(g.sum())
    out["sum_b"] = int(b.sum())
    out["planes"] = crops
    return out


def _decode_scan(payload, pos, frame, scan, qtabs, htabs, ri: int = 0) -> dict:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    sub, hmax, vmax = _sub_geometry(comps)

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.int32))

    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_i and mcu_i % ri == 0:
                reader.restart((mcu_i // ri - 1) % 8)
                preds = [0] * len(comps)
            mcu_i += 1
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_t, ac_t = htabs[(0, td)], htabs[(1, ta)]
                q = qtabs[c["tq"]]
                for sy in range(c["v"]):
                    for sx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        ssss = _decode_huff(reader, dc_t)
                        diff = _extend(reader.bits(ssss), ssss) if ssss else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q
                        blk = _M.T @ coef.reshape(8, 8) @ _M
                        px = np.clip(np.floor(blk + 128.0 + 0.5), 0, 255).astype(
                            np.int32
                        )
                        y0 = (my * c["v"] + sy) * 8
                        x0 = (mx * c["h"] + sx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px

    return _planes_to_stats(h, w, comps, planes, sub, hmax, vmax)


LOSSLESS_DC_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    list(range(17)),
)  # 17 difference categories (SSSS 0..16) for the lossless process


def _ll_predict(plane, yy: int, xx: int, sel: int, default: int) -> int:
    """T.81 H.1.2: prediction for the lossless process. First sample
    uses 2^(P-Pt-1); the rest of the first line predicts from Ra
    (left); the first column predicts from Rb (above); elsewhere the
    scan-selected predictor 1..7 over (Ra, Rb, Rc). >> is the
    arithmetic shift the spec (and libjpeg) uses."""
    if yy == 0 and xx == 0:
        return default
    if yy == 0:
        return int(plane[0, xx - 1])
    if xx == 0:
        return int(plane[yy - 1, 0])
    ra, rb, rc = int(plane[yy, xx - 1]), int(plane[yy - 1, xx]), int(plane[yy - 1, xx - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"lossless predictor selector {sel} (1..7)")


def _decode_lossless(payload, pos, frame, scan, htabs, ri: int, sel: int,
                     pt: int) -> dict:
    """SOF3 lossless sequential (T.81 Annex H): Huffman-coded
    prediction differences, no DCT/quantization — bit-exact samples at
    2..16-bit precision. Supports 1- and 3-component scans with 1x1
    sampling; components pass through UNTRANSFORMED (the lossless
    process defines no color transform), so sum_r/g/b are the raw
    component sums. CONVENTION: for Pt > 0 streams the reconstructed
    samples are the POINT-TRANSFORMED (right-shifted) values, NOT
    re-scaled by 2^Pt as T.81's output stage suggests — the dict
    exposes ``point_transform`` so consumers can multiply sums by
    ``1 << point_transform`` to recover nominal-range magnitudes.
    Restart intervals refuse loudly (predictor re-init across RST
    boundaries is not wired)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    prec = frame["prec"]
    if ri:
        raise NotImplementedError("lossless restart intervals (DRI > 0)")
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"lossless with {len(comps)} components")
    for c in comps:
        if c["h"] != 1 or c["v"] != 1:
            raise NotImplementedError("lossless sampling factors must be 1x1")
    planes = [np.zeros((h, w), dtype=np.int64) for _ in comps]
    tables = [htabs[(0, scan[c["id"]][0])] for c in comps]
    reader = _BitReader(payload, pos)
    default = 1 << (prec - pt - 1)
    for yy in range(h):
        for xx in range(w):
            for ci, plane in enumerate(planes):
                ssss = _decode_huff(reader, tables[ci])
                if ssss == 16:  # T.81 H.2: 32768 with no extra bits
                    diff = 32768
                elif ssss:
                    diff = _extend(reader.bits(ssss), ssss)
                else:
                    diff = 0
                pred = _ll_predict(plane, yy, xx, sel, default)
                plane[yy, xx] = (pred + diff) & 0xFFFF  # mod 2^16 (H.1.2.1)
    sums = [int(pl.sum()) for pl in planes]
    gray = len(planes) == 1
    return {
        "format": "jpeg_lossless",
        "width": w,
        "height": h,
        "subsampling": "lossless",
        "n_pixels": int(w) * int(h),
        "precision": prec,
        "predictor": sel,
        "point_transform": pt,
        "sum_y": sums[0],
        "sum_cb": 0 if gray else sums[1],
        "sum_cr": 0 if gray else sums[2],
        "sum_r": sums[0],
        "sum_g": sums[0] if gray else sums[1],
        "sum_b": sums[0] if gray else sums[2],
        "planes": planes,
    }


def encode_jpeg_lossless(planes, predictor: int = 1, precision: int = 8,
                         point_transform: int = 0) -> bytes:
    """Lossless JPEG (SOF3) from 1 or 3 full-resolution sample planes
    (2-D arrays, values < 2^precision). The inverse of
    _decode_lossless: per-sample prediction (T.81 H.1.2), differences
    mod 2^16 mapped to SSSS categories (16 = the no-extra-bits 32768
    case), one 17-symbol DC-style Huffman table shared by all
    components. point_transform > 0 right-shifts inputs by Pt before
    coding (the decoder reconstructs the shifted samples)."""
    if not isinstance(planes, (list, tuple)):
        planes = [planes]
    planes = [np.asarray(pl, dtype=np.int64) for pl in planes]
    if len(planes) not in (1, 3):
        raise ValueError("1 (gray) or 3 component planes")
    h, w = planes[0].shape
    if any(pl.shape != (h, w) for pl in planes):
        raise ValueError("all planes must share one shape")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if any(int(pl.max(initial=0)) >= (1 << precision) for pl in planes):
        raise ValueError(f"sample exceeds {precision}-bit range")
    coded = [pl >> point_transform for pl in planes]

    out = bytearray(b"\xff\xd8")  # SOI
    ncomp = len(planes)
    sof = bytearray(struct.pack(">BHHB", precision, h, w, ncomp))
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, LOSSLESS_DC_SPEC)
    sos = bytearray([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([predictor, 0, point_transform & 0xF])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)

    codes = _canonical_codes(*LOSSLESS_DC_SPEC)
    wtr = _BitWriter()
    default = 1 << (precision - point_transform - 1)
    rec = [np.zeros((h, w), dtype=np.int64) for _ in coded]
    for yy in range(h):
        for xx in range(w):
            for pl, rp in zip(coded, rec):
                pred = _ll_predict(rp, yy, xx, predictor, default)
                diff = (int(pl[yy, xx]) - pred) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                rp[yy, xx] = (pred + diff) & 0xFFFF
                if diff == -32768:
                    code, length = codes[16]
                    wtr.put(code, length)
                    continue
                ssss = _category(diff)
                code, length = codes[ssss]
                wtr.put(code, length)
                if ssss:
                    wtr.put(_value_bits(diff, ssss), ssss)
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _next_marker(payload: bytes, pos: int) -> int:
    """Advance from inside/at the end of entropy data to the next real
    marker (skipping stuffed 0x00 and RSTn)."""
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00,) and not (
            0xD0 <= payload[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    raise ValueError("ran off the end of JPEG entropy data")


def _decode_progressive(payload, pos, frame, qtabs, htabs, ri: int) -> dict:
    """Progressive DCT decode (SOF2, T.81 §G — r10, the last named JPEG
    refusal): coefficients accumulate across MANY scans, each carrying
    a spectral band [Ss, Se] and successive-approximation bit position
    (Ah → Al). DC scans may interleave all components in MCU order; AC
    scans are single-component over the non-interleaved block grid.
    First passes (Ah=0) Huffman-decode magnitudes shifted left by Al;
    refinement passes (Ah>0) add one bit of precision per coefficient
    — newly-significant coefficients arrive as ±1<<Al, already-nonzero
    ones consume correction bits, and EOB runs span blocks. After the
    walk hits EOI, every component dequantizes and inverse-transforms
    exactly like the baseline path (shared _planes_to_stats tail).
    ``pos`` points at the first SOS marker; DHT/DQT/DRI between scans
    are honored; RSTn inside scans reset predictors and the EOB run."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    sub, hmax, vmax = _sub_geometry(comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # MCU-padded coefficient store per component (zigzag order);
    # non-interleaved scans cover the unpadded prefix grid
    coefs = []
    nonint_dims = []
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        coefs.append(np.zeros((bh, bw, 64), dtype=np.int32))
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        nonint_dims.append((-(-ch // 8), -(-cw // 8)))
    by_id = {c["id"]: i for i, c in enumerate(comps)}

    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xC4:  # DHT between scans
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17:p + 17 + nvals])
                table = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = values[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tc, th)] = table
                p += 17 + nvals
        elif marker == 0xDB:
            p = 0
            _parse_dqt(seg, qtabs)
        elif marker == 0xDD:
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append((by_id[cs], tds >> 4, tds & 0xF))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos = _decode_prog_scan(
                payload, pos + seg_len, frame, comps, coefs, nonint_dims,
                scomps, ss, se, ah, al, qtabs, htabs, ri, mcus_x, mcus_y,
            )
            continue
        pos += seg_len

    # dequantize + IDCT every block (one batched matmul per component,
    # r12 verdict #9), then the shared reconstruction
    planes = [_idct_grid(cf, qtabs[c["tq"]]) for c, cf in zip(comps, coefs)]
    return _planes_to_stats(h, w, comps, planes, sub, hmax, vmax)


def _decode_prog_scan(
    payload, pos, frame, comps, coefs, nonint_dims, scomps, ss, se, ah, al,
    qtabs, htabs, ri, mcus_x, mcus_y,
) -> int:
    """Decode ONE progressive scan's entropy data; returns the offset
    of the next marker. DC scans (ss == 0) may interleave components;
    AC scans (ss > 0) cover one component's non-interleaved grid."""
    if ss == 0 and se != 0:
        raise ValueError(
            "progressive scan with Ss=0 must have Se=0 (DC scans carry "
            "no AC band) — T.81 §G.1"
        )
    if ah and ah != al + 1:
        raise ValueError(f"successive approximation must step by 1 bit (Ah={ah}, Al={al})")
    reader = _BitReader(payload, pos)
    eobrun = 0
    preds = [0] * len(comps)

    def dc_first(ci, blk, td):
        ssss = _decode_huff(reader, htabs[(0, td)])
        diff = _extend(reader.bits(ssss), ssss) if ssss else 0
        preds[ci] += diff
        blk[0] = preds[ci] << al

    def dc_refine(blk):
        if reader.bit():
            blk[0] |= 1 << al

    def ac_first(blk, ta):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_huff(reader, htabs[(1, ta)])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run overflows the spectral band")
            blk[k] = _extend(reader.bits(s), s) << al
            k += 1

    def ac_refine(blk, ta):
        # T.81 §G.1.2.3 correction-bit algorithm (the hard one): new
        # coefficients arrive as ±1<<al; every already-nonzero
        # coefficient passed on the way consumes one correction bit
        nonlocal eobrun
        p1, m1 = 1 << al, -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff(reader, htabs[(1, ta)])
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        # total run INCLUDING this block; the tail
                        # correction loop below consumes this block's
                        # remaining bits and decrements
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.bits(r)
                        break
                    # r == 15: pass 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("AC refinement magnitude must be 1")
                    val = p1 if reader.bit() else m1
                while k <= se:
                    if blk[k]:
                        if reader.bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k]:
                    if reader.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            eobrun -= 1

    def restart(unit_i):
        nonlocal eobrun, preds
        if ri and unit_i and unit_i % ri == 0:
            reader.restart((unit_i // ri - 1) % 8)
            preds = [0] * len(comps)
            eobrun = 0

    if ss == 0:  # DC scan, possibly interleaved
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                restart(unit)
                unit += 1
                for ci, td, _ta in scomps:
                    c = comps[ci]
                    for sy in range(c["v"]):
                        for sx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + sy, mx * c["h"] + sx]
                            if ah == 0:
                                dc_first(ci, blk, td)
                            else:
                                dc_refine(blk)
    else:  # AC scan: exactly one component, non-interleaved grid
        if len(scomps) != 1:
            raise ValueError("progressive AC scans must be single-component")
        ci, _td, ta = scomps[0]
        bh, bw = nonint_dims[ci]
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                restart(unit)
                unit += 1
                blk = coefs[ci][by, bx]
                if ah == 0:
                    ac_first(blk, ta)
                else:
                    ac_refine(blk, ta)

    return _next_marker(payload, reader.pos)


def _quantize_block(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization to a zigzag-order int32 vector — the
    shared front half of the baseline and progressive encoders."""
    coef = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    flat = coef.reshape(64)[ZIGZAG]
    scaled = flat / q
    return np.where(
        scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
    ).astype(np.int32)


def _quantize_grid(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All of a plane's 8x8 blocks quantized in ONE batched matmul
    (r12 verdict #9: the per-block Python loop dominated the
    progressive fixture synth). Returns the (bh, bw, 64) zigzag grid,
    element-for-element identical to _quantize_block per block: the
    batched ``_M @ blocks @ _M.T`` runs the same dgemm per 8x8 slab,
    and the round-half-away-from-zero is the same vectorized
    where/floor/ceil — pinned by tests/test_jpeg.py's grid-vs-block
    equality on random planes."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        (plane.astype(np.float64) - 128.0)
        .reshape(bh, 8, bw, 8)
        .transpose(0, 2, 1, 3)
    )
    coef = _M @ blocks @ _M.T
    flat = coef.reshape(bh, bw, 64)[:, :, ZIGZAG]
    scaled = flat / q
    return np.where(
        scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
    ).astype(np.int32)


def _idct_grid(cf: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Dequantize + inverse-transform a whole (bh, bw, 64) zigzag
    coefficient grid in one batched matmul, returning the (bh*8, bw*8)
    int32 pixel plane — the vectorized twin of the progressive tail's
    per-block loop, same clip(floor(x + 128.5)) arithmetic."""
    bh, bw = cf.shape[0], cf.shape[1]
    coef = np.zeros((bh, bw, 64), dtype=np.float64)
    coef[:, :, ZIGZAG] = cf * q
    blocks = _M.T @ coef.reshape(bh, bw, 8, 8) @ _M
    px = np.clip(np.floor(blocks + 128.0 + 0.5), 0, 255).astype(np.int32)
    return px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


def _pt(v: int, al: int) -> int:
    """AC point transform: divide by 2^al truncating toward ZERO (DC
    uses a plain arithmetic shift instead — T.81 A.4)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def encode_jpeg_progressive(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    quality: int = 100,
    subsampling: str = "444",
) -> bytes:
    """Progressive JPEG (SOF2) writer — the fixture synthesizer for the
    progressive decode leg (r10). Emits a libjpeg-style scan script
    exercising EVERY progressive decode path: DC first at Al=1 →
    banded AC first passes at Al>0 (spectral selection + EOB runs) →
    DC refinement → chained AC refinements down to Al=0 (new ±1
    coefficients, correction bits, EOB-run corrections). Per-block EOB
    emission (no cross-block run accumulation) keeps the writer simple
    — decoders must accept it, and the stream is bit-exact recoverable:
    after all scans every coefficient equals the baseline quantized
    value, so block-constant quality-100 fixtures stay DC-exact and
    ORACLE-CHECKABLE exactly like the sequential path. Geometry and
    plane rules match encode_jpeg (gray/444/420/422)."""
    h, w = y.shape
    color = cb is not None
    if color and (cr is None or cb.shape != cr.shape):
        raise ValueError("cb/cr must both be given with identical shapes")
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if not color or subsampling == "444":
        mcu_h = mcu_w = 8
    elif subsampling == "420":
        mcu_h = mcu_w = 16
    else:
        mcu_h, mcu_w = 8, 16
    if h % mcu_h or w % mcu_w:
        raise ValueError(f"dims must be multiples of {mcu_w}x{mcu_h} for {subsampling}")
    sampling = {"420": (2, 2), "422": (2, 1)}.get(subsampling if color else "", (1, 1))
    fh, fv = sampling
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    dcl = _canonical_codes(*DC_LUMA_SPEC)
    acl = _canonical_codes(*AC_LUMA_SPEC)
    dcc = _canonical_codes(*DC_CHROMA_SPEC)
    acc = _canonical_codes(*AC_CHROMA_SPEC)

    # quantize every block up front, per component, in block-grid order
    mcus_x, mcus_y = w // mcu_w, h // mcu_h
    planes = [(y, ql, fh, fv)]
    if color:
        planes += [(cb, qc, 1, 1), (cr, qc, 1, 1)]
    zz = []  # per component: (bh, bw) grid of 64-vectors
    for plane, q, ch_, cv_ in planes:
        zz.append(_quantize_grid(plane, q))

    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, ql)
    if color:
        out += _dqt_segment(1, qc)
    ncomp = 3 if color else 1
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    sof += bytes([1, (fh << 4) | fv, 0])
    if color:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, DC_LUMA_SPEC)
    out += _dht_segment(1, 0, AC_LUMA_SPEC)
    if color:
        out += _dht_segment(0, 1, DC_CHROMA_SPEC)
        out += _dht_segment(1, 1, AC_CHROMA_SPEC)

    all_comps = list(range(ncomp))
    script = [(all_comps, 0, 0, 0, 1)]  # DC first, Al=1
    script += [([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2)]  # luma AC first, banded
    if color:
        script += [([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1)]
    script += [(all_comps, 0, 0, 1, 0)]  # DC refine
    script += [([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)]  # luma AC refine chain
    if color:
        script += [([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0)]

    for scomps, ss, se, ah, al in script:
        sos = bytearray([len(scomps)])
        for ci in scomps:
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)
        wtr = _BitWriter()
        if ss == 0 and ah == 0:  # DC first: interleaved MCU order
            preds = [0] * ncomp
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci in scomps:
                        dc = dcl if ci == 0 else dcc
                        ch_ = fh if ci == 0 else 1
                        cv_ = fv if ci == 0 else 1
                        for sy in range(cv_):
                            for sx in range(ch_):
                                v = int(zz[ci][my * cv_ + sy, mx * ch_ + sx][0]) >> al
                                diff = v - preds[ci]
                                preds[ci] = v
                                ssss = _category(diff)
                                code, ln = dc[ssss]
                                wtr.put(code, ln)
                                if ssss:
                                    wtr.put(_value_bits(diff, ssss), ssss)
        elif ss == 0:  # DC refine: one bit per block, MCU order
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci in scomps:
                        ch_ = fh if ci == 0 else 1
                        cv_ = fv if ci == 0 else 1
                        for sy in range(cv_):
                            for sx in range(ch_):
                                v = int(zz[ci][my * cv_ + sy, mx * ch_ + sx][0])
                                wtr.put((v >> al) & 1, 1)
        else:
            ci = scomps[0]
            ac = acl if ci == 0 else acc
            grid = zz[ci]
            # the whole scan's point-transformed magnitudes in one
            # vectorized pass (r12 verdict #9): blocks are mostly
            # zeros, so each block's walk touches only its nonzero
            # positions instead of all se-ss+1 coefficients — the
            # emitted bitstream is IDENTICAL to the per-coefficient
            # walk (runs between nonzeros are the index gaps)
            band = grid[:, :, ss:se + 1]
            mags_all = np.abs(band) >> al
            blen = se - ss + 1
            for by in range(grid.shape[0]):
                for bx in range(grid.shape[1]):
                    blk = band[by, bx]
                    mags = mags_all[by, bx]
                    nz = np.flatnonzero(mags)
                    if ah == 0:  # AC first pass at this precision
                        prev = -1
                        for idx in nz:
                            r = idx - prev - 1
                            prev = idx
                            t = _pt(int(blk[idx]), al)
                            while r > 15:
                                c, ln = ac[0xF0]
                                wtr.put(c, ln)
                                r -= 16
                            s = _category(t)
                            c, ln = ac[(r << 4) | s]
                            wtr.put(c, ln)
                            wtr.put(_value_bits(t, s), s)
                        if prev < blen - 1:
                            c, ln = ac[0x00]  # EOB0: this block only
                            wtr.put(c, ln)
                    else:  # AC refinement: ah -> al
                        r = 0
                        prev = -1
                        pending: list[int] = []
                        for idx in nz:
                            r += idx - prev - 1
                            prev = idx
                            mag = int(mags[idx])
                            # ZRL flush BEFORE buffering this position's
                            # correction bit: the decoder's ZRL walk only
                            # consumes bits for nonzero-history positions
                            # it actually passes (before its 16th zero)
                            while r > 15:
                                c, ln = ac[0xF0]
                                wtr.put(c, ln)
                                for b in pending:
                                    wtr.put(b, 1)
                                pending = []
                                r -= 16
                            if mag > 1:  # already significant: 1 bit
                                pending.append(mag & 1)
                                continue
                            c, ln = ac[(r << 4) | 1]
                            wtr.put(c, ln)
                            wtr.put(1 if int(blk[idx]) > 0 else 0, 1)
                            for b in pending:
                                wtr.put(b, 1)
                            pending = []
                            r = 0
                        r += blen - 1 - prev
                        if r or pending:
                            c, ln = ac[0x00]
                            wtr.put(c, ln)
                            for b in pending:
                                wtr.put(b, 1)
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)
