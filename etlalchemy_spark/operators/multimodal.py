"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Mandated extension surface (BASELINE.json): image/audio/video are
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas functions over
``mapInPandas``. Formats whose byte layout is decodable with the
stdlib decode for REAL — WAV/PCM-16 (``decode_wav``), 24-bit BMP
(``decode_bmp``), binary PPM (``decode_ppm``), and since r8 PNG
(``decode_png`` — zlib inflate + full five-filter scanline
unfiltering; PNG's "compression" is stdlib zlib, so it never needed an
external codec) — producing genuine per-asset stats (duration, sample
rate, amplitude; dimensions, channel sums) — GIF (pure-python LZW),
IMA ADPCM audio, and uncompressed-AVI frame sampling joined the
native set later in r8. Only codecs with non-stdlib compression
(JPEG/WEBP images, mu-law/MP3 audio, compressed video) remain
``NotImplementedError``: their libraries aren't in this container
(SURVEY.md environment), and the router raises with the sniffed
format so the boundary is explicit.

Scale shape: mapInPandas streams Arrow batches partition-local — no
shuffle, no driver traffic; exactly how a real decoder would run over
100 TB of media (payload column pruned unless required, metadata-only
queries never touch bytes).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = "payload binary, meta struct<mime:string,n_bytes:bigint,source:string>"


def attach_payload(df: DataFrame, id_col: str, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Wrap a column as the multimodal convention: (id, payload binary,
    meta struct). With real media, payload comes from
    ``spark.read.format('binaryFile')`` and meta from the file catalog."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.lit("fixture").alias("source"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Real stdlib-only decoders: WAV/PCM, BMP, PPM (uncompressed), PNG
# (zlib), GIF (pure-python LZW), IMA ADPCM, uncompressed-AVI frames.
# Codecs needing non-stdlib libraries (JPEG/WEBP/mu-law/MP3/compressed
# video) — and only those — remain NotImplementedError.
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> dict:
    """Stats-level WAV decode: `decode_wav_samples` minus the sample
    array — the summary shape `wav_stats` emits per asset."""
    meta, _ = decode_wav_samples(payload)
    return meta


def decode_wav_samples(payload: bytes):
    """Decode a RIFF/WAVE container with 16-bit LE PCM samples —
    stdlib ``struct`` + numpy only, no codec library. Returns
    (meta, samples) where samples is the int64 array (interleaved if
    multi-channel) for operators that need the waveform itself
    (autocorrelation pitch, spectral features), not just the stats.

    Walks the chunk list (tolerating extra chunks like LIST),
    parses the fmt chunk, and materializes the sample array. Format
    tag 1 (integer PCM, 16-bit) and 17 (mono IMA ADPCM — r8, pure
    table arithmetic) decode natively; formats needing a non-stdlib
    codec (mu-law, MP3-in-WAV, ...) raise NotImplementedError — the
    genuine container boundary. For ADPCM the 'fact' chunk's true
    sample count truncates the final block's nibble padding (padding
    samples are NOT silence — each moves the predictor — so counting
    them would inflate duration and amplitude stats; r8 review)."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact_samples = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            fact_samples = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format == 17:  # IMA ADPCM — pure table arithmetic (r8)
        decoded: list[int] = []
        for off in range(0, len(data) - 3, block_align):
            block = data[off : off + block_align]
            if n_channels == 1:
                decoded.extend(_ima_decode_block(block))
            elif n_channels == 2:  # r9: stereo — per-channel state,
                # data interleaved in 4-byte (8-nibble) groups
                left, right = _ima_decode_block_stereo(block)
                for l_s, r_s in zip(left, right):
                    decoded.append(l_s)
                    decoded.append(r_s)
            else:
                raise NotImplementedError(
                    f"{n_channels}-channel IMA ADPCM not implemented (1/2 only)"
                )
        if fact_samples is not None:
            decoded = decoded[: fact_samples * n_channels]
        samples = np.asarray(decoded, dtype=np.int64)
    elif audio_format == 7:  # G.711 mu-law — a pure 8-bit table (r9)
        samples = _mulaw_decode_bytes(data)
    elif audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} is compressed with a "
            "non-stdlib codec; PCM (1), mu-law (7), and IMA ADPCM (17) "
            "decode natively"
        )
    else:
        if bits != 16:
            raise NotImplementedError(f"only 16-bit PCM implemented, got {bits}")
        samples = np.frombuffer(data, dtype="<i2")
    n_frames = len(samples) // n_channels
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": n_frames,
        "duration_us": n_frames * 1_000_000 // sample_rate,
        "sum_abs_amplitude": int(np.abs(samples.astype(np.int64)).sum()),
        "peak_amplitude": int(np.abs(samples.astype(np.int64)).max()) if len(samples) else 0,
    }, samples.astype(np.int64)


_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8] * 2
_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM state update (shared by encode and decode so the
    two can never drift): returns (new_pred, new_index)."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble]))
    return pred, index


def _ima_decode_block(block: bytes) -> list[int]:
    """Decode one mono IMA ADPCM block: 4-byte header (predictor int16
    LE = sample 0, step index uint8, reserved) + 2 samples/byte, low
    nibble first."""
    import struct

    pred, index = struct.unpack_from("<hB", block, 0)[0], block[2]
    index = max(0, min(88, index))
    out = [pred]
    for byte in block[4:]:
        for nibble in (byte & 0x0F, byte >> 4):
            pred, index = _ima_step(pred, index, nibble)
            out.append(pred)
    return out


def _ima_decode_block_stereo(block: bytes) -> tuple[list[int], list[int]]:
    """Decode one STEREO IMA ADPCM block (r9): two 4-byte channel
    headers (left, right), then nibble data interleaved in 4-byte
    groups per channel (8 left samples, 8 right samples, ...). Each
    channel carries its own (predictor, step-index) state through the
    SAME _ima_step as mono — the layout is the only difference."""
    import struct

    lp, li = struct.unpack_from("<hB", block, 0)[0], max(0, min(88, block[2]))
    rp, ri = struct.unpack_from("<hB", block, 4)[0], max(0, min(88, block[6]))
    left, right = [lp], [rp]
    body = block[8:]
    for g in range(0, len(body) - 7, 8):
        for byte in body[g : g + 4]:
            for nibble in (byte & 0x0F, byte >> 4):
                lp, li = _ima_step(lp, li, nibble)
                left.append(lp)
        for byte in body[g + 4 : g + 8]:
            for nibble in (byte & 0x0F, byte >> 4):
                rp, ri = _ima_step(rp, ri, nibble)
                right.append(rp)
    return left, right


def encode_wav_ima_adpcm_stereo(
    left, right, sample_rate: int, block_align: int = 264
) -> bytes:
    """STEREO IMA ADPCM (format 17, 2 channels) writer — the fixture
    synthesizer for the stereo decode leg. block_align must satisfy
    (block_align - 8) % 8 == 0; samples per channel per block =
    (block_align - 8) // 4 + 1."""
    import struct

    import numpy as np

    if (block_align - 8) % 8:
        raise ValueError("stereo block_align must be 8 + multiple of 8")
    lpcm = [int(x) for x in np.asarray(left, dtype="<i2")]
    rpcm = [int(x) for x in np.asarray(right, dtype="<i2")]
    if len(lpcm) != len(rpcm):
        raise ValueError("left/right must be equal length")
    # (block_align - 8) data bytes split evenly between channels, two
    # nibbles per byte, plus the header sample
    spb = (block_align - 8) + 1  # samples per CHANNEL per block

    def _enc_channel(chunk: list[int], index: int) -> tuple[list[int], int, int]:
        pred = chunk[0]
        head_pred = pred
        nibbles = []
        for s in chunk[1:]:
            step = _IMA_STEP_TABLE[index]
            diff = s - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, index = _ima_step(pred, index, nib)
            nibbles.append(nib)
        while len(nibbles) < spb - 1:
            nibbles.append(0)
        return nibbles, head_pred, index

    blocks = bytearray()
    li = ri = 0
    i = 0
    while i < len(lpcm):
        lc, rc = lpcm[i : i + spb], rpcm[i : i + spb]
        i += spb
        li0, ri0 = li, ri  # header carries the BLOCK-START step index
        ln, lh, li = _enc_channel(lc, li)
        rn, rh, ri = _enc_channel(rc, ri)
        blocks += struct.pack("<hBB", lh, li0, 0) + struct.pack("<hBB", rh, ri0, 0)
        for g in range(0, len(ln), 8):
            for ch in (ln, rn):
                grp = ch[g : g + 8] + [0] * max(0, 8 - len(ch[g : g + 8]))
                for lo, hi in zip(grp[0::2], grp[1::2]):
                    blocks.append(lo | (hi << 4))
    data = bytes(blocks)
    byte_rate = sample_rate * block_align // spb
    fmt = b"fmt " + struct.pack(
        "<IHHIIHHHH", 20, 17, 2, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = b"fact" + struct.pack("<II", 4, len(lpcm))
    hdr = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(fact) + 8 + len(data)) + b"WAVE"
    return hdr + fmt + fact + b"data" + struct.pack("<I", len(data)) + data


def mulaw_decode_byte(b: int) -> int:
    """G.711 mu-law expansion of one encoded byte — pure integer
    formula (ITU G.711, public): complement, split sign/exponent/
    mantissa, rebuild magnitude around the 0x84 bias. The DuckDB
    oracle replicates this exact arithmetic with // and % — the whole
    point of closing this 'codec': it was never a codec, just a
    table."""
    u = ~b & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return -magnitude if sign else magnitude


def _mulaw_decode_bytes(data: bytes):
    import numpy as np

    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    u = 255 - b
    sign = u >> 7
    exponent = (u >> 4) & 7
    mantissa = u & 15
    magnitude = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(sign == 1, -magnitude, magnitude)


def mulaw_encode_sample(s: int) -> int:
    """G.711 mu-law compression of one int16 sample (bias 0x84, clip
    32635) — the fixture synthesizer's inverse of mulaw_decode_byte."""
    sign = 0x80 if s < 0 else 0
    s = min(abs(s), 32635) + 0x84
    exponent = s.bit_length() - 8  # top bit position above the mantissa
    mantissa = (s >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def encode_wav_mulaw(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """Mono/stereo G.711 mu-law WAV (format tag 7) writer. ``samples``
    is the interleaved int16 stream."""
    import struct

    import numpy as np

    pcm = [int(x) for x in np.asarray(samples, dtype="<i2")]
    data = bytes(mulaw_encode_sample(s) for s in pcm)
    byte_rate = sample_rate * n_channels
    fmt = b"fmt " + struct.pack(
        "<IHHIIHHH", 18, 7, n_channels, sample_rate, byte_rate, n_channels, 8, 0
    )
    fact = b"fact" + struct.pack("<II", 4, len(pcm) // n_channels)
    hdr = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(fact) + 8 + len(data)) + b"WAVE"
    return hdr + fmt + fact + b"data" + struct.pack("<I", len(data)) + data


def encode_wav_ima_adpcm(samples, sample_rate: int, block_align: int = 256) -> bytes:
    """Mono IMA ADPCM (WAV format tag 17) writer — the lossy-audio
    fixture synthesizer for decode_wav's ADPCM leg. Each block:
    4-byte header (current predictor = block's sample 0, step index)
    + quantized 4-bit deltas, encoder state advanced with the SAME
    _ima_step the decoder uses. Trailing nibbles of the last block pad
    with 0 (decoders emit the padding as trailing samples — standard
    for the format; 'fact' chunk carries the true count)."""
    import struct

    import numpy as np

    pcm = [int(x) for x in np.asarray(samples, dtype="<i2")]
    spb = (block_align - 4) * 2 + 1  # samples per block incl. header
    blocks = bytearray()
    index = 0
    i = 0
    while i < len(pcm):
        chunk = pcm[i : i + spb]
        i += spb
        pred = chunk[0]
        blocks += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = _IMA_STEP_TABLE[index]
            diff = s - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, index = _ima_step(pred, index, nib)
            nibbles.append(nib)
        while len(nibbles) < spb - 1:  # pad the final block
            nibbles.append(0)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))
    data = bytes(blocks)
    byte_rate = sample_rate * block_align // spb
    fmt = b"fmt " + struct.pack(
        "<IHHIIHHHH", 20, 17, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = b"fact" + struct.pack("<II", 4, len(pcm))
    hdr = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(fact) + 8 + len(data)) + b"WAVE"
    return hdr + fmt + fact + b"data" + struct.pack("<I", len(data)) + data


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """Minimal mono 16-bit PCM WAV writer (the fixture synthesizer for
    decode_wav's round-trip; also what a real pipeline's resampler
    would emit). ``samples`` is any int16-coercible numpy array."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


def _dib_rows(payload: bytes, offset: int, width: int, height: int, top_down: bool = False):
    """(h, w, 3) BGR raster from a 24-bit DIB pixel array (4-byte
    padded rows, bottom-up unless ``top_down``) — THE raster reader
    shared by BMP and AVI so the two contracts can never drift (r8
    review)."""
    import numpy as np

    stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = [
        np.frombuffer(
            payload, dtype=np.uint8, count=width * 3, offset=offset + y * stride
        ).reshape(width, 3)
        for y in range(height)
    ]
    if not top_down:
        rows.reverse()  # bottom-up storage → natural top-down order
    return np.stack(rows) if rows else np.zeros((0, 0, 3), np.uint8)


def _dib_body(frame) -> bytes:
    """Bottom-up 4-byte-padded BGR bytes from an (h, w, 3) RGB uint8
    frame — the writer twin of _dib_rows, shared by BMP and AVI."""
    import numpy as np

    px = np.asarray(frame, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (stride - len(row))
    return bytes(body)


def decode_bmp(payload: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER): header
    fields + per-channel pixel sums. Rows are stored bottom-up,
    BGR-ordered, padded to 4-byte boundaries — all handled here; any
    BI_RLE/BI_PNG compression raises NotImplementedError."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER variant not implemented")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    top_down = height < 0
    height = abs(height)
    if compression == 1:  # BI_RLE8 (r11): the compressed-BMP norm
        if bpp != 8:
            raise ValueError(f"BI_RLE8 requires 8-bit pixels, got {bpp}")
        if top_down:
            raise ValueError("BI_RLE8 is bottom-up by spec (negative height)")
        clr_used = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = [
            struct.unpack_from("<BBBB", payload, 14 + hdr_size + 4 * i)
            for i in range(clr_used)
        ]  # (B, G, R, reserved)
        idx = _bmp_rle8_decode(payload[data_offset:], width, height)
        sum_r = sum(pal[v][2] for row in idx for v in row)
        sum_g = sum(pal[v][1] for row in idx for v in row)
        sum_b = sum(pal[v][0] for row in idx for v in row)
        return {
            "format": "bmp",
            "width": width,
            "height": height,
            "n_pixels": width * height,
            "sum_r": sum_r,
            "sum_g": sum_g,
            "sum_b": sum_b,
        }
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} requires a codec; "
            "BI_RGB (0) and BI_RLE8 (1) decode"
        )
    if bpp != 24:
        raise NotImplementedError(f"only 24-bit BMP implemented, got {bpp}")
    px = _dib_rows(payload, data_offset, width, height, top_down=top_down)
    bgr = px.astype("int64")
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "sum_r": int(bgr[:, :, 2].sum()),  # BMP stores BGR
        "sum_g": int(bgr[:, :, 1].sum()),
        "sum_b": int(bgr[:, :, 0].sum()),
    }


def _bmp_rle8_decode(data: bytes, width: int, height: int) -> list[list[int]]:
    """BI_RLE8 (BMP spec): pairs (count, index) repeat; count == 0
    escapes — 0 = end of line, 1 = end of bitmap, 2 = delta (dx, dy
    skipped pixels read as index 0), n >= 3 = absolute run of n raw
    indices padded to a word boundary. Rows are bottom-up; returns
    top-down rows of palette indices."""
    rows = [[0] * width for _ in range(height)]
    x = y = i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            for _ in range(cnt):
                if x < width and y < height:
                    rows[y][x] = val
                x += 1
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("BI_RLE8: truncated delta escape")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: val raw indices, word-aligned
            if i + val > n:
                raise ValueError("BI_RLE8: truncated absolute run")
            for k in range(val):
                if x < width and y < height:
                    rows[y][x] = data[i + k]
                x += 1
            i += val + (val & 1)
    return rows[::-1]  # bottom-up storage -> top-down


def _bmp_rle8_encode(rows_idx: list[list[int]]) -> bytes:
    """RLE8 fixture writer: encoded runs for repeats >= 2, absolute
    mode for literal stretches (>= 3 per spec; shorter literals emit
    as 1-runs), end-of-line / end-of-bitmap escapes. Mirrors
    _bmp_rle8_decode so round trips exercise both modes."""
    out = bytearray()
    for row in rows_idx[::-1]:  # stored bottom-up
        x, w = 0, len(row)
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 2:
                out += bytes([run, row[x]])
                x += run
            else:
                lit_start = x
                x += 1
                while x < w and x - lit_start < 255:
                    run = 1
                    while x + run < w and run < 255 and row[x + run] == row[x]:
                        run += 1
                    if run >= 3:
                        break
                    x += run
                    if x - lit_start >= 255:
                        x = lit_start + 255
                        break
                lit = row[lit_start:x]
                if len(lit) >= 3:
                    out += bytes([0, len(lit)]) + bytes(lit)
                    if len(lit) & 1:
                        out += b"\x00"  # word alignment
                else:
                    for v in lit:
                        out += bytes([1, v])
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def encode_bmp_rle8(rows_idx: list[list[int]], palette: list[tuple]) -> bytes:
    """8-bit BI_RLE8 BMP writer: BITMAPINFOHEADER + BGRA palette +
    RLE8 stream (bottom-up). ``palette`` entries are (r, g, b)."""
    import struct

    h = len(rows_idx)
    w = len(rows_idx[0]) if h else 0
    body = _bmp_rle8_encode(rows_idx)
    pal = b"".join(struct.pack("<BBBB", b, g, r, 0) for (r, g, b) in palette)
    data_offset = 14 + 40 + len(pal)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(body), 2835, 2835, len(palette), 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", data_offset + len(body), 0, 0, data_offset)
    return hdr + info + pal + body


def encode_bmp_24(pixels) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer from an (h, w, 3) RGB uint8
    array (bottom-up rows, BGR, 4-byte padding — the format contract
    decode_bmp recovers)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    body = _dib_body(px)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + bytes(body)


def _ppm_raster(payload: bytes):
    """Parse a binary PPM (P6) into an (h, w, 3) int64 RGB raster:
    whitespace/comment-tolerant header (width, height, maxval) + raw
    samples. maxval > 255 (2-byte samples) raises NotImplementedError."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header tokens: P6, width, height, maxval — '#' comments legal
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    width, height, maxval = tokens
    if maxval > 65535 or maxval < 1:
        raise ValueError(f"PPM maxval {maxval} out of range")
    if maxval > 255:  # r10: 2-byte big-endian samples (PPM spec)
        px = np.frombuffer(payload, dtype=">u2", count=width * height * 3, offset=pos)
    else:
        px = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=pos)
    return px.reshape(height, width, 3).astype(np.int64)


def decode_image_pixels(payload: bytes):
    """Pixel-level decode for the uncompressed raster formats: BMP
    (``_dib_rows`` + BGR->RGB reorder) and P6 PPM. Returns an
    (h, w, 3) int64 RGB array — the input shape of patch/tile/resize
    operators. Compressed formats raise NotImplementedError (same
    boundary as decode_image)."""
    if payload[:2] == b"BM":
        import struct

        data_offset = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
        if hdr_size < 40:
            raise NotImplementedError("BITMAPCOREHEADER variant not implemented")
        _, bpp, compression = struct.unpack_from("<HHI", payload, 26)
        if compression != 0 or bpp != 24:
            raise NotImplementedError("only uncompressed 24-bit BMP decodes to pixels")
        top_down = height < 0
        px = _dib_rows(payload, data_offset, width, abs(height), top_down=top_down)
        return px.astype("int64")[:, :, ::-1]  # BGR -> RGB
    if payload[:2] == b"P6":
        return _ppm_raster(payload)
    raise NotImplementedError("pixel decode implemented for BMP/P6 PPM only")


def decode_ppm(payload: bytes) -> dict:
    """Decode a binary PPM (P6): header + raw RGB samples via
    ``_ppm_raster``; summary stats shape matching decode_bmp."""
    rgb = _ppm_raster(payload)
    height, width = rgb.shape[0], rgb.shape[1]
    return {
        "format": "ppm",
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "sum_r": int(rgb[:, :, 0].sum()),
        "sum_g": int(rgb[:, :, 1].sum()),
        "sum_b": int(rgb[:, :, 2].sum()),
    }


def encode_ppm_p6(pixels) -> bytes:
    """Minimal P6 writer from an (h, w, 3) RGB uint8 array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # gray, RGB, indexed, gray+alpha, RGBA
# Adam7 pass geometry: (x_start, y_start, x_step, y_step) — T.81's PNG
# sibling, public spec (PNG §8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, offset: int, stride: int, bpp: int, height: int):
    """Undo the five scanline filters for one (sub-)image; returns
    (rows bytes, bytes consumed). ``bpp`` is the filter's left-pixel
    distance in BYTES (max(1, bits_per_pixel // 8) per spec)."""
    prev = bytearray(stride)
    rows = []
    for y in range(height):
        base = offset + y * (stride + 1)
        f = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if f == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"PNG filter type {f} is invalid")
        rows.append(bytes(row))
        prev = row
    return b"".join(rows), height * (stride + 1)


def _png_samples(rows: bytes, width: int, height: int, ch: int, depth: int):
    """Unpack unfiltered scanline bytes into an (h, w, ch) int64 sample
    array: 8/16-bit samples direct (16-bit big-endian per spec),
    sub-byte depths bit-unpacked MSB-first with row-tail padding bits
    discarded."""
    import numpy as np

    stride = (width * ch * depth + 7) // 8
    arr = np.frombuffer(rows, dtype=np.uint8).reshape(height, stride)
    if depth == 8:
        return arr[:, : width * ch].astype(np.int64).reshape(height, width, ch)
    if depth == 16:
        a16 = np.frombuffer(rows, dtype=">u2").reshape(height, stride // 2)
        return a16[:, : width * ch].astype(np.int64).reshape(height, width, ch)
    bits = np.unpackbits(arr, axis=1)  # MSB-first, matching PNG packing
    vals = bits.reshape(height, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
    packed = (vals * weights).sum(axis=2)
    return packed[:, : width * ch].astype(np.int64).reshape(height, width, ch)


def decode_png(payload: bytes) -> dict:
    """REAL stdlib PNG decode (r8; extended r10 — the format's full
    baseline matrix): chunk walk (IHDR/PLTE/IDAT*/IEND), zlib inflate,
    scanline unfiltering for all five filter types (None/Sub/Up/
    Average/Paeth) at the spec's byte-distance for every depth, bit
    depths 1/2/4/8/16 (sub-byte MSB-first unpack, 16-bit big-endian),
    ALL FIVE color types (0 gray, 2 RGB, 3 indexed via PLTE, 4
    gray+alpha, 6 RGBA), and Adam7 INTERLACING (7 independently-filtered sub-images
    scattered by the pass geometry). Stats convention: grayscale
    reports its sum as r=g=b; indexed sums the palette-mapped RGB;
    alpha is ignored in channel sums; 16-bit sums raw sample values."""
    import struct

    import numpy as np

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height, depth, ctype, interlace = len(_PNG_SIG), None, None, None, None, None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        length, chunk = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if chunk == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif chunk == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        elif chunk == b"IDAT":
            idat += data
        elif chunk == b"IEND":
            break
    if width is None:
        raise ValueError("PNG has no IHDR chunk")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG bit depth {depth} is invalid")
    if ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG color type {ctype} not implemented (0/2/3/4/6 decode natively)"
        )
    if ctype == 3 and plte is None:
        raise ValueError("indexed PNG has no PLTE chunk")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} is invalid")
    ch = _PNG_CHANNELS[ctype]
    bpp = max(1, ch * depth // 8)
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        stride = (width * ch * depth + 7) // 8
        if len(raw) != (stride + 1) * height:
            raise ValueError(
                f"PNG scanline payload is {len(raw)} bytes, "
                f"expected {(stride + 1) * height}"
            )
        rows, _ = _png_unfilter(raw, 0, stride, bpp, height)
        img = _png_samples(rows, width, height, ch, depth)
    else:  # Adam7: each pass filters independently, then scatters
        img = np.zeros((height, width, ch), dtype=np.int64)
        offset = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = max(0, -(-(width - x0) // xs))
            ph = max(0, -(-(height - y0) // ys))
            if pw == 0 or ph == 0:
                continue
            pstride = (pw * ch * depth + 7) // 8
            if len(raw) - offset < (pstride + 1) * ph:
                raise ValueError("Adam7 pass payload size mismatch")
            rows, used = _png_unfilter(raw, offset, pstride, bpp, ph)
            offset += used
            img[y0::ys, x0::xs] = _png_samples(rows, pw, ph, ch, depth)
        if offset != len(raw):
            raise ValueError("Adam7 pass payload size mismatch")
    if ctype in (0, 4):  # gray (+alpha, ignored in sums)
        sum_r = sum_g = sum_b = int(img[:, :, 0].sum())
    elif ctype == 3:
        rgb = plte[img[:, :, 0]]
        sum_r, sum_g, sum_b = (int(rgb[:, :, i].sum()) for i in range(3))
    else:
        sum_r, sum_g, sum_b = (int(img[:, :, i].sum()) for i in range(3))
    return {
        "format": "png",
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_pack_rows(px, w: int, h: int, ch: int, depth: int) -> list[bytes]:
    """Pack an (h, w, ch) int sample array into per-row scanline bytes
    at the given depth (sub-byte MSB-first, 16-bit big-endian)."""
    import numpy as np

    flat = px.reshape(h, w * ch)
    if depth == 8:
        return [flat[y].astype(np.uint8).tobytes() for y in range(h)]
    if depth == 16:
        return [flat[y].astype(">u2").tobytes() for y in range(h)]
    per_byte = 8 // depth
    rows = []
    for y in range(h):
        vals = flat[y]
        pad = (-len(vals)) % per_byte
        if pad:
            vals = np.concatenate([vals, np.zeros(pad, dtype=vals.dtype)])
        shifts = np.arange(per_byte - 1, -1, -1) * depth
        packed = (vals.reshape(-1, per_byte).astype(np.uint16) << shifts).sum(axis=1)
        rows.append(packed.astype(np.uint8).tobytes())
    return rows


def encode_png(
    pixels,
    color_type: int = 2,
    bit_depth: int = 8,
    palette=None,
    interlace: bool = False,
) -> bytes:
    """Spec-correct PNG writer from an (h, w[, ch]) sample array:
    filter byte 0 per scanline, one zlib IDAT, CRC-stamped chunks.
    ``color_type``: 0 (gray), 2 (RGB), 3 (indexed — pass ``palette``
    as (n, 3) uint8, pixels are indices), 6 (RGBA). ``bit_depth``
    1/2/4/8 for gray/indexed, 8/16 for 2/6 (r10). ``interlace=True``
    writes Adam7 passes (each filtered independently). What decode_png
    recovers; also valid for any external reader."""
    import struct

    import numpy as np

    px = np.asarray(pixels)
    if color_type in (0, 3) and px.ndim == 2:
        px = px[:, :, None]
    ch = _PNG_CHANNELS[color_type]
    if px.shape[2] != ch:
        raise ValueError(f"color_type {color_type} needs {ch} channels, got {px.shape[2]}")
    if color_type == 3 and palette is None:
        raise ValueError("color_type 3 requires a palette")
    allowed = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8), 2: (8, 16), 4: (8, 16), 6: (8, 16)}
    if bit_depth not in allowed[color_type]:
        raise ValueError(f"bit depth {bit_depth} invalid for color type {color_type}")
    h, w = px.shape[0], px.shape[1]
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            rows = _png_pack_rows(sub, sub.shape[1], sub.shape[0], ch, bit_depth)
            parts.extend(b"\x00" + r for r in rows)
        body = b"".join(parts)
    else:
        body = b"".join(
            b"\x00" + r for r in _png_pack_rows(px, w, h, ch, bit_depth)
        )
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, int(interlace))
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _png_chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(body, 6)) + _png_chunk(b"IEND", b"")


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bitstream, CLEAR/END control codes,
    dictionary growing to 12-bit codes, KwKwK case handled."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table: list[list[int]] = []

    def reset():
        nonlocal table, code_size
        table = [[i] for i in range(clear)] + [[], []]
        code_size = min_code_size + 1

    code_size = min_code_size + 1
    reset()
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + [prev[0]]  # KwKwK
            else:
                raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + [entry[0]])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-flavor LZW encoder (dictionary-growing, CLEAR on full) —
    the fixture writer; code-size growth mirrors _lzw_decode's rule
    exactly so round trips exercise the real dictionary path."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0
    code_size = min_code_size + 1

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    cur: tuple[int, ...] = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        # decoder adds its entry THEN grows when table hits 1<<code_size
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        cur = (px,)
    if cur:
        emit(table[cur])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_interlace_order(h: int) -> list[int]:
    """Display row for each STORAGE row of an interlaced frame — the
    four GIF89a passes (every 8th from 0, every 8th from 4, every 4th
    from 2, every 2nd from 1)."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def _gif_deinterlace(stored):
    """Reorder an interlaced frame's (h, w) storage-order rows into
    display order (r10)."""
    import numpy as np

    out = np.empty_like(stored)
    out[_gif_interlace_order(stored.shape[0])] = stored
    return out


def decode_gif(payload: bytes) -> dict:
    """REAL stdlib GIF decode (r8): header + logical screen descriptor,
    global/local color tables, extension-block skipping, and a full
    LZW inflate of the FIRST image frame (dictionary growth to 12-bit
    codes, KwKwK). Interlaced frames deinterlace via the four-pass row
    order (r10). Stats are per-channel sums of the palette-mapped
    pixels — same contract as the other image decoders."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(payload)
    except IndexError as exc:  # ran off the end of a sub-block walk
        raise ValueError(f"truncated GIF payload: {exc}") from None


def _decode_gif_body(payload: bytes) -> dict:
    import struct

    import numpy as np

    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 ** ((ipacked & 0x07) + 1)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            interlaced = bool(ipacked & 0x40)
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(data), min_code)[: w * h]
            if len(idx) < w * h:
                raise ValueError(f"GIF frame decoded {len(idx)} of {w * h} pixels")
            ia = np.asarray(idx, dtype=np.int64)
            if ia.size and int(ia.max()) >= len(ct):
                raise ValueError(
                    f"GIF pixel index {int(ia.max())} exceeds the "
                    f"{len(ct)}-entry color table"
                )
            if interlaced:  # r10: four-pass row reorder (GIF89a §20)
                ia = _gif_deinterlace(ia.reshape(h, w)).reshape(-1)
            px = ct[ia].astype(np.int64)
            return {
                "format": "gif",
                "width": w,
                "height": h,
                "n_pixels": w * h,
                "sum_r": int(px[:, 0].sum()),
                "sum_g": int(px[:, 1].sum()),
                "sum_b": int(px[:, 2].sum()),
            }
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF has no image frame")


def encode_gif(indices, palette, interlace: bool = False) -> bytes:
    """Minimal GIF89a writer: one frame, global color table, real LZW
    compression. ``indices``: (h, w) uint8 palette indices; ``palette``:
    (n, 3) uint8 RGB, n a power of two >= 4. ``interlace=True`` stores
    rows in the four-pass order with the flag set (r10)."""
    import struct

    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    if interlace:
        idx = idx[_gif_interlace_order(h)]  # display -> storage order
    n = pal.shape[0]
    size_field = max(1, (n - 1).bit_length() - 1)  # 2^(f+1) = n
    min_code = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (0 << 4) | size_field, 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    lzw = _lzw_encode([int(v) for v in idx.reshape(-1)], min_code)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(payload: bytes) -> dict:
    """Content-sniffing image decode: real stdlib decoders for BMP
    (decode_bmp), P6 PPM (decode_ppm), PNG (decode_png — zlib is
    stdlib, native since r8), GIF (decode_gif — pure-python LZW), and
    baseline sequential JPEG (operators/jpeg.py — first-principles
    Huffman + DCT since r9; progressive refuses loudly); WEBP raises
    NotImplementedError — its codec isn't in this container; swap in
    PIL.Image.open(io.BytesIO(payload)) on a real cluster."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from etlalchemy_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    kind = "RIFF(WEBP/AVI)" if payload[:4] == b"RIFF" else "unknown"
    raise NotImplementedError(
        f"{kind} decode requires a codec library not present in this "
        "environment; BMP/PPM/PNG/GIF/JPEG decode natively"
    )


def wav_stats(df: DataFrame, id_col: str) -> DataFrame:
    """decode→feature-extract for audio payloads: Arrow-batched
    mapInPandas over (id, payload) running the stdlib PCM decoder —
    partition-local, no shuffle, payload column pruned upstream of
    this call. Output is one stats row per asset."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, sample_rate int, n_channels int, n_samples bigint, "
        "duration_us bigint, sum_abs_amplitude bigint, peak_amplitude bigint"
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            stats = [decode_wav(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "sample_rate": [s["sample_rate"] for s in stats],
                    "n_channels": [s["n_channels"] for s in stats],
                    "n_samples": [s["n_samples"] for s in stats],
                    "duration_us": [s["duration_us"] for s in stats],
                    "sum_abs_amplitude": [s["sum_abs_amplitude"] for s in stats],
                    "peak_amplitude": [s["peak_amplitude"] for s in stats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def audio_autocorr(df: DataFrame, id_col: str, max_lag: int = 8) -> DataFrame:
    """Integer autocorrelation pitch/periodicity detection over REAL
    decoded waveforms — the audio-curation analog of the image
    perceptual hash: decode (PCM or ADPCM via the shared chunk
    walker), then for each lag L in 1..max_lag compute the exact
    integer autocorrelation sum(s[i]*s[i+L]) and report the lag that
    maximizes it (smallest lag on ties — the fundamental period for a
    periodic signal), alongside total energy sum(s[i]^2) and the
    zero-crossing count (both standard voiced/unvoiced features).
    All-integer arithmetic end to end, so an oracle recomputes the
    verdict exactly; mono only (interleaved autocorrelation would mix
    channels). Partition-local Arrow batches — at 100 TB this is the
    scan-speed feature pass; max_lag is a constant, so cost is
    O(max_lag * n_samples) per asset with zero shuffles."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, n_samples bigint, energy bigint, "
        "best_lag int, best_ac bigint, zero_crossings bigint"
    )

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                meta, s = decode_wav_samples(payload)
                if meta["n_channels"] != 1:
                    raise NotImplementedError("autocorrelation implemented for mono audio")
                n = len(s)
                acs = [int((s[: n - L] * s[L:]).sum()) for L in range(1, max_lag + 1)]
                best = int(np.argmax(acs))  # first (smallest lag) on ties
                zc = int(((s[:-1] * s[1:]) < 0).sum()) if n > 1 else 0
                rows.append((i, n, int((s * s).sum()), best + 1, acs[best], zc))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_samples", "energy", "best_lag", "best_ac",
                         "zero_crossings"],
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def image_stats(df: DataFrame, id_col: str) -> DataFrame:
    """decode→feature-extract for image payloads (BMP/PPM router):
    same Arrow-batched partition-local shape as wav_stats."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, format string, width int, height int, "
        "n_pixels bigint, sum_r bigint, sum_g bigint, sum_b bigint"
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            stats = [decode_image(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "format": [s["format"] for s in stats],
                    "width": [s["width"] for s in stats],
                    "height": [s["height"] for s in stats],
                    "n_pixels": [s["n_pixels"] for s in stats],
                    "sum_r": [s["sum_r"] for s in stats],
                    "sum_g": [s["sum_g"] for s in stats],
                    "sum_b": [s["sum_b"] for s in stats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def byte_features(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic 'decode': per-payload byte-level features via
    mapInPandas (n_bytes, first_byte, byte_sum over the first 64 bytes)
    — the stand-in for decode→feature-extract with identical batch
    shape, schema handling, and partitioning. The id column keeps the
    CALLER's type (a hardcoded long broke string/int-keyed tables at
    the Arrow conversion)."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, n_bytes long, first_byte int, head_byte_sum long"

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            # NULL payloads arrive as None: feature as empty (a real
            # decoder would route these to a dead-letter column, not
            # crash the executor)
            payloads = pdf["payload"].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "head_byte_sum": payloads.map(
                        lambda b: int(sum(b[:64]))
                    ).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def decode_avi_frames(payload: bytes, every_n: int = 1, with_raster: bool = False) -> list[dict]:
    """REAL video decode (r8 — the video modality leaves stub-land for
    the uncompressed case): walk the RIFF/AVI container (hdrl → avih
    main header for dims/fps/frame count, movi LIST for frame chunks)
    and decode every ``every_n``-th uncompressed DIB frame ('00db' —
    bottom-up BGR rows padded to 4 bytes, the same raster contract as
    BMP). Returns one dict per SAMPLED frame: frame_index, width,
    height, per-channel sums, and the stream's frame period in
    microseconds. Compressed streams ('00dc' chunks) raise
    NotImplementedError — those codecs (MJPEG/H.264/...) aren't
    stdlib."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    us_per_frame = width = height = None
    frames: list[dict] = []
    frame_i = 0
    compression = ["raw"]  # mutated by strf; list for closure write

    def walk(pos: int, end: int):
        nonlocal us_per_frame, width, height, frame_i
        import struct as _s
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)  # skip list type tag
            elif cid == b"avih":
                us_per_frame, width, height = (
                    struct.unpack_from("<I", payload, body_start)[0],
                    struct.unpack_from("<I", payload, body_start + 32)[0],
                    struct.unpack_from("<I", payload, body_start + 36)[0],
                )
            elif cid == b"strf" and size >= 20:
                # BITMAPINFOHEADER: 16/32-bpp DIBs are still '00db'
                # BI_RGB — decoding them as 24-bpp would produce
                # silently wrong sums, exactly what decode_bmp's guard
                # refuses (r8 review). biCompression 'MJPG' (r10)
                # routes '00dc' frames through the in-house JPEG
                # decoder; other codecs refuse by fourcc.
                _bpp, _comp = (
                    _s.unpack_from("<H", payload, body_start + 14)[0],
                    _s.unpack_from("<I", payload, body_start + 16)[0],
                )
                if _comp == 0x47504A4D:  # 'MJPG' little-endian
                    compression[0] = "mjpeg"
                elif _comp != 0 or _bpp != 24:
                    raise NotImplementedError(
                        f"AVI DIB stream with biBitCount={_bpp} "
                        f"biCompression={_comp:#x}; 24-bit BI_RGB and "
                        "MJPG decode natively"
                    )
            elif cid[2:4] == b"dc":
                if compression[0] != "mjpeg":
                    fourcc = payload[pos:pos + 4].decode("ascii", "replace")
                    raise NotImplementedError(
                        f"compressed AVI stream ({fourcc!r}) with a "
                        "non-MJPG codec; MJPG (r10) and uncompressed DIB "
                        "('00db') decode natively"
                    )
                if frame_i % every_n == 0:
                    from etlalchemy_spark.operators.jpeg import decode_jpeg

                    d = decode_jpeg(payload[body_start:body_start + size])
                    f = {
                        "frame_index": frame_i,
                        "width": d["width"],
                        "height": d["height"],
                        "us_per_frame": int(us_per_frame or 0),
                        "sum_r": d["sum_r"],
                        "sum_g": d["sum_g"],
                        "sum_b": d["sum_b"],
                    }
                    if with_raster:
                        raise NotImplementedError(
                            "raster extraction from MJPG frames not wired "
                            "(sums-level decode only)"
                        )
                    frames.append(f)
                frame_i += 1
            elif cid[2:4] == b"db":
                if width is None:
                    raise ValueError("AVI frame before avih header")
                if frame_i % every_n == 0:
                    px = _dib_rows(payload, body_start, width, height).astype(np.int64)
                    f = {
                        "frame_index": frame_i,
                        "width": int(width),
                        "height": int(height),
                        "us_per_frame": int(us_per_frame or 0),
                        "sum_r": int(px[:, :, 2].sum()),  # DIB rows are BGR
                        "sum_g": int(px[:, :, 1].sum()),
                        "sum_b": int(px[:, :, 0].sum()),
                    }
                    if with_raster:
                        f["raster"] = px
                    frames.append(f)
                frame_i += 1
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    if not frames and frame_i == 0:
        raise ValueError("AVI has no video frames")
    return frames


def encode_avi_rgb(frames, fps: int = 10) -> bytes:
    """Minimal uncompressed AVI writer from an (n, h, w, 3) RGB uint8
    array: avih + one 'vids' stream (strh/strf BITMAPINFOHEADER,
    BI_RGB) + movi '00db' chunks with the standard bottom-up padded
    BGR raster. What decode_avi_frames recovers."""
    import struct

    import numpy as np

    fr = np.asarray(frames, dtype=np.uint8)
    n, h, w = fr.shape[0], fr.shape[1], fr.shape[2]
    stride = (w * 3 + 3) & ~3
    dib = _dib_body

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, stride * h * fps, 0, 0x10, n, 0, 1, stride * h, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, stride * h, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(fr[i])) for i in range(n)))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_avi_mjpeg(jpeg_frames: list[bytes], w: int, h: int, fps: int = 10) -> bytes:
    """MJPEG AVI writer (r10): the container carries PRE-ENCODED JPEG
    payloads as '00dc' chunks with strh fourcc + strf biCompression
    'MJPG' — the classic webcam/DVR format, and the bridge between the
    RIFF walker and the in-house T.81 codec. What decode_avi_frames'
    MJPG path recovers."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n = len(jpeg_frames)
    buf = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, buf * fps, 0, 0x10, n, 0, 1, buf, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, buf, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", buf, 2835, 2835, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def video_frame_stats(df: DataFrame, id_col: str, every_n: int = 2) -> DataFrame:
    """decode→frame-sample for video payloads: Arrow-batched
    mapInPandas running the stdlib AVI walker, one output row per
    SAMPLED frame — the real shape of frame extraction over 100 TB of
    video (partition-local, payload bytes never shuffle, frames the
    sampler skips are never rasterized)."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, frame_index int, width int, height int, "
        "us_per_frame bigint, sum_r bigint, sum_g bigint, sum_b bigint"
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                for f in decode_avi_frames(b, every_n=every_n):
                    rows.append((i, f["frame_index"], f["width"], f["height"],
                                 f["us_per_frame"], f["sum_r"], f["sum_g"], f["sum_b"]))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_index", "width", "height",
                         "us_per_frame", "sum_r", "sum_g", "sum_b"],
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def frame_sample_stub(df: DataFrame, id_col: str, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' on the byte stream: one row per sampled offset
    (the video-frame-sampling plumbing — explode of sampled positions,
    payload sliced per frame). Deterministic byte slices stand in for
    decoded frames. NULL payloads are ROUTED, not dropped (module
    contract, same as byte_features): greatest() skips the NULL
    length so the id keeps one placeholder row (offset 1, NULL
    bytes), and explode_outer backstops that if the length expression
    ever returns NULL outright — a per-id reconciliation against
    byte_features must agree on row sets."""
    n = F.octet_length("payload")
    offsets = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(every_n_bytes))
    return (
        df.select(F.col(id_col), "payload", F.explode_outer(offsets).alias("frame_offset"))
        .select(
            id_col,
            "frame_offset",
            F.substring(F.col("payload"), F.col("frame_offset"), 4).alias("frame_bytes"),
        )
    )


def resize_nearest(px, target_w: int, target_h: int):
    """REAL pixel resampling (r8 — resize leaves stub-land):
    nearest-neighbor resize of an (h, w, c) raster with pure integer
    index arithmetic — src_x = (x * w) // target_w — so the mapping is
    engine-reproducible (an oracle can recompute it formula-side,
    unlike interpolating kernels whose float rounding varies). The
    thumbnailing workhorse for training-data pipelines; swap for a
    PIL/area kernel when fidelity beats reproducibility."""
    import numpy as np

    a = np.asarray(px)
    h, w = a.shape[0], a.shape[1]
    ys = (np.arange(target_h, dtype=np.int64) * h) // target_h
    xs = (np.arange(target_w, dtype=np.int64) * w) // target_w
    return a[ys][:, xs]


def decode_raster(payload: bytes):
    """Magic-byte-routed RASTER decode (the stats decoders summarize
    and discard the grid): returns (meta, raster) where raster is an
    (h, w, 3) uint8 RGB array. One shared reader for every operator
    that needs pixels (resize, perceptual hash, motion energy) so
    there is exactly one DIB/PPM byte-layout implementation to
    maintain. BMP rows are stored bottom-up BGR — both undone here."""
    import numpy as np

    meta = decode_image(payload)
    w, h = meta["width"], meta["height"]
    if payload[:2] == b"BM":
        import struct

        off = struct.unpack_from("<I", payload, 10)[0]
        raster = _dib_rows(payload, off, w, h)[:, :, ::-1]  # BGR→RGB
    elif payload[:2] == b"P6":
        hdr_end = payload.index(b"255\n") + 4
        raster = np.frombuffer(payload, np.uint8, w * h * 3, hdr_end).reshape(h, w, 3)
    else:
        raise NotImplementedError(
            "raster decode implemented for BMP/PPM; other formats "
            "route through their stats-only decoders"
        )
    return meta, raster


def image_ahash(df: DataFrame, id_col: str) -> DataFrame:
    """Perceptual average-hash (aHash) of image payloads — the
    image-dedup fingerprint: decode → integer luma
    ((299R + 587G + 114B) // 1000) → nearest-neighbor resize to 8×8 →
    one bit per cell (set iff 64*cell > sum of all 64 cells, i.e.
    cell > mean without ever dividing) → four 16-bit band integers
    b0..b3 (bit j of the hash lands in band j//16 at position j%16,
    row-major cells). Every step is integer arithmetic, so an oracle
    recomputes the hash formula-side and near-dup verdicts are
    engine-exact. Bands instead of one 64-bit word because the
    downstream LSH join buckets on band equality (Hamming-distance
    LSH: two hashes within distance d collide on ≥1 of 4 bands
    whenever d < 4 by pigeonhole) and 16-bit band values dodge
    signed-shift edge cases in SQL engines. Partition-local Arrow
    batches; payload column pruned upstream; at 100 TB this is the
    scan-speed fingerprinting pass, and the banded join that follows
    never goes all-pairs."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, format string, b0 int, b1 int, b2 int, b3 int"

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                meta, raster = decode_raster(payload)
                px = raster.astype(np.int64)
                luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
                cells = resize_nearest(luma, 8, 8).reshape(64)
                total = int(cells.sum())
                bits = (64 * cells > total).astype(np.int64)
                weights = 1 << (np.arange(64, dtype=np.int64) % 16)
                bands = [
                    int((bits[16 * k : 16 * (k + 1)] * weights[16 * k : 16 * (k + 1)]).sum())
                    for k in range(4)
                ]
                rows.append((i, meta["format"], *bands))
            yield pd.DataFrame(
                rows, columns=[id_col, "format", "b0", "b1", "b2", "b3"]
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def image_resize_stats(
    df: DataFrame, id_col: str, target_w: int, target_h: int
) -> DataFrame:
    """decode → RESIZE → feature-extract: every payload is decoded by
    the magic-byte router, nearest-neighbor-resampled to
    (target_w, target_h), and summarized per channel — the thumbnail
    normalization step of an image-training pipeline, partition-local
    over Arrow batches like the other extractors. Emits the ORIGINAL
    dimensions beside the resized sums so audits can bucket by source
    size without a second decode."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, format string, src_width int, src_height int, "
        "width int, height int, sum_r bigint, sum_g bigint, sum_b bigint"
    )

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                meta, raster = decode_raster(payload)
                w, h = meta["width"], meta["height"]
                rz = resize_nearest(raster, target_w, target_h).astype(np.int64)
                rows.append(
                    (i, meta["format"], w, h, target_w, target_h,
                     int(rz[:, :, 0].sum()), int(rz[:, :, 1].sum()),
                     int(rz[:, :, 2].sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "format", "src_width", "src_height",
                         "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def video_motion_energy(df: DataFrame, id_col: str, every_n: int = 1) -> DataFrame:
    """Frame-to-frame motion energy (r8): per consecutive SAMPLED frame
    pair, the summed absolute per-channel pixel difference — the
    shot-boundary / static-clip detector of video curation pipelines.
    Consumes decode_avi_frames(with_raster=True), so there is exactly
    ONE container walker and one DIB raster reader to maintain; one
    output row per frame pair, partition-local."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, frame_a int, frame_b int, "
        "abs_diff_r bigint, abs_diff_g bigint, abs_diff_b bigint"
    )

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                frames = decode_avi_frames(payload, every_n=every_n, with_raster=True)
                for fa, fb in zip(frames, frames[1:]):
                    d = np.abs(fb["raster"] - fa["raster"])
                    rows.append(
                        (i, fa["frame_index"], fb["frame_index"],
                         int(d[:, :, 2].sum()), int(d[:, :, 1].sum()),
                         int(d[:, :, 0].sum()))  # DIB rows are BGR
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_a", "frame_b",
                         "abs_diff_r", "abs_diff_g", "abs_diff_b"],
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def resize_stub(df: DataFrame, id_col: str, target_bytes: int = 32) -> DataFrame:
    """'Resize' plumbing: normalize every payload to ``target_bytes``
    (crop long, zero-pad short) through the same Arrow-batched
    mapInPandas path a real thumbnailer uses. STUB semantics (byte
    crop/pad is the deterministic stand-in for pixel resampling — swap
    the body for PIL ``Image.resize`` on a real cluster); the schema,
    batch iteration, and updated metadata are the real contract."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, payload binary, n_bytes bigint"

    def resize(batches):
        import pandas as pd

        for pdf in batches:
            fixed = pdf["payload"].map(
                lambda b: bytes((b or b"")[:target_bytes]).ljust(target_bytes, b"\x00")
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": fixed,
                    "n_bytes": fixed.map(len).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(resize, out_schema)


def image_patch_grid(df: DataFrame, id_col: str, grid: int = 2) -> DataFrame:
    """ViT-style patch preparation: decode each payload to pixels
    (decode_image_pixels) and emit one row per grid cell — patch
    coordinates, pixel count, exact integer intensity sum (r+g+b) —
    the tabular form patch-embedding pipelines batch from. Pixel
    (x, y) belongs to patch ((y*grid)//h, (x*grid)//w), so any image
    size maps onto the same grid without resampling. Arrow
    mapInPandas, partition-local, no shuffle; only grid^2 summary
    rows per asset leave the executor."""
    from typing import Iterator

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, prs, pcs, ns, sums = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                rgb = decode_image_pixels(bytes(payload))
                h, w = rgb.shape[0], rgb.shape[1]
                inten = rgb.sum(axis=2)  # (h, w) int64
                ys = (np.arange(h) * grid) // h
                xs = (np.arange(w) * grid) // w
                for pr in range(grid):
                    for pc in range(grid):
                        mask = np.ix_(ys == pr, xs == pc)
                        cell = inten[mask]
                        if cell.size == 0:
                            continue
                        ids.append(int(i))
                        prs.append(pr)
                        pcs.append(pc)
                        ns.append(int(cell.size))
                        sums.append(int(cell.sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "patch_row": pd.Series(prs, dtype="int32"),
                    "patch_col": pd.Series(pcs, dtype="int32"),
                    "n_px": pd.Series(ns, dtype="int64"),
                    "intensity_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(
        extract,
        f"{id_col} long, patch_row int, patch_col int, n_px long, intensity_sum long",
    )


def image_sobel_energy(df: DataFrame, id_col: str) -> DataFrame:
    """Sobel gradient edge energy — the classic sharpness/blur signal
    image curation filters on (a near-constant or heavily blurred
    image scores ~0; text/structure scores high): decode the raster,
    integer luma L = 299R + 587G + 114B (scaled ×1000, never divided —
    keeps every tap exact), convolve the two 3×3 Sobel kernels over
    the interior, emit Σ(|gx|+|gy|) per image. All-integer arithmetic,
    so a SQL oracle can recompute the energy from the synthesized
    pixel formulas tap by tap. Same Arrow-batched partition-local
    shape as image_stats: only (id, dims, energy) rows leave the
    executors."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, width int, height int, "
        "interior_pixels bigint, edge_energy bigint"
    )

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            widths, heights, interiors, energies = [], [], [], []
            for b in pdf["payload"]:
                _, px = decode_raster(bytes(b))
                h, w = px.shape[:2]
                L = (
                    299 * px[:, :, 0].astype(np.int64)
                    + 587 * px[:, :, 1].astype(np.int64)
                    + 114 * px[:, :, 2].astype(np.int64)
                )
                gx = (
                    L[0 : h - 2, 2:w] + 2 * L[1 : h - 1, 2:w] + L[2:h, 2:w]
                ) - (
                    L[0 : h - 2, 0 : w - 2]
                    + 2 * L[1 : h - 1, 0 : w - 2]
                    + L[2:h, 0 : w - 2]
                )
                gy = (
                    L[2:h, 0 : w - 2] + 2 * L[2:h, 1 : w - 1] + L[2:h, 2:w]
                ) - (
                    L[0 : h - 2, 0 : w - 2]
                    + 2 * L[0 : h - 2, 1 : w - 1]
                    + L[0 : h - 2, 2:w]
                )
                widths.append(w)
                heights.append(h)
                interiors.append((w - 2) * (h - 2))
                energies.append(int(np.abs(gx).sum() + np.abs(gy).sum()))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": widths,
                    "height": heights,
                    "interior_pixels": interiors,
                    "edge_energy": energies,
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def audio_rms_gain(df: DataFrame, id_col: str, target_rms: float) -> DataFrame:
    """Loudness-normalization audit — the gain pass every speech/audio
    training pipeline runs before feature extraction: per clip, RMS
    from the exact integer energy sum, the LINEAR gain that would hit
    ``target_rms``, the clip-safe ceiling 32767/peak, and the applied
    gain = min of the two (dB is just 20·log10 of this ratio — kept
    linear so the whole chain stays libm-free and cross-engine exact:
    integer sums → one sqrt + divisions). Arrow-batched partition-local
    like every decoder here; only summary rows leave the executors."""
    import math

    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, n_samples bigint, sum_sq bigint, peak bigint, "
        "rms double, target_gain double, clip_safe_gain double, applied_gain double"
    )

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in
                    ("n", "ss", "pk", "rms", "tg", "cg", "ag")}
            for b in pdf["payload"]:
                _, samples = decode_wav_samples(bytes(b))
                s = np.asarray(samples, dtype=np.int64)
                n = int(s.size)
                ss = int((s * s).sum())
                pk = int(np.abs(s).max()) if n else 0
                rms = math.sqrt(ss / n) if n else 0.0
                tg = target_rms / rms if rms > 0 else None
                cg = 32767.0 / pk if pk > 0 else None
                ag = min(tg, cg) if tg is not None and cg is not None else None
                rows["n"].append(n); rows["ss"].append(ss); rows["pk"].append(pk)
                rows["rms"].append(rms); rows["tg"].append(tg)
                rows["cg"].append(cg); rows["ag"].append(ag)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_samples": rows["n"],
                    "sum_sq": rows["ss"],
                    "peak": rows["pk"],
                    "rms": rows["rms"],
                    "target_gain": rows["tg"],
                    "clip_safe_gain": rows["cg"],
                    "applied_gain": rows["ag"],
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def image_color_histogram(df: DataFrame, id_col: str, bins: int = 8) -> DataFrame:
    """Per-channel color histogram (``bins`` equal-width buckets over
    0..255, bucket = value * bins // 256 — pure integer) from the real
    raster decode: the color-distribution feature image curation uses
    for near-monochrome filtering, palette clustering, and cheap
    pre-dedup blocking. Output is long-form (id, channel, bucket,
    n_pixels) so histograms merge across shards by SUM — the same
    mergeable-register discipline as the sketch family. Arrow-batched
    partition-local; rows out = 3·bins per image."""
    import numpy as np

    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, channel string, bucket int, n_pixels bigint"

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, chans, buckets, counts = [], [], [], []
            for rid, b in zip(pdf[id_col], pdf["payload"]):
                _, px = decode_raster(bytes(b))
                for ci, cname in enumerate(("r", "g", "b")):
                    v = px[:, :, ci].astype(np.int64) * bins // 256
                    cnt = np.bincount(v.reshape(-1), minlength=bins)
                    for bk in range(bins):
                        ids.append(rid)
                        chans.append(cname)
                        buckets.append(bk)
                        counts.append(int(cnt[bk]))
            yield pd.DataFrame(
                {id_col: ids, "channel": chans, "bucket": buckets, "n_pixels": counts}
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


# --- Walsh-Hadamard sequency bands (r10) -------------------------------------------

def _wht_sequency(k: int, bits: int) -> int:
    """Sequency (sign-change count) of the natural-order Hadamard
    index ``k``: bit-reverse, then Gray-to-binary."""
    r = 0
    for i in range(bits):
        r = (r << 1) | ((k >> i) & 1)
    s = 0
    while r:
        s ^= r
        r >>= 1
    return s


def wht_band_table(n: int, n_bands: int) -> list[int]:
    """band index per natural-order WHT coefficient (shared by the
    Spark operator and the SQL oracle literal)."""
    bits = n.bit_length() - 1
    per = n // n_bands
    return [min(_wht_sequency(k, bits) // per, n_bands - 1) for k in range(n)]


def wht_sequency_bands(
    df: "DataFrame", id_col: str, n: int = 64, n_bands: int = 4
) -> "DataFrame":
    """Spectral feature extraction with ZERO float risk: the
    Walsh-Hadamard transform is the +/-1-basis sibling of the FFT
    (same O(n log n) butterfly; real pipelines use it for spectral
    hashing and as the rotation in LSH/quantization preconditioners),
    and over int16 PCM it is EXACT integer arithmetic — coefficients
    bounded by n*32768, energies by n*(n*32768)^2 — so band energies
    oracle-verify bit-for-bit where an FFT's libm twiddles could not.
    Decodes the first ``n`` samples of each REAL WAV payload (shared
    chunk walker), runs the integer butterfly, folds coefficients
    into ``n_bands`` SEQUENCY bands (sign-change order — the WHT's
    notion of low->high frequency; natural order would interleave).
    Partition-local Arrow batches; n is a constant, so cost is
    scan-speed times n log n."""
    import numpy as np

    band = wht_band_table(n, n_bands)
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, band int, energy bigint"

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, bands, energies = [], [], []
            for rid, b in zip(pdf[id_col], pdf["payload"]):
                _, samples = decode_wav_samples(bytes(b))
                if len(samples) < n:
                    raise ValueError(
                        f"wht_sequency_bands: payload has {len(samples)} < {n} samples"
                    )
                x = np.asarray(samples[:n], dtype=np.int64).copy()
                h = 1
                while h < n:
                    for i in range(0, n, h * 2):
                        a = x[i : i + h].copy()
                        bb = x[i + h : i + 2 * h].copy()
                        x[i : i + h] = a + bb
                        x[i + h : i + 2 * h] = a - bb
                    h *= 2
                acc = [0] * n_bands
                for k in range(n):
                    acc[band[k]] += int(x[k]) * int(x[k])
                for bi in range(n_bands):
                    ids.append(rid)
                    bands.append(bi)
                    energies.append(acc[bi])
            yield pd.DataFrame({id_col: ids, "band": bands, "energy": energies})

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


# --- TIFF (uncompressed baseline) codec (r10) ---------------------------------------

def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW (spec section 13): MSB-first bitstream (GIF's
    is LSB-first), fixed 8-bit symbols, Clear=256/EOI=257, codes start
    at 9 bits, and the EarlyChange rule — code width bumps when the
    table reaches 511/1023/2047 (one entry EARLY vs GIF; the TIFF
    spec's own 'Whoa!' footnote). Each strip is an independent
    stream."""
    CLEAR, EOI = 256, 257
    table: list[bytes] = []
    code_size = 9

    def reset():
        nonlocal table, code_size
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        code_size = 9

    reset()
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= code_size:
            code = (acc >> (bits - code_size)) & ((1 << code_size) - 1)
            bits -= code_size
            acc &= (1 << bits) - 1
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if code < len(table) and (code < 256 or table[code]):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"corrupt TIFF LZW stream: code {code} of {len(table)}")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                # EarlyChange: bump at 2^n - 1, not 2^n
                if len(table) == (1 << code_size) - 1 and code_size < 12:
                    code_size += 1
            prev = entry
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW encoder (fixture writer): MSB-first emission,
    leading Clear, trailing EOI, dictionary + EarlyChange width rule
    mirroring _tiff_lzw_decode exactly so round trips exercise the
    real dictionary growth path."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0
    code_size = 9

    def emit(code: int):
        nonlocal acc, bits
        acc = (acc << code_size) | code
        bits += code_size
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
            acc &= (1 << bits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
        else:
            emit(table[w])
            if next_code < 4096:
                table[wk] = next_code
                next_code += 1
                # mirror decode's EarlyChange exactly: the decoder adds
                # its a-th entry while PROCESSING code a+1 (one code
                # later than the encoder's add-after-emit), so the
                # encoder widens at next_code == 2^size where the
                # decoder widens at table len == 2^size - 1 — both land
                # on the same first 10-bit code
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            else:
                emit(CLEAR)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                code_size = 9
            w = bytes([b])
    if w:
        emit(table[w])
    emit(EOI)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """PackBits RLE (TIFF spec section 9, Compression=32773): signed
    control byte n — 0..127 copies n+1 literals, -1..-127 repeats the
    next byte 1-n times, -128 is a noop."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1
            if i + c + 1 > n:
                raise ValueError("PackBits: truncated literal run")
            out += data[i : i + c + 1]
            i += c + 1
        elif c == 128:  # noop
            continue
        else:  # repeat next byte 257-c times (= 1 - signed(c))
            if i >= n:
                raise ValueError("PackBits: truncated repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (fixture writer): greedy — runs of >=3 become
    repeats, everything else batches into <=128-byte literal groups."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            lit_start = i
            i += run
            while i < n and i - lit_start < 128:
                run = 1
                while i + run < n and run < 128 and data[i + run] == data[i]:
                    run += 1
                if run >= 3:
                    break
                i += run
                if i - lit_start >= 128:
                    i = lit_start + 128
                    break
            out.append(i - lit_start - 1)
            out += data[lit_start:i]
    return bytes(out)


def encode_tiff_gray8(pixels, big_endian: bool = False, compression: int = 1,
                      predictor: int = 1, rows_per_strip: int | None = None,
                      tile_size: tuple | None = None) -> bytes:
    """Spec-correct TIFF 6.0 writer: 8-bit grayscale, both byte orders
    (II/MM — real scanner exhaust is frequently MM), Compression 1
    (none) / 5 (LZW) / 32773 (PackBits), Predictor 2 (horizontal
    differencing — the LZW-corpus norm), multi-strip via
    rows_per_strip, or TILED layout via tile_size=(tw, tl) (TIFF 6.0
    §15: dims multiples of 16, edge tiles padded to full size, each
    tile an independent compression stream). Header -> data -> IFD."""
    import struct

    if compression not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF writer: Compression {compression}")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF writer: Predictor {predictor}")
    e = ">" if big_endian else "<"
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    rps = h if rows_per_strip is None else max(1, rows_per_strip)

    def diff_rows(rws, width):
        return [
            bytes([row[0]] + [(row[c] - row[c - 1]) & 0xFF for c in range(1, width)])
            for row in rws
        ]

    def pack(raw: bytes) -> bytes:
        if compression == 5:
            return _tiff_lzw_encode(raw)
        if compression == 32773:
            return _packbits_encode(raw)
        return raw

    if tile_size is not None:
        tw, tl = tile_size
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError("TIFF writer: tile dims must be multiples of 16")
        strips = []
        for ty in range(0, h, tl):
            for tx in range(0, w, tw):
                rows = []
                for r in range(ty, ty + tl):
                    if r < h:
                        row = list(pixels[r][tx:tx + tw])
                        row += [0] * (tw - len(row))  # right-edge pad
                    else:
                        row = [0] * tw  # bottom-edge pad
                    rows.append(bytes(row))
                if predictor == 2:
                    rows = diff_rows(rows, tw)
                strips.append(pack(b"".join(rows)))
    else:
        rows = [bytes(row) for row in pixels]
        if predictor == 2:
            rows = diff_rows(rows, w)
        strips = []
        for s0 in range(0, max(h, 1), rps):
            strips.append(pack(b"".join(rows[s0 : s0 + rps])))

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    out += struct.pack(e + "I", 0)  # IFD offset patched below
    offs, cnts = [], []
    for s in strips:
        offs.append(len(out))
        cnts.append(len(s))
        out += s
    if len(out) & 1:
        out += b"\x00"

    n_strips = len(strips)
    # multi-valued LONG arrays need an external data area after the IFD
    entries = [
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, 1, [8]),
        (259, 3, 1, [compression]),
        (262, 3, 1, [1]),
        (277, 3, 1, [1]),
    ]
    if tile_size is not None:
        entries += [
            (322, 4, 1, [tile_size[0]]),
            (323, 4, 1, [tile_size[1]]),
            (324, 4, n_strips, offs),
            (325, 4, n_strips, cnts),
        ]
    else:
        entries += [
            (273, 4, n_strips, offs),
            (278, 4, 1, [rps]),
            (279, 4, n_strips, cnts),
        ]
    if predictor == 2:
        entries.append((317, 3, 1, [2]))
    entries.sort()
    ifd_off = len(out)
    struct.pack_into(e + "I", out, 4, ifd_off)
    ext_off = ifd_off + 2 + 12 * len(entries) + 4
    ext = bytearray()
    out += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, vals in entries:
        if typ == 3:
            out += struct.pack(e + "HHIHH", tag, typ, cnt, vals[0], 0)
        elif cnt == 1:
            out += struct.pack(e + "HHII", tag, typ, cnt, vals[0])
        else:
            out += struct.pack(e + "HHII", tag, typ, cnt, ext_off + len(ext))
            ext += struct.pack(e + f"{cnt}I", *vals)
    out += struct.pack(e + "I", 0)  # next-IFD terminator
    out += ext
    return bytes(out)


def decode_tiff(payload: bytes) -> dict:
    """TIFF 6.0 decode: both byte orders, IFD walk, 8-bit
    single-sample strips (multi-strip supported — RowsPerStrip <
    height is the spec's norm), Compression 1 (none) / 5 (LZW,
    MSB-first with the EarlyChange width rule, per-strip streams) /
    32773 (PackBits RLE), Predictor 2 (horizontal differencing — the
    real-scanner-corpus norm with LZW), and the TILED layout (r11:
    TileWidth/TileLength/TileOffsets/TileByteCounts, edge tiles
    padded to full size, predictor per tile row, each tile an
    independent compression stream), and chunky RGB/RGBA
    (SamplesPerPixel 3/4, PlanarConfiguration 1, per-channel
    horizontal differencing — r13, unlocked by the libtiff-written
    python.tiff third-party witness). Anything deeper refuses LOUDLY
    by field name: other Compression values (JPEG-in-TIFF, deflate),
    Predictor 3, BitsPerSample != 8, planar (PlanarConfiguration 2)
    color."""
    import struct

    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload (bad byte-order mark)")
    e = "<" if payload[:2] == b"II" else ">"
    if struct.unpack_from(e + "H", payload, 2)[0] != 42:
        raise ValueError("not a TIFF payload (magic != 42)")
    ifd_off = struct.unpack_from(e + "I", payload, 4)[0]
    n = struct.unpack_from(e + "H", payload, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, off)
        if typ == 3:  # SHORT
            if cnt <= 2:
                vals = list(struct.unpack_from(e + f"{cnt}H", payload, off + 8))
            else:
                ptr = struct.unpack_from(e + "I", payload, off + 8)[0]
                vals = list(struct.unpack_from(e + f"{cnt}H", payload, ptr))
        elif typ == 4:  # LONG
            if cnt == 1:
                vals = [struct.unpack_from(e + "I", payload, off + 8)[0]]
            else:
                ptr = struct.unpack_from(e + "I", payload, off + 8)[0]
                vals = list(struct.unpack_from(e + f"{cnt}I", payload, ptr))
        else:
            continue  # RATIONAL/ASCII metadata — ignorable for stats
        tags[tag] = vals
    comp = tags.get(259, [1])[0]
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF: Compression {comp} (1 = none, 5 = LZW, 32773 = PackBits)"
        )
    pred = tags.get(317, [1])[0]
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF: Predictor {pred} (1 = none, 2 = horizontal)")
    if any(b != 8 for b in tags.get(258, [1])):
        raise NotImplementedError(
            f"TIFF: BitsPerSample {tags.get(258)} (only 8)"
        )
    spp = tags.get(277, [1])[0]
    if spp not in (1, 3, 4):
        raise NotImplementedError(
            f"TIFF: SamplesPerPixel {spp} (1 = gray, 3 = RGB, 4 = RGBA)"
        )
    planar = tags.get(284, [1])[0]
    if spp > 1 and planar != 1:
        raise NotImplementedError(
            f"TIFF: PlanarConfiguration {planar} with {spp} samples "
            "(only 1 = chunky)"
        )
    w, h = tags[256][0], tags[257][0]

    def unpack(raw: bytes) -> bytes:
        if comp == 5:
            return _tiff_lzw_decode(raw)  # each chunk = independent stream
        if comp == 32773:
            return _packbits_decode(raw)
        return raw

    def undiff(buf: bytearray, width_px: int, rows: int) -> None:
        # horizontal differencing is PER CHANNEL: each sample deltas
        # against the same channel of the previous pixel (TIFF 6.0
        # §14), which for spp=1 degenerates to the old byte-prev rule
        rw = width_px * spp
        for r in range(rows):
            base = r * rw
            for col in range(spp, rw):
                buf[base + col] = (buf[base + col] + buf[base + col - spp]) & 0xFF

    if 322 in tags:  # tiled layout (TIFF 6.0 §15, r11)
        tw, tl = tags[322][0], tags[323][0]
        offs, cnts = tags[324], tags[325]
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offs) != across * down:
            raise ValueError(
                f"TIFF: {len(offs)} tiles != {across}x{down} grid"
            )
        img = bytearray(w * h * spp)
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = unpack(payload[o : o + c])
            if len(raw) < tw * tl * spp:
                raise ValueError(
                    f"TIFF: tile {i} decoded {len(raw)} < {tw * tl * spp}"
                )
            tile = bytearray(raw[: tw * tl * spp])  # edge tiles stay padded
            if pred == 2:  # predictor runs over TILE rows (tw wide)
                undiff(tile, tw, tl)
            ty, tx = (i // across) * tl, (i % across) * tw
            cw = min(tw, w - tx)
            for r in range(min(tl, h - ty)):
                dst = ((ty + r) * w + tx) * spp
                img[dst:dst + cw * spp] = tile[r * tw * spp : r * tw * spp + cw * spp]
        data = bytes(img)
    else:
        offs, cnts = tags[273], tags[279]
        rps = tags.get(278, [h])[0]
        chunks = []
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = unpack(payload[o : o + c])
            expect = min(rps, h - i * rps) * w * spp
            if len(raw) < expect:
                raise ValueError(f"TIFF: strip {i} decoded {len(raw)} < {expect}")
            chunks.append(raw[:expect])  # writers may pad the final code byte
        data = b"".join(chunks)
        if len(data) != w * h * spp:
            raise ValueError(f"TIFF: strip bytes {len(data)} != {w}x{h}x{spp}")
        if pred == 2:  # undo horizontal differencing, per image row
            buf = bytearray(data)
            undiff(buf, w, h)
            data = bytes(buf)
    out = {
        "byte_order": "II" if e == "<" else "MM",
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "samples_per_pixel": spp,
        "sum_pixels": sum(data),
        "max_pixel": max(data) if data else 0,
        "compression": comp,
        "predictor": pred,
        # raw decoded strip bytes (row-major, chunky) so callers can
        # verify pixel CONTENT (histograms/entropy), not just counts
        "strip": data,
    }
    if spp >= 3:  # per-channel sums for the color witnesses
        out["sum_r"] = sum(data[0::spp])
        out["sum_g"] = sum(data[1::spp])
        out["sum_b"] = sum(data[2::spp])
    return out


def tiff_stats(df: "DataFrame", id_col: str) -> "DataFrame":
    """decode→stats for TIFF payloads — same Arrow mapInPandas shape
    as wav_stats: partition-local, only summary rows leave."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, byte_order string, width int, height int, "
        "n_pixels bigint, sum_pixels bigint, max_pixel int"
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            stats = [decode_tiff(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "byte_order": [s["byte_order"] for s in stats],
                    "width": [s["width"] for s in stats],
                    "height": [s["height"] for s in stats],
                    "n_pixels": [s["n_pixels"] for s in stats],
                    "sum_pixels": [s["sum_pixels"] for s in stats],
                    "max_pixel": [s["max_pixel"] for s in stats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


# --- EXIF metadata (r10) --------------------------------------------------------------

def encode_exif_jpeg(make: str, orientation: int, datetime_str: str,
                     xres: tuple[int, int], big_endian: bool = False) -> bytes:
    """Minimal metadata-bearing JPEG: SOI + APP1("Exif\\0\\0" + a TIFF
    IFD0 carrying Make[271]/Orientation[274]/XResolution[282]/
    DateTime[306]) + EOI. The TIFF-in-EXIF structure is the real
    layout cameras write; scan data is irrelevant to a metadata
    extractor and omitted."""
    import struct

    e = ">" if big_endian else "<"
    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime_str.encode("ascii") + b"\x00"
    # header(8) + count(2) + 4 entries(48) + next(4) = 62 bytes of IFD
    data_off = 8 + 2 + 4 * 12 + 4
    entries = []
    extra = bytearray()

    def slot(tag, typ, cnt, payload: bytes, inline_ok: bool):
        nonlocal extra
        if inline_ok and len(payload) <= 4:
            val = payload + b"\x00" * (4 - len(payload))
            entries.append(struct.pack(e + "HHI", tag, typ, cnt) + val)
        else:
            ptr = data_off + len(extra)
            entries.append(struct.pack(e + "HHII", tag, typ, cnt, ptr))
            extra += payload

    slot(271, 2, len(make_b), make_b, True)
    entries.append(struct.pack(e + "HHIHH", 274, 3, 1, orientation, 0))
    slot(282, 5, 1, struct.pack(e + "II", xres[0], xres[1]), False)
    slot(306, 2, len(dt_b), dt_b, True)
    tiff = (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    tiff += struct.pack(e + "I", 8)
    tiff += struct.pack(e + "H", len(entries)) + b"".join(entries)
    tiff += struct.pack(e + "I", 0) + bytes(extra)
    app1 = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", len(app1) + 2)
        + app1
        + b"\xff\xd9"
    )


def decode_exif(payload: bytes) -> dict:
    """Walk JPEG markers to APP1/Exif, parse the TIFF IFD0 (both byte
    orders), extract Make/Orientation/XResolution/DateTime. ASCII
    (inline or pointed), SHORT, LONG and RATIONAL types decode;
    missing APP1 or a non-JPEG payload refuses loudly."""
    import struct

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    tiff = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("EXIF: bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + size]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + size
    if tiff is None:
        raise ValueError("EXIF: no APP1 Exif segment")
    if tiff[:2] not in (b"II", b"MM"):
        raise ValueError("EXIF: bad TIFF byte-order mark")
    e = "<" if tiff[:2] == b"II" else ">"
    ifd_off = struct.unpack_from(e + "I", tiff, 4)[0]
    n = struct.unpack_from(e + "H", tiff, ifd_off)[0]
    out = {"byte_order": "II" if e == "<" else "MM"}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, off)
        if typ == 2:  # ASCII
            if cnt <= 4:
                raw = tiff[off + 8 : off + 8 + cnt]
            else:
                ptr = struct.unpack_from(e + "I", tiff, off + 8)[0]
                raw = tiff[ptr : ptr + cnt]
            val = raw.rstrip(b"\x00").decode("ascii")
        elif typ == 3:
            val = struct.unpack_from(e + "H", tiff, off + 8)[0]
        elif typ == 4:
            val = struct.unpack_from(e + "I", tiff, off + 8)[0]
        elif typ == 5:  # RATIONAL
            ptr = struct.unpack_from(e + "I", tiff, off + 8)[0]
            num, den = struct.unpack_from(e + "II", tiff, ptr)
            val = (num, den)
        else:
            continue
        out[tag] = val
    return {
        "byte_order": out["byte_order"],
        "make": out.get(271),
        "orientation": out.get(274),
        "xres_num": out.get(282, (None, None))[0],
        "xres_den": out.get(282, (None, None))[1],
        "datetime": out.get(306),
    }


def exif_metadata(df: "DataFrame", id_col: str) -> "DataFrame":
    """decode→metadata rows for EXIF-bearing JPEG payloads (the shared
    Arrow mapInPandas codec shape)."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, byte_order string, make string, orientation int, "
        "xres_num bigint, xres_den bigint, exif_datetime string"
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            stats = [decode_exif(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "byte_order": [s["byte_order"] for s in stats],
                    "make": [s["make"] for s in stats],
                    "orientation": [s["orientation"] for s in stats],
                    "xres_num": [s["xres_num"] for s in stats],
                    "xres_den": [s["xres_den"] for s in stats],
                    "exif_datetime": [s["datetime"] for s in stats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


# --- AIFF (r11) --------------------------------------------------------------------------------


def _ext80_pack(value: int) -> bytes:
    """80-bit IEEE 754 extended float (the AIFF COMM sampleRate field):
    sign+15-bit exponent (bias 16383), 64-bit mantissa with an
    EXPLICIT integer bit. Exact for the positive integers sample
    rates are."""
    import struct

    if value <= 0:
        raise ValueError("extended-float pack: positive integers only")
    e = value.bit_length() - 1
    mant = value << (63 - e)  # normalize: integer bit at bit 63
    return struct.pack(">HQ", 16383 + e, mant)


def _ext80_unpack(raw: bytes) -> int:
    import struct

    se, mant = struct.unpack(">HQ", raw)
    if se & 0x8000:
        raise ValueError("AIFF: negative sample rate")
    e = (se & 0x7FFF) - 16383
    if mant == 0:
        return 0
    # shift the 63-fraction-bit mantissa to the integer value
    shift = 63 - e
    if shift < 0:
        return mant << (-shift)
    if mant & ((1 << shift) - 1):
        raise ValueError("AIFF: non-integer sample rate")
    return mant >> shift


def encode_aiff_pcm16(samples, sample_rate: int) -> bytes:
    """Minimal mono 16-bit PCM AIFF writer (big-endian throughout —
    the FORM/COMM/SSND mirror of encode_wav_pcm16)."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype=">i2").tobytes()
    comm = b"COMM" + struct.pack(">IhIh", 18, 1, len(pcm) // 2, 16) + _ext80_pack(
        sample_rate
    )
    ssnd = b"SSND" + struct.pack(">III", len(pcm) + 8, 0, 0) + pcm
    if len(pcm) & 1:
        ssnd += b"\x00"  # chunks are word-aligned
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(payload: bytes) -> dict:
    """AIFF (FORM/AIFF) decode: COMM with the 80-bit extended-float
    sample rate parsed EXACTLY (integer rates round-trip bit-for-bit;
    fractional rates refuse loudly), SSND big-endian 16-bit PCM with
    offset/blockSize honored, odd-size chunk padding walked. Returns
    the same stats dict shape as decode_wav so `wav_stats`-style
    consumers need no branching. Compressed AIFC refuses by name."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"FORM":
        raise ValueError("not a FORM/AIFF payload")
    form_type = payload[8:12]
    if form_type == b"AIFC":
        raise NotImplementedError("AIFC (compressed AIFF) not supported")
    if form_type != b"AIFF":
        raise ValueError(f"FORM type {form_type!r} is not AIFF")
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)  # odd chunks pad one byte
    if comm is None or ssnd is None:
        raise ValueError("AIFF payload missing COMM/SSND chunk")
    n_channels, n_frames, bits = struct.unpack_from(">hIh", comm, 0)
    sample_rate = _ext80_unpack(comm[8:18])
    if bits != 16:
        raise NotImplementedError(f"only 16-bit AIFF PCM implemented, got {bits}")
    offset, _block = struct.unpack_from(">II", ssnd, 0)
    data = ssnd[8 + offset:8 + offset + n_frames * n_channels * 2]
    if len(data) != n_frames * n_channels * 2:
        raise ValueError(
            f"SSND truncated: COMM numSampleFrames={n_frames} x {n_channels} ch "
            f"needs {n_frames * n_channels * 2} bytes, SSND holds {len(data)}"
        )
    samples = np.frombuffer(data, dtype=">i2")
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": n_frames,
        "duration_us": n_frames * 1_000_000 // sample_rate,
        "sum_abs_amplitude": int(np.abs(samples.astype(np.int64)).sum()),
        "peak_amplitude": int(np.abs(samples.astype(np.int64)).max()) if len(samples) else 0,
    }


# --- TGA (r11) ---------------------------------------------------------------------------------


def encode_tga(pixels, rle: bool = False, top_down: bool = True) -> bytes:
    """Truevision TARGA writer, 24-bit truecolor: type 2 (raw) or
    type 10 (run-length packets, max 128 px, never spanning rows —
    the spec's row-boundary rule). ``pixels`` is rows of (r, g, b).
    ``top_down`` sets descriptor bit 5 (screen origin)."""
    import struct

    h = len(pixels)
    w = len(pixels[0]) if h else 0
    desc = 0x20 if top_down else 0x00
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10 if rle else 2, 0, 0, 0, 0, 0, w, h, 24, desc
    )
    rows = pixels if top_down else list(reversed(pixels))
    out = bytearray(hdr)
    for row in rows:
        if not rle:
            for r, g, b in row:
                out += bytes((b, g, r))
            continue
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 128 and row[x + run] == row[x]:
                run += 1
            if run >= 2:
                r, g, b = row[x]
                out += bytes((0x80 | (run - 1), b, g, r))
                x += run
            else:
                lit = 1
                while (
                    x + lit < w and lit < 128
                    and not (x + lit + 1 < w and row[x + lit] == row[x + lit + 1])
                ):
                    lit += 1
                out += bytes((lit - 1,))
                for r, g, b in row[x:x + lit]:
                    out += bytes((b, g, r))
                x += lit
    return bytes(out)


def decode_tga(payload: bytes) -> dict:
    """TARGA decode: 24-bit truecolor, types 2 (raw) and 10 (RLE —
    run AND literal packets, row-clamped), both screen origins, image
    ID field skipped. Color-mapped/grayscale/16/32-bit refuse by
    name. Returns the BMP-style stats dict (n_pixels, per-channel
    sums, pixel rows as (r, g, b))."""
    import struct

    if len(payload) < 18:
        raise ValueError("not a TGA payload (short header)")
    (idlen, cmap_type, img_type, _cm_first, _cm_len, _cm_bits,
     _x0, _y0, w, h, bpp, desc) = struct.unpack_from("<BBBHHBHHHHBB", payload, 0)
    if cmap_type != 0:
        raise NotImplementedError("TGA: color-mapped images")
    if img_type not in (2, 10):
        raise NotImplementedError(f"TGA: image type {img_type} (2/10 only)")
    if bpp != 24:
        raise NotImplementedError(f"TGA: {bpp} bpp (24 only)")
    pos = 18 + idlen
    px = []
    if img_type == 2:
        for _ in range(h):
            row = []
            for _ in range(w):
                b, g, r = payload[pos:pos + 3]
                row.append((r, g, b))
                pos += 3
            px.append(row)
    else:
        for _ in range(h):
            row = []
            while len(row) < w:
                head = payload[pos]
                pos += 1
                count = (head & 0x7F) + 1
                if len(row) + count > w:
                    raise ValueError("TGA: RLE packet crosses row boundary")
                if head & 0x80:
                    b, g, r = payload[pos:pos + 3]
                    pos += 3
                    row += [(r, g, b)] * count
                else:
                    for _ in range(count):
                        b, g, r = payload[pos:pos + 3]
                        row.append((r, g, b))
                        pos += 3
            px.append(row)
    if not (desc & 0x20):  # bottom-up origin
        px = list(reversed(px))
    return {
        "format": "tga",
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_r": sum(p[0] for row in px for p in row),
        "sum_g": sum(p[1] for row in px for p in row),
        "sum_b": sum(p[2] for row in px for p in row),
        "pixels": px,
    }


# --- PGM (P5) / PBM (P4) — the rest of the binary netpbm family (r12) --------------------------


def _pnm_header(payload: bytes, magic: bytes, n_tokens: int):
    """Whitespace/comment-tolerant netpbm header: ``magic`` then
    ``n_tokens`` ASCII integers (P4: width height; P5/P6: width height
    maxval), returning (tokens, offset_of_raster). Same tokenizer
    discipline as _ppm_raster."""
    if payload[:2] != magic:
        raise ValueError(f"not a {magic.decode()} payload")
    pos, tokens = 2, []
    while len(tokens) < n_tokens:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    return tokens, pos + 1  # single whitespace, then raw raster


def decode_pgm(payload: bytes) -> dict:
    """Binary PGM (P5) grayscale: header + raw samples (1 byte, or
    2-byte big-endian when maxval > 255 per the spec — same rule as
    the P6 path). Truncated rasters refuse loudly by byte count."""
    import numpy as np

    (width, height, maxval), pos = _pnm_header(payload, b"P5", 3)
    if maxval > 65535 or maxval < 1:
        raise ValueError(f"PGM maxval {maxval} out of range")
    n = width * height
    dt, unit = (">u2", 2) if maxval > 255 else (np.uint8, 1)
    if len(payload) - pos < n * unit:
        raise ValueError(
            f"PGM raster truncated: {width}x{height} needs {n * unit} bytes, "
            f"payload holds {len(payload) - pos}"
        )
    px = np.frombuffer(payload, dtype=dt, count=n, offset=pos).astype(np.int64)
    return {
        "format": "pgm",
        "width": width,
        "height": height,
        "n_pixels": n,
        "maxval": maxval,
        "sum_gray": int(px.sum()),
        "max_gray": int(px.max()) if n else 0,
    }


def decode_pbm(payload: bytes) -> dict:
    """Binary PBM (P4) bitmap: header (no maxval) + packed bits, each
    ROW padded to a byte boundary, MSB first, 1 = BLACK (the netpbm
    ink convention). ``sum_gray`` reads the bitmap as an 8-bit image
    (black 0, white 255) so the stat composes with the P5/P6 sums."""
    import numpy as np

    (width, height), pos = _pnm_header(payload, b"P4", 2)
    row_bytes = (width + 7) // 8
    need = row_bytes * height
    if len(payload) - pos < need:
        raise ValueError(
            f"PBM raster truncated: {width}x{height} needs {need} bytes, "
            f"payload holds {len(payload) - pos}"
        )
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    bits = np.unpackbits(raw.reshape(height, row_bytes), axis=1)[:, :width]
    n_black = int(bits.sum())
    n = width * height
    return {
        "format": "pbm",
        "width": width,
        "height": height,
        "n_pixels": n,
        "n_black": n_black,
        "sum_gray": 255 * (n - n_black),
    }


def encode_pgm_p5(pixels) -> bytes:
    """Minimal P5 writer from an (h, w) uint8 gray array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()


def encode_pbm_p4(bits) -> bytes:
    """Minimal P4 writer from an (h, w) 0/1 array (1 = black), rows
    padded to byte boundaries per the spec."""
    import numpy as np

    b = np.asarray(bits, dtype=np.uint8)
    h, w = b.shape
    row_bytes = (w + 7) // 8
    padded = np.zeros((h, row_bytes * 8), dtype=np.uint8)
    padded[:, :w] = b
    return f"P4\n{w} {h}\n".encode() + np.packbits(padded, axis=1).tobytes()
