"""Multimodal plumbing tests (binary payloads, mapInPandas features,
stubbed codecs)."""

import pytest

from etlalchemy_spark.operators.multimodal import (
    attach_payload,
    byte_features,
    decode_image,
    frame_sample_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 100)], "id long, text string"
    )
    return attach_payload(df, "id", "text")


def test_payload_schema(media):
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<mime:string,n_bytes:bigint")


def test_byte_features(spark, media):
    rows = {r.id: r for r in byte_features(media, "id").collect()}
    assert rows[1].n_bytes == 11 and rows[1].first_byte == ord("h")
    assert rows[1].head_byte_sum == sum(b"hello world")
    assert rows[2].n_bytes == 0 and rows[2].first_byte == -1
    assert rows[3].head_byte_sum == ord("x") * 64  # capped at 64 bytes


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG")


def test_frame_sampling(spark, media):
    frames = frame_sample_stub(media, "id", every_n_bytes=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r.frame_offset)
    assert by_id[1] == [1, 5, 9]  # 11 bytes, stride 4
    assert by_id[2] == [1]  # empty payload still yields one probe


def test_byte_features_string_ids(spark):
    """The mapInPandas schema keeps the caller's id type (a hardcoded
    long broke string-keyed tables, r5 review)."""
    from etlalchemy_spark.operators.multimodal import attach_payload, byte_features

    df = spark.createDataFrame([("doc-a", "hello")], "doc_id string, text string")
    out = byte_features(attach_payload(df, "doc_id", "text"), "doc_id").collect()
    assert out[0]["doc_id"] == "doc-a" and out[0]["n_bytes"] == 5


def test_frame_sample_routes_null_payload(spark):
    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.multimodal import frame_sample_stub

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdefgh")), (2, None)], "doc_id int, payload binary"
    )
    out = frame_sample_stub(df, "doc_id", every_n_bytes=4)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 2}  # NULL payload routed, not dropped
    # the NULL-payload doc yields exactly one placeholder row with NULL
    # frame bytes (greatest() skips the NULL length -> offset 1)
    null_rows = out.where(F.col("doc_id") == 2).collect()
    assert len(null_rows) == 1 and null_rows[0]["frame_bytes"] is None


# -- stdlib codecs (round 6: the last partial closed) ----------------------


def test_wav_decode_golden_roundtrip():
    """Exact sample recovery through the RIFF writer/parser, including
    an interleaved extra chunk (real files carry LIST/fact chunks)."""
    import struct

    import numpy as np

    from etlalchemy_spark.operators.multimodal import decode_wav, encode_wav_pcm16

    samples = np.array([0, 1, -1, 32767, -32768, 1000], dtype=np.int16)
    wav = encode_wav_pcm16(samples, 8000)
    got = decode_wav(wav)
    assert got["sample_rate"] == 8000 and got["n_channels"] == 1
    assert got["n_samples"] == 6
    assert got["duration_us"] == 6 * 1_000_000 // 8000 == 750
    assert got["sum_abs_amplitude"] == 0 + 1 + 1 + 32767 + 32768 + 1000
    assert got["peak_amplitude"] == 32768
    # splice a LIST chunk between fmt and data — the chunk walk must skip it
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = wav[:fmt_end] + extra + wav[fmt_end:]
    assert decode_wav(spliced) == got


def test_wav_decode_rejects_compressed_and_garbage():
    import struct

    import pytest

    from etlalchemy_spark.operators.multimodal import decode_wav, encode_wav_pcm16

    wav = bytearray(encode_wav_pcm16([1, 2, 3], 8000))
    struct.pack_into("<H", wav, 12 + 8, 2)  # audio format 2 = ADPCM
    with pytest.raises(NotImplementedError, match="compressed|PCM"):
        decode_wav(bytes(wav))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG not a wav")


def test_bmp_decode_golden_orientation_stride_and_bgr():
    """3x2 image (stride padding exercised: 3*3=9 -> padded to 12),
    distinct per-pixel values prove row order (bottom-up storage) and
    BGR->RGB recovery, not just sums."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import decode_bmp, encode_bmp_24

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    bmp = encode_bmp_24(px)
    got = decode_bmp(bmp)
    assert (got["width"], got["height"], got["n_pixels"]) == (3, 2, 6)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    assert (got["sum_r"], got["sum_g"], got["sum_b"]) == (
        int(r.sum()),
        int(g.sum()),
        int(b.sum()),
    )
    # byte-level: the padded stride is 12 and the FIRST stored row is the
    # BOTTOM image row, BGR-ordered
    body = bmp[14 + 40 :]
    assert len(body) == 2 * 12
    assert body[:9] == bytes(px[1, :, ::-1].reshape(-1))


def test_bmp_decode_rejects_compression():
    import struct

    import pytest

    from etlalchemy_spark.operators.multimodal import decode_bmp, encode_bmp_24
    import numpy as np

    bmp = bytearray(encode_bmp_24(np.zeros((1, 1, 3), np.uint8)))
    struct.pack_into("<I", bmp, 14 + 16, 5)  # BI_PNG (RLE8 decodes since r11)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(bmp))


def test_ppm_decode_header_comments_and_pixels():
    import numpy as np
    import pytest

    from etlalchemy_spark.operators.multimodal import decode_ppm, encode_ppm_p6

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3) * 10
    ppm = encode_ppm_p6(px)
    got = decode_ppm(ppm)
    assert (got["width"], got["height"]) == (2, 2)
    assert got["sum_r"] == int(px[:, :, 0].sum())
    # comment lines in the header are legal P6 and must be skipped
    commented = b"P6\n# generated by a camera\n2 2\n# maxval next\n255\n" + px.tobytes()
    assert decode_ppm(commented) == got
    # r10: maxval > 255 decodes as 2-byte big-endian samples
    deep = decode_ppm(b"P6\n1 1\n65535\n\x01\x00\x00\x02\xff\xff")
    assert (deep["sum_r"], deep["sum_g"], deep["sum_b"]) == (256, 2, 65535)


def test_decode_image_router_compressed_boundary():
    import pytest

    from etlalchemy_spark.operators.multimodal import decode_image

    # PNG decodes natively since r8 — a bare signature with no IHDR is
    # a MALFORMED png now, not an unimplemented codec
    with pytest.raises(ValueError, match="no IHDR"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    # JPEG decodes natively since r9 — a bare SOI+APP0 with no scan is
    # MALFORMED, not unimplemented; WEBP remains the refusal boundary
    with pytest.raises(ValueError, match="expected marker"):
        decode_image(b"\xff\xd8\xff\xe0\x00\x02..")
    with pytest.raises(NotImplementedError, match="RIFF"):
        decode_image(b"RIFFxxxxWEBPxxxx")


def test_png_roundtrip_all_color_types_and_filters():
    """decode_png recovers exact pixel sums for gray/RGB/RGBA payloads
    written by encode_png, AND for PNGs whose scanlines use every
    filter type (Sub/Up/Average/Paeth) — the part external writers
    exercise that a filter-0-only decoder would get wrong silently."""
    import struct
    import zlib

    import numpy as np

    from etlalchemy_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for ct, ch in ((0, 1), (2, 3), (6, 4)):
        px = rng.integers(0, 256, size=(6, 9, ch), dtype=np.uint8)
        d = decode_png(encode_png(px if ch > 1 else px[:, :, 0], ct))
        a = px.astype(np.int64)
        want = ((int(a.sum()),) * 3 if ct == 0
                else tuple(int(a[:, :, i].sum()) for i in range(3)))
        assert (d["sum_r"], d["sum_g"], d["sum_b"]) == want
        assert (d["width"], d["height"], d["format"]) == (9, 6, "png")

    # hand-filter rows with types 0..4 and confirm exact unfiltering
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = px.shape
    prev, rows = bytes(w * ch), []
    for y, f in zip(range(h), (0, 1, 2, 3, 4)):
        cur = px[y].tobytes()
        out = bytearray()
        for i in range(w * ch):
            x, a = cur[i], (cur[i - ch] if i >= ch else 0)
            b, c = prev[i], (prev[i - ch] if i >= ch else 0)
            if f == 0:
                v = x
            elif f == 1:
                v = (x - a) & 255
            elif f == 2:
                v = (x - b) & 255
            elif f == 3:
                v = (x - ((a + b) >> 1)) & 255
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (x - pred) & 255
            out.append(v)
        rows.append(bytes([f]) + bytes(out))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + _png_chunk(b"IEND", b""))
    d = decode_image(payload)  # router dispatch, not direct call
    a = px.astype(np.int64)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == tuple(
        int(a[:, :, i].sum()) for i in range(3)
    )


def test_png_unsupported_variants_fail_loudly():
    import struct
    import zlib

    import numpy as np
    import pytest

    from etlalchemy_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    def hdr_png(depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 4))
                + _png_chunk(b"IEND", b""))

    # r10: depth 16 / indexed / Adam7 now decode; the refusal surface
    # left is invalid depths, UNKNOWN color types, invalid interlace
    # methods, and an indexed frame missing its PLTE
    with pytest.raises(ValueError, match="bit depth 3"):
        decode_png(hdr_png(3, 2, 0))
    with pytest.raises(NotImplementedError, match="color type 5"):
        decode_png(hdr_png(8, 5, 0))
    with pytest.raises(ValueError, match="interlace method 2"):
        decode_png(hdr_png(8, 2, 2))
    with pytest.raises(ValueError, match="no PLTE"):
        decode_png(hdr_png(8, 3, 0))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a....")
    # truncated scanline payload is detected, not mis-summed
    ok = encode_png(np.zeros((3, 3, 3), np.uint8), 2)
    with pytest.raises(ValueError, match="scanline payload"):
        ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
        decode_png(_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                   + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
                   + _png_chunk(b"IEND", b""))
    assert ok  # writer output itself was consumed above


def test_ima_adpcm_roundtrip_and_guards():
    """IMA ADPCM (WAV format 17): decode must track the encoder's
    shared _ima_step state machine exactly, reconstruct a smooth
    signal within ADPCM's nominal error, and refuse stereo / unknown
    compressed formats loudly."""
    import struct

    import numpy as np
    import pytest

    from etlalchemy_spark.operators.multimodal import (
        _ima_decode_block,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    t = np.arange(2500)
    orig = (3000 * np.sin(t / 30.0) + 500 * np.sin(t / 7.0)).astype(np.int16)
    payload = encode_wav_ima_adpcm(orig, 8000)
    d = decode_wav(payload)
    assert d["sample_rate"] == 8000 and d["n_channels"] == 1
    assert d["n_samples"] == len(orig)  # fact chunk truncates nibble padding

    data = payload[payload.find(b"data") + 8 :]
    dec = []
    for off in range(0, len(data) - 3, 256):
        dec.extend(_ima_decode_block(data[off : off + 256]))
    err = np.abs(np.asarray(dec[: len(orig)]) - orig.astype(np.int64))
    assert float(err.mean()) < 100, f"ADPCM reconstruction error {err.mean():.1f}"

    # golden block: header predictor is sample 0; a zero-nibble stream
    # decays toward the predictor by step>>3 increments
    blk = struct.pack("<hBB", 1000, 0, 0) + b"\x00\x00"
    assert _ima_decode_block(blk)[:3] == [1000, 1000, 1000]  # step 7>>3 = 0

    # stereo decodes natively since r9; >2 channels refuse loudly
    three = bytearray(payload)
    fmt_off = payload.find(b"fmt ") + 8
    struct.pack_into("<H", three, fmt_off + 2, 3)  # n_channels = 3
    with pytest.raises(NotImplementedError, match="3-channel"):
        decode_wav(bytes(three))
    mp3 = bytearray(payload)
    struct.pack_into("<H", mp3, fmt_off, 85)  # MP3-in-WAV stays refused
    with pytest.raises(NotImplementedError, match="format 85"):
        decode_wav(bytes(mp3))


def test_gif_lzw_roundtrip_and_router():
    """GIF decode: real LZW (dictionary growth to 12-bit codes, KwKwK,
    4096-entry CLEAR reset), palette mapping, extension skipping —
    pinned over repetitive, random, dict-saturating, and 4-color
    images, plus the constant-code-size CLEAR-heavy style simple
    external writers emit."""
    import numpy as np
    import pytest

    from etlalchemy_spark.operators.multimodal import (
        _lzw_decode,
        decode_gif,
        decode_image,
        encode_gif,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    cases = [
        ((np.arange(40 * 60) * 7 % 5 % 16).reshape(40, 60).astype(np.uint8), pal),
        (rng.integers(0, 16, size=(120, 130), dtype=np.uint8), pal),  # dict-full
        (rng.integers(0, 4, size=(9, 11), dtype=np.uint8),
         np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)),
    ]
    for idx, p in cases:
        d = decode_image(encode_gif(idx, p))  # router dispatch
        px = p[idx.reshape(-1).astype(np.int64)].astype(np.int64)
        assert (d["sum_r"], d["sum_g"], d["sum_b"]) == tuple(
            int(px[:, i].sum()) for i in range(3)
        )
        assert (d["width"], d["height"]) == (idx.shape[1], idx.shape[0])

    # constant-code-size, CLEAR-before-every-code external style
    min_code, clear, end, cs = 4, 16, 17, 5
    pixels = [3, 7, 15, 0, 0, 9, 9, 9, 2]
    codes = [c for p in pixels for c in (clear, p)] + [end]
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += cs
        while bits >= 8:
            out.append(acc & 255)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 255)
    assert _lzw_decode(bytes(out), min_code) == pixels

    # r10: flipping the interlace flag on a frame whose rows were
    # stored sequentially just permutes rows — channel sums (all this
    # decoder reports) are row-permutation-invariant, so the flip must
    # decode to the same sums, not refuse
    g = bytearray(encode_gif(cases[0][0], pal))
    desc = g.find(b"\x2c")
    g[desc + 9] |= 0x40  # interlace flag
    flipped, straight = decode_gif(bytes(g)), decode_gif(encode_gif(cases[0][0], pal))
    assert {k: flipped[k] for k in ("sum_r", "sum_g", "sum_b")} == {
        k: straight[k] for k in ("sum_r", "sum_g", "sum_b")
    }
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG....")


def test_avi_frame_sampling_and_guards():
    """AVI container walk: sampled-frame channel sums match the raw
    frames exactly, skipped frames stay unrasterized (every_n honored),
    fps survives the avih header, and compressed ('00dc') streams or
    non-AVI RIFFs refuse loudly."""
    import numpy as np
    import pytest

    from etlalchemy_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_rgb,
    )

    rng = np.random.default_rng(13)
    fr = rng.integers(0, 256, size=(7, 5, 9, 3), dtype=np.uint8)
    payload = encode_avi_rgb(fr, fps=25)
    out = decode_avi_frames(payload, every_n=3)
    assert [f["frame_index"] for f in out] == [0, 3, 6]
    for f in out:
        a = fr[f["frame_index"]].astype(np.int64)
        assert (f["sum_r"], f["sum_g"], f["sum_b"]) == tuple(
            int(a[:, :, i].sum()) for i in range(3)
        )
        assert f["us_per_frame"] == 1_000_000 // 25

    comp = bytearray(payload)
    db = comp.find(b"00db")
    comp[db : db + 4] = b"00dc"  # pretend the first frame is compressed
    with pytest.raises(NotImplementedError, match="00dc"):
        decode_avi_frames(bytes(comp))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_resize_nearest_mapping_exact():
    """resize_nearest uses pure integer index arithmetic — each target
    pixel must equal exactly its (y*h//th, x*w//tw) source pixel, for
    upscale and downscale alike."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import resize_nearest

    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    for tw, th in ((4, 3), (18, 12), (1, 1), (9, 6)):
        rz = resize_nearest(px, tw, th)
        assert rz.shape == (th, tw, 3)
        for y2 in range(th):
            for x2 in range(tw):
                assert (rz[y2, x2] == px[(y2 * 6) // th, (x2 * 9) // tw]).all()


def test_video_motion_energy_matches_frames():
    """Motion energy per consecutive frame pair equals the brute |diff|
    of the raw frames; single-frame clips produce no pairs."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_rgb,
    )

    rng = np.random.default_rng(23)
    fr = rng.integers(0, 256, size=(4, 5, 6, 3), dtype=np.uint8)
    out = decode_avi_frames(encode_avi_rgb(fr, 10), every_n=1, with_raster=True)
    for a, b in zip(out, out[1:]):
        d = np.abs(b["raster"] - a["raster"])
        want = np.abs(fr[b["frame_index"]].astype(np.int64) - fr[a["frame_index"]].astype(np.int64))
        # raster is BGR; compare channel-mapped
        assert int(d[:, :, 2].sum()) == int(want[:, :, 0].sum())
        assert int(d[:, :, 1].sum()) == int(want[:, :, 1].sum())
        assert int(d[:, :, 0].sum()) == int(want[:, :, 2].sum())
    one = decode_avi_frames(encode_avi_rgb(fr[:1], 10), every_n=1, with_raster=True)
    assert len(one) == 1  # no pair rows downstream


def test_image_ahash_cross_format_and_pigeonhole():
    """aHash invariants that make the banded join an LSH: (1) the hash
    depends only on PIXELS — the same raster encoded as BMP and as PPM
    hashes identically (that's what lets the registered query plant
    cross-format near-dup pairs); (2) flipping < 4 bits leaves >=1 of
    the 4 bands untouched (pigeonhole), so every Hamming-distance-<4
    pair is guaranteed a band-join candidate."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import (
        decode_raster,
        encode_bmp_24,
        encode_ppm_p6,
        resize_nearest,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(13, 17, 3)).astype(np.uint8)

    def ahash_local(payload):
        _, raster = decode_raster(payload)
        a = raster.astype(np.int64)
        luma = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
        cells = resize_nearest(luma, 8, 8).reshape(64)
        s = int(cells.sum())
        bits = (64 * cells > s).astype(int)
        return [
            sum(int(b) << t for t, b in enumerate(bits[16 * k : 16 * (k + 1)]))
            for k in range(4)
        ]

    assert ahash_local(encode_bmp_24(px)) == ahash_local(encode_ppm_p6(px))

    # pigeonhole: any 3 bit flips leave at least one band equal
    base_bits = [1, 0] * 32
    for flips in [(0, 17, 35), (5, 6, 7), (15, 16, 63)]:
        flipped = list(base_bits)
        for f in flips:
            flipped[f] ^= 1
        bands_a = [base_bits[16 * k : 16 * (k + 1)] for k in range(4)]
        bands_b = [flipped[16 * k : 16 * (k + 1)] for k in range(4)]
        assert any(a == b for a, b in zip(bands_a, bands_b))


def test_image_ahash_operator_schema(spark):
    import numpy as np

    from etlalchemy_spark.operators.multimodal import encode_bmp_24, image_ahash

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2] = 255  # top half bright: deterministic non-trivial bit pattern
    df = spark.createDataFrame([(1, bytearray(encode_bmp_24(px)))], "doc_id long, payload binary")
    row = image_ahash(df, "doc_id").collect()[0]
    assert row.format == "bmp"
    assert [row.b0, row.b1, row.b2, row.b3] == [65535, 65535, 0, 0]


def test_audio_autocorr_detects_period(spark):
    """A clean periodic waveform's best autocorrelation lag IS its
    period, and mono-only refusal fires on stereo payloads."""
    import struct

    import numpy as np
    import pytest

    from etlalchemy_spark.operators.multimodal import audio_autocorr, encode_wav_pcm16

    i = np.arange(80, dtype=np.int64)
    s = np.where(i % 5 < 2, 1500, -900)  # period 5, asymmetric duty cycle
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(s, 8000)))], "doc_id long, payload binary"
    )
    row = audio_autocorr(df, "doc_id", max_lag=8).collect()[0]
    assert row.best_lag == 5
    assert row.energy == int((s * s).sum())
    assert row.zero_crossings == int(((s[:-1] * s[1:]) < 0).sum())

    stereo = bytearray(encode_wav_pcm16(s, 8000))
    struct.pack_into("<H", stereo, 22, 2)  # fmt chunk n_channels -> 2
    df2 = spark.createDataFrame([(2, bytes(stereo))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="mono"):
        audio_autocorr(df2, "doc_id").collect()


def test_mulaw_codec_roundtrip_and_formula():
    """G.711 mu-law: decode formula spot values, companding error
    bound, and container round-trip incl. stereo frame math."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_mulaw,
        mulaw_decode_byte,
        mulaw_encode_sample,
    )

    assert mulaw_decode_byte(0xFF) == 0  # encoded zero
    assert mulaw_decode_byte(0x7F) == -0
    for s in (0, 1, -1, 100, -100, 5000, -5000, 32635, -32635, 32767, -32768):
        d = mulaw_decode_byte(mulaw_encode_sample(s))
        clipped = max(-32635, min(32635, s))
        assert abs(d - clipped) <= max(32, abs(clipped) // 16), (s, d)
    rng = np.random.default_rng(5)
    pcm = rng.integers(-32000, 32000, size=1000).astype(np.int16)
    meta, samples = decode_wav_samples(encode_wav_mulaw(pcm, 8000))
    assert (meta["n_channels"], meta["n_samples"]) == (1, 1000)
    rel = np.abs(samples - pcm) / np.maximum(np.abs(pcm.astype(np.int64)), 64)
    assert np.percentile(rel, 99) < 0.05
    meta2, _ = decode_wav_samples(encode_wav_mulaw(pcm, 8000, n_channels=2))
    assert (meta2["n_channels"], meta2["n_samples"]) == (2, 500)


def test_stereo_adpcm_roundtrip_and_channel_isolation():
    """Stereo IMA ADPCM: bounded reconstruction error per channel and
    per-channel state isolation — each channel must decode exactly as
    its mono encoding does (same _ima_step path, interleaved layout
    only)."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_ima_adpcm,
        encode_wav_ima_adpcm_stereo,
    )

    t = np.arange(1200)
    left = (6000 * np.sin(t / 5)).astype(np.int16)
    right = (-4000 * np.cos(t / 9)).astype(np.int16)
    meta, s = decode_wav_samples(encode_wav_ima_adpcm_stereo(left, right, 16000))
    assert (meta["n_channels"], meta["n_samples"]) == (2, 1200)
    l2, r2 = s[0::2], s[1::2]
    assert np.abs(l2 - left).mean() < 150 and np.abs(r2 - right).mean() < 150
    # channel isolation: stereo left == mono decode when block sample
    # counts line up (stereo block 72 -> 65 samples/ch; mono 132 -> 65)
    _, mono_l = decode_wav_samples(encode_wav_ima_adpcm(left, 16000, block_align=36))
    _, st = decode_wav_samples(
        encode_wav_ima_adpcm_stereo(left, right, 16000, block_align=72)
    )
    assert np.array_equal(st[0::2][: len(left)], mono_l[: len(left)])


def test_wav_format_refusal_still_names_the_codec():
    import struct

    import pytest

    from etlalchemy_spark.operators.multimodal import decode_wav

    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 85, 1, 8000, 8000, 1, 16)  # MP3
    hdr = b"RIFF" + struct.pack("<I", 4 + len(fmt) + 8) + b"WAVE"
    with pytest.raises(NotImplementedError, match="format 85"):
        decode_wav(hdr + fmt + b"data" + struct.pack("<I", 0))


def test_adpcm_oracle_sin_truncation_agreement_exhaustive():
    """The mm_decode_adpcm_stats oracle synthesizes the waveform in
    DuckDB (trunc(2500*sin(i/p1) + 400*sin(i/p2))) while the Spark leg
    uses numpy's astype(int16) — the ONLY cross-engine float risk in
    the pair. The parameter space is finite (p1 = 20 + doc%13,
    p2 = 5 + doc%7, i < 2100 at every SF), so agreement is checked
    EXHAUSTIVELY, not sampled: any numpy/libm sin divergence that
    could flip a truncation boundary fails here before it can show up
    as an oracle hash mismatch."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        "SELECT p1, p2, i, "
        "trunc(2500*sin(CAST(i AS DOUBLE)/p1) + 400*sin(CAST(i AS DOUBLE)/p2)) AS v "
        "FROM generate_series(20,32) t1(p1), generate_series(5,11) t2(p2), "
        "generate_series(0,2099) t3(i)"
    ).fetchnumpy()
    p1 = rows["p1"].astype(np.float64)
    p2 = rows["p2"].astype(np.float64)
    i = rows["i"].astype(np.float64)
    v_np = (2500 * np.sin(i / p1) + 400 * np.sin(i / p2)).astype(np.int16)
    assert (v_np.astype(np.float64) == rows["v"].astype(np.float64)).all()


def test_png_extended_matrix_roundtrip():
    """r10 PNG coverage: indexed (PLTE) at depths 1/2/4/8, grayscale
    sub-byte depths, 16-bit gray/RGB (big-endian samples), and Adam7
    interlacing for every shape — each must decode to the exact sums
    of the source raster, including sizes where some Adam7 passes are
    empty."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(21)
    for depth, ncol in ((8, 256), (4, 16), (2, 4), (1, 2)):
        pal = rng.integers(0, 256, size=(ncol, 3)).astype(np.uint8)
        idx = rng.integers(0, ncol, size=(9, 11))
        rgb = pal.astype(np.int64)[idx]
        for inter in (False, True):
            d = decode_png(
                encode_png(idx, color_type=3, bit_depth=depth, palette=pal,
                           interlace=inter)
            )
            assert (d["sum_r"], d["sum_g"], d["sum_b"]) == tuple(
                int(rgb[:, :, i].sum()) for i in range(3)
            ), (depth, inter)
    for depth in (1, 2, 4):
        g = rng.integers(0, 1 << depth, size=(10, 17))
        d = decode_png(encode_png(g, color_type=0, bit_depth=depth))
        assert d["sum_r"] == int(g.sum()) == d["sum_b"], depth
    g16 = rng.integers(0, 65536, size=(5, 6))
    d = decode_png(encode_png(g16, color_type=0, bit_depth=16))
    assert d["sum_r"] == int(g16.sum())
    px16 = rng.integers(0, 65536, size=(7, 9, 3))
    for inter in (False, True):
        d = decode_png(encode_png(px16, color_type=2, bit_depth=16, interlace=inter))
        assert d["sum_g"] == int(px16[:, :, 1].sum()), inter
    for hw in ((1, 1), (2, 3), (3, 2), (5, 1)):  # empty Adam7 passes
        g = rng.integers(0, 256, size=hw)
        d = decode_png(encode_png(g, color_type=0, interlace=True))
        assert d["sum_r"] == int(g.sum()), hw


def test_png_16bit_filters_unfilter_at_sample_width():
    """Hand-filter 16-bit scanlines with Sub/Up/Average/Paeth at the
    spec's 6-byte left distance (3 channels x 2 bytes) — an 8-bit-only
    unfilter distance would corrupt these silently."""
    import struct
    import zlib

    import numpy as np

    from etlalchemy_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(22)
    px = rng.integers(0, 65536, size=(5, 4, 3))
    h, w, ch = px.shape
    bpp = ch * 2
    raw_rows = [px[y].astype(">u2").tobytes() for y in range(h)]
    prev = bytes(w * bpp)
    body = bytearray()
    for y, f in zip(range(h), (0, 1, 2, 3, 4)):
        cur = raw_rows[y]
        out = bytearray([f])
        for i in range(len(cur)):
            x = cur[i]
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = (x - a) & 255
            elif f == 2:
                v = (x - b) & 255
            elif f == 3:
                v = (x - ((a + b) >> 1)) & 255
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (x - pred) & 255
            out.append(v)
        body += out
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    payload = (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )
    d = decode_png(payload)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == tuple(
        int(px[:, :, i].astype(np.int64).sum()) for i in range(3)
    )


def test_gif_interlace_roundtrip_and_row_placement():
    """r10 GIF interlacing: the four-pass storage order must invert
    exactly — pinned on the helper with row-identifiable content (sums
    alone can't see a row permutation), then end-to-end through the
    LZW encode/decode path."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import (
        _gif_deinterlace,
        _gif_interlace_order,
        decode_gif,
        encode_gif,
    )

    h, w = 13, 4
    display = np.arange(h, dtype=np.uint8)[:, None].repeat(w, axis=1) % 8
    stored = display[_gif_interlace_order(h)]
    assert (_gif_deinterlace(stored) == display).all()
    pal = (np.arange(8 * 3, dtype=np.uint8) * 7 % 256).reshape(8, 3)
    d_inter = decode_gif(encode_gif(display, pal, interlace=True))
    d_plain = decode_gif(encode_gif(display, pal))
    for k in ("sum_r", "sum_g", "sum_b", "width", "height"):
        assert d_inter[k] == d_plain[k], k


def test_ppm_16bit_samples():
    """r10: maxval > 255 PPM carries 2-byte big-endian samples (spec);
    the raster and stats paths must both recover exact values."""
    import numpy as np

    from etlalchemy_spark.operators.multimodal import decode_image_pixels, decode_ppm

    rng = np.random.default_rng(33)
    px = rng.integers(0, 65536, size=(4, 5, 3))
    payload = b"P6\n5 4\n65535\n" + px.astype(">u2").tobytes()
    assert (decode_image_pixels(payload) == px).all()
    d = decode_ppm(payload)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == tuple(
        int(px[:, :, i].sum()) for i in range(3)
    )
    import pytest

    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n70000\n" + b"\x00" * 24)


def test_avi_mjpeg_roundtrip_and_refusal():
    """r10: '00dc' chunks with strf biCompression 'MJPG' decode through
    the in-house JPEG codec (per-frame sums equal the direct JPEG
    decode; sampling honored); any OTHER compressed fourcc still
    refuses loudly by name."""
    import numpy as np
    import pytest

    from etlalchemy_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from etlalchemy_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(41)
    ones = np.ones((8, 8), dtype=np.int64)
    jpegs, expected = [], []
    for _ in range(5):
        y = np.kron(rng.integers(0, 256, size=(2, 3)), ones).astype(np.uint8)
        p = encode_jpeg(y, quality=100)
        jpegs.append(p)
        expected.append(decode_jpeg(p))
    avi = encode_avi_mjpeg(jpegs, 24, 16, fps=5)
    out = decode_avi_frames(avi, every_n=2)
    assert [f["frame_index"] for f in out] == [0, 2, 4]
    for f in out:
        e = expected[f["frame_index"]]
        assert (f["sum_r"], f["sum_g"], f["sum_b"]) == (
            e["sum_r"], e["sum_g"], e["sum_b"],
        )
        assert f["us_per_frame"] == 200000 and (f["width"], f["height"]) == (24, 16)
    bad = bytearray(avi)
    i = bad.find(b"MJPG")
    while i != -1:
        bad[i:i + 4] = b"H264"
        i = bad.find(b"MJPG", i)
    with pytest.raises(NotImplementedError, match="biCompression|H264"):
        decode_avi_frames(bytes(bad))


# --- TIFF LZW / PackBits / predictor (r11) -------------------------------------------


def test_tiff_lzw_early_change_boundary():
    """TIFF LZW's EarlyChange rule: code width bumps at table size
    2^n - 1 (511/1023/2047), one entry earlier than GIF. Data with
    thousands of distinct phrases crosses all three boundaries; a
    width mismatch between encoder and decoder desynchronizes the
    bitstream immediately, so an exact round trip IS the boundary
    proof."""
    import random

    from etlalchemy_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(30000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data
    # dict-full CLEAR path: low-entropy stream overflows 4096 entries
    data2 = bytes(rng.randrange(3) for _ in range(80000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(data2)) == data2
    # MSB-first framing: the stream must OPEN with Clear = 256,
    # i.e. first 9 bits 1_0000_0000
    enc = _tiff_lzw_encode(b"x")
    assert enc[0] == 0x80


def test_tiff_packbits_golden():
    """PackBits control bytes from the spec: n in 0..127 copies n+1
    literals, 129..255 repeats the next byte 257-n times, 128 is a
    noop."""
    from etlalchemy_spark.operators.multimodal import (
        _packbits_decode,
        _packbits_encode,
    )

    # spec-style example: run of 4 'A' then literals 'BCD'
    assert _packbits_decode(bytes([257 - 4, 65, 2, 66, 67, 68])) == b"AAAABCD"
    assert _packbits_decode(bytes([128, 0, 65])) == b"A"  # noop skipped
    enc = _packbits_encode(b"AAAABCD")
    assert enc == bytes([253, 65, 2, 66, 67, 68])
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(bytes([5, 1, 2]))


def test_tiff_compressed_variants_roundtrip():
    """Full-container round trips: LZW / PackBits x predictor x
    multi-strip x byte order, decoded strip bytes exact. Multi-strip
    LZW proves each strip is an independent stream (the property that
    makes compressed TIFF splittable at scale)."""
    import random

    from etlalchemy_spark.operators.multimodal import decode_tiff, encode_tiff_gray8

    rng = random.Random(5)
    px = [[rng.randrange(256) for _ in range(31)] for _ in range(22)]
    flat = bytes(v for row in px for v in row)
    for comp in (5, 32773):
        for pred in (1, 2):
            for rps in (None, 4):
                for be in (False, True):
                    d = decode_tiff(
                        encode_tiff_gray8(px, big_endian=be, compression=comp,
                                          predictor=pred, rows_per_strip=rps)
                    )
                    assert d["strip"] == flat
                    assert d["compression"] == comp and d["predictor"] == pred


def test_tiff_remaining_refusals_are_loud():
    from etlalchemy_spark.operators.multimodal import decode_tiff, encode_tiff_gray8

    blob = bytearray(encode_tiff_gray8([[1, 2], [3, 4]]))
    # patch Compression (tag 259) to 7 = JPEG-in-TIFF
    import struct

    ifd_off = struct.unpack_from("<I", blob, 4)[0]
    n = struct.unpack_from("<H", blob, ifd_off)[0]
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", blob, off)[0]
        if tag == 259:
            struct.pack_into("<H", blob, off + 8, 7)
    with pytest.raises(NotImplementedError, match="Compression 7"):
        decode_tiff(bytes(blob))
    with pytest.raises(NotImplementedError, match="Predictor"):
        encode_tiff_gray8([[1]], predictor=3)


# --- BMP BI_RLE8 (r11) ---------------------------------------------------------------


def test_bmp_rle8_stream_golden():
    """RLE8 control bytes from the BMP spec: (n, v) repeats v n times;
    (0, 0) ends the line, (0, 1) ends the bitmap, (0, 2) is a delta,
    (0, n>=3) starts an absolute run padded to a word boundary."""
    from etlalchemy_spark.operators.multimodal import _bmp_rle8_decode

    # one 4-wide, 2-high image: row0 = [7,7,7,9], row1 = [1,2,3,4]
    stream = bytes(
        [0, 4, 1, 2, 3, 4]      # absolute run of 4 (even: no pad)
        + [0, 0]                # end of line
        + [3, 7, 1, 9]          # run of three 7s, single 9
        + [0, 0, 0, 1]          # end of line, end of bitmap
    )
    assert _bmp_rle8_decode(stream, 4, 2) == [[7, 7, 7, 9], [1, 2, 3, 4]]
    # absolute run of 3 carries a pad byte
    stream2 = bytes([0, 3, 5, 6, 7, 0] + [0, 0, 0, 1])
    assert _bmp_rle8_decode(stream2, 3, 1) == [[5, 6, 7]]
    # delta escape skips pixels (left as index 0)
    stream3 = bytes([1, 9, 0, 2, 2, 0, 1, 8] + [0, 0, 0, 1])
    assert _bmp_rle8_decode(stream3, 5, 1) == [[9, 0, 0, 8, 0]]


def test_bmp_rle8_roundtrip_and_container():
    import random

    from etlalchemy_spark.operators.multimodal import (
        _bmp_rle8_decode,
        _bmp_rle8_encode,
        decode_bmp,
        encode_bmp_rle8,
    )

    rng = random.Random(77)
    for w, h in [(1, 1), (8, 5), (37, 23), (64, 1)]:
        rows = [
            [rng.choice([0, 0, 0, 1, 2, rng.randrange(16)]) for _ in range(w)]
            for _ in range(h)
        ]
        assert _bmp_rle8_decode(_bmp_rle8_encode(rows), w, h) == rows
    pal = [(i * 5 % 256, (i * 7 + 3) % 256, (i * 11 + 1) % 256) for i in range(16)]
    rows = [[rng.randrange(16) for _ in range(37)] for _ in range(23)]
    d = decode_bmp(encode_bmp_rle8(rows, pal))
    assert d["sum_r"] == sum(pal[v][0] for r in rows for v in r)
    assert d["sum_b"] == sum(pal[v][2] for r in rows for v in r)
    assert (d["width"], d["height"]) == (37, 23)


def test_bmp_rle8_refusals():
    import struct

    import pytest as _pytest

    from etlalchemy_spark.operators.multimodal import decode_bmp, encode_bmp_rle8

    blob = bytearray(encode_bmp_rle8([[1, 2]], [(0, 0, 0)] * 16))
    struct.pack_into("<I", blob, 30, 4)  # compression = BI_JPEG
    with _pytest.raises(NotImplementedError, match="compression 4"):
        decode_bmp(bytes(blob))
    blob2 = bytearray(encode_bmp_rle8([[1, 2]], [(0, 0, 0)] * 16))
    struct.pack_into("<H", blob2, 28, 24)  # bpp 24 with RLE8: invalid
    with _pytest.raises(ValueError, match="8-bit"):
        decode_bmp(bytes(blob2))


# --- tiled TIFF (r11) ------------------------------------------------------------------


def test_tiff_tiled_roundtrip_matrix():
    """TIFF 6.0 §15 tiled layout: edge tiles are padded to full tile
    size and cropped on decode; the predictor differences TILE rows
    (tw wide), not image rows; every tile is an independent
    compression stream — across both byte orders and all three
    compressions."""
    import random

    from etlalchemy_spark.operators.multimodal import decode_tiff, encode_tiff_gray8

    rng = random.Random(11)
    for w, h in ((16, 16), (40, 35), (17, 50), (5, 4)):
        px = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        flat = bytes(v for row in px for v in row)
        for comp in (1, 5, 32773):
            for pred in (1, 2):
                for be in (False, True):
                    blob = encode_tiff_gray8(
                        px, big_endian=be, compression=comp,
                        predictor=pred, tile_size=(16, 16),
                    )
                    d = decode_tiff(blob)
                    assert d["strip"] == flat, (w, h, comp, pred, be)
    # non-square tiles + a grid wider than one tile each way
    px = [[rng.randrange(256) for _ in range(70)] for _ in range(40)]
    d = decode_tiff(encode_tiff_gray8(px, compression=5, predictor=2,
                                      tile_size=(32, 16)))
    assert d["strip"] == bytes(v for row in px for v in row)


def test_tiff_tiled_guardrails():
    import struct

    import pytest as _pytest

    from etlalchemy_spark.operators.multimodal import decode_tiff, encode_tiff_gray8

    with _pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff_gray8([[1]], tile_size=(8, 8))
    # a tile-count/grid mismatch must refuse, not read stray offsets:
    # shrink ImageWidth (tag 256) so the declared grid no longer
    # matches the written tile count
    blob = bytearray(
        encode_tiff_gray8([[i % 256 for i in range(40)]] * 20, tile_size=(16, 16))
    )
    ifd_off = struct.unpack_from("<I", blob, 4)[0]
    n = struct.unpack_from("<H", blob, ifd_off)[0]
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", blob, off)[0] == 256:
            struct.pack_into("<I", blob, off + 8, 16)
    with _pytest.raises(ValueError, match="grid"):
        decode_tiff(bytes(blob))


# --- AIFF + TGA (r11) --------------------------------------------------------------------


def test_aiff_matches_wav_stats_and_ext80_exact():
    import numpy as np
    import pytest as _pytest

    from etlalchemy_spark.operators.multimodal import (
        _ext80_pack, _ext80_unpack, decode_aiff, decode_wav,
        encode_aiff_pcm16, encode_wav_pcm16,
    )

    rng = np.random.default_rng(13)
    for n, rate in ((100, 44100), (7, 8000), (255, 48000), (1, 11025)):
        s = rng.integers(-32768, 32767, n, dtype=np.int64)
        a = decode_aiff(encode_aiff_pcm16(s, rate))
        w = decode_wav(encode_wav_pcm16(s, rate))
        for k in ("sample_rate", "n_channels", "n_samples", "duration_us",
                  "sum_abs_amplitude", "peak_amplitude"):
            assert a[k] == w[k], k
    # 80-bit extended float: exact for every common rate
    for rate in (8000, 11025, 22050, 44100, 48000, 96000, 192000, 1):
        assert _ext80_unpack(_ext80_pack(rate)) == rate
    # refusals name the field
    blob = bytearray(encode_aiff_pcm16(np.zeros(4), 8000))
    aifc = blob[:8] + b"AIFC" + blob[12:]
    with _pytest.raises(NotImplementedError, match="AIFC"):
        decode_aiff(bytes(aifc))
    with _pytest.raises(ValueError, match="FORM"):
        decode_aiff(b"RIFFjunkWAVE")


def test_tga_roundtrip_matrix_and_guards():
    import random

    import pytest as _pytest

    from etlalchemy_spark.operators.multimodal import decode_tga, encode_tga

    rng = random.Random(17)
    for w, h in ((1, 1), (7, 5), (130, 3)):
        px = [
            [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(w)]
            for _ in range(h)
        ]
        flat = [[(9, 9, 9)] * w for _ in range(h)]  # >128-px run splits
        for p in (px, flat):
            for rle in (False, True):
                for td in (True, False):
                    d = decode_tga(encode_tga(p, rle=rle, top_down=td))
                    assert d["pixels"] == p, (w, h, rle, td)
    # a run crossing the row boundary must refuse, not wrap silently
    blob = bytearray(encode_tga([[(1, 2, 3)] * 4] * 2, rle=True))
    # craft: header + one RLE packet claiming 8 px on a 4-px row
    bad = blob[:18] + bytes((0x87, 3, 2, 1))
    with _pytest.raises(ValueError, match="row boundary"):
        decode_tga(bytes(bad))
    with _pytest.raises(NotImplementedError, match="32 bpp"):
        hdr = bytearray(encode_tga([[(0, 0, 0)]]))
        hdr[16] = 32
        decode_tga(bytes(hdr))
