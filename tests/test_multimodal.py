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
    struct.pack_into("<I", bmp, 14 + 16, 1)  # BI_RLE8
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
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_decode_image_router_compressed_boundary():
    import pytest

    from etlalchemy_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0....")
