"""Third-party-encoded codec witnesses (r11 verdict #9).

Every other multimodal gate decodes bytes that THIS repo's encoders
wrote, so an encoder/decoder pair could share a bug and still pass.
The fixtures under tests/data/thirdparty/ were written by OTHER
software (CPython/IPython test data — see the README there); pinning
their decoded stats breaks that symmetry. The strongest check is the
PNG-vs-PPM cross-witness: the SAME 16x16 image through two unrelated
third-party encoders and two unrelated in-house decode paths
(zlib inflate + filter reconstruction vs raw ASCII triples) must land
on identical RGB sums.
"""

from __future__ import annotations

import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "thirdparty")


def _read(name: str) -> bytes:
    with open(os.path.join(DATA, name), "rb") as fh:
        return fh.read()


def test_png_ppm_cross_witness():
    from etlalchemy_spark.operators.multimodal import decode_png, decode_ppm

    png = decode_png(_read("python.png"))
    ppm = decode_ppm(_read("python.ppm"))
    assert (png["width"], png["height"]) == (ppm["width"], ppm["height"]) == (16, 16)
    assert (png["sum_r"], png["sum_g"], png["sum_b"]) == (
        ppm["sum_r"], ppm["sum_g"], ppm["sum_b"],
    ) == (24683, 26085, 17950)


def test_gif_thirdparty_pin():
    # real-encoder LZW stream (GIF87a/89a palette + sub-blocks)
    from etlalchemy_spark.operators.multimodal import decode_gif

    d = decode_gif(_read("python.gif"))
    assert (d["width"], d["height"]) == (16, 16)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (23450, 24868, 17269)


def test_jpeg_thirdparty_pins():
    from etlalchemy_spark.operators.jpeg import decode_jpeg

    # 16x16 4:2:0 baseline stream from a real libjpeg-family encoder
    d = decode_jpeg(_read("python.jpg"))
    assert (d["width"], d["height"], d["subsampling"]) == (16, 16, "420")
    assert (d["sum_y"], d["sum_r"], d["sum_g"], d["sum_b"]) == (
        24862, 25121, 26232, 19612,
    )
    # 2x2 grayscale baseline (IPython fixture): uniform mid-gray
    g = decode_jpeg(_read("gray2x2.jpg"))
    assert (g["width"], g["height"], g["subsampling"]) == (2, 2, "gray")
    assert g["sum_y"] == g["sum_r"] == 512


def test_jpeg_lossy_stays_near_the_lossless_twin():
    # python.jpg and python.png encode the SAME image; JPEG is lossy,
    # so the decoded sums must sit NEAR the lossless truth (a decoder
    # bug that still parses tends to be wildly off, not 2% off)
    from etlalchemy_spark.operators.jpeg import decode_jpeg
    from etlalchemy_spark.operators.multimodal import decode_png

    j = decode_jpeg(_read("python.jpg"))
    p = decode_png(_read("python.png"))
    for ch in ("sum_r", "sum_g", "sum_b"):
        assert abs(j[ch] - p[ch]) / p[ch] < 0.10, (ch, j[ch], p[ch])


def test_wav_aiff_thirdparty_pins():
    from etlalchemy_spark.operators.multimodal import decode_aiff, decode_wav

    w = decode_wav(_read("pluck-pcm16.wav"))
    a = decode_aiff(_read("pluck-pcm16.aiff"))
    # same source audio, two third-party container writers
    for d in (w, a):
        assert (d["sample_rate"], d["n_channels"], d["n_samples"]) == (11025, 2, 3307)
        assert d["duration_us"] == 299954
        assert d["peak_amplitude"] == 32768
    assert w["sum_abs_amplitude"] == 22064211
    assert a["sum_abs_amplitude"] == 22064451


def test_webp_lossy_refusal_on_real_bytes():
    # the only real-world webp on this machine is lossy VP8X — the
    # documented refusal boundary must hold on third-party bytes too,
    # loudly and by name
    from etlalchemy_spark.operators.webp import decode_webp

    with pytest.raises(NotImplementedError, match="VP8X"):
        decode_webp(_read("python.webp"))


def test_pgm_pbm_thirdparty_pins():
    # P5 graymap + P4 packed-bit bitmap of the same 16x16 logo from
    # CPython's imghdr fixtures — the netpbm family's other two
    # binary forms, decoded from bytes no in-house writer produced
    from etlalchemy_spark.operators.multimodal import decode_pbm, decode_pgm

    g = decode_pgm(_read("python.pgm"))
    assert (g["width"], g["height"], g["maxval"]) == (16, 16, 255)
    assert (g["sum_gray"], g["max_gray"]) == (25193, 255)
    b = decode_pbm(_read("python.pbm"))
    assert (b["width"], b["height"]) == (16, 16)
    assert (b["n_black"], b["sum_gray"]) == (149, 27285)
