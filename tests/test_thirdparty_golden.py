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


def test_tiff_joins_the_png_ppm_cross_witness():
    """The SAME 16x16 logo through a THIRD independent encoder
    (libtiff-family chunky RGBA, CPython imghdrdata) and a third
    in-house decode path (IFD walk + strip assembly) must land on the
    identical RGB sums the PNG and PPM witnesses pin — closing r12
    verdict #8 for the TIFF family with a non-self-encoded fixture.
    (No TIFF-LZW stream from an independent producer exists in this
    sandbox — no PIL/libtiff binaries; the LZW leg stays witnessed by
    round-trips and the GIF family's real-encoder LZW pin.)"""
    from etlalchemy_spark.operators.multimodal import decode_tiff

    d = decode_tiff(_read("python.tiff"))
    assert (d["width"], d["height"], d["samples_per_pixel"]) == (16, 16, 4)
    assert d["compression"] == 1 and d["byte_order"] == "II"
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (24683, 26085, 17950)


def test_wav_ima_adpcm_against_cpython_audioop():
    """IMA-ADPCM witnessed by an INDEPENDENT codec implementation
    (r12 verdict #8): CPython's C `audioop` module implements the same
    DVI/IMA quantizer. Real pluck audio (third-party PCM fixture) is
    compressed by audioop.lin2adpcm per WAV-IMA block (header sample +
    carried step index as the explicit audioop state; audioop packs
    the first nibble HIGH, WAV-IMA packs it LOW, so each byte is
    swapped), wrapped in a WAV format-17 container, and decoded by
    THIS repo's table arithmetic. Asserts (a) our decode equals
    audioop.adpcm2lin's reconstruction sample-for-sample, and (b) our
    own encoder emits the byte-identical nibble stream — quantizer
    agreement with CPython's C implementation on real audio."""
    import struct
    import wave

    import pytest

    audioop = pytest.importorskip("audioop")
    import io

    import numpy as np

    from etlalchemy_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_ima_adpcm,
    )

    with wave.open(io.BytesIO(_read("pluck-pcm16.wav"))) as wf:
        assert wf.getsampwidth() == 2
        rate = wf.getframerate()
        raw = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
        # the pluck fixture is stereo; the mono witness takes the left channel
        pcm = raw[:: wf.getnchannels()]

    block_align = 256
    spb = (block_align - 4) * 2 + 1  # 505 samples/block incl. header
    n_blocks = 2
    pcm = pcm[: n_blocks * spb]

    blocks = bytearray()
    expect = []
    index = 0
    for b in range(n_blocks):
        chunk = [int(x) for x in pcm[b * spb : (b + 1) * spb]]
        pred = chunk[0]
        blocks += struct.pack("<hBB", pred, index, 0)
        frag = np.asarray(chunk[1:], dtype="<i2").tobytes()
        nibbles, (valpred, new_index) = audioop.lin2adpcm(frag, 2, (pred, index))
        swapped = bytes(((x & 0x0F) << 4) | (x >> 4) for x in nibbles)
        blocks += swapped
        # what the independent decoder reconstructs from those nibbles
        rec, _ = audioop.adpcm2lin(nibbles, 2, (pred, index))
        expect.append(pred)
        expect.extend(np.frombuffer(rec, dtype="<i2").tolist())
        index = new_index

    data = bytes(blocks)
    byte_rate = rate * block_align // spb
    fmt = b"fmt " + struct.pack(
        "<IHHIIHHHH", 20, 17, 1, rate, byte_rate, block_align, 4, 2, spb
    )
    fact = b"fact" + struct.pack("<II", 4, n_blocks * spb)
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt) + len(fact) + 8 + len(data))
        + b"WAVE"
        + fmt
        + fact
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    meta, samples = decode_wav_samples(payload)
    assert samples.tolist() == expect
    # (b) encoder witness: our quantizer emits the identical stream
    ours = encode_wav_ima_adpcm(pcm, rate, block_align=block_align)
    our_data = ours[ours.index(b"data") + 8 :]
    assert our_data == data
