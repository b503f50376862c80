"""Property tests for the pure-Python codecs (no Spark session —
hypothesis drives the encoder/decoder pairs directly): every random
image/waveform must survive its container roundtrip with channel sums
(and for raster formats, exact pixels) intact. These are the same
functions the Arrow-batched multimodal operators call per partition,
so a property failure here is a silent corpus-corruption bug there."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etlalchemy_spark.operators.multimodal import (
    decode_bmp,
    decode_gif,
    decode_png,
    decode_ppm,
    decode_raster,
    decode_wav_samples,
    encode_bmp_24,
    encode_gif,
    encode_png,
    encode_ppm_p6,
    encode_wav_pcm16,
    mulaw_decode_byte,
    mulaw_encode_sample,
)

_dims = st.tuples(st.integers(1, 9), st.integers(1, 7))


def _img(data, w, h):
    arr = np.array(data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3,
                                      max_size=w * h * 3)), dtype=np.uint8)
    return arr.reshape(h, w, 3)


@settings(max_examples=40, deadline=None)
@given(st.data(), _dims)
def test_bmp_ppm_png_roundtrip_exact_pixels(data, dims):
    w, h = dims
    px = _img(data, w, h)
    for enc, dec in ((encode_bmp_24, decode_bmp), (encode_ppm_p6, decode_ppm),
                     (encode_png, decode_png)):
        payload = enc(px)
        meta = dec(payload)
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["sum_r"] == int(px[:, :, 0].sum())
        assert meta["sum_g"] == int(px[:, :, 1].sum())
        assert meta["sum_b"] == int(px[:, :, 2].sum())
    # raster-level identity for the formats the raster reader covers
    for enc in (encode_bmp_24, encode_ppm_p6):
        _, raster = decode_raster(enc(px))
        assert np.array_equal(raster, px)


@settings(max_examples=25, deadline=None)
@given(st.data(), _dims, st.sampled_from([4, 8, 16]))
def test_gif_roundtrip_palette_mapped_sums(data, dims, n_colors):
    w, h = dims
    palette = np.array(
        data.draw(st.lists(st.integers(0, 255), min_size=n_colors * 3,
                           max_size=n_colors * 3)),
        dtype=np.uint8,
    ).reshape(n_colors, 3)
    idx = np.array(
        data.draw(st.lists(st.integers(0, n_colors - 1), min_size=w * h,
                           max_size=w * h)),
        dtype=np.uint8,
    ).reshape(h, w)
    meta = decode_gif(encode_gif(idx, palette))
    mapped = palette[idx]
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["sum_r"] == int(mapped[:, :, 0].sum())
    assert meta["sum_g"] == int(mapped[:, :, 1].sum())
    assert meta["sum_b"] == int(mapped[:, :, 2].sum())


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_pcm16_roundtrip_exact(samples, rate):
    meta, got = decode_wav_samples(encode_wav_pcm16(samples, rate))
    assert meta["sample_rate"] == rate and meta["n_samples"] == len(samples)
    assert list(got) == samples


@settings(max_examples=100, deadline=None)
@given(st.integers(-32768, 32767))
def test_mulaw_quantization_is_idempotent(s):
    # lossy by design, but the quantization must be a projection:
    # re-encoding a decoded value reproduces the same byte
    b = mulaw_encode_sample(s)
    d = mulaw_decode_byte(b)
    assert 0 <= b <= 255
    assert mulaw_encode_sample(d) == b


# --- TIFF (r10) --------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=0, max_value=2**31),
    st.booleans(),
)
def test_tiff_roundtrip(w, h, seed, big_endian):
    from etlalchemy_spark.operators.multimodal import decode_tiff, encode_tiff_gray8

    px = [[(seed * 7 + (r * w + c) * 13) % 256 for c in range(w)] for r in range(h)]
    d = decode_tiff(encode_tiff_gray8(px, big_endian=big_endian))
    assert d["width"] == w and d["height"] == h
    assert d["byte_order"] == ("MM" if big_endian else "II")
    assert d["sum_pixels"] == sum(sum(r) for r in px)
    assert d["max_pixel"] == max(max(r) for r in px)


def test_tiff_refusals_name_the_field():
    import struct

    import pytest

    from etlalchemy_spark.operators.multimodal import decode_tiff, encode_tiff_gray8

    b = bytearray(encode_tiff_gray8([[1, 2], [3, 4]]))
    ifd = struct.unpack_from("<I", b, 4)[0]
    n = struct.unpack_from("<H", b, ifd)[0]
    # Compression 5 (LZW) DECODES as of r11 — an uncompressed stream
    # mislabeled as LZW must still fail LOUDLY (short decode), never
    # return wrong pixels; a genuinely unsupported codec (7 =
    # JPEG-in-TIFF) still refuses by name
    for comp, exc, msg in (
        (5, ValueError, "decoded"),
        (7, NotImplementedError, "Compression 7"),
    ):
        bb = bytearray(b)
        for i in range(n):
            off = ifd + 2 + 12 * i
            if struct.unpack_from("<H", bb, off)[0] == 259:
                struct.pack_into("<H", bb, off + 8, comp)
        with pytest.raises(exc, match=msg):
            decode_tiff(bytes(bb))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX\x2a\x00garbage")


# --- Walsh-Hadamard bands (r10) ----------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_wht_parseval_energy_identity(seed):
    """Parseval for the unnormalized WHT: sum_k c_k^2 = n * sum_i s_i^2
    — so the 4 band energies must sum to exactly n times the signal
    energy, whatever the signal."""
    import numpy as np
    import pandas as pd

    from etlalchemy_spark.operators.multimodal import (
        encode_wav_pcm16,
        wht_band_table,
    )

    n = 64
    i = np.arange(n, dtype=np.int64)
    samples = (seed * 31 + i * 17) % 65536 - 32768
    x = samples.copy()
    h = 1
    while h < n:
        for s0 in range(0, n, h * 2):
            a = x[s0 : s0 + h].copy()
            b = x[s0 + h : s0 + 2 * h].copy()
            x[s0 : s0 + h] = a + b
            x[s0 + h : s0 + 2 * h] = a - b
        h *= 2
    assert int((x.astype(object) ** 2).sum()) == n * int(
        (samples.astype(object) ** 2).sum()
    )
    # and the band table is a partition of all 64 coefficients
    tbl = wht_band_table(n, 4)
    assert sorted(set(tbl)) == [0, 1, 2, 3] and len(tbl) == n
    assert all(tbl.count(b) == 16 for b in range(4))


# --- EXIF (r10) --------------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=28),
    st.booleans(),
)
def test_exif_roundtrip(cam, orientation, day, big_endian):
    from etlalchemy_spark.operators.multimodal import decode_exif, encode_exif_jpeg

    dt = f"2024:01:{day:02d} 10:30:00"
    d = decode_exif(
        encode_exif_jpeg(f"CAM-{cam}", orientation, dt, (300, 1), big_endian=big_endian)
    )
    assert d["make"] == f"CAM-{cam}" and d["orientation"] == orientation
    assert d["datetime"] == dt and (d["xres_num"], d["xres_den"]) == (300, 1)
    assert d["byte_order"] == ("MM" if big_endian else "II")


def test_exif_refusals():
    import pytest

    from etlalchemy_spark.operators.multimodal import decode_exif

    with pytest.raises(ValueError, match="SOI"):
        decode_exif(b"not a jpeg")
    # valid JPEG envelope, no APP1
    with pytest.raises(ValueError, match="APP1"):
        decode_exif(b"\xff\xd8\xff\xd9")
