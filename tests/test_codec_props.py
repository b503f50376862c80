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
