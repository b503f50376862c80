"""Baseline JPEG codec (operators/jpeg.py): exact DC-only roundtrips,
bounded general-image loss, golden-byte pin, honest refusals."""

import hashlib

import numpy as np
import pytest

from etlalchemy_spark.operators.jpeg import decode_jpeg, encode_jpeg
from etlalchemy_spark.operators.multimodal import decode_image


def _flat(rng, nbx, nby):
    blocks = rng.integers(0, 256, size=(nby, nbx))
    return np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_flat_block_grayscale_exact_roundtrip():
    rng = np.random.default_rng(1)
    for h, w in ((8, 8), (16, 40), (48, 16)):
        y = _flat(rng, w // 8, h // 8)
        d = decode_jpeg(encode_jpeg(y, quality=100))
        assert (d["planes"][0] == y).all()
        assert d["sum_y"] == int(y.sum(dtype=np.int64))
        assert (d["width"], d["height"], d["subsampling"]) == (w, h, "gray")


def test_flat_block_444_and_420_exact_roundtrip():
    rng = np.random.default_rng(2)
    h, w = 32, 48
    y = _flat(rng, w // 8, h // 8)
    cb, cr = _flat(rng, w // 8, h // 8), _flat(rng, w // 8, h // 8)
    d = decode_jpeg(encode_jpeg(y, cb, cr, quality=100, subsampling="444"))
    assert (d["planes"][0] == y).all() and (d["planes"][1] == cb).all()
    assert d["subsampling"] == "444"
    cb2, cr2 = _flat(rng, w // 16, h // 16), _flat(rng, w // 16, h // 16)
    d = decode_jpeg(encode_jpeg(y, cb2, cr2, quality=100, subsampling="420"))
    assert (d["planes"][0] == y).all()
    assert (d["planes"][1] == cb2).all() and (d["planes"][2] == cr2).all()
    assert d["subsampling"] == "420"


def test_general_image_loss_is_bounded():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, size=(40, 64)).astype(np.uint8)
    for quality, bound in ((100, 1.0), (75, 15.0)):
        d = decode_jpeg(encode_jpeg(y, quality=quality))
        mae = np.abs(d["planes"][0] - y.astype(np.int64)).mean()
        assert mae <= bound, (quality, mae)
    # smooth gradients compress near-losslessly even at q75
    x = np.arange(64)[None, :] + np.arange(40)[:, None]
    smooth = (x * 2 % 256).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(smooth, quality=75))
    assert np.abs(d["planes"][0] - smooth.astype(np.int64)).mean() <= 6.0


def test_golden_bytes_and_sums_pinned():
    """Deterministic encoder: byte-identical output and pinned decoded
    sums across rounds/machines — drift in tables, rounding, or bit
    packing shows up here first."""
    y = np.kron(
        np.array([[0, 255], [128, 7]], dtype=np.int64), np.ones((8, 8), dtype=np.int64)
    ).astype(np.uint8)
    payload = encode_jpeg(y, quality=100)
    assert hashlib.md5(payload).hexdigest() == _GOLDEN_MD5
    d = decode_jpeg(payload)
    assert d["sum_y"] == 64 * (0 + 255 + 128 + 7)
    assert d["sum_r"] == d["sum_y"]  # grayscale replicates Y


def test_rgb_conversion_formula():
    y = np.full((8, 8), 100, dtype=np.uint8)
    cb = np.full((8, 8), 200, dtype=np.uint8)
    cr = np.full((8, 8), 60, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(y, cb, cr, quality=100, subsampling="444"))
    r = min(max(int(np.floor(100 + 1.402 * (60 - 128) + 0.5)), 0), 255)
    g = min(max(int(np.floor(100 - 0.344136 * (200 - 128) - 0.714136 * (60 - 128) + 0.5)), 0), 255)
    b = min(max(int(np.floor(100 + 1.772 * (200 - 128) + 0.5)), 0), 255)
    assert d["sum_r"] == 64 * r and d["sum_g"] == 64 * g and d["sum_b"] == 64 * b


def test_byte_stuffing_roundtrip():
    """Values engineered to emit 0xFF bytes in the entropy stream must
    survive the stuff/unstuff path."""
    rng = np.random.default_rng(4)
    for _ in range(10):
        y = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(y, quality=90))
        assert d["width"] == 16 and d["height"] == 16


def test_router_dispatches_jpeg():
    y = np.full((8, 8), 42, dtype=np.uint8)
    d = decode_image(encode_jpeg(y, quality=100))
    assert d["format"] == "jpeg" and d["sum_r"] == 64 * 42


def test_refusals_name_the_field():
    y = np.full((8, 8), 9, dtype=np.uint8)
    payload = bytearray(encode_jpeg(y, quality=100))
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2): r10 decodes real
    # progressive streams, so the mislabeled baseline scan (Ss=0 with
    # Se=63 — illegal for a progressive DC scan) must refuse as
    # corrupt, not decode garbage
    i = bytes(payload).find(b"\xff\xc0")
    prog = payload[:i] + b"\xff\xc2" + payload[i + 2:]
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(prog))
    # SOF1 (extended sequential) still refuses by name
    sof1 = payload[:i] + b"\xff\xc1" + payload[i + 2:]
    with pytest.raises(NotImplementedError, match="SOF1"):
        decode_jpeg(bytes(sof1))
    # a DECLARED restart interval whose RST markers never arrive must
    # fail loudly (the stream disagrees with its own DRI), not decode
    # garbage — an 8x8 image is one MCU, so interval 16 never fires
    # and a smaller image can't exercise it; corrupt-declaration is
    # the refusal shape left now that DRI itself decodes (r10)
    dri = payload[:2] + b"\xff\xdd\x00\x04\x00\x10" + payload[2:]
    assert decode_jpeg(bytes(dri))["sum_y"] == 64 * 9  # interval > MCUs: benign
    # Pq=1 flipped onto an 8-bit table body lies about its own length:
    # must refuse as truncated, never misparse half a table (16-bit
    # DQT itself decodes as of r11 — see test_dqt_16bit_roundtrip)
    j = bytes(payload).find(b"\xff\xdb")
    q16 = bytearray(payload)
    q16[j + 4] = 0x10
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(bytes(q16))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01")


def test_encoder_rejects_bad_geometry():
    y = np.zeros((12, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 8"):
        encode_jpeg(y, quality=100)
    y = np.zeros((16, 16), dtype=np.uint8)
    cb = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(ValueError, match="half-size"):
        encode_jpeg(y, cb, cb, quality=100, subsampling="420")


# md5 of encode_jpeg(kron([[0,255],[128,7]], ones(8,8)), quality=100),
# pinned as a LITERAL: any drift in tables, rounding, or bit packing
# across rounds/machines fails here first.
_GOLDEN_MD5 = "ee5a98efdc9ed8be3f5dbf81126f7b4b"


def test_flat_block_422_exact_roundtrip():
    rng = np.random.default_rng(7)
    h, w = 24, 48
    y = _flat(rng, w // 8, h // 8)
    cb, cr = _flat(rng, w // 16, h // 8), _flat(rng, w // 16, h // 8)
    d = decode_jpeg(encode_jpeg(y, cb, cr, quality=100, subsampling="422"))
    assert d["subsampling"] == "422"
    assert (d["planes"][0] == y).all()
    assert (d["planes"][1] == cb).all() and (d["planes"][2] == cr).all()
    # RGB sums use the horizontally-replicated chroma
    assert d["n_pixels"] == h * w


def test_restart_interval_roundtrip_all_geometries():
    """DRI + RSTn (r10): the stream byte-aligns, emits the modulo-8
    marker, and resets DC predictors every `ri` MCUs — decode must be
    bit-identical to the no-DRI decode for every subsampling and for
    intervals that do and don't divide the MCU count (incl. ri=1 and
    an interval needing RST7→RST0 wraparound at >8 restarts)."""
    rng = np.random.default_rng(8)
    h, w = 32, 64
    y = _flat(rng, w // 8, h // 8)
    cb4, cr4 = _flat(rng, w // 8, h // 8), _flat(rng, w // 8, h // 8)
    cb0, cr0 = _flat(rng, w // 16, h // 16), _flat(rng, w // 16, h // 16)
    cb2, cr2 = _flat(rng, w // 16, h // 8), _flat(rng, w // 16, h // 8)
    cases = [
        dict(),                                                # gray
        dict(cb=cb4, cr=cr4, subsampling="444"),
        dict(cb=cb0, cr=cr0, subsampling="420"),
        dict(cb=cb2, cr=cr2, subsampling="422"),
    ]
    for kw in cases:
        base = decode_jpeg(encode_jpeg(y, quality=100, **kw))
        for ri in (1, 3, 5):  # 32 MCUs (gray/444): ri=1 wraps RST0..7 4x
            d = decode_jpeg(encode_jpeg(y, quality=100, restart_interval=ri, **kw))
            for k in ("sum_y", "sum_cb", "sum_cr", "sum_r", "sum_g", "sum_b"):
                assert d[k] == base[k], (kw.get("subsampling", "gray"), ri, k)
            assert (d["planes"][0] == base["planes"][0]).all()


def test_restart_marker_mismatch_fails_loudly():
    rng = np.random.default_rng(9)
    y = _flat(rng, 8, 4)  # 32 blocks, gray: 32 MCUs
    payload = bytearray(encode_jpeg(y, quality=100, restart_interval=4))
    # find the first RST0 (FFD0) in the entropy stream and corrupt its
    # sequence number to RST3 — the modulo check must catch it
    i = bytes(payload).find(b"\xff\xd0")
    assert i > 0
    payload[i + 1] = 0xD3
    with pytest.raises(ValueError, match="expected RST0"):
        decode_jpeg(bytes(payload))


def test_progressive_decode_equals_baseline_bit_exact():
    """SOF2 (r10): the progressive scan script encodes exactly the
    same quantized coefficients as the sequential encoder, so after
    all scans — DC first at Al=1, banded AC first passes, DC
    refinement, chained AC refinements to Al=0 — the decode must be
    BIT-IDENTICAL to the baseline decode, for every geometry and for
    lossy qualities (not just DC-only fixtures)."""
    from etlalchemy_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(31)
    cases = []
    y = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    for q in (100, 90, 75):
        cases.append((f"gray q{q}", dict(quality=q), (y,)))
    y3 = rng.integers(0, 256, size=(32, 48)).astype(np.uint8)
    cb4 = rng.integers(0, 256, size=(32, 48)).astype(np.uint8)
    cr4 = rng.integers(0, 256, size=(32, 48)).astype(np.uint8)
    cases.append(("444", dict(quality=85, subsampling="444"), (y3, cb4, cr4)))
    cb0 = rng.integers(0, 256, size=(16, 24)).astype(np.uint8)
    cr0 = rng.integers(0, 256, size=(16, 24)).astype(np.uint8)
    cases.append(("420", dict(quality=80, subsampling="420"), (y3, cb0, cr0)))
    cb2 = rng.integers(0, 256, size=(32, 24)).astype(np.uint8)
    cr2 = rng.integers(0, 256, size=(32, 24)).astype(np.uint8)
    cases.append(("422", dict(quality=95, subsampling="422"), (y3, cb2, cr2)))
    for tag, kw, planes in cases:
        b = decode_jpeg(encode_jpeg(*planes, **kw))
        p = decode_jpeg(encode_jpeg_progressive(*planes, **kw))
        for k in ("width", "height", "subsampling", "sum_y", "sum_cb", "sum_cr",
                  "sum_r", "sum_g", "sum_b"):
            assert b[k] == p[k], (tag, k)
        for pb, pp in zip(b["planes"], p["planes"]):
            assert (pb == pp).all(), tag


def test_progressive_golden_bytes_pinned():
    """Deterministic progressive encoder: byte-identical output across
    rounds/machines — drift in the scan script, EOB/ZRL emission, or
    correction-bit buffering fails here first."""
    from etlalchemy_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(77)
    y = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    payload = encode_jpeg_progressive(y, quality=80)
    assert hashlib.md5(payload).hexdigest() == _GOLDEN_PROG_MD5
    d = decode_jpeg(payload)
    b = decode_jpeg(encode_jpeg(y, quality=80))
    assert d["sum_y"] == b["sum_y"]


# md5 of encode_jpeg_progressive(rng(77) 16x16 gray, quality=80),
# pinned as a LITERAL like the baseline golden hash
_GOLDEN_PROG_MD5 = "d3ec9e6295fde71aa8f920e80014d0e9"


def test_dqt_16bit_roundtrip():
    """Pq=1 (16-bit big-endian) quant tables decode; a flat-block
    image at quality 100 stays DC-exact through them, and the stream
    differs from the Pq=0 encoding only in the DQT segments."""
    from etlalchemy_spark.operators.jpeg import _parse_dqt

    y = np.full((16, 16), 77, dtype=np.uint8)
    cb = np.full((16, 16), 40, dtype=np.uint8)
    cr = np.full((16, 16), 200, dtype=np.uint8)
    wide = encode_jpeg(y, cb, cr, quality=100, dqt_16bit=True)
    narrow = encode_jpeg(y, cb, cr, quality=100)
    assert wide != narrow and len(wide) == len(narrow) + 2 * 64
    d16, d8 = decode_jpeg(wide), decode_jpeg(narrow)
    for k in ("sum_y", "sum_cb", "sum_cr", "sum_r", "sum_g", "sum_b"):
        assert d16[k] == d8[k]
    # entries above 255 survive the 16-bit path (pure parse check)
    import struct as _s

    tabs = {}
    body = bytes([0x10]) + b"".join(_s.pack(">H", 300 + i) for i in range(64))
    _parse_dqt(body, tabs)
    assert tabs[0][0] == 300 and tabs[0][63] == 363


@pytest.mark.parametrize("pred", list(range(1, 8)))
def test_lossless_roundtrip_all_predictors(pred):
    from etlalchemy_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(pred)
    a = rng.integers(0, 256, size=(11, 17), dtype=np.int64)
    d = decode_jpeg(encode_jpeg_lossless(a, predictor=pred))
    assert d["format"] == "jpeg_lossless" and d["predictor"] == pred
    assert (d["planes"][0] == a).all()
    assert d["sum_y"] == int(a.sum()) == d["sum_r"]


@pytest.mark.parametrize("prec", [2, 8, 12, 16])
def test_lossless_precision_and_three_components(prec):
    from etlalchemy_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(prec)
    pls = [
        rng.integers(0, 1 << prec, size=(7, 9), dtype=np.int64) for _ in range(3)
    ]
    d = decode_jpeg(encode_jpeg_lossless(pls, predictor=4, precision=prec))
    assert d["precision"] == prec
    for i in range(3):
        assert (d["planes"][i] == pls[i]).all()
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == tuple(
        int(p.sum()) for p in pls
    )


def test_lossless_point_transform_and_refusals():
    from etlalchemy_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(6, 6), dtype=np.int64)
    d = decode_jpeg(encode_jpeg_lossless(a, predictor=5, point_transform=3))
    assert (d["planes"][0] == (a >> 3)).all()
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(a, predictor=8)
    with pytest.raises(ValueError, match="range"):
        encode_jpeg_lossless(a, precision=4)
    # a DRI segment ahead of a lossless scan refuses by name
    blob = bytearray(encode_jpeg_lossless(a))
    dri = blob[:2] + b"\xff\xdd\x00\x04\x00\x08" + blob[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg(bytes(dri))


def test_lossless_wraparound_diff():
    """A 0 -> 65535 jump at 16-bit precision exercises the mod-2^16
    difference arithmetic and the SSSS=16 no-extra-bits category."""
    from etlalchemy_spark.operators.jpeg import encode_jpeg_lossless

    a = np.array([[0, 65535, 0, 32768], [65535, 0, 32768, 1]], dtype=np.int64)
    d = decode_jpeg(encode_jpeg_lossless(a, predictor=1, precision=16))
    assert (d["planes"][0] == a).all()


def test_quantize_grid_equals_per_block():
    """The batched-matmul quantizer (r12 verdict #9 speedup) must be
    element-for-element identical to the per-block reference on
    arbitrary content — the bit-exactness the golden byte pins rely
    on."""
    from etlalchemy_spark.operators.jpeg import (
        _quantize_block,
        _quantize_grid,
        _scaled_quant,
        QUANT_LUMA,
    )

    rng = np.random.default_rng(123)
    plane = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    for quality in (50, 80, 100):
        q = _scaled_quant(QUANT_LUMA, quality)
        grid = _quantize_grid(plane, q)
        for by in range(3):
            for bx in range(5):
                ref = _quantize_block(plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8], q)
                assert (grid[by, bx] == ref).all(), (quality, by, bx)


def test_progressive_random_content_equals_baseline():
    """Wider randomized sweep than the golden pin: for random planes at
    mixed qualities/subsamplings, progressive encode→decode must land
    on the SAME pixel sums as the baseline path (the coefficients are
    identical by construction; only their scan order differs)."""
    from etlalchemy_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(2024)
    for quality, sub in [(80, "444"), (100, "420"), (60, "444")]:
        y = rng.integers(0, 256, size=(16, 32)).astype(np.uint8)
        if sub == "420":
            cb = rng.integers(0, 256, size=(8, 16)).astype(np.uint8)
            cr = rng.integers(0, 256, size=(8, 16)).astype(np.uint8)
        else:
            cb = rng.integers(0, 256, size=(16, 32)).astype(np.uint8)
            cr = rng.integers(0, 256, size=(16, 32)).astype(np.uint8)
        p = decode_jpeg(encode_jpeg_progressive(y, cb, cr, quality=quality, subsampling=sub))
        b = decode_jpeg(encode_jpeg(y, cb, cr, quality=quality, subsampling=sub))
        for key in ("sum_y", "sum_cb", "sum_cr", "width", "height"):
            assert p[key] == b[key], (quality, sub, key)
