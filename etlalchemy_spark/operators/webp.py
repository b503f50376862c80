"""WEBP-lossless (VP8L) codec, pure Python, from the public spec
(https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification).

Closes the longest-standing entry on the codec refusal list: the r9
boundary said "WEBP refuses loudly"; this implements the LOSSLESS
bitstream — RIFF/VP8L container, LSB-first bit reader, canonical
Huffman (both the SIMPLE 1-2-symbol form and the full
code-length-coded form with 16/17/18 repeat codes), LZ77
backward references with prefix-coded lengths/distances, the COLOR
CACHE (spec hash 0x1e35a7bd, every produced pixel inserts), and the
SUBTRACT_GREEN transform.

All four spec transforms decode: SUBTRACT_GREEN, PREDICTOR (14
modes), CROSS_COLOR, COLOR_INDEXING (palette). The 2D-neighbor
distance map (plane codes 1..120) decodes as of r11 (``_DIST_MAP``);
the encoder emits plane codes with ``plane_codes=True``. The one
remaining refusal: VP8 (lossy) chunks — and that boundary is
deliberate, not deferred: VP8 entropy decoding requires ~1k-entry
default/update probability tables (coeff, mode) that cannot be
verified offline in this container, and a from-memory transcription
paired with an in-house encoder would ROUND-TRIP even if wrong (the
encoder/decoder would share the error), silently corrupting
third-party files. VP8L's distance map was closeable because its 120
entries derive from a checkable ordering rule; no such derivation
exists for the VP8 probability tables.

Scale shape: like every codec here, decode runs partition-local
inside Arrow ``mapInPandas`` batches; only stats rows leave."""

from __future__ import annotations

import struct

# 2D-neighbor distance map (spec "distance mapping", plane codes
# 1..120).  The spec lists 120 (xoffset, yoffset) pairs; the listing
# is exactly the neighbors {x in [-7, 8], y in [0, 7]} minus the
# non-causal row {y == 0, x <= 0}, ordered by squared Euclidean
# distance with ties broken by |x| then positive-x-first.  We derive
# it from that rule rather than transcribing 120 literals — the
# derivation reproduces the spec table row-for-row (pinned in
# tests/test_webp.py::test_distance_map_matches_spec_listing).
_DIST_MAP: list = sorted(
    [(x, y) for y in range(8) for x in range(-7, 9) if not (y == 0 and x <= 0)],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0),
)


def _map_dist(plane: int, w: int) -> int:
    """Plane code -> pixel distance at coded width w. Codes > 120 are
    raw (dist = code - 120); codes 1..120 look up the neighbor map,
    clamped to 1 when the mapped offset is non-causal at this width."""
    if plane > 120:
        return plane - 120
    x, y = _DIST_MAP[plane - 1]
    return max(1, x + y * w)


def _dist_inverse(w: int) -> dict:
    """dist -> smallest plane code mapping to it at coded width w.
    Only exact (unclamped, >= 1) distances are invertible; anything
    else encodes raw as dist + 120."""
    inv: dict = {}
    for code, (x, y) in enumerate(_DIST_MAP, start=1):
        d = x + y * w
        if d >= 1 and d not in inv:
            inv[d] = code
    return inv


# ---------------------------------------------------------------- bit I/O


class BitWriter:
    """LSB-first within each byte (the VP8L stream order)."""

    def __init__(self) -> None:
        self._bits: int = 0
        self._n: int = 0
        self._out = bytearray()

    def write(self, value: int, n_bits: int) -> None:
        """Write the low n_bits of value, LSB first."""
        self._bits |= (value & ((1 << n_bits) - 1)) << self._n
        self._n += n_bits
        while self._n >= 8:
            self._out.append(self._bits & 0xFF)
            self._bits >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman code bits go MSB-first (tree-walk order)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self._out)
        if self._n:
            out.append(self._bits & 0xFF)
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def read(self, n_bits: int) -> int:
        v = 0
        for i in range(n_bits):
            byte = self._d[self._pos >> 3]
            v |= ((byte >> (self._pos & 7)) & 1) << i
            self._pos += 1
        return v


# ---------------------------------------------------------------- huffman

_MAX_LEN = 15


def huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code lengths from frequencies — textbook heap Huffman. Small
    alphabets + fixture-sized depth, so no length-limiting pass is
    needed; an over-deep tree raises rather than emitting an invalid
    stream."""
    import heapq

    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        raise ValueError("huffman over empty alphabet")
    if len(syms) == 1:
        return {syms[0]: 0}  # 1-symbol code: zero bits per symbol
    h = [(freqs[s], i, (s,)) for i, s in enumerate(sorted(syms))]
    heapq.heapify(h)
    depth = {s: 0 for s in syms}
    uid = len(h)
    while len(h) > 1:
        fa, _, a = heapq.heappop(h)
        fb, _, b = heapq.heappop(h)
        for s in a + b:
            depth[s] += 1
        heapq.heappush(h, (fa + fb, uid, a + b))
        uid += 1
    if max(depth.values()) > _MAX_LEN:
        raise NotImplementedError(
            f"VP8L: huffman depth {max(depth.values())} > 15 (length limiting)"
        )
    return depth


def canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """DEFLATE-style canonical assignment: symbols sorted by
    (length, symbol); returns {symbol: (code, length)}."""
    code = 0
    prev_len = 0
    out: dict[int, tuple[int, int]] = {}
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        if ln == 0:
            continue
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


class HuffTree:
    """Bit-at-a-time decode tree from canonical lengths."""

    __slots__ = ("root", "single")

    def __init__(self, lengths: dict[int, int]) -> None:
        nonzero = {s: l for s, l in lengths.items() if l > 0}
        if not nonzero:
            singles = [s for s, l in lengths.items() if l == 0]
            if len(singles) != 1:
                raise ValueError("invalid huffman lengths")
            self.single = singles[0]
            self.root = None
            return
        self.single = None
        self.root: list = [None, None]
        for sym, (code, ln) in canonical_codes(nonzero).items():
            node = self.root
            for i in range(ln - 1, 0, -1):
                b = (code >> i) & 1
                if node[b] is None:
                    node[b] = [None, None]
                node = node[b]
            node[code & 1] = sym

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        node = self.root
        while True:
            node = node[br.read(1)]
            if not isinstance(node, list):
                if node is None:
                    raise ValueError("VP8L: invalid huffman code in stream")
                return node


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


def _write_huffman_code(bw: BitWriter, lengths: dict[int, int]) -> None:
    """Emit one Huffman code: SIMPLE form for <= 2 used symbols, else
    the full code-length-coded form (no 16/17/18 repeats on the write
    side — the reader handles them; zeros are emitted literally)."""
    used = sorted(s for s, l in lengths.items() if l >= 0 and (l > 0 or len(lengths) == 1))
    nonzero = sorted(s for s, l in lengths.items() if l > 0)
    if len(nonzero) == 0 and len(lengths) == 1:
        nonzero = list(lengths)  # 1-symbol code, length 0
    if len(nonzero) <= 2 and all(s <= 255 for s in nonzero):
        bw.write(1, 1)  # simple
        n = max(len(nonzero), 1)
        bw.write(n - 1, 1)
        first = nonzero[0] if nonzero else 0
        if first <= 1:
            bw.write(0, 1)
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if n == 2:
            bw.write(nonzero[1], 8)
        return
    bw.write(0, 1)  # normal
    max_sym = max(nonzero)
    lens = [lengths.get(s, 0) for s in range(max_sym + 1)]
    cl_freq: dict[int, int] = {}
    for l in lens:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = huffman_lengths(cl_freq)
    if not any(l > 0 for l in cl_lengths.values()):
        # heap huffman gives a lone CL symbol length 0; the CL table
        # needs an explicit 1-bit entry so the reader can walk it —
        # give it length 1 by pairing with a dummy
        only = next(iter(cl_lengths))
        cl_lengths = {only: 1, (only + 1) % 19: 1}
    # how many 3-bit CL-code entries must be written (order prefix)
    need = {s for s, l in cl_lengths.items() if l > 0}
    num_codes = max(i + 1 for i, s in enumerate(_CL_ORDER) if s in need)
    num_codes = max(num_codes, 4)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    # max_symbol shortcut: we write exactly len(lens) length entries,
    # so the reader must stop there instead of scanning the full
    # alphabet (one CL symbol per entry — the writer never emits
    # 16/17/18 repeats)
    bw.write(1, 1)
    value = len(lens) - 2
    k = 0
    while (1 << (2 + 2 * k)) <= value:
        k += 1
    bw.write(k, 3)
    bw.write(value, 2 + 2 * k)
    cl_codes = canonical_codes({s: l for s, l in cl_lengths.items() if l > 0})
    for l in lens:
        code, ln = cl_codes[l]
        bw.write_code(code, ln)


def _read_huffman_code(br: BitReader, alphabet_size: int) -> HuffTree:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = {sym0: 1}
        if num_symbols == 2:
            lengths[br.read(8)] = 1
        else:
            lengths = {sym0: 0}  # 1-symbol: zero-bit code
        return HuffTree(lengths)
    num_codes = 4 + br.read(4)
    cl_lengths: dict[int, int] = {}
    for i in range(num_codes):
        l = br.read(3)
        if l:
            cl_lengths[_CL_ORDER[i]] = l
    cl_tree = HuffTree(cl_lengths)
    if br.read(1):  # max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = {}
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_tree.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        elif code_len == 16:
            for _ in range(3 + br.read(2)):
                lengths[symbol] = prev
                symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return HuffTree({s: l for s, l in lengths.items() if l > 0} or lengths)


# ------------------------------------------------------- LZ77 prefix coding


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """length/distance value (>=1) -> (prefix_code, extra_bits_value,
    n_extra_bits). Inverse of the spec's prefix decoding."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    rest = v - (1 << nbits)
    half = 1 << (nbits - 1)
    if rest < half:
        return 2 * nbits, rest, nbits - 1
    return 2 * nbits + 1, rest - half, nbits - 1


def _prefix_decode(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# ---------------------------------------------------------------- encoder


_CACHE_MUL = 0x1E35A7BD  # spec hash multiplier


def _cache_index(argb: int, bits: int) -> int:
    return ((_CACHE_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


# ----------------------------------------------------- predictor transform

def _avg2(a, b):
    return tuple((x + y) // 2 for x, y in zip(a, b))


def _clamp(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L, T, TL, TR):
    """The 14 spec predictors over (r, g, b, a) tuples."""
    if mode == 0:
        return (0, 0, 0, 255)  # 0xff000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = tuple(l + t - tl for l, t, tl in zip(L, T, TL))
        pL = sum(abs(pc - lc) for pc, lc in zip(p, L))
        pT = sum(abs(pc - tc) for pc, tc in zip(p, T))
        return L if pL < pT else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(_clamp(l + t - tl) for l, t, tl in zip(L, T, TL))
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        out = []
        for a, b in zip(ave, TL):
            q = a - b
            half = q // 2 if q >= 0 else -((-q) // 2)  # C trunc-toward-0
            out.append(_clamp(a + half))
        return tuple(out)
    raise ValueError(f"VP8L: predictor mode {mode}")


def _neighbors(out: list, idx: int, w: int):
    """(L, T, TL, TR) with libwebp's contiguous-buffer edge semantics:
    at x = w-1, top-right reads one past the previous row's end, which
    is the CURRENT row's first pixel."""
    L = out[idx - 1]
    T = out[idx - w]
    TL = out[idx - w - 1]
    TR = out[idx - w + 1]
    return L, T, TL, TR


def _predict_at(out: list, idx: int, w: int, mode: int):
    """Prediction for position idx given all prior reconstructed
    pixels — spec edge rules: (0,0) is black, row 0 uses L, col 0
    uses T."""
    x, y = idx % w, idx // w
    if x == 0 and y == 0:
        return (0, 0, 0, 255)
    if y == 0:
        return out[idx - 1]
    if x == 0:
        return out[idx - w]
    return _predict(mode, *_neighbors(out, idx, w))


# ----------------------------------------------- entropy-coded image I/O

def _write_entropy_image(bw: BitWriter, tx: list, cache_bits: int, is_main: bool,
                         w: int | None = None, meta=None,
                         plane_codes: bool = False) -> None:
    """Write one entropy-coded image (token stream + Huffman codes).
    ``tx`` is the flat pixel list in coded space. ``meta`` (main image
    only) = (mbits, group_idx) partitions the image into 2^mbits
    blocks each selecting its own 5-code group (the spec's
    meta-Huffman 'entropy image'); a token uses the group of its
    START pixel. ``plane_codes`` emits mapped 2D-neighbor distances
    (plane codes 1..120) where the distance is invertible, and also
    detects vertical (dist = w) runs so the map path is exercised."""
    inv = _dist_inverse(w) if plane_codes and w else {}

    def dcode_of(dist: int) -> int:
        return inv.get(dist, dist + 120)

    cache = [None] * (1 << cache_bits) if cache_bits else []
    tokens: list = []  # (start_pos, tok)
    i = 0
    while i < len(tx):
        run = 0
        while i + run < len(tx) and run < 4096 and i > 0 and tx[i + run] == tx[i - 1]:
            run += 1
        vrun = 0
        if plane_codes and w and i >= w:
            while (i + vrun < len(tx) and vrun < 4096
                   and tx[i + vrun] == tx[i + vrun - w]):
                vrun += 1
        if vrun >= 4 and vrun > run:
            tokens.append((i, ("copy", vrun, w)))
            step = vrun
        elif run >= 4:
            tokens.append((i, ("copy", run, 1)))
            step = run
        else:
            r, g, b, a = tx[i]
            argb = (a << 24) | (r << 16) | (g << 8) | b
            if cache_bits and cache[_cache_index(argb, cache_bits)] == argb:
                tokens.append((i, ("cache", _cache_index(argb, cache_bits))))
            else:
                tokens.append((i, ("lit", tx[i])))
            step = 1
        if cache_bits:
            for j in range(i, i + step):
                r, g, b, a = tx[j]
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[_cache_index(argb, cache_bits)] = argb
        i += step

    if meta is not None:
        mbits, group_idx = meta
        pw = (w + (1 << mbits) - 1) >> mbits
        n_groups = max(group_idx) + 1

        def group_of(pos: int) -> int:
            x, y = pos % w, pos // w
            return group_idx[(y >> mbits) * pw + (x >> mbits)]
    else:
        n_groups = 1

        def group_of(pos: int) -> int:
            return 0

    freqs = [
        [dict() for _ in range(5)] for _ in range(n_groups)
    ]  # per group: g, r, b, a, d
    for pos, tok in tokens:
        gf, rf, bf, af, df = freqs[group_of(pos)]
        if tok[0] == "lit":
            r, g, b, a = tok[1]
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        elif tok[0] == "cache":
            gf[256 + 24 + tok[1]] = gf.get(256 + 24 + tok[1], 0) + 1
        else:
            _, length, dist = tok
            lp, _, _ = _prefix_encode(length)
            gf[256 + lp] = gf.get(256 + lp, 0) + 1
            dp, _, _ = _prefix_encode(dcode_of(dist))
            df[dp] = df.get(dp, 0) + 1
    for grp in freqs:
        for f in grp:
            if not f:
                f[0] = 1  # unused alphabet still needs a (1-symbol) code

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)  # no color cache
    if is_main:
        if meta is not None:
            mbits, group_idx = meta
            bw.write(1, 1)  # meta-huffman present
            bw.write(mbits - 2, 3)
            meta_px = [((g >> 8) & 0xFF, g & 0xFF, 0, 255) for g in group_idx]
            _write_entropy_image(bw, meta_px, 0, is_main=False)
        else:
            bw.write(0, 1)  # no meta-huffman

    group_codes = []
    for grp in freqs:
        codes = []
        for f in grp:
            lengths = huffman_lengths(f)
            _write_huffman_code(bw, lengths)
            codes.append(canonical_codes({s: l for s, l in lengths.items() if l > 0}))
        group_codes.append(codes)

    def emit(codebook, sym):
        if not codebook:  # 1-symbol zero-bit code
            return
        code, ln = codebook[sym]
        bw.write_code(code, ln)

    for pos, tok in tokens:
        gcode, rcode, bcode, acode, dcode = group_codes[group_of(pos)]
        if tok[0] == "lit":
            r, g, b, a = tok[1]
            emit(gcode, g)
            emit(rcode, r)
            emit(bcode, b)
            emit(acode, a)
        elif tok[0] == "cache":
            emit(gcode, 256 + 24 + tok[1])
        else:
            _, length, dist = tok
            lp, lx, ln = _prefix_encode(length)
            emit(gcode, 256 + lp)
            bw.write(lx, ln)
            dp, dx, dn = _prefix_encode(dcode_of(dist))
            emit(dcode, dp)
            bw.write(dx, dn)


def _read_entropy_image(br: BitReader, w: int, h: int, is_main: bool) -> list:
    """Decode one entropy-coded image to a flat (r, g, b, a) list."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: color cache bits {cache_bits} out of range")
    meta = None
    if is_main and br.read(1):
        # meta-huffman: an entropy-coded sub-image assigns each block
        # its own 5-code group via (red << 8) | green
        mbits = br.read(3) + 2
        pw = (w + (1 << mbits) - 1) >> mbits
        ph = (h + (1 << mbits) - 1) >> mbits
        meta_px = _read_entropy_image(br, pw, ph, is_main=False)
        group_idx = [((r << 8) | g) for (r, g, _b, _a) in meta_px]
        meta = (mbits, pw, group_idx)
        n_groups = max(group_idx) + 1
    else:
        n_groups = 1

    galpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        gtree = _read_huffman_code(br, galpha)
        rtree = _read_huffman_code(br, 256)
        btree = _read_huffman_code(br, 256)
        atree = _read_huffman_code(br, 256)
        dtree = _read_huffman_code(br, 40)
        groups.append((gtree, rtree, btree, atree, dtree))

    n = w * h
    out: list = []
    cache = [None] * (1 << cache_bits) if cache_bits else []

    def insert(px):
        if cache_bits:
            r, g, b, a = px
            argb = (a << 24) | (r << 16) | (g << 8) | b
            cache[_cache_index(argb, cache_bits)] = argb

    while len(out) < n:
        if meta is not None:
            mbits, pw, group_idx = meta
            x, y = len(out) % w, len(out) // w
            gtree, rtree, btree, atree, dtree = groups[
                group_idx[(y >> mbits) * pw + (x >> mbits)]
            ]
        else:
            gtree, rtree, btree, atree, dtree = groups[0]
        s = gtree.read(br)
        if s < 256:
            g = s
            r = rtree.read(br)
            b = btree.read(br)
            a = atree.read(br)
            out.append((r, g, b, a))
            insert(out[-1])
        elif s < 256 + 24:
            length = _prefix_decode(s - 256, br)
            dp = dtree.read(br)
            plane = _prefix_decode(dp, br)
            dist = _map_dist(plane, w)
            for _ in range(length):
                out.append(out[-dist])
                insert(out[-1])
        else:
            argb = cache[s - 256 - 24]
            if argb is None:
                raise ValueError("VP8L: cache reference before insertion")
            px = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF, (argb >> 24) & 0xFF)
            out.append(px)
            insert(px)
    return out


# ---------------------------------------------------------------- encoder


def _s8(v: int) -> int:
    """Reinterpret a byte as int8."""
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """Spec ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic
    shift — Python >> floors, matching libwebp)."""
    return (_s8(t) * _s8(c)) >> 5


def encode_webp_lossless(pixels, cache_bits: int = 6, predictor_mode=None,
                         color_transform=None, palette: bool = False,
                         meta_split: bool = False,
                         plane_codes: bool = False) -> bytes:
    """pixels: list of rows of (r, g, b, a) tuples. Emits a
    spec-correct VP8L stream. Default: SUBTRACT_GREEN + color cache +
    literals/LZ77-runs/cache-refs, raw distances (plane code =
    dist + 120); ``plane_codes=True`` emits mapped 2D-neighbor
    distance codes (1..120) where invertible and adds vertical-run
    detection. ``predictor_mode`` (0..13) switches to the PREDICTOR
    transform (one whole-image block, residual coding over
    reconstructed neighbors). ``color_transform`` = (green_to_red,
    green_to_blue, red_to_blue) byte triple switches to CROSS_COLOR
    (one whole-image block). ``palette=True`` switches to
    COLOR_INDEXING (distinct colors become a delta-coded palette
    sub-image; 17..256 colors — sub-byte index bundling is the
    decoder's named refusal)."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    w_main = w  # coded width (bundling shrinks it)
    flat = [px for row in pixels for px in row]

    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    if predictor_mode is not None:
        if not (w <= 512 and h <= 512):
            raise NotImplementedError("VP8L encoder: predictor image > 1 block")
        bw.write(1, 1)  # transform present
        bw.write(0, 2)  # PREDICTOR
        bw.write(9 - 2, 3)  # size_bits = 9 -> 512x512 blocks
        # 1x1 predictor sub-image; mode rides the green channel
        _write_entropy_image(bw, [(0, predictor_mode, 0, 255)], 0, is_main=False)
        bw.write(0, 1)  # no more transforms
        tx = []
        for idx in range(len(flat)):
            pred = _predict_at(flat, idx, w, predictor_mode)
            tx.append(tuple((c - p) & 0xFF for c, p in zip(flat[idx], pred)))
    elif color_transform is not None:
        if not (w <= 512 and h <= 512):
            raise NotImplementedError("VP8L encoder: cte image > 1 block")
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)  # transform present
        bw.write(1, 2)  # CROSS_COLOR
        bw.write(9 - 2, 3)
        # cte sub-image pixel: red_to_blue in RED, green_to_blue in
        # GREEN, green_to_red in BLUE (spec channel mapping)
        _write_entropy_image(bw, [(r2b, g2b, g2r, 255)], 0, is_main=False)
        bw.write(0, 1)
        tx = [
            (
                (r - _ct_delta(g2r, g)) & 0xFF,
                g,
                (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF,
                a,
            )
            for (r, g, b, a) in flat
        ]
    elif palette:
        colors = []
        seen = set()
        for px in flat:
            if px not in seen:
                seen.add(px)
                colors.append(px)
        if len(colors) > 256:
            raise NotImplementedError(
                f"VP8L encoder: {len(colors)} colors exceed one palette"
            )
        index = {px: i for i, px in enumerate(colors)}
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(colors) - 1, 8)
        # palette rows are delta-coded component-wise vs the previous
        prev = (0, 0, 0, 0)
        deltas = []
        for px in colors:
            deltas.append(tuple((c - p) & 0xFF for c, p in zip(px, prev)))
            prev = px
        _write_entropy_image(bw, deltas, 0, is_main=False)
        bw.write(0, 1)
        n_colors = len(colors)
        if n_colors <= 2:
            wb = 3
        elif n_colors <= 4:
            wb = 2
        elif n_colors <= 16:
            wb = 1
        else:
            wb = 0
        if wb:
            per = 1 << wb
            bits = 8 >> wb
            w_coded = (w + per - 1) >> wb
            tx = []
            for y in range(h):
                for xc in range(w_coded):
                    g = 0
                    for k in range(per):
                        x = (xc << wb) + k
                        if x < w:
                            g |= index[pixels[y][x]] << (k * bits)
                    tx.append((0, g, 0, 255))
            w_main = w_coded
        else:
            tx = [(0, index[px], 0, 255) for px in flat]
    else:
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # SUBTRACT_GREEN
        bw.write(0, 1)  # no more transforms
        # subtract-green (mod 256) — the decoder adds it back
        tx = [((r - g) & 0xFF, g, (b - g) & 0xFF, a) for (r, g, b, a) in flat]

    if meta_split:
        # checkerboard of 4-pixel blocks, two code groups — the real
        # meta-Huffman shape (per-region entropy codes). Grid is over
        # the CODED width (w_main): sub-byte palette bundling shrinks
        # the pixel stream, and a grid sized from the original w would
        # mis-dimension the group map and emit a corrupt stream.
        mbits = 2
        pw = (w_main + (1 << mbits) - 1) >> mbits
        ph = (h + (1 << mbits) - 1) >> mbits
        group_idx = [((bx + by) % 2) for by in range(ph) for bx in range(pw)]
        if max(group_idx) == 0:
            group_idx[0] = 0  # single-block image: one group
        meta_arg = (mbits, group_idx)
    else:
        meta_arg = None
    _write_entropy_image(bw, tx, cache_bits, is_main=True, w=w_main, meta=meta_arg,
                         plane_codes=plane_codes)

    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------- decoder


def decode_webp(payload: bytes) -> dict:
    """Decode a lossless WEBP; returns stats + the pixel matrix (rows
    of (r, g, b, a)). Refusals name the exact unsupported field."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            vp8l = body
            break
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(f"WEBP: {fourcc.decode().strip()} (lossy/extended)")
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("WEBP: no VP8L chunk")
    if vp8l[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: version != 0")

    transforms = []  # (type, data) in read order
    while br.read(1):
        ttype = br.read(2)
        if ttype == 2:
            transforms.append(("subtract_green", None))
        elif ttype == 0:
            size_bits = br.read(3) + 2
            block = 1 << size_bits
            pw = (w + block - 1) // block
            ph = (h + block - 1) // block
            modes = _read_entropy_image(br, pw, ph, is_main=False)
            transforms.append(("predictor", (size_bits, pw, modes)))
        elif ttype == 1:
            size_bits = br.read(3) + 2
            block = 1 << size_bits
            pw = (w + block - 1) // block
            ph = (h + block - 1) // block
            ctes = _read_entropy_image(br, pw, ph, is_main=False)
            transforms.append(("cross_color", (size_bits, pw, ctes)))
        else:  # 3 = COLOR_INDEXING
            n_colors = br.read(8) + 1
            deltas = _read_entropy_image(br, n_colors, 1, is_main=False)
            pal = []
            prev = (0, 0, 0, 0)
            for d in deltas:
                prev = tuple((c + p) & 0xFF for c, p in zip(d, prev))
                pal.append(prev)
            # sub-byte bundling: small palettes pack 2/4/8 indices per
            # green byte, shrinking the coded width (spec width_bits)
            if n_colors <= 2:
                wb = 3
            elif n_colors <= 4:
                wb = 2
            elif n_colors <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append(("color_indexing", (pal, wb)))

    # bundling shrinks the CODED width; other transforms are not
    # defined over the packed image in this implementation
    bundle_wb = 0
    for ttype, data in transforms:
        if ttype == "color_indexing" and data[1] > 0:
            bundle_wb = data[1]
            if len(transforms) > 1:
                raise NotImplementedError(
                    "VP8L: pixel bundling combined with other transforms"
                )
    w_coded = (w + (1 << bundle_wb) - 1) >> bundle_wb if bundle_wb else w
    out = _read_entropy_image(br, w_coded, h, is_main=True)

    # inverse transforms, REVERSE read order (spec)
    for ttype, data in reversed(transforms):
        if ttype == "subtract_green":
            out = [((r + g) & 0xFF, g, (b + g) & 0xFF, a) for (r, g, b, a) in out]
        elif ttype == "cross_color":
            size_bits, pw, ctes = data
            res = []
            for idx, (r, g, b, a) in enumerate(out):
                x, y = idx % w, idx // w
                r2b, g2b, g2r, _ = ctes[(y >> size_bits) * pw + (x >> size_bits)]
                red = (r + _ct_delta(g2r, g)) & 0xFF
                blue = (b + _ct_delta(g2b, g) + _ct_delta(r2b, red)) & 0xFF
                res.append((red, g, blue, a))
            out = res
        elif ttype == "color_indexing":
            pal, wb = data
            if wb:
                # unpack row-wise: x-th output index lives in packed
                # pixel x >> wb, bit slot (x % per) * bits, LSB-first
                per = 1 << wb
                bits = 8 >> wb
                mask = (1 << bits) - 1
                w_coded = (w + per - 1) >> wb
                expanded = []
                for y in range(h):
                    for x in range(w):
                        g = out[y * w_coded + (x >> wb)][1]
                        expanded.append((0, (g >> ((x % per) * bits)) & mask, 0, 255))
                out = expanded
            res = []
            for (r, g, b, a) in out:
                if g >= len(pal):
                    raise ValueError(f"VP8L: palette index {g} >= {len(pal)}")
                res.append(pal[g])
            out = res
        else:  # predictor
            size_bits, pw, modes = data
            for idx in range(len(out)):
                x, y = idx % w, idx // w
                mode = modes[(y >> size_bits) * pw + (x >> size_bits)][1]
                pred = _predict_at(out, idx, w, mode)
                out[idx] = tuple((c + p) & 0xFF for c, p in zip(out[idx], pred))

    rows = [out[y * w : (y + 1) * w] for y in range(h)]
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_r": sum(p[0] for p in out),
        "sum_g": sum(p[1] for p in out),
        "sum_b": sum(p[2] for p in out),
        "subtract_green": any(t == "subtract_green" for t, _ in transforms),
        "pixels": rows,
    }


def webp_stats(df, id_col: str):
    """decode→stats over WEBP payloads — the shared Arrow mapInPandas
    codec shape (only summary rows leave the executors)."""
    from typing import Iterator

    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, width int, height int, n_pixels bigint, "
        "sum_r bigint, sum_g bigint, sum_b bigint, subtract_green boolean"
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            stats = [decode_webp(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [s["width"] for s in stats],
                    "height": [s["height"] for s in stats],
                    "n_pixels": [s["n_pixels"] for s in stats],
                    "sum_r": [s["sum_r"] for s in stats],
                    "sum_g": [s["sum_g"] for s in stats],
                    "sum_b": [s["sum_b"] for s in stats],
                    "subtract_green": [s["subtract_green"] for s in stats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)
