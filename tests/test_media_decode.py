"""Exactness tests for the stdlib GIF + baseline-JPEG pixel decoders.

Every payload is crafted by an INDEPENDENT encoder written here (GIF
LZW encoder; baseline JPEG entropy encoder over the spec's Annex K
huffman tables), and expected pixels come from either the raw inputs
or a direct quadruple-loop IDCT (T.81 A.3.3) — a different algorithm
from the decoder's separable version — so the decoders are checked
against the format spec, not against themselves.
"""

from __future__ import annotations

import math
import random
import struct as st

import pytest

from duckdb_otlp_spark.operators import multimodal as mm

# ---------------------------------------------------------------------------
# independent GIF encoder
# ---------------------------------------------------------------------------


def _gif_lzw_encode(indices, min_code_size):
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    emit(clear, width)
    cur = b""
    for v in indices:
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4097:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        cur = bytes([v])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _full_gif(w, h, palette, indices, *, interlace=False, min_code_size=2,
              local_palette=False, trailer=True):
    """Craft a complete single-frame GIF89a (graphic-control extension
    included, so the decoder's extension skip is exercised too)."""
    npal = len(palette) // 3
    bits = max(2, (npal - 1).bit_length())
    size = 2 ** bits
    pal = palette + b"\x00" * (3 * (size - npal))
    if interlace:
        order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                 + [*range(2, h, 4)] + [*range(1, h, 2)])
        rows = [indices[r * w:(r + 1) * w] for r in range(h)]
        stored = b"".join(bytes(rows[d]) for d in order)
    else:
        stored = bytes(indices)
    lzw = _gif_lzw_encode(stored, min_code_size)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i:i + 255]
        sub.append(len(part))
        sub += part
    sub.append(0)
    gpacked = 0 if local_palette else (0x80 | (bits - 1))
    ipacked = (0x80 | (bits - 1)) if local_palette else 0
    if interlace:
        ipacked |= 0x40
    b = (b"GIF89a" + st.pack("<HHBBB", w, h, gpacked, 0, 0)
         + (b"" if local_palette else pal)
         + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
         + b"\x2c" + st.pack("<HHHHB", 0, 0, w, h, ipacked)
         + (pal if local_palette else b"")
         + bytes([min_code_size]) + bytes(sub))
    if trailer:
        b += b"\x3b"
    return b


# ---------------------------------------------------------------------------
# independent baseline-JPEG encoder (Annex K huffman tables)
# ---------------------------------------------------------------------------

_K_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_SYMS = list(range(12))
_K_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_SYMS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _build_codes(counts, syms):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[syms[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_K_DC_COUNTS, _K_DC_SYMS)
_AC_CODES = _build_codes(_K_AC_COUNTS, _K_AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, width):
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:      # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _cat_bits(v):
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else (v + (1 << t) - 1)
    return t, bits


def _full_jpeg(w, h, comps, qtab, *, dri=0, sof=0xC0):
    """comps: list of {id, h, v, blocks} with blocks = quantized coefs
    in ZIGZAG order, MCU traversal order."""
    def seg(marker, payload):
        return bytes([0xFF, marker]) + st.pack(">H", 2 + len(payload)) \
            + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qtab))
    out += seg(0xC4, bytes([0x00]) + bytes(_K_DC_COUNTS)
               + bytes(_K_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_K_AC_COUNTS)
               + bytes(_K_AC_SYMS))
    sofp = st.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sofp += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += seg(sof, sofp)
    if dri:
        out += seg(0xDD, st.pack(">H", dri))
    sosp = bytes([len(comps)])
    for c in comps:
        sosp += bytes([c["id"], 0x00])
    sosp += bytes([0, 63, 0])
    out += seg(0xDA, sosp)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    preds = {c["id"]: 0 for c in comps}
    idx = {c["id"]: 0 for c in comps}
    bw = _BitWriter()
    mcu, rst = 0, 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                for _ in range(c["h"] * c["v"]):
                    blk = c["blocks"][idx[c["id"]]]
                    idx[c["id"]] += 1
                    diff = blk[0] - preds[c["id"]]
                    preds[c["id"]] = blk[0]
                    t, bits = _cat_bits(diff)
                    ln, code = _DC_CODES[t]
                    bw.put(code, ln)
                    if t:
                        bw.put(bits, t)
                    k = 1
                    while k < 64:
                        run = 0
                        while k < 64 and blk[k] == 0:
                            run += 1
                            k += 1
                        if k == 64:
                            ln, code = _AC_CODES[0x00]   # EOB
                            bw.put(code, ln)
                            break
                        while run >= 16:
                            ln, code = _AC_CODES[0xF0]   # ZRL
                            bw.put(code, ln)
                            run -= 16
                        t, bits = _cat_bits(blk[k])
                        ln, code = _AC_CODES[(run << 4) | t]
                        bw.put(code, ln)
                        bw.put(bits, t)
                        k += 1
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _ref_idct(coef_nat):
    """Direct quadruple-loop 2D IDCT (T.81 A.3.3) — independent of the
    decoder's separable implementation."""
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (cu * cv / 4.0 * coef_nat[8 * v + u]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            val = s + 128
            out.append(0 if val < 0 else (255 if val > 255
                                          else int(val + 0.5)))
    return out


_Q16 = [16] * 64
_DC = lambda v: [v] + [0] * 63  # noqa: E731


# ---------------------------------------------------------------------------
# GIF tests
# ---------------------------------------------------------------------------


def test_gif_decode_exact_rgb():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idxs = [0, 1, 2, 3, 3, 2, 1, 0]
    w, h, n, px = mm.decode_gif_pixels(_full_gif(4, 2, pal, idxs))
    assert (w, h, n) == (4, 2, 3)
    assert bytes(px) == b"".join(pal[3 * i:3 * i + 3] for i in idxs)


def test_gif_uniform_local_palette_kwkwk():
    """A uniform image forces the LZW KwKwK special case (a code equal
    to next_code); the frame also carries a LOCAL color table."""
    g = _full_gif(16, 16, bytes([7, 8, 9]) + b"\x00" * 9, [0] * 256,
                  local_palette=True)
    _, _, _, px = mm.decode_gif_pixels(g)
    assert bytes(px) == bytes([7, 8, 9]) * 256


def test_gif_interlace_reorder():
    """Each row's pixels encode the row's OWN index, so a botched
    4-pass deinterlace produces the wrong sequence."""
    pal8 = bytes(v for i in range(8) for v in (i * 30, i * 30, i * 30))
    idxs8 = [r for r in range(8) for _ in range(4)]
    g = _full_gif(4, 8, pal8, idxs8, interlace=True, min_code_size=3)
    _, _, _, px = mm.decode_gif_pixels(g)
    assert [px[12 * r] // 30 for r in range(8)] == list(range(8))


def test_gif_code_width_growth_random():
    """A 64x64 random-index image grows the LZW table past several
    width boundaries."""
    random.seed(42)
    pal8 = bytes(v for i in range(8) for v in (i * 30, i * 30, i * 30))
    big = [random.randrange(8) for _ in range(64 * 64)]
    g = _full_gif(64, 64, pal8, big, min_code_size=3)
    _, _, _, px = mm.decode_gif_pixels(g)
    assert bytes(px) == b"".join(pal8[3 * i:3 * i + 3] for i in big)


def test_gif_mean_luma_and_errors():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idxs = [0, 1, 2, 3, 3, 2, 1, 0]
    luma = mm.gif_mean_luma(_full_gif(4, 2, pal, idxs))
    exp = sum(0.299 * pal[3 * i] + 0.587 * pal[3 * i + 1]
              + 0.114 * pal[3 * i + 2] for i in idxs) / 8
    assert abs(luma - exp) < 1e-9
    with pytest.raises(ValueError, match="not a GIF"):
        mm.decode_gif_pixels(b"garbage")
    with pytest.raises(ValueError, match="no image data"):
        # header + trailer, no image descriptor
        mm.decode_gif_pixels(b"GIF89a" + st.pack("<HHBBB", 1, 1, 0, 0, 0)
                             + b"\x3b")
    with pytest.raises(ValueError, match="no color table"):
        bad = _full_gif(4, 2, pal, idxs)
        # strip the global color table flag and bytes
        bad = bytearray(bad)
        bad[10] &= 0x7F
        mm.decode_gif_pixels(bytes(bad[:13]) + bytes(bad[13 + 12:]))
    with pytest.raises(ValueError, match="indices, expected"):
        # surplus pixel data before EOI: 11 indices for a 4x2 frame —
        # must be detected, not silently truncated (r10 ADVICE)
        mm.decode_gif_pixels(_full_gif(4, 2, pal, idxs + [0, 1, 2]))


# ---------------------------------------------------------------------------
# JPEG tests
# ---------------------------------------------------------------------------


def test_jpeg_dc_only_gray_exact():
    """DC-only 8x8 grayscale: every pixel is exactly
    128 + dequant_DC/8 = 128 + 16*10/8 = 148."""
    j = _full_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1,
                           "blocks": [_DC(10)]}], _Q16)
    w, h, n, px = mm.decode_jpeg_pixels(j)
    assert (w, h, n) == (8, 8, 1)
    assert all(p == 148 for p in px)
    assert abs(mm.jpeg_mean_luma(j) - 148.0) < 1e-9


def test_jpeg_dc_prediction_across_blocks():
    j = _full_jpeg(16, 8, [{"id": 1, "h": 1, "v": 1,
                            "blocks": [_DC(10), _DC(20)]}], _Q16)
    _, _, _, px = mm.decode_jpeg_pixels(j)
    assert px[0] == 148 and px[8] == 128 + 2 * 20


def test_jpeg_ac_coefficients_vs_independent_idct():
    """A block with DC + two AC coefficients must decode to exactly the
    direct-formula IDCT of the dequantized coefficients."""
    zz = [0] * 64
    zz[0], zz[1], zz[5] = 5, -7, 3
    j = _full_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1, "blocks": [zz]}],
                   _Q16)
    _, _, _, px = mm.decode_jpeg_pixels(j)
    nat = [0.0] * 64
    for k, v in enumerate(zz):
        nat[mm._ZIGZAG[k]] = v * 16
    assert list(px) == _ref_idct(nat)


def test_jpeg_color_ycbcr_to_rgb():
    j = _full_jpeg(8, 8, [
        {"id": 1, "h": 1, "v": 1, "blocks": [_DC(8)]},    # Y = 144
        {"id": 2, "h": 1, "v": 1, "blocks": [_DC(4)]},    # Cb = 136
        {"id": 3, "h": 1, "v": 1, "blocks": [_DC(-4)]}],  # Cr = 120
        _Q16)
    w, h, n, px = mm.decode_jpeg_pixels(j)
    assert (w, h, n) == (8, 8, 3)
    yv, cb, cr = 144, 136 - 128, 120 - 128
    er = int(yv + 1.402 * cr + 0.5)
    eg = int(yv - 0.344136 * cb - 0.714136 * cr + 0.5)
    eb = int(yv + 1.772 * cb + 0.5)
    assert (px[0], px[1], px[2]) == (er, eg, eb)
    assert (px[-3], px[-2], px[-1]) == (er, eg, eb)


def test_jpeg_420_subsampling_block_layout():
    """2x2-subsampled 16x16: the four Y blocks of the MCU land in the
    right quadrants (neutral chroma so R=G=B=Y)."""
    ybs = [_DC(6), _DC(12), _DC(18), _DC(24)]
    j = _full_jpeg(16, 16, [
        {"id": 1, "h": 2, "v": 2, "blocks": ybs},
        {"id": 2, "h": 1, "v": 1, "blocks": [[0] * 64]},
        {"id": 3, "h": 1, "v": 1, "blocks": [[0] * 64]}], _Q16)
    _, _, _, px = mm.decode_jpeg_pixels(j)

    def ypix(x, y):
        return px[3 * (y * 16 + x)]
    assert (ypix(0, 0), ypix(8, 0), ypix(0, 8), ypix(8, 8)) == \
        (140, 152, 164, 176)


def test_jpeg_restart_markers_reset_predictors():
    j = _full_jpeg(16, 8, [{"id": 1, "h": 1, "v": 1,
                            "blocks": [_DC(10), _DC(10)]}], _Q16, dri=1)
    _, _, _, px = mm.decode_jpeg_pixels(j)
    # with a reset predictor both blocks decode to the same 148; without
    # the reset the second block's DC would land on 128 + 2*20 = 168
    assert px[0] == 148 and px[8] == 148


def test_jpeg_error_contracts():
    blk = _DC(10)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        # SOF9 (extended sequential, ARITHMETIC coding) stays a
        # codec-library job; SOF2 progressive decodes as of r10
        mm.decode_jpeg_pixels(_full_jpeg(
            8, 8, [{"id": 1, "h": 1, "v": 1, "blocks": [blk]}], _Q16,
            sof=0xC9))
    with pytest.raises(ValueError, match="not a JPEG"):
        mm.decode_jpeg_pixels(b"garbage")
    with pytest.raises(ValueError, match="missing SOS"):
        # header-only JPEG (SOI + SOF + EOI, no scan)
        hdr = _full_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1,
                                 "blocks": [blk]}], _Q16)
        sos = hdr.index(b"\xff\xda")
        mm.decode_jpeg_pixels(hdr[:sos] + b"\xff\xd9")
    with pytest.raises(ValueError, match="SOS missing component"):
        # baseline SOS that selects a component id absent from the
        # frame: must raise the documented corrupt-container ValueError,
        # not a bare KeyError (r10 ADVICE)
        good = _full_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1,
                                  "blocks": [blk]}], _Q16)
        sos = good.index(b"\xff\xda")
        bad = bytearray(good)
        bad[sos + 5] = 9        # SOS: marker(2) len(2) ns(1) → cid byte
        mm.decode_jpeg_pixels(bytes(bad))


# ---------------------------------------------------------------------------
# through the Arrow batch path
# ---------------------------------------------------------------------------


def test_extract_features_decodes_all_four_containers(spark):
    """decode_pixels=True now yields a REAL mean_luma for PNG, JPEG and
    GIF in one pass (WAV exercised in test_operators)."""
    from test_operators import _full_png

    png = _full_png([bytes([200, 100, 50] * 2)] * 2, color_type=2)
    jpg = _full_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1,
                             "blocks": [_DC(10)]}], _Q16)
    pal = bytes([60, 61, 62]) + b"\x00" * 9
    gif = _full_gif(4, 2, pal, [0] * 8)
    media = spark.createDataFrame(
        [(1, "image", "png", png, (None,) * 4),
         (2, "image", "jpeg", jpg, (None,) * 4),
         (3, "image", "gif", gif, (None,) * 4)],
        mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           mm.extract_features(media, decode_pixels=True).collect()}
    assert abs(got[1]["mean_luma"]
               - (0.299 * 200 + 0.587 * 100 + 0.114 * 50)) < 1e-9
    assert abs(got[2]["mean_luma"] - 148.0) < 1e-9
    assert abs(got[3]["mean_luma"]
               - (0.299 * 60 + 0.587 * 61 + 0.114 * 62)) < 1e-9
    assert all(got[k]["rms_amplitude"] is None for k in (1, 2, 3))


# ---------------------------------------------------------------------------
# PNG palette / sub-byte / Adam7 (r10: the seam beyond plain 8-bit)
# ---------------------------------------------------------------------------


def _png_chunk(ctype, data):
    import zlib
    return (st.pack(">I", len(data)) + ctype + data
            + st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _png_from_stream(w, h, depth, color_type, stream, plte=None,
                     interlace=0):
    import zlib
    ihdr = st.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return (out + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _png_chunk(b"IEND", b""))


def _pack_rows(rows, depth):
    """Pack sub-byte sample rows MSB-first, one filter-0 byte per row."""
    per_byte = 8 // depth
    stream = bytearray()
    for row in rows:
        stream.append(0)
        packed = bytearray((len(row) + per_byte - 1) // per_byte)
        for x, v in enumerate(row):
            packed[x // per_byte] |= v << (8 - depth * (x % per_byte + 1))
        stream += packed
    return stream


def test_png_palette_8bit_exact():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])
    rows = [[0, 1, 2], [3, 2, 1]]
    stream = bytearray()
    for row in rows:
        stream.append(0)
        stream += bytes(row)
    png = _png_from_stream(3, 2, 8, 3, stream, plte=plte)
    w, h, n, px = mm.decode_png_pixels(png)
    assert (w, h, n) == (3, 2, 3)
    want = b"".join(plte[3 * v:3 * v + 3] for row in rows for v in row)
    assert bytes(px) == want
    with pytest.raises(ValueError, match="outside"):
        bad = _png_from_stream(3, 2, 8, 3, stream, plte=plte[:9])
        mm.decode_png_pixels(bad)


def test_png_palette_2bit_packed_rows():
    """Width 5 at 2 bits/px: rows pack into 2 bytes with 6 pad bits —
    the unpacker must honor per-row byte boundaries."""
    plte = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 50, 60])
    rows = [[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]]
    png = _png_from_stream(5, 2, 2, 3, _pack_rows(rows, 2), plte=plte)
    w, h, n, px = mm.decode_png_pixels(png)
    assert (w, h, n) == (5, 2, 3)
    want = b"".join(plte[3 * v:3 * v + 3] for row in rows for v in row)
    assert bytes(px) == want


def test_png_gray_1bit_rescales():
    rows = [[0, 1, 1, 0, 1, 0, 1, 1, 0]]     # width 9: 2 packed bytes
    png = _png_from_stream(9, 1, 1, 0, _pack_rows(rows, 1))
    w, h, n, px = mm.decode_png_pixels(png)
    assert (w, h, n) == (9, 1, 1)
    assert list(px) == [v * 255 for v in rows[0]]


def test_png_adam7_interlace_rgb():
    """8x8 RGB with pixel (x,y) = (x*16, y*16, x+y): craft the stream
    in Adam7 pass order (filter 0 rows) and require the reassembled
    image to equal the raw scanline layout."""
    w = h = 8

    def pix(x, y):
        return bytes([x * 16, y * 16, x + y])

    stream = bytearray()
    for xoff, yoff, xstep, ystep in mm._ADAM7:
        pw = (w - xoff + xstep - 1) // xstep
        ph = (h - yoff + ystep - 1) // ystep
        for py in range(ph):
            stream.append(0)
            for px_ in range(pw):
                stream += pix(xoff + px_ * xstep, yoff + py * ystep)
    png = _png_from_stream(w, h, 8, 2, stream, interlace=1)
    got_w, got_h, n, px = mm.decode_png_pixels(png)
    assert (got_w, got_h, n) == (8, 8, 3)
    want = b"".join(pix(x, y) for y in range(h) for x in range(w))
    assert bytes(px) == want


def test_png_16bit_high_byte_reduction():
    """16-bit gray and RGB decode to the high byte of each big-endian
    sample; the per-scanline filters run on the full 2-byte samples
    (bpp = 2*channels), checked with a forward-Sub-filtered row."""
    # gray 3x2: samples as 16-bit BE values
    vals = [[0x1234, 0xFF00, 0x0080], [0xABCD, 0x0001, 0x8000]]
    stream = bytearray()
    raw_rows = [b"".join(st.pack(">H", v) for v in row) for row in vals]
    stream.append(0)
    stream += raw_rows[0]
    # second row Sub-filtered: f[x] = raw[x] - raw[x - bpp], bpp=2
    stream.append(1)
    r = raw_rows[1]
    stream += bytes((r[x] - (r[x - 2] if x >= 2 else 0)) & 0xFF
                    for x in range(len(r)))
    png = _png_from_stream(3, 2, 16, 0, stream)
    w, h, n, px = mm.decode_png_pixels(png)
    assert (w, h, n) == (3, 2, 1)
    assert list(px) == [v >> 8 for row in vals for v in row]

    # RGB 2x1 filter-0
    rgb = [(0x1122, 0x3344, 0x5566), (0xFFEE, 0x0100, 0x9ABC)]
    stream = bytearray([0])
    for p_ in rgb:
        for v in p_:
            stream += st.pack(">H", v)
    png = _png_from_stream(2, 1, 16, 2, stream)
    w, h, n, px = mm.decode_png_pixels(png)
    assert (w, h, n) == (2, 1, 3)
    assert list(px) == [v >> 8 for p_ in rgb for v in p_]


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2: spectral selection + successive approximation)
# ---------------------------------------------------------------------------

# Progressive AC scans need EOBn symbols (r>0, s=0) that the Annex K
# baseline table lacks: a flat custom AC table (all length-8 codes),
# emitted as a SECOND DHT between scans — which also exercises
# between-scan table redefinition.
_PROG_AC_SYMS = [0x00, 0x10, 0x20, 0x01, 0x11, 0x21, 0x02, 0x12,
                 0x03, 0x13, 0x04, 0x31, 0xF0]
_PROG_AC_COUNTS = [0] * 16
_PROG_AC_COUNTS[7] = len(_PROG_AC_SYMS)
_PROG_AC_CODES = _build_codes(_PROG_AC_COUNTS, _PROG_AC_SYMS)


def _jseg(marker, payload):
    return bytes([0xFF, marker]) + st.pack(">H", 2 + len(payload)) \
        + payload


def _prog_headers(w, h, ncomp, qtab, sampling=None):
    out = bytearray(b"\xff\xd8")
    out += _jseg(0xDB, bytes([0]) + bytes(qtab))
    out += _jseg(0xC4, bytes([0x00]) + bytes(_K_DC_COUNTS)
                 + bytes(_K_DC_SYMS))
    out += _jseg(0xC4, bytes([0x10]) + bytes(_PROG_AC_COUNTS)
                 + bytes(_PROG_AC_SYMS))
    sofp = st.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        hv = sampling[c] if sampling else (1, 1)
        sofp += bytes([c + 1, (hv[0] << 4) | hv[1], 0])
    out += _jseg(0xC2, sofp)
    return out


def _sos(comp_ids, ss, se, ah, al, body):
    p = bytes([len(comp_ids)])
    for cid in comp_ids:
        p += bytes([cid, 0x00])
    p += bytes([ss, se, (ah << 4) | al])
    return _jseg(0xDA, p) + body


def _scan_bits(emits):
    """emits: ('acsym', rs) / ('dcsym', t) / ('bits', value, width)."""
    bw = _BitWriter()
    for e in emits:
        if e[0] == "acsym":
            ln, code = _PROG_AC_CODES[e[1]]
            bw.put(code, ln)
        elif e[0] == "dcsym":
            ln, code = _DC_CODES[e[1]]
            bw.put(code, ln)
        else:
            bw.put(e[1], e[2])
    bw.flush()
    return bytes(bw.out)


def _dc_scan(diffs):
    emits = []
    for d in diffs:
        t, bits = _cat_bits(d)
        emits.append(("dcsym", t))
        if t:
            emits.append(("bits", bits, t))
    return _scan_bits(emits)


def _zz_expect(pairs):
    """Expected pixels from zigzag (k, quantized value) pairs, q=16."""
    nat = [0.0] * 64
    for k, v in pairs:
        nat[mm._ZIGZAG[k]] = v * 16
    return _ref_idct(nat)


def test_jpeg_progressive_dc_ac_and_dc_refinement():
    """Three scans: DC first at Al=1, AC first, then a DC refinement
    bit — the accumulated coefficients must IDCT to the exact
    direct-formula expectation."""
    b = _prog_headers(8, 8, 1, _Q16)
    b += _sos([1], 0, 0, 0, 1, _dc_scan([5]))       # coef0 = 5<<1 = 10
    t, bits = _cat_bits(-7)
    b += _sos([1], 1, 63, 0, 0, _scan_bits([
        ("acsym", t), ("bits", bits, t), ("acsym", 0x00)]))
    b += _sos([1], 0, 0, 1, 0, _scan_bits([("bits", 1, 1)]))  # 10|1=11
    b += b"\xff\xd9"
    w, h, n, px = mm.decode_jpeg_pixels(bytes(b))
    assert (w, h, n) == (8, 8, 1)
    assert list(px) == _zz_expect([(0, 11), (1, -7)])


def test_jpeg_progressive_eobrun_spans_blocks():
    """A 3-block image where the AC first scan ends with EOB2 (run of
    3 incl. the current block): blocks 2-3 must decode with zero AC."""
    b = _prog_headers(24, 8, 1, _Q16)
    b += _sos([1], 0, 0, 0, 0, _dc_scan([4, 4, -8]))  # DCs 4, 8, 0
    t, bits = _cat_bits(5)
    b += _sos([1], 1, 63, 0, 0, _scan_bits([
        ("acsym", (1 << 4) | t), ("bits", bits, t),   # r=1 then k=2 -> 5
        ("acsym", (1 << 4) | 0), ("bits", 1, 1)]))    # EOB run = 3
    b += b"\xff\xd9"
    _, _, _, px = mm.decode_jpeg_pixels(bytes(b))
    wants = [_zz_expect([(0, 4), (2, 5)]), _zz_expect([(0, 8)]),
             _zz_expect([])]
    for blk, want in enumerate(wants):
        assert all(px[y * 24 + 8 * blk + x] == want[8 * y + x]
                   for y in range(8) for x in range(8)), blk


def test_jpeg_progressive_ac_refinement():
    """AC first at Al=1 plants k=1 as 6; the refinement scan corrects
    it (+1 -> 7) and introduces a new +-1 coefficient at k=2 — the
    T.81 G.1.2.3 history/correction-bit walk, exactly."""
    b = _prog_headers(8, 8, 1, _Q16)
    b += _sos([1], 0, 0, 0, 0, _dc_scan([4]))
    t, bits = _cat_bits(3)
    b += _sos([1], 1, 63, 0, 1, _scan_bits([
        ("acsym", t), ("bits", bits, t), ("acsym", 0x00)]))
    b += _sos([1], 1, 63, 1, 0, _scan_bits([
        ("acsym", 0x01), ("bits", 1, 1),   # new coef at k=2, sign +
        ("bits", 1, 1),                    # correction bit for k=1: 6->7
        ("acsym", 0x00)]))                 # EOB (run 1)
    b += b"\xff\xd9"
    _, _, _, px = mm.decode_jpeg_pixels(bytes(b))
    assert list(px) == _zz_expect([(0, 4), (1, 7), (2, 1)])


def test_jpeg_progressive_color_interleaved_dc():
    """Interleaved 3-component DC scan + per-component AC scans:
    uniform YCbCr -> exact RGB."""
    b = _prog_headers(8, 8, 3, _Q16)
    b += _sos([1, 2, 3], 0, 0, 0, 0, _dc_scan([8, 4, -4]))
    for cid in (1, 2, 3):
        b += _sos([cid], 1, 63, 0, 0, _scan_bits([("acsym", 0x00)]))
    b += b"\xff\xd9"
    w, h, n, px = mm.decode_jpeg_pixels(bytes(b))
    yv, cb, cr = 144, 8, -8
    er = int(yv + 1.402 * cr + 0.5)
    eg = int(yv - 0.344136 * cb - 0.714136 * cr + 0.5)
    eb = int(yv + 1.772 * cb + 0.5)
    assert (w, h, n) == (8, 8, 3)
    assert (px[0], px[1], px[2]) == (er, eg, eb)
    assert (px[-3], px[-2], px[-1]) == (er, eg, eb)


def test_jpeg_progressive_noninterleaved_grid_unpadded():
    """T.81 A.2.2: NON-interleaved scans walk the component's OWN
    (unpadded) block grid. With Y at 2x2 and w=17, Y's padded grid is
    4 blocks wide (mcux=2) but its own grid is ceil(17/8)=3 — the AC
    scan must supply exactly 3x2 blocks, and a coefficient planted in
    grid position (0,2) must land at pixel column 16."""
    b = _prog_headers(17, 16, 3, _Q16, sampling=[(2, 2), (1, 1), (1, 1)])
    # interleaved DC first over 2 MCUs x (4 Y + Cb + Cr):
    # MCU0 Y DCs 2,4,6,8; MCU1 Y DCs back to 0; chroma all 0
    b += _sos([1, 2, 3], 0, 0, 0, 0,
              _dc_scan([2, 2, 2, 2, 0, 0, -8, 0, 0, 0, 0, 0]))
    t, bits = _cat_bits(5)
    b += _sos([1], 1, 63, 0, 0, _scan_bits([
        ("acsym", (1 << 4) | 0), ("bits", 0, 1),   # EOB run 2: (0,0-1)
        ("acsym", t), ("bits", bits, t),           # (0,2): k=1 -> 5
        ("acsym", 0x00),                           # end block (0,2)
        ("acsym", (1 << 4) | 0), ("bits", 1, 1)]))  # EOB run 3: row 1
    # chroma grids are ceil(9/8) x ceil(8/8) = 2x1 blocks: EOB1 (run 2)
    for cid in (2, 3):
        b += _sos([cid], 1, 63, 0, 0, _scan_bits([
            ("acsym", (1 << 4) | 0), ("bits", 0, 1)]))
    b += b"\xff\xd9"
    w, h, n, px = mm.decode_jpeg_pixels(bytes(b))
    assert (w, h, n) == (17, 16, 3)
    # Y block (0,2) sits in MCU1 whose Y DCs were driven back to 0, so
    # its pixels show ONLY the planted AC coefficient on the 128 base;
    # neutral chroma -> R=G=B
    want_b2 = _zz_expect([(1, 5)])
    for y in range(8):
        assert px[3 * (y * 17 + 16)] == want_b2[8 * y + 0], y
    # and the interleaved-DC block (0,0) kept its DC
    want_b0 = _zz_expect([(0, 2)])
    assert px[0] == want_b0[0]
