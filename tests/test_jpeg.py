"""Ground-truth tests for the dependency-free baseline-JPEG decoder
(prose_spark/operators/multimodal.py `_decode_jpeg`).

Strategy mirrors the PNG suite: a minimal TEST-SIDE ENCODER (forward
DCT + quantization + canonical Huffman, JFIF segment layout) produces
real baseline-JPEG bytes from known pixel arrays, and the decoder must
recover them within quantization tolerance. Shared-bug risk between the
two sides is bounded by pinning the format-level invariants to
independently-known values: the zigzag table is re-derived here by the
diagonal-walk algorithm and compared to the decoder's constant, and the
canonical Huffman code assignment is pinned against the well-known
ITU-T T.81 Annex K DC-luminance codes ("00" for category 0, "010" for
1, ..., "111111110" for 11). The encoder writes its quant and Huffman
tables into DQT/DHT segments exactly as real encoders do, so the
decoder's table parsing — not a shared assumption — is what round-trips.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from prose_spark.operators.multimodal import (
    _JPEG_ZIGZAG,
    _jpeg_huff_table,
    decode_image,
)

# ITU-T T.81 Annex K quantization tables (raster order)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K DC Huffman specs (BITS per code length 1..16, then HUFFVAL)
_DC_LUM_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_CHR_BITS = bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
_DC_VALS = bytes(range(12))

# forward 8x8 DCT-II basis, written from the standard formula (NOT the
# decoder's matrix): F = _FDCT_A @ (block - 128) @ _FDCT_A.T
_FDCT_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _zigzag_order():
    """Zigzag scan re-derived by the diagonal-walk algorithm."""
    order, x, y = [], 0, 0
    for _ in range(64):
        order.append(y * 8 + x)
        if (x + y) % 2 == 0:
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x, y = x + 1, y - 1
        else:
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x, y = x - 1, y + 1
    return np.array(order)


def _scaled_quant(base, quality):
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _enc_table(bits, vals):
    """{symbol: (length, code)} by T.81 Annex C canonical assignment."""
    out, code, vi = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[vi]] = (length, code)
            code += 1
            vi += 1
        code <<= 1
    return out


def _fixed_table(symbols):
    """DHT spec putting every used symbol at one fixed code length."""
    syms = sorted(set(symbols)) or [0x00]
    length = 1
    while (1 << length) <= len(syms):
        length += 1
    bits = bytearray(16)
    bits[length - 1] = len(syms)
    return bytes(bits), bytes(syms)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length, code):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)


def _magnitude(v):
    """(category, field-bits) per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _pad_to(plane, hn, wn):
    h, w = plane.shape
    return np.pad(plane, ((0, hn - h), (0, wn - w)), mode="edge")


def _encode_jpeg(img, quality=90, subsample=(1, 1), restart_interval=0):
    """Minimal baseline-JFIF encoder: 4:4:4 or Y-subsampled color /
    grayscale, Annex K quant tables scaled by `quality`, Annex K DC
    Huffman tables + generated fixed-length AC tables (all written to
    DQT/DHT), optional restart markers."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scaled_quant(_QL, quality)
    qc = _scaled_quant(_QC, quality)
    zz = _zigzag_order()
    if gray:
        comps = [(1, 1, 1, 0, img.astype(np.float64))]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sh, sv = subsample
        hc, wc = -(-h // sv), -(-w // sh)
        cb = _pad_to(cb, hc * sv, wc * sh).reshape(
            hc, sv, wc, sh).mean(axis=(1, 3))
        cr = _pad_to(cr, hc * sv, wc * sh).reshape(
            hc, sv, wc, sh).mean(axis=(1, 3))
        comps = [(1, sh, sv, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = {
        cid: _pad_to(p, mcuy * 8 * vs, mcux * 8 * hs)
        for cid, hs, vs, _, p in comps
    }

    # pass 1: quantized zigzag blocks in MCU-interleaved order, with
    # DC differences (reset at restart boundaries)
    blocks = []  # (is_chroma, dc_sym, dc_field, [(ac_sym, s, field)])
    pred = {c[0]: 0 for c in comps}
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            pred = {cid: 0 for cid in pred}
        my, mx = divmod(mcu, mcux)
        for cid, hs, vs, tq, _ in comps:
            q = (ql if tq == 0 else qc)
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    blk = planes[cid][y0:y0 + 8, x0:x0 + 8] - 128.0
                    coef = _FDCT_A @ blk @ _FDCT_A.T
                    qz = np.rint(
                        coef.reshape(64)[zz] / q[zz]
                    ).astype(np.int64)
                    diff = int(qz[0]) - pred[cid]
                    pred[cid] = int(qz[0])
                    dc_s, dc_f = _magnitude(diff)
                    acs = []
                    run = 0
                    nz = np.nonzero(qz[1:])[0]
                    last = nz[-1] + 1 if len(nz) else 0
                    for k in range(1, last + 1):
                        if qz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            acs.append((0xF0, 0, 0))
                            run -= 16
                        s, fld = _magnitude(int(qz[k]))
                        acs.append(((run << 4) | s, s, fld))
                        run = 0
                    if last < 63:
                        acs.append((0x00, 0, 0))  # EOB
                    blocks.append((tq != 0, dc_s, dc_f, acs))

    ac_lum = _fixed_table(
        [s for chroma, _, _, acs in blocks if not chroma
         for s, _, _ in acs])
    ac_chr = _fixed_table(
        [s for chroma, _, _, acs in blocks if chroma
         for s, _, _ in acs])
    enc = {
        (0, 0): _enc_table(_DC_LUM_BITS, _DC_VALS),
        (0, 1): _enc_table(_DC_CHR_BITS, _DC_VALS),
        (1, 0): _enc_table(*ac_lum),
        (1, 1): _enc_table(*ac_chr),
    }

    # pass 2: bitstream
    writer = _BitWriter()
    data = bytearray()
    bi = 0
    blocks_per_mcu = sum(c[1] * c[2] for c in comps)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            data += writer.out
            writer = _BitWriter()
            data += bytes(
                [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
        for _ in range(blocks_per_mcu):
            chroma, dc_s, dc_f, acs = blocks[bi]
            bi += 1
            writer.write(*enc[(0, 1 if chroma else 0)][dc_s])
            if dc_s:
                writer.write(dc_s, dc_f)
            for sym, s, fld in acs:
                writer.write(*enc[(1, 1 if chroma else 0)][sym])
                if s:
                    writer.write(s, fld)
    writer.flush()
    data += writer.out

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1) + b"\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql[zz].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[zz].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq, _ in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + _DC_LUM_BITS + _DC_VALS)
    out += seg(0xC4, bytes([0x10]) + ac_lum[0] + ac_lum[1])
    if not gray:
        out += seg(0xC4, bytes([0x01]) + _DC_CHR_BITS + _DC_VALS)
        out += seg(0xC4, bytes([0x11]) + ac_chr[0] + ac_chr[1])
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, _, tq, _ in comps:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    return out + bytes(data) + b"\xff\xd9"


def _smooth_rgb(h, w, seed=0):
    """Low-frequency synthetic image (JPEG-friendly, so round-trip
    error stays at quantization scale)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 127 + 100 * np.sin(xx / 9.0 + seed)
    g = 127 + 100 * np.cos(yy / 7.0 - seed)
    b = 127 + 90 * np.sin((xx + yy) / 11.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def test_jpeg_zigzag_and_canonical_codes_pinned():
    # zigzag: hand-typed decoder constant vs diagonal-walk derivation
    assert np.array_equal(_JPEG_ZIGZAG, _zigzag_order())
    # canonical Huffman assignment vs the well-known Annex K DC-lum
    # codes (T.81 table K.3): 0->"00", 1->"010", ..., 6->"1110",
    # 11->"111111110"
    table = _jpeg_huff_table(_DC_LUM_BITS, _DC_VALS)
    assert table[(2, 0b00)] == 0
    assert table[(3, 0b010)] == 1
    assert table[(3, 0b110)] == 5
    assert table[(4, 0b1110)] == 6
    assert table[(9, 0b111111110)] == 11
    assert len(table) == 12


def test_jpeg_roundtrip_flat_and_smooth_444():
    flat = np.full((16, 16, 3), (90, 160, 40), dtype=np.uint8)
    got = decode_image(_encode_jpeg(flat, quality=90))
    assert got.shape == (16, 16, 3)
    assert np.max(np.abs(got.astype(int) - flat.astype(int))) <= 3

    img = _smooth_rgb(24, 17, seed=1)  # non-multiple-of-8 crop
    got = decode_image(_encode_jpeg(img, quality=95))
    assert got.shape == (24, 17, 3)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 14 and err.mean() <= 4.0


def test_jpeg_420_subsampling():
    # neutral-chroma content so 2x2 chroma pooling is near-lossless and
    # the tolerance stays tight; 30x22 exercises MCU-grid crop (16-px
    # MCUs over a non-multiple size)
    g = _smooth_rgb(30, 22, seed=2)[:, :, :1]
    img = np.repeat(g, 3, axis=2)
    got = decode_image(_encode_jpeg(img, quality=95, subsample=(2, 2)))
    assert got.shape == (30, 22, 3)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() <= 2.5


def test_jpeg_restart_markers():
    img = _smooth_rgb(32, 24, seed=3)
    plain = decode_image(_encode_jpeg(img, quality=90))
    with_rst = decode_image(
        _encode_jpeg(img, quality=90, restart_interval=2))
    # restart markers change the bitstream, not the coefficients
    assert np.array_equal(plain, with_rst)


def test_jpeg_grayscale_single_component():
    g = _smooth_rgb(13, 21, seed=4)[:, :, 0]
    got = decode_image(_encode_jpeg(g, quality=95))
    assert got.shape == (13, 21, 3)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])
    err = np.abs(got[:, :, 0].astype(int) - g.astype(int))
    assert err.max() <= 10 and err.mean() <= 3.0


def test_jpeg_unsupported_and_malformed():
    # progressive (SOF2) is now SUPPORTED; a bare SOF2 header with no
    # tables or scan data is malformed, not unimplemented
    sof2 = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_image(sof2)
    # arithmetic-coded (SOF9) still raises honestly
    sof9 = (b"\xff\xd8\xff\xc9" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_image(sof9)
    # decode cap: giant declared dims rejected before any allocation
    giant = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
             + struct.pack(">BHHB", 8, 50000, 50000, 1)
             + bytes([1, 0x11, 0])
             + b"\xff\xda" + struct.pack(">H", 8)
             + bytes([1, 1, 0x00, 0, 63, 0]))
    with pytest.raises(NotImplementedError, match="decode cap"):
        decode_image(giant)
    # truncated entropy data is malformed, not a crash
    blob = _encode_jpeg(_smooth_rgb(16, 16), quality=90)
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_image(blob[:-12])
    # fake=True keeps the never-raises plumbing contract on all three
    for bad in (sof2, giant, blob[:-12]):
        assert decode_image(bad, fake=True).shape[2] == 3


def test_jpeg_spark_stage(spark):
    from prose_spark.operators.multimodal import extract_image_features

    img = _smooth_rgb(19, 27, seed=5)
    blob = _encode_jpeg(img, quality=95, subsample=(2, 2))
    df = spark.createDataFrame([("u1", bytearray(blob))], ["url", "html"])
    row = extract_image_features(
        df, blob_col="html", fake=False).collect()[0]
    assert row.media_meta.mime == "image/jpeg"
    assert (row.media_meta.width, row.media_meta.height) == (27, 19)
    ref = decode_image(blob).reshape(-1, 3).astype("float64")
    assert abs(row.features[0] - ref[:, 0].mean() / 255.0) < 1e-6


def test_jpeg_grayscale_ignores_declared_sampling_factors():
    """T.81 A.2.2: a single-component scan is non-interleaved — one
    data unit per MCU — so a grayscale JPEG declaring 2x2 sampling
    factors (some encoders do) must decode identically to 1x1."""
    g = _smooth_rgb(17, 23, seed=6)[:, :, 0]
    blob = bytearray(_encode_jpeg(g, quality=95))
    ref = decode_image(bytes(blob))
    sof = bytes(blob).index(b"\xff\xc0")
    # marker(2)+len(2)+prec(1)+h(2)+w(2)+nc(1) -> component id at +10,
    # its sampling byte at +11
    assert blob[sof + 11] == 0x11
    blob[sof + 11] = 0x22
    got = decode_image(bytes(blob))
    assert np.array_equal(got, ref)


def test_jpeg_real_world_files():
    """Decode JPEGs produced by standard encoders (CPython's own test
    fixtures plus any rust-doc photos present); a shared encoder/
    decoder bug cannot pass external files. Skips if none found."""
    import glob

    candidates = (
        glob.glob("/root/.pyenv/versions/*/lib/python*/test/"
                  "imghdrdata/python.jpg")
        + glob.glob("/root/.rustup/toolchains/*/share/doc/rust/html/"
                    "embedded-book/assets/verify.jpeg")
    )
    decoded = 0
    for f in candidates:
        try:
            blob = open(f, "rb").read()
        except OSError:
            continue
        try:
            img = decode_image(blob)
        except NotImplementedError:
            continue  # progressive etc. raise honestly
        assert img.ndim == 3 and img.shape[2] == 3 and img.size > 0
        decoded += 1
    if not decoded:
        pytest.skip("no decodable real-world JPEGs available")


# --- progressive test-side encoder (spectral selection + DC
# successive approximation; grayscale and 4:4:4 color) ----------------

def _prog_blocks(plane, q):
    """Quantized zigzag blocks of one component plane (pad to 8)."""
    zz = _zigzag_order()
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = _pad_to(plane.astype(np.float64), ph, pw)
    out = []
    for y0 in range(0, ph, 8):
        row = []
        for x0 in range(0, pw, 8):
            coef = _FDCT_A @ (p[y0:y0 + 8, x0:x0 + 8] - 128.0) @ _FDCT_A.T
            row.append(np.rint(coef.reshape(64)[zz] / q[zz]).astype(int))
        out.append(row)
    return out


def _emit_ac_first(writer, enc_ac, blocks_band, ss, se):
    """AC first-scan emission with cross-block EOB runs."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            n = min(eobrun, (1 << (r + 1)) - 1)
            r = n.bit_length() - 1
            writer.write(*enc_ac[r << 4])
            if r:
                writer.write(r, n - (1 << r))
            eobrun -= n

    for blk in blocks_band:
        nz = [k for k in range(ss, se + 1) if blk[k]]
        if not nz:
            eobrun += 1
            continue
        flush_eob()
        run = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                writer.write(*enc_ac[0xF0])
                run -= 16
            s, fld = _magnitude(v)
            writer.write(*enc_ac[(run << 4) | s])
            writer.write(s, fld)
            run = 0
        if nz[-1] < se:
            eobrun += 1
    flush_eob()


def _encode_jpeg_progressive(img, quality=90, dc_al=0):
    """SOF2 stream: DC scan (optionally at Al=dc_al with a refinement
    scan), then AC bands 1-5 and 6-63 per component."""
    gray = img.ndim == 2
    ql = _scaled_quant(_QL, quality)
    qc = _scaled_quant(_QC, quality)
    zz = _zigzag_order()
    h, w = img.shape[:2]
    if gray:
        planes = [(1, ql, img)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            (1, ql, 0.299 * r + 0.587 * g + 0.114 * b),
            (2, qc, -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0),
            (3, qc, 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0),
        ]
    comp_blocks = {cid: _prog_blocks(p, q) for cid, q, p in planes}

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(ql[zz].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[zz].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for cid, q, _p in planes:
        sof += bytes([cid, 0x11, 0 if q is ql else 1])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + _DC_LUM_BITS + _DC_VALS)
    if not gray:
        out += seg(0xC4, bytes([0x01]) + _DC_CHR_BITS + _DC_VALS)
    enc_dc = {0: _enc_table(_DC_LUM_BITS, _DC_VALS),
              1: _enc_table(_DC_CHR_BITS, _DC_VALS)}

    # --- DC first scan (interleaved when color) at Al=dc_al ---
    writer = _BitWriter()
    pred = {cid: 0 for cid, _, _ in planes}
    bh = len(comp_blocks[1])
    bw = len(comp_blocks[1][0])
    for by in range(bh):
        for bx in range(bw):
            for cid, q, _p in planes:
                tid = 0 if q is ql else 1
                v = int(comp_blocks[cid][by][bx][0]) >> dc_al
                diff = v - pred[cid]
                pred[cid] = v
                s, fld = _magnitude(diff)
                writer.write(*enc_dc[tid][s])
                if s:
                    writer.write(s, fld)
    writer.flush()
    sos = bytes([len(planes)])
    for cid, q, _p in planes:
        sos += bytes([cid, (0 if q is ql else 1) << 4])
    sos += bytes([0, 0, dc_al])
    out += seg(0xDA, sos) + bytes(writer.out)
    if dc_al:
        # --- DC refinement scan: one raw bit per block ---
        writer = _BitWriter()
        for by in range(bh):
            for bx in range(bw):
                for cid, _q, _p in planes:
                    writer.write(1, int(comp_blocks[cid][by][bx][0]) & 1)
        writer.flush()
        hdr = bytes([len(planes)])
        for cid, _q, _p in planes:
            hdr += bytes([cid, 0])
        hdr += bytes([0, 0, (1 << 4) | 0])
        out += seg(0xDA, hdr) + bytes(writer.out)
    # --- AC band scans per component ---
    for cid, q, _p in planes:
        tid = 0 if q is ql else 1
        blocks = [comp_blocks[cid][by][bx]
                  for by in range(len(comp_blocks[cid]))
                  for bx in range(len(comp_blocks[cid][0]))]
        for ss_, se_ in ((1, 5), (6, 63)):
            syms = []
            # first pass to collect AC symbols for the table
            class _Cnt:
                def write(self, a, b=None):
                    pass
            cnt = {}
            eobrun = 0
            for blk in blocks:
                nz = [k for k in range(ss_, se_ + 1) if blk[k]]
                if not nz:
                    eobrun += 1
                    continue
                run = 0
                for k in range(ss_, se_ + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        cnt[0xF0] = 1
                        run -= 16
                    s, _f = _magnitude(v)
                    cnt[(run << 4) | s] = 1
                    run = 0
            for r in range(15):
                cnt[r << 4] = 1  # all EOBn codes available
            bits, vals = _fixed_table(list(cnt))
            out += seg(0xC4, bytes([0x10 | tid]) + bits + vals)
            enc_ac = _enc_table(bits, vals)
            writer = _BitWriter()
            _emit_ac_first(writer, enc_ac, blocks, ss_, se_)
            writer.flush()
            hdr = bytes([1, cid, tid << 4 | tid, ss_, se_, 0])
            out += seg(0xDA, hdr) + bytes(writer.out)
    return out + b"\xff\xd9"


def test_jpeg_progressive_roundtrip():
    """Progressive streams from the test-side encoder must decode to
    the SAME pixels as the equivalent baseline encoding (identical
    quantized coefficients, different scan order)."""
    g = _smooth_rgb(21, 26, seed=7)[:, :, 0]
    base = decode_image(_encode_jpeg(g, quality=90))
    prog = decode_image(_encode_jpeg_progressive(g, quality=90))
    assert np.array_equal(prog, base)
    # DC successive approximation (Al=1 + refinement scan)
    prog2 = decode_image(_encode_jpeg_progressive(g, quality=90,
                                                  dc_al=1))
    assert np.array_equal(prog2, base)
    # color: interleaved DC scan + per-component AC bands
    img = _smooth_rgb(18, 15, seed=8)
    base_c = decode_image(_encode_jpeg(img, quality=92))
    prog_c = decode_image(_encode_jpeg_progressive(img, quality=92))
    assert np.array_equal(prog_c, base_c)


def test_jpeg_progressive_real_world_files():
    """Real progressive JPEGs (standard encoders, successive
    approximation + EOB runs) decode with plausible statistics; the
    nodejs fixtures are white-background graphics."""
    import os

    f = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not os.path.exists(f):
        pytest.skip("no real progressive JPEG available")
    img = decode_image(open(f, "rb").read())
    assert img.shape == (312, 493, 3)
    assert img.mean() > 235  # white-dominated graphic
