"""Baseline JPEG decode: roundtrip against a reference encoder built
here from the spec (forward DCT + flat quantization + simple canonical
Huffman tables), fuzz, and quarantine wiring."""

from __future__ import annotations

import numpy as np
import pytest

from near_real_time_data_warehouse_spark.operators import jpeg as J
from near_real_time_data_warehouse_spark.operators import multimodal as mm

_ZZ = J.zigzag_order()

# Simple valid canonical Huffman tables (the decoder reads whatever DHT
# declares — no need for the Annex K tables): 12 DC categories at 4
# bits, all 162 standard AC run/size symbols at 8 bits.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALUES = bytes(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8
_AC_VALUES = bytes(_AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)

    def flush_to_marker(self, marker: int) -> None:
        """Byte-align (1-padded) and emit a raw marker (RSTn)."""
        self.flush()
        self.out += bytes([0xFF, marker])


def _canonical_codes(bits, values):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALUES)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALUES)

_FDCT_C = J._IDCT_C  # orthonormal: forward = C @ B @ C.T


def _encode_block(writer, block, pred):
    coeffs = _FDCT_C @ (block - 128.0) @ _FDCT_C.T
    q = np.rint(coeffs).astype(int)
    zz = [int(q.flat[_ZZ[i]]) for i in range(64)]
    diff = zz[0] - pred
    size = abs(diff).bit_length()
    code, length = _DC_CODES[size]
    writer.write(code, length)
    if size:
        raw = diff if diff >= 0 else diff + (1 << size) - 1
        writer.write(raw, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_CODES[0xF0]
            writer.write(c, ln)
            run -= 16
        size = abs(v).bit_length()
        c, ln = _AC_CODES[(run << 4) | size]
        writer.write(c, ln)
        raw = v if v >= 0 else v + (1 << size) - 1
        writer.write(raw, size)
        run = 0
    if last_nz < 63:
        c, ln = _AC_CODES[0x00]
        writer.write(c, ln)
    return zz[0]


def encode_jpeg(rgb: np.ndarray, grayscale: bool = False,
                sof_marker: int = 0xC0) -> bytes:
    """Reference baseline encoder: 4:4:4 (or single-plane grayscale),
    flat quantization (all 1s — near-lossless), restarts off."""
    import struct

    h, w, _ = rgb.shape
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [y] if grayscale else [y, cb, cr]

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.zeros((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    writer = _BitWriter()
    preds = [0] * len(padded)
    for my in range(ph // 8):
        for mx in range(pw // 8):
            for ci, p in enumerate(padded):
                block = p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[ci] = _encode_block(writer, block, preds[ci])
    data = writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = bytes([0]) + bytes([1] * 64)
    nc = len(padded)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + _DC_VALUES
        + bytes([0x10]) + bytes(_AC_BITS) + _AC_VALUES
    )
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    return (
        b"\xff\xd8" + seg(0xDB, dqt) + seg(sof_marker, sof) + seg(0xC4, dht)
        + seg(0xDA, sos) + data + b"\xff\xd9"
    )


def _test_image(h, w, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h, w, 3))
    # smooth it a little so quantization error stays tiny
    return ((base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3).astype(
        np.uint8
    )


def test_jpeg_roundtrip_near_lossless():
    """Flat quantization: decode(encode(img)) within a few counts of the
    original (float DCT rounding only), exact dimensions, multiple sizes
    including non-multiple-of-8."""
    for h, w in [(16, 16), (24, 17), (9, 13)]:
        img = _test_image(h, w)
        parsed = J.parse_jpeg(encode_jpeg(img))
        assert (parsed["width"], parsed["height"]) == (w, h)
        got = np.frombuffer(parsed["pixels"], np.uint8).reshape(h, w, 3)
        err = np.abs(got.astype(int) - img.astype(int))
        assert err.max() <= 6, (h, w, err.max())
        assert err.mean() < 2.0


def test_jpeg_grayscale_and_solid():
    img = np.full((8, 8, 3), 200, np.uint8)
    parsed = J.parse_jpeg(encode_jpeg(img, grayscale=True))
    got = np.frombuffer(parsed["pixels"], np.uint8).reshape(8, 8, 3)
    assert np.abs(got.astype(int) - 200).max() <= 2
    parsed = J.parse_jpeg(encode_jpeg(img))
    got = np.frombuffer(parsed["pixels"], np.uint8).reshape(8, 8, 3)
    assert np.abs(got.astype(int) - 200).max() <= 3


def test_jpeg_progressive_sof_with_sequential_scan_is_malformed():
    """SOF2 with a full-band Ah=Al=0 interleaved scan header (Ss=0,
    Se=63) is inconsistent — progressive DC scans must have Se=0."""
    img = _test_image(8, 8)
    payload = encode_jpeg(img, sof_marker=0xC2)
    with pytest.raises(mm.MalformedMedia, match="DC scan"):
        J.parse_jpeg(payload)


def test_jpeg_incomplete_component_coverage_is_malformed():
    """A 3-component baseline file whose only scan covers Y then hits
    EOI never defines the chroma planes — malformed (was the old
    non-interleaved DecodeNotAvailable gate; proper per-component
    multi-scan files now decode for real, see the tests below)."""
    import struct

    payload = encode_jpeg(_test_image(8, 8))
    i = payload.find(b"\xff\xda")
    seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
    sos1 = bytes([1, 1, 0x00, 0, 63, 0])  # ns=1: Y only, of nc=3
    patched = (
        payload[:i]
        + b"\xff\xda" + struct.pack(">H", len(sos1) + 2) + sos1
        + payload[i + 2 + seg_len :]
    )
    with pytest.raises(mm.MalformedMedia):
        J.parse_jpeg(patched)


def test_jpeg_never_crashes_on_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = encode_jpeg(_test_image(8, 8))

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=256), st.integers(0, len(valid) - 1),
           st.integers(0, 255))
    def run(payload, mi, mb):
        for p in (payload, valid[:mi] + bytes([mb]) + valid[mi + 1:]):
            try:
                J.parse_jpeg(p)
            except (mm.MalformedMedia, mm.DecodeNotAvailable):
                pass

    run()


def test_quarantine_routes_jpeg(spark):
    img = _test_image(8, 8)
    good = encode_jpeg(img)
    rows = [(1, "image", bytearray(good)), (2, "image", bytearray(good[:30]))]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in mm.decode_with_quarantine(df).collect()}
    assert out[1].ok and out[1].format == "jpeg" and out[1].width == 8
    assert not out[2].ok


def encode_jpeg_420(rgb: np.ndarray, restart_interval: int = 0) -> bytes:
    """Reference 4:2:0 encoder: 16x16 MCUs of four Y blocks plus one
    2x2-averaged Cb and Cr block each, optional DRI/RSTn restarts —
    exercises the decoder's multi-block sampling assembly, chroma
    upsampling, and restart handling."""
    import struct

    h, w, _ = rgb.shape
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16

    def pad(p):
        pp = np.zeros((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        return pp

    yp = pad(y)
    cbp = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    crp = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    writer = _BitWriter()
    preds = [0, 0, 0]
    mcus_x, mcus_y = pw // 16, ph // 16
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.flush_to_marker(0xD0 + (rst & 7))
                rst += 1
                preds = [0, 0, 0]
            for by in range(2):
                for bx in range(2):
                    blk = yp[(my * 2 + by) * 8:(my * 2 + by) * 8 + 8,
                             (mx * 2 + bx) * 8:(mx * 2 + bx) * 8 + 8]
                    preds[0] = _encode_block(writer, blk, preds[0])
            preds[1] = _encode_block(
                writer, cbp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], preds[1]
            )
            preds[2] = _encode_block(
                writer, crp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], preds[2]
            )
            mcu_index += 1
    data = writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = bytes([0]) + bytes([1] * 64)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + _DC_VALUES
        + bytes([0x10]) + bytes(_AC_BITS) + _AC_VALUES
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out = b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof) + seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    return out + seg(0xDA, sos) + data + b"\xff\xd9"


def test_jpeg_420_sampling_and_restarts():
    """4:2:0 decode: luma near-exact, chroma within subsampling error on
    a smooth gradient; restart markers reset predictors correctly."""
    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 5) % 256,
            (yy * 7) % 256,
            ((xx + yy) * 3) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    for ri in (0, 1, 2):
        parsed = J.parse_jpeg(encode_jpeg_420(img, restart_interval=ri))
        assert (parsed["width"], parsed["height"]) == (w, h)
        got = np.frombuffer(parsed["pixels"], np.uint8).reshape(h, w, 3).astype(int)
        # compare in YCbCr space: luma is full-res (tight), chroma is
        # 2x2-averaged then replicated (bounded by local variation)
        def ycc(a):
            r, g, b = a[..., 0], a[..., 1], a[..., 2]
            return (
                0.299 * r + 0.587 * g + 0.114 * b,
                -0.168736 * r - 0.331264 * g + 0.5 * b,
                0.5 * r - 0.418688 * g - 0.081312 * b,
            )
        y0, cb0, cr0 = ycc(img.astype(int))
        y1, cb1, cr1 = ycc(got)
        assert np.abs(y1 - y0).max() <= 6, ri
        assert np.abs(cb1 - cb0).mean() <= 8, ri
        assert np.abs(cr1 - cr0).mean() <= 8, ri


def test_cross_format_perceptual_hash_agrees():
    """One image through four containers: PPM/PNG/GIF decode pixel-exact
    (identical aHash), lossy JPEG lands within a few Hamming bits — the
    cross-format dedup property the decode layer exists to provide."""
    from tests.test_multimodal import _gif_bytes, _png_bytes

    h, w = 32, 32
    # a grayscale-ish gradient quantizable to a small GIF palette
    levels = [(v, v, v) for v in range(0, 256, 8)]  # 32 palette entries
    idx = [((x // 2 + y // 2) % 32) for y in range(h) for x in range(w)]
    pixels = bytes(c for i in idx for c in levels[i])

    ppm = mm.parse_ppm(b"P6\n%d %d\n255\n" % (w, h) + pixels)
    png = mm.parse_png(_png_bytes(w, h, pixels))
    gif = mm.parse_gif(_gif_bytes(w, h, idx, levels, min_code_size=5))
    assert png["pixels"] == ppm["pixels"] == gif["pixels"]

    img = np.frombuffer(pixels, np.uint8).reshape(h, w, 3)
    jpg = J.parse_jpeg(encode_jpeg(img))

    hashes = {f["format"]: mm.ppm_ahash(f) for f in (ppm, png, gif, jpg)}
    assert hashes["ppm"] == hashes["png"] == hashes["gif"]
    ham = bin(hashes["ppm"] ^ hashes["jpeg"]).count("1")
    assert ham <= 4, ham


# --- progressive reference encoder (ITU T.81 Annex G forward path) --------
# Emits real spectral-selection + successive-approximation scan sequences
# so the decoder is validated against the TRUSTED baseline decode of the
# same quantized coefficients: both paths must produce identical pixels.

_AC_SYMBOLS_PROG = [r << 4 for r in range(16)] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS_PROG = [0] * 7 + [len(_AC_SYMBOLS_PROG)] + [0] * 8
_AC_VALUES_PROG = bytes(_AC_SYMBOLS_PROG)
_AC_CODES_PROG = _canonical_codes(_AC_BITS_PROG, _AC_VALUES_PROG)


def _quantized_planes(rgb, grayscale=False):
    """Per-component (bh, bw, 64) zigzag coefficient arrays, flat quant."""
    h, w, _ = rgb.shape
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [y] if grayscale else [y, cb, cr]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    comps = []
    for p in planes:
        pp = np.zeros((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        zz = np.zeros((ph // 8, pw // 8, 64), dtype=int)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                co = np.rint(_FDCT_C @ (blk - 128.0) @ _FDCT_C.T).astype(int)
                zz[by, bx] = co.flat[_ZZ]
        comps.append(zz)
    return comps


class _ProgScanWriter:
    """One scan's entropy coder with libjpeg-style EOB-run batching and
    the saved (BE) vs current-block (BR) correction-bit split."""

    def __init__(self):
        self.w = _BitWriter()
        self.eobrun = 0
        self.saved_bits = []   # flushed with the next EOBn emission
        self.cur_bits = []     # flushed after the next in-block symbol

    def _emit(self, codes, sym):
        c, ln = codes[sym]
        self.w.write(c, ln)

    def _flush_bits(self, bits):
        for b in bits:
            self.w.write(b, 1)
        bits.clear()

    def flush_eobrun(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self._emit(_AC_CODES_PROG, r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        self._flush_bits(self.saved_bits)

    def dc_first(self, dc_shifted, pred):
        diff = dc_shifted - pred
        size = abs(diff).bit_length()
        self._emit(_DC_CODES, size)
        if size:
            raw = diff if diff >= 0 else diff + (1 << size) - 1
            self.w.write(raw, size)
        return dc_shifted

    def dc_refine(self, dc, al):
        self.w.write((dc >> al) & 1, 1)

    def ac_first(self, zz, ss, se, al):
        band = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = abs(v) >> al
            band.append(t if v >= 0 else -t)
        if not any(band):
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()
            return
        self.flush_eobrun()
        r = 0
        last_nz = max(i for i, v in enumerate(band) if v)
        for i, v in enumerate(band):
            if i > last_nz:
                self.eobrun += 1
                return
            if v == 0:
                r += 1
                continue
            while r > 15:
                self._emit(_AC_CODES_PROG, 0xF0)
                r -= 16
            size = abs(v).bit_length()
            self._emit(_AC_CODES_PROG, (r << 4) | size)
            raw = v if v >= 0 else v + (1 << size) - 1
            self.w.write(raw, size)
            r = 0

    def ac_refine(self, zz, ss, se, al):
        t = []
        hist = []
        sign = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            t.append(abs(v) >> al)
            hist.append((abs(v) >> (al + 1)) != 0)
            sign.append(v >= 0)
        eob = -1
        for i, ti in enumerate(t):
            if ti == 1 and not hist[i]:
                eob = i
        r = 0
        for i, ti in enumerate(t):
            if ti == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                self.flush_eobrun()
                self._emit(_AC_CODES_PROG, 0xF0)
                r -= 16
                self._flush_bits(self.cur_bits)
            if hist[i]:
                self.cur_bits.append(ti & 1)
                continue
            # newly visible (ti == 1)
            self.flush_eobrun()
            self._emit(_AC_CODES_PROG, (r << 4) | 1)
            self.w.write(1 if sign[i] else 0, 1)
            self._flush_bits(self.cur_bits)
            r = 0
        if r > 0 or self.cur_bits:
            self.eobrun += 1
            self.saved_bits.extend(self.cur_bits)
            self.cur_bits.clear()
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def restart(self, marker_idx):
        """Flush all pending state and byte-align to an RSTn marker —
        the encoder side of the decoder's unit_boundary reset."""
        self.flush_eobrun()
        self._flush_bits(self.cur_bits)
        self.w.flush_to_marker(0xD0 + (marker_idx % 8))

    def finish(self):
        self.flush_eobrun()
        return self.w.flush()


def encode_jpeg_progressive(rgb, grayscale=False, dc_al=1, ac_al=1,
                            bands=((1, 5), (6, 63)), restart_interval=0):
    """Spectral selection + successive approximation: interleaved DC
    first/refine scans, per-component AC band first/refine scans;
    optional DRI/RSTn restarts every ``restart_interval`` data units
    (MCUs in the interleaved DC scans, blocks in the AC scans)."""
    import struct

    comps = _quantized_planes(rgb, grayscale)
    h, w, _ = rgb.shape
    nc = len(comps)
    bh, bw = comps[0].shape[0], comps[0].shape[1]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(scan_comps, ss, se, ah, al, data):
        body = bytes([len(scan_comps)])
        for cid in scan_comps:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body) + data

    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALUES
               + bytes([0x10]) + bytes(_AC_BITS_PROG) + _AC_VALUES_PROG)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    class _Rst:
        """Counts data units and emits RSTn every restart_interval."""

        def __init__(self, sw):
            self.sw, self.units, self.n = sw, 0, 0

        def boundary(self):
            hit = (restart_interval and self.units
                   and self.units % restart_interval == 0)
            if hit:
                self.sw.restart(self.n)
                self.n += 1
            self.units += 1
            return hit

    # DC first (interleaved, Al=dc_al)
    sw = _ProgScanWriter()
    rst = _Rst(sw)
    preds = [0] * nc
    for by in range(bh):
        for bx in range(bw):
            if rst.boundary():
                preds = [0] * nc
            for ci in range(nc):
                preds[ci] = sw.dc_first(int(comps[ci][by, bx, 0]) >> dc_al,
                                        preds[ci])
    out += sos(list(range(1, nc + 1)), 0, 0, 0, dc_al, sw.finish())

    # AC first scans: per component, per spectral band
    for ci in range(nc):
        for (ss, se) in bands:
            sw = _ProgScanWriter()
            rst = _Rst(sw)
            for by in range(bh):
                for bx in range(bw):
                    rst.boundary()
                    sw.ac_first(comps[ci][by, bx], ss, se, ac_al)
            out += sos([ci + 1], ss, se, 0, ac_al, sw.finish())

    # DC refinement scans down to full precision
    for al in range(dc_al - 1, -1, -1):
        sw = _ProgScanWriter()
        rst = _Rst(sw)
        for by in range(bh):
            for bx in range(bw):
                rst.boundary()
                for ci in range(nc):
                    sw.dc_refine(int(comps[ci][by, bx, 0]), al)
        out += sos(list(range(1, nc + 1)), 0, 0, al + 1, al, sw.finish())

    # AC refinement scans
    for al in range(ac_al - 1, -1, -1):
        for ci in range(nc):
            for (ss, se) in bands:
                sw = _ProgScanWriter()
                rst = _Rst(sw)
                for by in range(bh):
                    for bx in range(bw):
                        rst.boundary()
                        sw.ac_refine(comps[ci][by, bx], ss, se, al)
                out += sos([ci + 1], ss, se, al + 1, al, sw.finish())

    return out + b"\xff\xd9"


def test_jpeg_progressive_with_restarts_matches_baseline():
    """DRI/RSTn inside progressive scans: predictors and EOB runs reset
    at every restart boundary in all four scan kinds; pixels must still
    equal the baseline decode."""
    img = _test_image(24, 17, seed=13)
    base = J.parse_jpeg(encode_jpeg(img))
    for ri in (1, 3):
        prog = J.parse_jpeg(encode_jpeg_progressive(img, restart_interval=ri))
        assert prog["pixels"] == base["pixels"], ri


def test_jpeg_progressive_matches_baseline_decode():
    """Progressive and baseline files built from the SAME quantized
    coefficients must decode to IDENTICAL pixels — certifying spectral
    selection, successive approximation, EOB runs, and AC correction
    bits against the independently-tested sequential path."""
    for h, w, gray in [(16, 16, False), (24, 17, False), (9, 13, True),
                       (8, 8, False)]:
        img = _test_image(h, w, seed=h + w)
        base = J.parse_jpeg(encode_jpeg(img, grayscale=gray))
        prog = J.parse_jpeg(encode_jpeg_progressive(img, grayscale=gray))
        assert (prog["width"], prog["height"]) == (w, h)
        assert prog["pixels"] == base["pixels"], (h, w, gray)


def test_jpeg_progressive_single_band_and_deeper_approximation():
    img = _test_image(17, 19, seed=11)
    base = J.parse_jpeg(encode_jpeg(img))
    prog = J.parse_jpeg(
        encode_jpeg_progressive(img, dc_al=2, ac_al=2, bands=((1, 63),))
    )
    assert prog["pixels"] == base["pixels"]
    prog2 = J.parse_jpeg(
        encode_jpeg_progressive(img, dc_al=0, ac_al=0,
                                bands=((1, 2), (3, 20), (21, 63)))
    )
    assert prog2["pixels"] == base["pixels"]


def test_jpeg_baseline_noninterleaved_multiscan_decodes():
    """A sequential file with one scan PER COMPONENT (ns=1 each) must
    decode identically to the interleaved single-scan file."""
    import struct

    img = _test_image(16, 16, seed=4)
    base = J.parse_jpeg(encode_jpeg(img))
    comps = _quantized_planes(img)
    h, w = 16, 16
    bh, bw = comps[0].shape[0], comps[0].shape[1]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for i in range(3):
        sof += bytes([i + 1, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALUES
               + bytes([0x10]) + bytes(_AC_BITS) + _AC_VALUES)
    for ci in range(3):
        writer = _BitWriter()
        pred = 0
        for by in range(bh):
            for bx in range(bw):
                zz = comps[ci][by, bx]
                diff = int(zz[0]) - pred
                pred = int(zz[0])
                size = abs(diff).bit_length()
                c, ln = _DC_CODES[size]
                writer.write(c, ln)
                if size:
                    raw = diff if diff >= 0 else diff + (1 << size) - 1
                    writer.write(raw, size)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = _AC_CODES[0xF0]
                        writer.write(c, ln)
                        run -= 16
                    size = abs(v).bit_length()
                    c, ln = _AC_CODES[(run << 4) | size]
                    writer.write(c, ln)
                    raw = v if v >= 0 else v + (1 << size) - 1
                    writer.write(raw, size)
                    run = 0
                if last_nz < 63:
                    c, ln = _AC_CODES[0x00]
                    writer.write(c, ln)
        out += seg(0xDA, bytes([1, ci + 1, 0x00, 0, 63, 0])) + writer.flush()
    out += b"\xff\xd9"
    got = J.parse_jpeg(out)
    assert got["pixels"] == base["pixels"]


def test_jpeg_progressive_never_crashes_on_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = encode_jpeg_progressive(_test_image(8, 8))

    @settings(max_examples=80, deadline=None)
    @given(st.integers(0, len(valid) - 1), st.integers(0, 255))
    def run(mi, mb):
        try:
            J.parse_jpeg(valid[:mi] + bytes([mb]) + valid[mi + 1:])
        except (mm.MalformedMedia, mm.DecodeNotAvailable):
            pass

    run()


def test_jpeg_16bit_dqt_and_sampling_gates():
    import struct

    img = _test_image(16, 16, seed=9)
    payload = encode_jpeg(img)
    base = J.parse_jpeg(payload)
    # swap the 8-bit DQT (pq=0, flat 1s) for a 16-bit one (pq=1, same 1s)
    i = payload.find(b"\xff\xdb")
    old_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
    dqt16 = bytes([0x10]) + b"".join(struct.pack(">H", 1) for _ in range(64))
    patched = (
        payload[:i]
        + b"\xff\xdb" + struct.pack(">H", len(dqt16) + 2) + dqt16
        + payload[i + 2 + old_len :]
    )
    assert J.parse_jpeg(patched)["pixels"] == base["pixels"]
    # 16-bit DQT with a LARGE value (>255) must actually be read as 16-bit
    big = bytearray(dqt16)
    big[1:3] = struct.pack(">H", 300)  # DC quant step 300
    patched_big = (
        payload[:i]
        + b"\xff\xdb" + struct.pack(">H", len(big) + 2) + bytes(big)
        + payload[i + 2 + old_len :]
    )
    assert J.parse_jpeg(patched_big)["pixels"] != base["pixels"]
    # sampling factor gates: 5 is out of spec; 3-vs-2 is non-divisible
    s = payload.find(b"\xff\xc0")
    sof_body = bytearray(payload[s + 4 : s + 4 + 15])
    bad = bytearray(payload)
    bad[s + 4 + 7] = 0x55  # Y h=5, v=5
    with pytest.raises(mm.MalformedMedia, match="1-4"):
        J.parse_jpeg(bytes(bad))
    nondiv = bytearray(payload)
    nondiv[s + 4 + 7] = 0x31   # Y h=3
    nondiv[s + 4 + 10] = 0x21  # Cb h=2 -> 3 % 2 != 0
    with pytest.raises(mm.DecodeNotAvailable, match="non-divisible"):
        J.parse_jpeg(bytes(nondiv))


def test_jpeg_progressive_dc_accumulation_past_int32_is_exact():
    """A crafted DC-first scan can climb the predictor by +2047 per
    block; with Al=13 the stored coefficient exceeds int32 after ~129
    blocks.  The coefficient store must hold it exactly (int64): numpy
    1.x would silently wrap to a negative DC (pixels 0 instead of 255),
    numpy >= 2 would raise OverflowError and escape quarantine."""
    import struct

    h, w = 8, 1032           # 1 x 129 blocks, grayscale
    nblocks = w // 8
    sw = _ProgScanWriter()
    pred = 0
    for i in range(nblocks):
        pred = sw.dc_first(2047 * (i + 1), pred)
    assert pred << 13 > 2**31  # the crafted stream really crosses int32

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALUES)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x0D])) + sw.finish()
    out += b"\xff\xd9"

    got = J.parse_jpeg(out)
    px = np.frombuffer(got["pixels"], dtype=np.uint8).reshape(h, w, 3)
    assert int(px[0, w - 1, 0]) == 255  # int32 wrap would clip to 0


# --- lossless (SOF3, T.81 Annex H) reference encoder ----------------------
# Forward path of the decoder's sample-domain process: predict with the
# same H.1.2 rules, difference mod 2^16, SSSS 0-16 coding with a DC-class
# Huffman table (SSSS 16 = +32768, no extra bits), optional DRI/RSTn.

_LL_BITS = [0, 0, 0, 0, 17] + [0] * 11   # all 17 SSSS symbols at 5 bits
_LL_VALUES = bytes(range(17))
_LL_CODES = _canonical_codes(_LL_BITS, _LL_VALUES)


def encode_jpeg_lossless(rgb, predictor=4, pt=0, restart_interval=0,
                         grayscale=False, interleaved=True):
    """SOF3 forward path: components stored directly (RGB — T.81 defines
    no lossless color transform), one interleaved scan or one scan per
    component, point transform ``pt``, restarts every
    ``restart_interval`` MCUs."""
    import struct

    h, w, _ = rgb.shape
    planes = (
        [rgb[:, :, 0].astype(int)]
        if grayscale
        else [rgb[:, :, i].astype(int) for i in range(3)]
    )
    planes = [p >> pt for p in planes]
    nc = len(planes)
    default = 1 << (8 - pt - 1)

    def predict(p, y, x, start):
        if y * w + x == start:
            return default
        if y == start // w:
            return int(p[y, x - 1])
        if x == 0:
            return int(p[y - 1, 0])
        a, b, c = int(p[y, x - 1]), int(p[y - 1, x]), int(p[y - 1, x - 1])
        return {1: a, 2: b, 3: c, 4: a + b - c, 5: a + ((b - c) >> 1),
                6: b + ((a - c) >> 1), 7: (a + b) >> 1}[predictor]

    def encode_scan(scan_planes):
        wtr = _BitWriter()
        rstn = 0
        start = 0
        for n in range(w * h):
            if restart_interval and n and n % restart_interval == 0:
                wtr.flush_to_marker(0xD0 + (rstn % 8))
                rstn += 1
                start = n
            y, x = divmod(n, w)
            for p in scan_planes:
                d = (int(p[y, x]) - predict(p, y, x, start)) % 65536
                if d > 32768:
                    d -= 65536
                if d == 32768:
                    c, ln = _LL_CODES[16]
                    wtr.write(c, ln)
                    continue
                size = abs(d).bit_length()
                c, ln = _LL_CODES[size]
                wtr.write(c, ln)
                if size:
                    raw = d if d >= 0 else d + (1 << size) - 1
                    wtr.write(raw, size)
        return wtr.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += seg(0xC3, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_LL_BITS) + _LL_VALUES)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def sos(comp_ids, data):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([predictor, 0, pt])
        return seg(0xDA, body) + data

    if interleaved or nc == 1:
        out += sos(list(range(1, nc + 1)), encode_scan(planes))
    else:
        for i, p in enumerate(planes):
            out += sos([i + 1], encode_scan([p]))
    return out + b"\xff\xd9"


def test_jpeg_lossless_roundtrip_every_predictor():
    """SOF3 is LOSSLESS: decoded pixels must equal the source bytes
    exactly for each of the seven predictors."""
    img = _test_image(19, 23, seed=7)
    for psel in range(1, 8):
        got = J.parse_jpeg(encode_jpeg_lossless(img, predictor=psel))
        assert (got["width"], got["height"]) == (23, 19)
        assert got["pixels"] == img.tobytes(), psel


def test_jpeg_lossless_point_transform_and_grayscale():
    img = _test_image(11, 14, seed=9)
    for pt in (1, 3):
        got = J.parse_jpeg(encode_jpeg_lossless(img, predictor=5, pt=pt))
        want = ((img.astype(int) >> pt) << pt).astype(np.uint8)
        assert got["pixels"] == want.tobytes(), pt
    gray = J.parse_jpeg(encode_jpeg_lossless(img, grayscale=True))
    want = np.repeat(img[:, :, :1], 3, axis=2)
    assert gray["pixels"] == want.tobytes()


def test_jpeg_lossless_restarts_and_noninterleaved():
    """RSTn resets the predictor to the interval-start rules (default
    value, then Ra on that line) in both scan layouts; mid-line restart
    intervals are exercised deliberately (w=13 is coprime to 5)."""
    img = _test_image(9, 13, seed=21)
    for ri in (1, 5):
        got = J.parse_jpeg(
            encode_jpeg_lossless(img, predictor=4, restart_interval=ri)
        )
        assert got["pixels"] == img.tobytes(), ri
    non_i = J.parse_jpeg(
        encode_jpeg_lossless(img, predictor=7, restart_interval=3,
                             interleaved=False)
    )
    assert non_i["pixels"] == img.tobytes()


def test_jpeg_lossless_gates_and_malformed():
    """Unsupported-but-valid lossless shapes quarantine as
    DecodeNotAvailable; nonsense scan parameters are MalformedMedia."""
    import struct

    img = _test_image(8, 8, seed=2)
    payload = bytearray(encode_jpeg_lossless(img))
    sof_at = payload.index(b"\xff\xc3")
    deep = bytearray(payload)
    deep[sof_at + 4] = 12  # precision 12: valid per spec, gated here
    with pytest.raises(mm.DecodeNotAvailable):
        J.parse_jpeg(bytes(deep))
    sub = bytearray(payload)
    sub[sof_at + 11] = 0x21  # 2x1 sampling on component 1
    with pytest.raises(mm.DecodeNotAvailable):
        J.parse_jpeg(bytes(sub))
    # predictor selector 0 is hierarchical-only -> malformed in SOF3
    bad = bytearray(payload)
    sos_at = payload.index(b"\xff\xda")
    bad[sos_at + 2 + 2 + 1 + 6] = 0  # Ss byte of the 3-component scan
    with pytest.raises(mm.MalformedMedia):
        J.parse_jpeg(bytes(bad))
