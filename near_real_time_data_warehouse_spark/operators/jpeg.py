"""Dependency-free baseline JPEG (JFIF) decoder.

The codec everyone assumes needs a library, implemented from the spec
on numpy: marker segment walking, 8-bit quantization tables, canonical
Huffman table reconstruction from DHT bits/values, the entropy-coded
scan with byte unstuffing and restart markers, per-MCU DC-differential
+ run/length AC coefficient decoding in zigzag order, dequantization,
a separable orthonormal 8×8 IDCT, sampling-factor plane assembly with
chroma upsampling, and JFIF YCbCr→RGB. Supports SOF0 (baseline
sequential), 8-bit precision, 1 or 3 components, sampling factors 1–2,
DRI/RSTn restarts. Progressive (SOF2) and arithmetic-coded variants
raise ``DecodeNotAvailable`` — valid files this decoder doesn't cover,
not parse failures; everything else malformed raises ``MalformedMedia``.

Determinism note: the IDCT is float64 but every consumer quantizes to
uint8 through the same numpy expressions, so decoded pixels are
reproducible across runs/machines for a fixed payload.

Output is the shared {width, height, pixels(RGB)} shape of
operators/multimodal.py, so features/aHash/near-dup work on JPEGs
unchanged.
"""

from __future__ import annotations

import numpy as np


def _errors():
    from .multimodal import DecodeNotAvailable, MalformedMedia

    return MalformedMedia, DecodeNotAvailable


def zigzag_order() -> list[int]:
    """The 64 zigzag positions, generated (not transcribed) by walking
    the anti-diagonals of the 8×8 block."""
    order = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        cells = [(d - j, j) for j in rng]
        if d % 2 == 0:
            cells.reverse()
        order += [r * 8 + c for r, c in cells]
    return order


_ZIGZAG = zigzag_order()

_IDCT_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _idct2(coeffs: np.ndarray) -> np.ndarray:
    """Separable 2-D inverse DCT of an 8×8 coefficient block."""
    return _IDCT_C.T @ coeffs @ _IDCT_C


class _Huffman:
    """Canonical Huffman table from DHT (bits per length, values)."""

    def __init__(self, bits: list[int], values: bytes):
        MalformedMedia, _ = _errors()
        if sum(bits) != len(values):
            raise MalformedMedia("DHT bits/values mismatch")
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        MalformedMedia, _ = _errors()
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise MalformedMedia("invalid Huffman code in scan")


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    unstuffing; RST markers reset the stream at restart intervals."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        MalformedMedia, _ = _errors()
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise MalformedMedia("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise MalformedMedia("dangling FF in scan")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise MalformedMedia("unexpected marker inside scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_restart(self) -> None:
        """Skip to just past the next RSTn marker."""
        MalformedMedia, _ = _errors()
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise MalformedMedia("expected restart marker")


def _extend(value: int, size: int) -> int:
    """JPEG signed-magnitude extension of a ``size``-bit received value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def parse_jpeg(payload: bytes) -> dict:
    MalformedMedia, DecodeNotAvailable = _errors()
    if payload is None or payload[:2] != b"\xff\xd8":
        raise MalformedMedia("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    sof = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise MalformedMedia(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RSTn outside a scan
            pos += 2
            continue
        if marker == 0x01 or marker == 0xFF:  # TEM / fill byte
            pos += 2 if marker == 0x01 else 1
            continue
        length = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if length < 2:
            raise MalformedMedia(f"segment FF{marker:02X} with bad length")
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) < length - 2:
            raise MalformedMedia(f"segment FF{marker:02X} truncated")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise DecodeNotAvailable("16-bit quantization tables")
                if p + 65 > len(body):
                    raise MalformedMedia("DQT truncated")
                tbl = np.zeros(64)
                for i in range(64):
                    tbl[_ZIGZAG[i]] = body[p + 1 + i]
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = bytes(body[p + 17 : p + 17 + n])
                if len(values) < n:
                    raise MalformedMedia("DHT values truncated")
                table = _Huffman(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise MalformedMedia("SOF0 truncated")
            if body[0] != 8:
                raise DecodeNotAvailable("non-8-bit JPEG precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                raise DecodeNotAvailable(f"{nc}-component JPEG")
            if len(body) < 6 + 3 * nc:
                raise MalformedMedia("SOF0 component list truncated")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            sof = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise DecodeNotAvailable(
                f"JPEG SOF type FF{marker:02X} (only baseline SOF0)"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise MalformedMedia("DRI truncated")
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if not body:
                raise MalformedMedia("empty SOS")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise MalformedMedia("SOS component list truncated")
            scan_comps = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append(
                    {"id": cs, "dc": tables >> 4, "ac": tables & 0x0F}
                )
            scan = scan_comps
            pos = pos + 2 + length
            break
        # APPn / COM / anything else: skip
        pos = pos + 2 + length
    if sof is None or scan is None:
        raise MalformedMedia("missing SOF0 or SOS")
    if len(scan) != len(sof["comps"]) or len({sc["id"] for sc in scan}) != len(scan):
        # Baseline allows multiple NON-interleaved scans (ns < nc each);
        # decoding only the first as if it covered every component would
        # silently produce garbage planes (zero chroma, wrong MCU
        # geometry) feeding wrong perceptual hashes downstream. Valid but
        # uncovered → the typed gate, not MalformedMedia (ADVICE r4).
        raise DecodeNotAvailable(
            "non-interleaved multi-scan JPEG (SOS covers a component subset)"
        )
    w, h = sof["w"], sof["h"]
    if w < 1 or h < 1 or w * h > (1 << 22):
        raise MalformedMedia("nonsensical JPEG dimensions")

    hmax = max(c["h"] for c in sof["comps"])
    vmax = max(c["v"] for c in sof["comps"])
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in sof["comps"]):
        raise DecodeNotAvailable("sampling factors beyond 2 not supported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    by_id = {c["id"]: c for c in sof["comps"]}
    planes = {}
    for c in sof["comps"]:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw))

    reader = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in sof["comps"]}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_to_restart()
                pred = {c["id"]: 0 for c in sof["comps"]}
            for sc in scan:
                comp = by_id.get(sc["id"])
                if comp is None:
                    raise MalformedMedia("scan references unknown component")
                if sc["dc"] not in huff_dc or sc["ac"] not in huff_ac:
                    raise MalformedMedia("scan references missing Huffman table")
                if comp["tq"] not in qt:
                    raise MalformedMedia("component references missing DQT")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64)
                        size = huff_dc[sc["dc"]].decode(reader)
                        if size > 11:
                            raise MalformedMedia("DC category out of range")
                        diff = _extend(reader.receive(size), size)
                        pred[comp["id"]] += diff
                        coeffs[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = huff_ac[sc["ac"]].decode(reader)
                            run, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise MalformedMedia("AC run past block end")
                            coeffs[k] = _extend(reader.receive(ssss), ssss)
                            k += 1
                        block = np.zeros((8, 8))
                        block.flat[_ZIGZAG] = coeffs
                        block *= qt[comp["tq"]]
                        px = _idct2(block) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_index += 1

    # upsample to full resolution and crop
    full = []
    for c in sof["comps"]:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
    else:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(
            np.uint8
        )
    return {"width": w, "height": h, "format": "jpeg", "pixels": rgb.tobytes()}
