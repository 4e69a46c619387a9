"""Baseline JPEG codec — pure numpy + stdlib, no media libraries.

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
4:4:4 / 4:2:2 / 4:2:0 chroma subsampling (generic sampling factors
1-2 on decode per T.81 A.2.3 — interleaved hi x vi blocks per MCU,
replication upsampling; encode offers the same three via block-mean
downsampling), standard Annex K quantization and Huffman tables,
optional restart markers on decode. Progressive (SOF2), sampling
factors > 2, arithmetic-coded and 12-bit streams raise
``NotImplementedError`` cleanly.

JPEG is LOSSY, so unlike the PNG codec there is no byte-exact
roundtrip to put under an SQL oracle hash; the correctness pins are
property tests (`tests/test_multimodal.py`): decode(encode(x)) within
a quality-dependent error envelope, bit-exact decode determinism,
interop-shaped streams (real markers, stuffed entropy bytes, standard
tables), and clean rejection of unsupported shapes.

Implementation notes: the 2-D DCT/IDCT are the orthonormal matrix
forms (C·B·Cᵀ with the exact cosine basis — float64 throughout, so
decode is deterministic); quantization rounds half-away-from-zero
(sign·floor(|x|+0.5) — numpy's round() is banker's and would desync
nothing here but be nonstandard); the entropy coder implements the
T.81 DC-difference + AC run/size code with 0xFF byte stuffing.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- Annex K quantization tables (luminance / chrominance) ----
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# ---- Annex K Huffman tables: (bits[1..16], values) ----
_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
for _bits, _vals in (_DC_L, _DC_C, _AC_L, _AC_C):
    assert sum(_bits) == len(_vals), "corrupt Annex K Huffman table"


def _zigzag():
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        order.extend(diag[::-1] if s % 2 == 0 else diag)
    return order


_ZZ = _zigzag()  # zigzag index -> (row, col)


def _dct_matrix() -> np.ndarray:
    C = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            C[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return C


_C = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QL, _QC):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) canonical Huffman assignment."""
    codes = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """((length, code) -> symbol) for the decoder."""
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int, restart_interval: int = 0):
        self.data = data
        self.pos = pos
        self.restart_interval = restart_interval
        self.acc = 0
        self.n = 0
        self.marker = None  # set when a non-stuffing marker interrupts

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            elif 0xD0 <= nxt <= 0xD7:  # RSTn — handled by caller
                if not self.restart_interval:
                    raise ValueError(
                        "RST marker in entropy data but DRI=0 (malformed JPEG)"
                    )
                self.marker = nxt
                self.acc = (self.acc << 8) | 0
                self.n += 8
                return
            else:  # EOI or next segment: feed zeros (spec-legal padding)
                self.marker = nxt
                self.acc = (self.acc << 8) | 0
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume a pending RSTn marker and realign to a byte."""
        # drop any partial bits, skip the 2-byte marker
        self.acc, self.n = 0, 0
        while True:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG stream (missing RST marker)")
            if self.data[self.pos] == 0xFF and (
                0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                break
            self.pos += 1
        self.pos += 2
        self.marker = None


def _huff_decode(r: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _encode_block(writer, block, qtab, enc_dc, enc_ac, pred, ci):
    """DCT + quantize + entropy-code one 8x8 block; returns new pred."""
    F = _C @ block @ _C.T
    qz = _round_half_away(F / qtab).astype(np.int64)
    zz = [int(qz[r_, c_]) for r_, c_ in _ZZ]
    # DC difference
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    cat = _category(diff)
    code, ln = enc_dc[ci][cat]
    writer.write(code, ln)
    if cat:
        writer.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    # AC run/size
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[ci][0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = enc_ac[ci][(run << 4) | cat]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        code, ln = enc_ac[ci][0x00]  # EOB
        writer.write(code, ln)


def jpeg_encode(
    raster: bytes,
    w: int,
    h: int,
    ch: int = 3,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Encode a row-major top-down raster (grayscale ch=1 or RGB ch=3)
    as a baseline JFIF JPEG: standard tables, no restart markers,
    ``subsampling`` in {"444", "422", "420"} (chroma block-mean
    downsampled; ignored for grayscale). Deterministic (fixed float64
    DCT + half-away rounding)."""
    if ch not in (1, 3):
        raise ValueError("jpeg_encode takes grayscale (1) or RGB (3) rasters")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hy, vy = _SUBSAMPLING[subsampling] if ch == 3 else (1, 1)
    qy, qc = _quality_tables(quality)
    px = np.frombuffer(raster, dtype=np.uint8, count=h * w * ch).reshape(h, w, ch)
    if ch == 3:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qtabs = [qy, qc, qc]
    else:
        comps = [px[:, :, 0].astype(np.float64)]
        qtabs = [qy]

    # pad every component at FULL resolution to whole MCUs (mcu =
    # 8*hy x 8*vy pixels), then block-mean downsample the chroma
    mcu_h, mcu_w = 8 * vy, 8 * hy
    H = -(-h // mcu_h) * mcu_h
    W = -(-w // mcu_w) * mcu_w
    planes = []
    for ci, c in enumerate(comps):
        p = np.empty((H, W))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]  # edge replicate
        p[:, w:] = p[:, w - 1 : w]
        if ci > 0 and (hy, vy) != (1, 1):
            p = p.reshape(H // vy, vy, W // hy, hy).mean(axis=(1, 3))
        planes.append(p - 128.0)

    # (hi, vi) per component: luma carries the max factors
    samps = [(hy, vy)] + [(1, 1)] * (ch - 1)
    enc_dc = [_canonical_codes(*_DC_L)] + [_canonical_codes(*_DC_C)] * (ch - 1)
    enc_ac = [_canonical_codes(*_AC_L)] + [_canonical_codes(*_AC_C)] * (ch - 1)
    writer = _BitWriter()
    pred = [0] * ch
    for my in range(H // mcu_h):
        for mx in range(W // mcu_w):
            for ci in range(ch):
                hi, vi = samps[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        r0 = (my * vi + byi) * 8
                        c0 = (mx * hi + bxi) * 8
                        _encode_block(
                            writer,
                            planes[ci][r0 : r0 + 8, c0 : c0 + 8],
                            qtabs[ci],
                            enc_dc, enc_ac, pred, ci,
                        )
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = b"\x00" + bytes(int(qy[r_, c_]) for r_, c_ in _ZZ)
    if ch == 3:
        dqt += b"\x01" + bytes(int(qc[r_, c_]) for r_, c_ in _ZZ)
    out += seg(0xFFDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for ci in range(ch):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    dht = b""
    tables = [(0x00, _DC_L), (0x10, _AC_L)]
    if ch == 3:
        tables += [(0x01, _DC_C), (0x11, _AC_C)]
    for tid, (bits, vals) in tables:
        dht += bytes([tid]) + bytes(bits) + bytes(vals)
    out += seg(0xFFC4, dht)
    sos = bytes([ch])
    for ci in range(ch):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    return out + entropy + b"\xff\xd9"


def jpeg_decode(b: bytes):
    """Decode a baseline JPEG → (width, height, channels, raster bytes)
    (grayscale or 4:4:4 color; RGB out via the JFIF YCbCr transform).
    Progressive/subsampled/arithmetic streams raise
    NotImplementedError; malformed streams raise ValueError."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    comps_cfg = None
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers carry no length field
            pos += 2
            continue
        if pos + 4 > len(b):
            raise ValueError("truncated JPEG segment header")
        ln = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        body = b[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros((8, 8), dtype=np.int64)
                for k, (r_, c_) in enumerate(_ZZ):
                    t[r_, c_] = body[i + 1 + k]
                qtabs[tid] = t
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, hh, ww, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("12-bit JPEG")
            comps_cfg = []
            for ci in range(nc):
                cid, samp, qid = body[6 + ci * 3 : 9 + ci * 3]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hi}x{vi} (supported: 1-2)"
                    )
                comps_cfg.append((cid, qid, hi, vi))
            sof = (ww, hh, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker {marker:#x})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None or comps_cfg is None:
                raise ValueError("SOS before SOF0")
            nc_s = body[0]
            scan_tabs = []
            for ci in range(nc_s):
                _cid, tsel = body[1 + ci * 2 : 3 + ci * 2]
                scan_tabs.append((tsel >> 4, tsel & 0x0F))
            pos = pos + 2 + ln
            return _decode_scan(
                b, pos, sof, comps_cfg, scan_tabs, qtabs, htabs, restart_interval
            )
        pos += 2 + ln
    raise ValueError("JPEG stream ended without a scan")


def _decode_one_block(reader, dc_t, ac_t, q, pred, ci):
    """Entropy-decode + dequantize + IDCT one 8x8 block."""
    zz = np.zeros(64, dtype=np.int64)
    cat = _huff_decode(reader, dc_t)
    diff = _extend(reader.bits(cat), cat) if cat else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        sym = _huff_decode(reader, ac_t)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, cat = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(reader.bits(cat), cat)
        k += 1
    block = np.zeros((8, 8), dtype=np.int64)
    for idx, (r_, c_) in enumerate(_ZZ):
        block[r_, c_] = zz[idx]
    return _C.T @ (block * q).astype(np.float64) @ _C


def _decode_scan(b, pos, sof, comps_cfg, scan_tabs, qtabs, htabs, restart_interval):
    w, h, nc = sof
    hmax = max(c[2] for c in comps_cfg)
    vmax = max(c[3] for c in comps_cfg)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    # per-component plane covering whole MCUs at ITS sampling density
    planes = [
        np.zeros((mcus_y * 8 * vi, mcus_x * 8 * hi))
        for (_cid, _qid, hi, vi) in comps_cfg
    ]
    reader = _BitReader(b, pos, restart_interval)
    pred = [0] * nc
    mcus_done = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
            ):
                reader.align_restart()
                pred = [0] * nc
            for ci in range(nc):
                dc_t = htabs[(0, scan_tabs[ci][0])]
                ac_t = htabs[(1, scan_tabs[ci][1])]
                _cid, qid, hi, vi = comps_cfg[ci]
                q = qtabs[qid]
                # T.81 A.2.3: hi x vi blocks per MCU, raster order
                for byi in range(vi):
                    for bxi in range(hi):
                        spatial = _decode_one_block(
                            reader, dc_t, ac_t, q, pred, ci
                        )
                        r0 = (my * vi + byi) * 8
                        c0 = (mx * hi + bxi) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = spatial
            mcus_done += 1
    # upsample subsampled components to the luma grid by replication
    for ci in range(nc):
        _cid, _qid, hi, vi = comps_cfg[ci]
        if (hi, vi) != (hmax, vmax):
            planes[ci] = np.repeat(
                np.repeat(planes[ci], vmax // vi, axis=0), hmax // hi, axis=1
            )
    if nc == 1:
        y = np.clip(_round_half_away(planes[0] + 128.0), 0, 255)
        return w, h, 1, y[:h, :w].astype(np.uint8).tobytes()
    if nc != 3:
        raise NotImplementedError(f"JPEG with {nc} components")
    y = planes[0] + 128.0
    cb = planes[1]
    cr = planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(_round_half_away(x), 0, 255) for x in (r, g, bl)], axis=-1
    )
    return w, h, 3, rgb[:h, :w].astype(np.uint8).tobytes()
