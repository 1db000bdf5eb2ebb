"""Baseline JFIF JPEG codec — pure stdlib + numpy, no PIL/libjpeg.

Un-gates the single most common real-world image format for the
multimodal feature-extraction path (VERDICT r6 "What's missing" #1; the
r6 PNG decoder proved the pure-stdlib kernel pattern). The DECODER is
the product: ITU T.81 baseline sequential (SOF0), 8-bit, grayscale or
YCbCr with sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), multiple
DQT/DHT segments, restart intervals, entropy byte-stuffing — anything
else (progressive SOF2, arithmetic coding, 12-bit) returns ``None``,
the same quarantine contract as ``decode_png``/``decode_ppm``. The
ENCODER exists to make the decoder testable without binary fixtures:
standard Annex K quantization + Huffman tables, libjpeg-convention
quality scaling, optional 4:2:0 and restart markers, the same
deterministic affine test pattern as the PPM/PNG fixture encoders.

Decode math is float64 separable IDCT (numpy matrix product per block)
— a decode kernel already runs per row inside an Arrow-batched
``mapInPandas``, so clarity beats micro-optimization; at 100 TB the
parallelism comes from partitioning media rows, not from the per-block
loop. JPEG is lossy: round-trip tests assert error BOUNDS (and exact
flatness for DC-only images), not pixel equality — the PNG/PPM decoders
keep the pixel-exact roundtrip duty.

Reference behavior (not code): reference repo has no media path at all;
this extends the engine's multimodal tier (SURVEY.md LLM-pipeline
scope).
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU T.81 Annex K.1/K.2: base quantization tables (raster order) ---
QT_LUM = np.array(
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
    dtype=np.int32,
).reshape(8, 8)

QT_CHROM = np.array(
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
    dtype=np.int32,
).reshape(8, 8)

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# --- ITU T.81 Annex K.3: standard Huffman tables as (bits, huffval) ---
# bits[i] = number of codes of length i+1 (16 entries)
HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HT_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: block_dct = A @ B @ A.T."""
    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling, clamped to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decode-side view of _build_codes."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, huffval).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # entropy byte-stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    block: np.ndarray,
    qt: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
    bw: _BitWriter,
) -> int:
    """FDCT + quantize + zigzag + Huffman one 8x8 block; returns new DC
    predictor."""
    coef = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    q = np.round(coef / qt).astype(np.int32)
    zz = [int(q[r, c]) for (r, c) in ZIGZAG]
    diff = zz[0] - pred
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return zz[0]


def _test_pattern(width: int, height: int, seed: int) -> np.ndarray:
    """The shared PPM/PNG affine fixture pattern — (h, w, 3) uint8."""
    y, x, c = np.mgrid[0:height, 0:width, 0:3]
    return ((x * 7 + y * 13 + c * 29 + seed) % 256).astype(np.uint8)


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr, float64 (h, w, 3)."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def encode_jpeg_baseline(
    width: int,
    height: int,
    seed: int = 0,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    img: np.ndarray | None = None,
) -> bytes:
    """Deterministic baseline JFIF JPEG for fixtures/tests: standard
    Annex K tables (quality-scaled), 4:4:4 by default or 4:2:0 with
    ``subsample=True``, optional restart markers. ``img`` overrides the
    affine test pattern with an explicit (h, w, 3) uint8 array."""
    if img is None:
        img = _test_pattern(width, height, seed)
    else:
        img = np.asarray(img, dtype=np.uint8)
        height, width = img.shape[0], img.shape[1]
    ycc = rgb_to_ycbcr(img)
    qt_l = _scaled_qt(QT_LUM, quality)
    qt_c = _scaled_qt(QT_CHROM, quality)
    dc_l, ac_l = _build_codes(*HT_DC_LUM), _build_codes(*HT_AC_LUM)
    dc_c, ac_c = _build_codes(*HT_DC_CHROM), _build_codes(*HT_AC_CHROM)

    mcu = 16 if subsample else 8
    ph = (height + mcu - 1) // mcu * mcu
    pw = (width + mcu - 1) // mcu * mcu
    pad = np.pad(
        ycc, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge"
    )
    yp = pad[..., 0]
    if subsample:
        cbp = pad[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = pad[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cbp, crp = pad[..., 1], pad[..., 2]

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcus_y, mcus_x = ph // mcu, pw // mcu
    restarts = []
    n_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_in_interval == restart_interval:
                bw.flush()
                restarts.append(len(bw.out))
                preds = [0, 0, 0]
                n_in_interval = 0
            if subsample:
                for by in range(2):
                    for bx in range(2):
                        r0, c0 = my * 16 + by * 8, mx * 16 + bx * 8
                        preds[0] = _encode_block(
                            yp[r0 : r0 + 8, c0 : c0 + 8], qt_l, dc_l, ac_l,
                            preds[0], bw,
                        )
                r0, c0 = my * 8, mx * 8
                preds[1] = _encode_block(
                    cbp[r0 : r0 + 8, c0 : c0 + 8], qt_c, dc_c, ac_c, preds[1], bw
                )
                preds[2] = _encode_block(
                    crp[r0 : r0 + 8, c0 : c0 + 8], qt_c, dc_c, ac_c, preds[2], bw
                )
            else:
                r0, c0 = my * 8, mx * 8
                preds[0] = _encode_block(
                    yp[r0 : r0 + 8, c0 : c0 + 8], qt_l, dc_l, ac_l, preds[0], bw
                )
                preds[1] = _encode_block(
                    cbp[r0 : r0 + 8, c0 : c0 + 8], qt_c, dc_c, ac_c, preds[1], bw
                )
                preds[2] = _encode_block(
                    crp[r0 : r0 + 8, c0 : c0 + 8], qt_c, dc_c, ac_c, preds[2], bw
                )
            n_in_interval += 1
    bw.flush()
    entropy = bytes(bw.out)
    # splice restart markers at the recorded byte offsets
    if restarts:
        parts = []
        prev = 0
        for i, off in enumerate(restarts):
            parts.append(entropy[prev:off])
            parts.append(bytes([0xFF, 0xD0 + (i % 8)]))
            prev = off
        parts.append(entropy[prev:])
        entropy = b"".join(parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def zz_bytes(qt: np.ndarray) -> bytes:
        return bytes(int(qt[r, c]) for (r, c) in ZIGZAG)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_bytes(qt_l))
    out += seg(0xDB, b"\x01" + zz_bytes(qt_c))
    hv_y = 0x22 if subsample else 0x11
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, hv_y, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += seg(0xC0, sof)
    for cls_id, (bits, huffval) in (
        (0x00, HT_DC_LUM),
        (0x10, HT_AC_LUM),
        (0x01, HT_DC_CHROM),
        (0x11, HT_AC_CHROM),
    ):
        out += seg(0xC4, bytes([cls_id]) + bytes(bits) + bytes(huffval))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _decode_block(
    br: _BitReader,
    dc_tab: dict,
    ac_tab: dict,
    qt: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    zz = [0] * 64
    s = _decode_huff(br, dc_tab)
    diff = _extend(br.read_bits(s), s) if s else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    for idx, (row, col) in enumerate(ZIGZAG):
        coef[row, col] = zz[idx] * qt[row, col]
    block = _A.T @ coef @ _A + 128.0
    return np.clip(np.round(block), 0, 255).astype(np.uint8), dc


def decode_jpeg(payload: bytes):
    """Parse a baseline JFIF JPEG into an (h, w, 3) uint8 RGB array, or
    ``None`` for anything malformed or beyond the baseline subset (the
    decode_png quarantine contract). Supported: SOF0, 8-bit, 1 or 3
    components, sampling factors 1-2, restart intervals, multi-segment
    DQT/DHT, APPn/COM skipping."""
    try:
        if payload[:2] != b"\xff\xd8":
            return None
        qts: dict[int, np.ndarray] = {}
        dc_tabs: dict[int, dict] = {}
        ac_tabs: dict[int, dict] = {}
        frame = None
        restart_interval = 0
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI
                return None  # reached EOI without SOS
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            body = payload[i + 4 : i + 2 + seg_len]
            if len(body) != seg_len - 2:
                return None
            if marker == 0xDB:  # DQT (possibly several tables per segment)
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    if pq != 0:  # 16-bit tables: beyond baseline-8
                        return None
                    vals = body[j + 1 : j + 65]
                    if len(vals) < 64:
                        return None
                    qt = np.zeros((8, 8), dtype=np.int32)
                    for idx, (r, c) in enumerate(ZIGZAG):
                        qt[r, c] = vals[idx]
                    qts[tq] = qt
                    j += 65
            elif marker == 0xC4:  # DHT (possibly several)
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    bits = list(body[j + 1 : j + 17])
                    n = sum(bits)
                    huffval = list(body[j + 17 : j + 17 + n])
                    if len(huffval) < n:
                        return None
                    tab = _build_decoder(bits, huffval)
                    (ac_tabs if tc else dc_tabs)[th] = tab
                    j += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                depth, h, w, nc = struct.unpack(">BHHB", body[:6])
                if depth != 8 or nc not in (1, 3) or h == 0 or w == 0:
                    return None
                comps = []
                for k in range(nc):
                    cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                    ch, cv = hv >> 4, hv & 0x0F
                    if ch not in (1, 2) or cv not in (1, 2):
                        return None
                    comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
                frame = {"h": h, "w": w, "comps": comps}
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # extended/progressive/arithmetic: not baseline
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    return None
                ns = body[0]
                scan = []
                for k in range(ns):
                    cs, tdta = body[1 + 2 * k], body[2 + 2 * k]
                    comp = next(
                        (c for c in frame["comps"] if c["id"] == cs), None
                    )
                    if comp is None:
                        return None
                    scan.append(
                        {"comp": comp, "dc": tdta >> 4, "ac": tdta & 0x0F}
                    )
                data_start = i + 2 + seg_len
                return _decode_scan(
                    payload, data_start, frame, scan, qts, dc_tabs, ac_tabs,
                    restart_interval,
                )
            # APPn / COM / others: skip
            i += 2 + seg_len
        return None
    except Exception:
        return None


def _decode_scan(
    payload: bytes,
    start: int,
    frame: dict,
    scan: list[dict],
    qts: dict,
    dc_tabs: dict,
    ac_tabs: dict,
    restart_interval: int,
):
    h, w = frame["h"], frame["w"]
    comps = [s["comp"] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # split the entropy stream into restart segments, de-stuffing each
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.uint8)
        for c in comps
    ]
    preds = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segments[0])
    n_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_in_interval == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing restart segment")
                br = _BitReader(segments[seg_idx])
                preds = [0] * len(comps)
                n_in_interval = 0
            for ci, s in enumerate(scan):
                c = s["comp"]
                qt = qts[c["tq"]]
                dct = dc_tabs[s["dc"]]
                act = ac_tabs[s["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block, preds[ci] = _decode_block(
                            br, dct, act, qt, preds[ci]
                        )
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
            n_in_interval += 1

    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w].astype(np.float64))
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return ycbcr_to_rgb(full[0], full[1], full[2])
