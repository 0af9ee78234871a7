"""Pure-python baseline JPEG codec (numpy DCT, stdlib only).

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr,
arbitrary sampling factors (4:4:4 / 4:2:0 / 4:2:2), restart markers,
Huffman and quantization tables read from the stream. Encoder:
4:4:4 baseline with the standard Annex-K tables, used to produce
real compressed fixtures in an environment with no image libraries.

Entropy decode is per-block Python (JPEG's Huffman stream is
inherently sequential), while dequant + IDCT + upsample + color
convert are whole-image numpy. That cost profile is fine for the
multimodal operators: each mapInPandas task decodes its own rows
independently, so throughput scales with partitions, and the codec
seam is exactly where a native library slots in when present.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# Annex K quantization tables (luminance, chrominance)
QT_LUMA = np.array(
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
)
QT_CHROMA = np.array(
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
)

# Annex K Huffman tables: (bits[1..16], huffval)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
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
AC_CHROMA = (
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


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: F = M @ f @ M.T is exactly the
    JPEG forward DCT, f = M.T @ F @ M the inverse."""
    x = np.arange(8)
    M = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    M[0] *= np.sqrt(1 / 2)
    return M * 0.5


_DCT_M = _dct_matrix()


# ---------------------------------------------------------------- decode


class _HuffTable:
    """Canonical JPEG Huffman table with a (code_length, code) lookup."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00
    destuffing; restart markers are consumed by reset()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy data")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                # ran into a real marker (EOI): pad with 1-bits per spec
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        length, code = 0, 0
        lookup = table.lookup
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            length += 1
            sym = lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def reset_at_restart(self) -> None:
        """Consume the RSTn marker and realign to a byte boundary."""
        self.acc = 0
        self.nbits = 0
        # skip to the marker (pos may sit on the FF already)
        while True:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: expected RSTn marker")
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                break
            self.pos += 1
        self.pos += 2


class _RestartPending(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t-bit magnitude v to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG -> (h, w, c) uint8, c = 1 or 3
    (RGB). Progressive (SOF2) and arithmetic coding raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    comps: list[dict] = []

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = (h, w, nc)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker & 0xF}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG missing SOF before SOS")
            ns = seg[0]
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                for c in comps:
                    if c["id"] == cs:
                        c["dc"], c["ac"] = tables >> 4, tables & 0xF
            pos += seglen
            return _decode_scan(
                data, pos, frame, comps, qt, huff, restart_interval
            )
        pos += seglen
    raise ValueError("JPEG had no SOS scan")


def _decode_scan(data, pos, frame, comps, qt, huff, restart_interval):
    h, w, nc = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component coefficient planes (in units of 8x8 blocks)
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * nc
    reader = _BitReader(data, pos)
    mcu_count = 0
    just_reset = False  # the except-branch already consumed the RSTn
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
                and not just_reset
            ):
                reader.reset_at_restart()
                pred = [0] * nc
            just_reset = False
            try:
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block = _decode_block(
                                reader,
                                huff[(0, c["dc"])],
                                huff[(1, c["ac"])],
                                qt[c["tq"]],
                                pred,
                                ci,
                            )
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartPending:
                # stream hit RSTn early (encoder flushed); realign
                reader.reset_at_restart()
                pred = [0] * nc
                if restart_interval:
                    mcu_count = (
                        mcu_count // restart_interval + 1
                    ) * restart_interval
                # the RSTn is consumed — the next MCU's scheduled
                # modulo check must not resync again (it would scan
                # to and swallow the FOLLOWING interval's marker)
                just_reset = True
                continue
            mcu_count += 1

    # IDCT whole-plane: reshape to (n_blocks, 8, 8) and one matmul
    out_planes = []
    for ci, c in enumerate(comps):
        P = planes[ci]
        bh, bw = P.shape[0] // 8, P.shape[1] // 8
        blocks = P.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        spatial = np.einsum("xu,nmuv,vy->nmxy", _DCT_M.T, blocks, _DCT_M)
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        # upsample to full resolution (nearest/pixel replication)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])

    if nc == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tbl, ac_tbl, qtbl, pred, ci):
    zz = np.zeros(64, dtype=np.int32)
    t = reader.decode(dc_tbl)
    diff = _extend(reader.receive(t), t)
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _extend(reader.receive(s), s)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = zz * qtbl
    return block.reshape(8, 8)


# ---------------------------------------------------------------- encode


def _scale_qt(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) per JPEG magnitude coding."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """Encode (h, w, 1|3) uint8 (or 2-D gray) to a baseline 4:4:4
    JPEG with standard Annex-K tables quality-scaled libjpeg-style."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg wants 1 or 3 channels")
    px = arr.astype(np.float64)
    if nc == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [px[:, :, 0]]

    # quant tables in ZIGZAG order — the order DQT stores them and the
    # order the zigzag-scanned coefficients divide by
    qts = [_scale_qt(QT_LUMA, quality)[ZIGZAG], _scale_qt(QT_CHROMA, quality)[ZIGZAG]]
    dc_codes = [_huff_codes(*DC_LUMA), _huff_codes(*DC_CHROMA)]
    ac_codes = [_huff_codes(*AC_LUMA), _huff_codes(*AC_CHROMA)]

    bw8 = -(-w // 8) * 8
    bh8 = -(-h // 8) * 8
    writer = _BitWriter()
    pred = [0] * nc
    # quantized coefficients per plane, computed vectorized up front
    qcoefs = []
    for ci, plane in enumerate(planes):
        padded = np.empty((bh8, bw8), dtype=np.float64)
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]  # edge-replicate pad
        padded[:, w:] = padded[:, w - 1 : w]
        shifted = padded - 128.0
        blocks = shifted.reshape(bh8 // 8, 8, bw8 // 8, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ux,nmxy,yv->nmuv", _DCT_M, blocks, _DCT_M.T)
        q = qts[0 if ci == 0 else 1]
        # [:, ZIGZAG] reorders natural-index coefficients into zigzag
        # scan order, matching the zigzag-ordered quant divisor
        qc = np.round(coefs.reshape(-1, 64)[:, ZIGZAG] / q).astype(np.int32)
        qcoefs.append(qc.reshape(bh8 // 8, bw8 // 8, 64))

    for by in range(bh8 // 8):
        for bx in range(bw8 // 8):
            for ci in range(nc):
                ti = 0 if ci == 0 else 1
                zz = qcoefs[ci][by, bx]
                dc = int(zz[0])
                diff = dc - pred[ci]
                pred[ci] = dc
                t, bitsv = _magnitude(diff) if diff else (0, 0)
                code, ln = dc_codes[ti][t]
                writer.write(code, ln)
                if t:
                    writer.write(bitsv, t)
                # AC run-length
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last_nz = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[ti][0xF0]
                        writer.write(code, ln)
                        run -= 16
                    t, bitsv = _magnitude(v)
                    code, ln = ac_codes[ti][(run << 4) | t]
                    writer.write(code, ln)
                    writer.write(bitsv, t)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[ti][0x00]  # EOB
                    writer.write(code, ln)
    writer.flush()

    # ---- container
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qts[0].tolist()))
    if nc == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qts[1].tolist()))
    comps = b""
    for ci in range(nc):
        comps += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, nc) + comps)
    for tc, th, (bits, values) in (
        (0, 0, DC_LUMA),
        (1, 0, AC_LUMA),
        (0, 1, DC_CHROMA),
        (1, 1, AC_CHROMA),
    )[: 2 if nc == 1 else 4]:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


