"""Baseline JPEG (SOF0) codec in pure numpy — the last common image
format behind the engine's decode operator (VERDICT r04 #6; previously
PIL-gated at multimodal/media.py).

Everything follows the public ITU-T T.81 specification: marker segments
(SOI/APP/DQT/SOF0/DHT/DRI/SOS/EOI), canonical Huffman coding (Annex C
code construction; Annex K.2's frequency-based table builder with the
16-bit BITS adjustment for the encoder), run-length/category entropy
coding (F.1.2), dequantization + 8x8 type-III DCT via the orthonormal
DCT matrix, chroma up/down-sampling for 1x1 and 2x2 factors, and the
JFIF YCbCr <-> RGB transform. Restart markers are honored on decode.

Scope: baseline sequential, 8-bit, 1- or 3-component, huffman (no
progressive / arithmetic / 12-bit). The encoder emits 4:4:4 with
per-image optimized Huffman tables; the decoder accepts any baseline
stream with sampling factors in {1,2} (so Annex-K 4:2:0 files from
other encoders decode too).

Lossy by design: decode(encode(img)) differs from img by quantization +
IDCT rounding — the round-trip test asserts a quality-dependent error
bound, and decode determinism is bit-exact for a fixed byte stream.

Like the other pure-Python codecs this runs inside Arrow-batched
mapInPandas one asset at a time; a production cluster swaps libjpeg-turbo
behind the same sniff+decode interface (multimodal/codecs.decode_any).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag[i] = raster index of the i-th scanned coeff
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (quality 50 base)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → base table, 100 → all-ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


# orthonormal 8-point DCT-II matrix: A @ x = DCT(x); A.T @ X = IDCT(X)
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def idct2(coeffs: np.ndarray) -> np.ndarray:
    return _A.T @ coeffs @ _A


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------


class HuffDecoder:
    """Canonical Huffman decode table from DHT (bits, values) — Annex C:
    codes of each length are consecutive, lengths ascending."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "BitReader") -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in entropy stream")


def huff_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical (same construction as decode)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def build_huffman(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """(BITS[1..16], HUFFVAL) from symbol frequencies — T.81 Annex K.2:
    pairwise-merge code sizes with the reserved all-ones sentinel (symbol
    256), fold lengths > 16 (adjust_bits), order symbols by (size, value)."""
    freq = {s: f for s, f in freq.items() if f > 0}
    freq[256] = 1  # sentinel reserves the all-ones code
    codesize: dict[int, int] = dict.fromkeys(freq, 0)
    others: dict[int, int] = dict.fromkeys(freq, -1)
    while True:
        nz = sorted((s for s in freq if freq[s] > 0), key=lambda s: (freq[s], -s))
        if len(nz) <= 1:
            break
        v1, v2 = nz[0], nz[1]
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for s, cs in codesize.items():
        if cs:
            bits[cs] += 1
    i = 32
    while i > 16:  # adjust_bits: fold overlong codes pairwise downward
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the sentinel's (longest) code
    huffval = [
        s
        for s in sorted(codesize, key=lambda s: (codesize[s], s))
        if s != 256 and codesize[s]
    ]
    return bits[1:17], huffval


# --------------------------------------------------------------------------
# bit I/O over the entropy-coded segment
# --------------------------------------------------------------------------


class BitReader:
    """MSB-first bit reader with 0xFF00 un-stuffing; stops at markers
    (restart intervals are handled by the caller via sync())."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_to_restart(self) -> None:
        """Skip to just past the next RSTn marker, reset bit state."""
        self.bitbuf = 0
        self.nbits = 0
        while True:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """F.2.2.1 sign extension: category-t magnitude bits → signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bitbuf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    """Encoder inverse of _extend."""
    return v if v >= 0 else v + (1 << t) - 1


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, channels) uint8 (channels 1 or 3, RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, HuffDecoder] = {}
    huff_ac: dict[int, HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tbl  # DQT stores zigzag order
                qt[tq] = raster
        elif marker == 0xC0:  # SOF0 (baseline)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF type 0xFF{marker:02X} (baseline only)")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nval = sum(bits)
                values = list(seg[p + 17 : p + 17 + nval])
                (huff_ac if tc else huff_dc)[th] = HuffDecoder(bits, values)
                p += 17 + nval
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0xF})
            ecs_start = pos + seglen
            return _decode_scan(
                data, ecs_start, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in scan:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)
    br = BitReader(data, pos)
    pred = {c["id"]: 0 for c in scan}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.sync_to_restart()
            pred = {c["id"]: 0 for c in scan}
        my, mx = divmod(m, mcux)
        try:
            for c in scan:
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = _decode_block(
                            br, huff_dc[c["dc"]], huff_ac[c["ac"]], pred, c["id"]
                        )
                        block = idct2((coeffs * q).reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
        except _RestartMarker:
            raise ValueError("restart marker misaligned with DRI interval")
    out_planes = []
    for c in scan:
        p = planes[c["id"]]
        # upsample to full MCU-grid resolution, then crop to (h, w)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    img = np.stack(out_planes, axis=2)
    if img.shape[2] == 3:
        img = _ycbcr_to_rgb(img)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def _decode_block(br, dc_tab, ac_tab, pred, cid) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    t = dc_tab.decode(br)
    diff = _extend(br.receive(t), t) if t else 0
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.receive(s), s)
        k += 1
    out = np.zeros(64, dtype=np.int64)
    out[ZIGZAG] = zz
    return out


_YCBCR = np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]]
)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    out = img.astype(np.float64) @ _YCBCR.T
    out[:, :, 1:] += 128.0
    return out


def _ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y = img[:, :, 0]
    cb = img[:, :, 1] - 128.0
    cr = img[:, :, 2] - 128.0
    return np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )


# --------------------------------------------------------------------------
# encoder (baseline, 4:4:4, per-image optimized Huffman tables)
# --------------------------------------------------------------------------


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w[, c]) uint8 → baseline JFIF bytes. Grayscale (c=1 or 2-D) or
    RGB (c=3; 4:4:4 by default, 4:2:0 box-downsampled chroma with
    ``subsample=True``). ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (and resets DC prediction), exercising
    the decoder's restart path."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    ycc = _rgb_to_ycbcr(img) if nc == 3 else img.astype(np.float64)
    q_luma = _scaled_quant(QUANT_LUMA, quality)
    q_chroma = _scaled_quant(QUANT_CHROMA, quality)

    samp = [(2, 2), (1, 1), (1, 1)] if (nc == 3 and subsample) else [(1, 1)] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # per-component planes at their sampling resolution, padded to the MCU
    # grid by edge replication; chroma downsampling is a 2x2 box mean
    comp_zz: list[list[np.ndarray]] = []  # blocks in MCU walk order
    for ci in range(nc):
        hs, vs = samp[ci]
        plane = ycc[:, :, ci]
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            eh, ew = -(-h // ry) * ry, -(-w // rx) * rx
            p = np.pad(plane, ((0, eh - h), (0, ew - w)), mode="edge")
            plane = p.reshape(eh // ry, ry, ew // rx, rx).mean(axis=(1, 3))
        ph, pw = mcuy * 8 * vs, mcux * 8 * hs
        plane = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        q = (q_luma if ci == 0 else q_chroma)
        blocks = []
        for m in range(n_mcu):
            my, mx = divmod(m, mcux)
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    coeffs = fdct2(plane[y0 : y0 + 8, x0 : x0 + 8])
                    blocks.append(
                        np.round(coeffs.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
                    )
        comp_zz.append(blocks)

    n_tabs = 1 if nc == 1 else 2

    def walk(on_dc, on_ac, on_rst=None):
        """The ONE MCU walk both passes share: identical symbol + DC-pred
        (+ restart reset) sequence, so the optimized tables from pass 1
        cover exactly the symbols pass 2 emits."""
        preds = [0] * nc
        idx = [0] * nc
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                if on_rst is not None:
                    on_rst((m // restart_interval - 1) % 8)
                preds = [0] * nc
            for ci in range(nc):
                ti = min(ci, 1)
                hs, vs = samp[ci]
                for _ in range(hs * vs):
                    zz = comp_zz[ci][idx[ci]]
                    idx[ci] += 1
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    t = _category(diff)
                    on_dc(ti, t, diff)
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            on_ac(ti, 0xF0, 0, 0)  # ZRL
                            run -= 16
                        s = _category(v)
                        on_ac(ti, (run << 4) | s, v, s)
                        run = 0
                    if run:
                        on_ac(ti, 0x00, 0, 0)  # EOB

    # pass 1: symbol frequencies (luma tables for comp 0, chroma for 1-2)
    freq_dc: list[dict] = [{} for _ in range(n_tabs)]
    freq_ac: list[dict] = [{} for _ in range(n_tabs)]
    walk(
        lambda ti, t, _d: freq_dc[ti].__setitem__(t, freq_dc[ti].get(t, 0) + 1),
        lambda ti, sym, _v, _s: freq_ac[ti].__setitem__(sym, freq_ac[ti].get(sym, 0) + 1),
    )
    dc_tabs = [build_huffman(f) for f in freq_dc]
    ac_tabs = [build_huffman(f) for f in freq_ac]
    dc_enc = [huff_encode_table(*t) for t in dc_tabs]
    ac_enc = [huff_encode_table(*t) for t in ac_tabs]

    # pass 2: entropy-coded segment
    bw = BitWriter()

    def emit_dc(ti, t, diff):
        code, ln = dc_enc[ti][t]
        bw.write(code, ln)
        if t:
            bw.write(_mag_bits(diff, t), t)

    def emit_ac(ti, sym, v, s):
        code, ln = ac_enc[ti][sym]
        bw.write(code, ln)
        if s:
            bw.write(_mag_bits(v, s), s)

    def emit_rst(m8):
        bw.flush()  # pad to byte boundary with 1s, then the marker
        bw.out += bytes([0xFF, 0xD0 + m8])

    walk(emit_dc, emit_ac, emit_rst)
    bw.flush()

    # assemble the stream
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(tbl[z]) for z in ZIGZAG)
        )

    out += dqt(0, q_luma)
    if nc == 3:
        out += dqt(1, q_chroma)
    # SOF0
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, 1)])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th: int, bits: list[int], values: list[int]) -> bytes:
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    for i in range(n_tabs):
        out += dht(0, i, *dc_tabs[i])
        out += dht(1, i, *ac_tabs[i])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytearray([nc])
    for ci in range(nc):
        ti = min(ci, 1)
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += b"\x00\x3f\x00"  # spectral selection 0..63, Ah/Al 0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
