"""Baseline (SOF0/SOF1) and progressive (SOF2) JPEG codec in pure numpy
— the last common image format behind the engine's decode operator
(VERDICT r04 #6 baseline, r05 #6 progressive; previously PIL-gated at
multimodal/media.py).

Everything follows the public ITU-T T.81 specification: marker segments
(SOI/APP/DQT/SOF/DHT/DRI/SOS/EOI), canonical Huffman coding (Annex C
code construction; Annex K.2's frequency-based table builder with the
16-bit BITS adjustment for the encoder), run-length/category entropy
coding (F.1.2), progressive spectral selection + successive
approximation (Annex G: DC-first/-refine, AC-first with EOB runs,
AC-refine with correction bits), dequantization + 8x8 type-III DCT via
the orthonormal DCT matrix, chroma up/down-sampling for 1x1 and 2x2
factors, and the JFIF YCbCr <-> RGB transform. Restart markers are
honored on decode in every scan kind (and reset both DC prediction and
the EOB run).

The decoder is multi-scan by architecture (round 6): every SOS
accumulates quantized coefficients into per-component block arrays and
the IDCT/upsample/color pipeline runs once at end-of-image. That is the
substrate progressive needs, and it also gives baseline NON-interleaved
scans (one component per SOS, ns < nc) the correct per-T.81 MCU
geometry — a non-interleaved MCU is one data unit over the component's
own block grid, not an hmax x vmax clump (ADVICE r05: such files
previously decoded with interleaved geometry).

Scope: 8-bit, 1- or 3-component, huffman (no arithmetic / 12-bit /
hierarchical / lossless). The encoder emits baseline (4:4:4 or 4:2:0)
and progressive (a libjpeg-style scan script exercising every decoder
scan kind) with per-image optimized Huffman tables; the decoder accepts
any baseline or progressive stream with sampling factors in {1,2} (so
Annex-K 4:2:0 files from other encoders decode too).

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
    """Baseline or progressive JPEG → (h, w, channels) uint8 (channels 1
    or 3, RGB).

    Multi-scan: the marker loop keeps parsing after each SOS — every scan
    (baseline full-block, progressive DC/AC first/refine) accumulates
    into per-component coefficient arrays, and reconstruction runs once
    at EOI (or end of data). Quant tables are snapshotted per component
    at its first scan, per T.81's tables-in-effect rule."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, HuffDecoder] = {}
    huff_ac: dict[int, HuffDecoder] = {}
    frame = None
    restart_interval = 0
    coeff: dict[int, np.ndarray] | None = None  # cid -> (bh, bw, 64) zigzag
    comp_q: dict[int, np.ndarray] = {}
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any marker may be preceded by fill bytes (runs of
        # 0xFF) — skip them so 0xFF is never misread as a marker code
        while pos < len(data) - 1 and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            # a trailing 0xFF run would read past the buffer below —
            # keep the parser's ValueError convention (ADVICE r07)
            raise ValueError("truncated marker segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            # SOF1 (extended sequential huffman) decodes exactly like
            # baseline at 8-bit precision; SOF2 flips the scan semantics
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF type 0xFF{marker:02X} "
                "(baseline/extended/progressive huffman only)"
            )
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
                raise ValueError("SOS before SOF")
            if coeff is None:
                coeff = _init_geometry(frame)
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0xF})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            if frame["progressive"]:
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise ValueError("progressive AC scan must be single-component")
                if not (ss <= se <= 63):
                    raise ValueError("bad spectral selection range")
            elif (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("sequential scan with progressive parameters")
            for c in scan:
                if c["id"] not in comp_q:
                    if c["tq"] not in qt:
                        raise ValueError("scan references undefined quant table")
                    comp_q[c["id"]] = qt[c["tq"]]
            pos = _decode_scan(
                data, pos + seglen, frame, scan, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval, coeff,
            )
            continue  # pos already points at the next marker
        pos += seglen
    if coeff is None:
        raise ValueError("no SOS segment found")
    return _reconstruct(frame, coeff, comp_q)


def _init_geometry(frame: dict) -> dict[int, np.ndarray]:
    """Per-T.81 A.1.1/A.2 geometry: hmax/vmax over the FRAME's components
    (not the scan's — a single-component scan of a subsampled component
    still sizes against the frame grid), MCU-padded block grids for
    interleaved scans, and the true ceil(comp/8) grids that bound
    non-interleaved ones. Coefficients live zigzag-ordered per block."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = -(-frame["w"] // (8 * hmax))
    frame["mcuy"] = -(-frame["h"] // (8 * vmax))
    coeff = {}
    for c in comps:
        cw = -(-frame["w"] * c["h"] // hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
        coeff[c["id"]] = np.zeros(
            (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64), dtype=np.int32
        )
    return coeff


def _decode_scan(
    data, pos, frame, scan, ss, se, ah, al, huff_dc, huff_ac,
    restart_interval, coeff,
) -> int:
    """Decode one scan's entropy-coded segment into ``coeff``; returns
    the byte offset of the next marker. Interleaved scans (ns > 1) walk
    hmax x vmax MCUs; non-interleaved scans walk the single component's
    own block grid one data unit per MCU (T.81 A.2.2/A.2.3)."""
    interleaved = len(scan) > 1
    if interleaved:
        n_units = frame["mcux"] * frame["mcuy"]
    else:
        c0 = scan[0]
        n_units = c0["bw"] * c0["bh"]
    br = BitReader(data, pos)
    pred = {c["id"]: 0 for c in scan}
    state = {"eobrun": 0}
    for m in range(n_units):
        if restart_interval and m and m % restart_interval == 0:
            br.sync_to_restart()
            pred = {c["id"]: 0 for c in scan}
            state["eobrun"] = 0
        try:
            if interleaved:
                my, mx = divmod(m, frame["mcux"])
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _decode_unit(
                                br, c,
                                coeff[c["id"]][my * c["v"] + by, mx * c["h"] + bx],
                                ss, se, ah, al, huff_dc, huff_ac, pred, state,
                                frame["progressive"],
                            )
            else:
                by, bx = divmod(m, c0["bw"])
                _decode_unit(
                    br, c0, coeff[c0["id"]][by, bx], ss, se, ah, al,
                    huff_dc, huff_ac, pred, state, frame["progressive"],
                )
        except _RestartMarker:
            raise ValueError("restart marker misaligned with DRI interval")
    # skip pad bits / the final interval's RST to the next real marker
    p = br.pos
    while p < len(data) - 1:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(data)


def _decode_unit(br, c, zz, ss, se, ah, al, huff_dc, huff_ac, pred, state,
                 progressive) -> None:
    """One data unit under the scan's (Ss, Se, Ah, Al) mode."""
    if not progressive:
        _decode_block_full(br, huff_dc[c["dc"]], huff_ac[c["ac"]], pred, c["id"], zz)
    elif ss == 0:
        if ah == 0:  # DC first (G.1.2.1): baseline DC diff, shifted by Al
            t = huff_dc[c["dc"]].decode(br)
            diff = _extend(br.receive(t), t) if t else 0
            pred[c["id"]] += diff
            zz[0] = pred[c["id"]] << al
        else:  # DC refinement: one raw correction bit per unit
            if br.read_bit():
                zz[0] |= 1 << al
    elif ah == 0:
        _ac_first(br, huff_ac[c["ac"]], zz, ss, se, al, state)
    else:
        _ac_refine(br, huff_ac[c["ac"]], zz, ss, se, al, state)


def _decode_block_full(br, dc_tab, ac_tab, pred, cid, zz) -> None:
    """Sequential full-precision data unit (F.2.2) into zigzag ``zz``."""
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


def _ac_first(br, ac_tab, zz, ss, se, al, state) -> None:
    """Progressive AC first scan (G.1.2.2): run/size pairs inside the
    spectral band, values shifted by Al; EOBn symbols (s=0, r<15) start a
    run of 2^r + ext end-of-band blocks shared across data units."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1  # this block ends the band
                if r:
                    state["eobrun"] += br.receive(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past spectral band end")
            zz[k] = _extend(br.receive(s), s) << al
            k += 1


def _ac_refine(br, ac_tab, zz, ss, se, al, state) -> None:
    """Progressive AC refinement scan (G.1.2.3): newly-significant
    coefficients arrive as (run-of-zero-history, ±1<<Al); every nonzero
    history coefficient traversed — including during EOB runs — carries
    one correction bit that may add 1<<Al toward larger magnitude."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.receive(r)
                    break  # fall through to the EOB correction sweep
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement scan with magnitude > 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    # correction bit for an already-significant coeff;
                    # two's-complement & p1 tests the magnitude bit for
                    # either sign because history values are multiples
                    # of 2^(Al+1) until corrected this scan
                    if br.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:  # end-of-band: corrections only
            if zz[k] != 0:
                if br.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, coeff, comp_q) -> np.ndarray:
    """Dequantize + IDCT every block, upsample subsampled planes to the
    frame grid, crop to (h, w), color-transform. Per-block idct2 keeps
    the float op order identical to the r05 single-scan path."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    out_planes = []
    for c in frame["comps"]:
        zz = coeff[c["id"]]
        q = comp_q[c["id"]]
        bh, bw = zz.shape[:2]
        plane = np.empty((bh * 8, bw * 8), dtype=np.float64)
        nat = np.zeros(64, dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                nat[ZIGZAG] = zz[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct2((nat * q).reshape(8, 8)) + 128.0
                )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    img = np.stack(out_planes, axis=2)
    if img.shape[2] == 3:
        img = _ycbcr_to_rgb(img)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


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
    interleave: bool = True,
) -> bytes:
    """(h, w[, c]) uint8 → baseline JFIF bytes. Grayscale (c=1 or 2-D) or
    RGB (c=3; 4:4:4 by default, 4:2:0 box-downsampled chroma with
    ``subsample=True``). ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (and resets DC prediction), exercising
    the decoder's restart path. ``interleave=False`` emits one SOS per
    component (T.81 non-interleaved scans: each MCU is one data unit over
    the component's own ceil(comp/8) block grid — exercising the
    decoder's ns < nc geometry, ADVICE r05)."""
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
    comp_zz: list[np.ndarray] = []  # (bh_pad, bw_pad, 64) zigzag coeffs
    comp_bwbh: list[tuple[int, int]] = []  # true (non-padded) block grids
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
        arr = np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
        for by in range(mcuy * vs):
            for bx in range(mcux * hs):
                coeffs = fdct2(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
                arr[by, bx] = np.round(coeffs.reshape(64)[ZIGZAG] / q[ZIGZAG])
        comp_zz.append(arr)
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        comp_bwbh.append((-(-cw // 8), -(-ch // 8)))

    n_tabs = 1 if nc == 1 else 2

    def code_block(ti: int, zz: np.ndarray, pred: int, on_dc, on_ac) -> int:
        """Symbol sequence for one full-precision data unit (F.1.2)."""
        diff = int(zz[0]) - pred
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
        return int(zz[0])

    def walk(on_dc, on_ac, on_rst=None, on_scan=None):
        """The ONE walk both passes share: identical symbol + DC-pred
        (+ restart reset) sequence, so the optimized tables from pass 1
        cover exactly the symbols pass 2 emits. Interleaved: MCU order
        over all components. Non-interleaved: one scan per component,
        data units in raster order over its true block grid (restart
        intervals count data units, DC prediction resets per scan)."""
        if interleave:
            preds = [0] * nc
            for m in range(n_mcu):
                if restart_interval and m and m % restart_interval == 0:
                    if on_rst is not None:
                        on_rst((m // restart_interval - 1) % 8)
                    preds = [0] * nc
                my, mx = divmod(m, mcux)
                for ci in range(nc):
                    ti = min(ci, 1)
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            preds[ci] = code_block(
                                ti, comp_zz[ci][my * vs + by, mx * hs + bx],
                                preds[ci], on_dc, on_ac,
                            )
        else:
            for ci in range(nc):
                if on_scan is not None:
                    on_scan(ci)
                ti = min(ci, 1)
                bw_, bh_ = comp_bwbh[ci]
                pred = 0
                for m in range(bw_ * bh_):
                    if restart_interval and m and m % restart_interval == 0:
                        if on_rst is not None:
                            on_rst((m // restart_interval - 1) % 8)
                        pred = 0
                    by, bx = divmod(m, bw_)
                    pred = code_block(ti, comp_zz[ci][by, bx], pred, on_dc, on_ac)

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

    # pass 2: entropy-coded segment(s) — one per scan
    segments: list[bytearray] = []
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

    def emit_scan(_ci):
        nonlocal bw
        bw.flush()
        segments.append(bw.out)
        bw = BitWriter()

    walk(emit_dc, emit_ac, emit_rst, emit_scan)
    bw.flush()
    # interleaved: the single segment is the final writer; non-interleaved:
    # emit_scan pushed an empty writer before scan 0, so drop it and append
    # the last component's tail
    segments = [bw.out] if interleave else segments[1:] + [bw.out]

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
    if interleave:
        sos = bytearray([nc])
        for ci in range(nc):
            ti = min(ci, 1)
            sos += bytes([ci + 1, (ti << 4) | ti])
        sos += b"\x00\x3f\x00"  # spectral selection 0..63, Ah/Al 0
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += segments[0]
    else:
        for ci in range(nc):
            ti = min(ci, 1)
            sos = bytes([1, ci + 1, (ti << 4) | ti]) + b"\x00\x3f\x00"
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            out += segments[ci]
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder (SOF2)
# --------------------------------------------------------------------------


def _prog_script(nc: int) -> list[tuple[list[int], int, int, int, int]]:
    """libjpeg-simple-progression-style scan script: interleaved DC at
    Al=1 + DC refine, per-component AC spectral bands 1-5 / 6-63 at Al=2,
    then two full-band refinement sweeps (Ah=2→1, 1→0). Together the
    scans exercise every decoder mode: interleaved + non-interleaved
    geometry, EOB runs, ZRL, and correction bits."""
    comps = list(range(nc))
    script: list[tuple[list[int], int, int, int, int]] = [
        (comps, 0, 0, 0, 1),
        (comps, 0, 0, 1, 0),
    ]
    for ci in comps:
        script += [([ci], 1, 5, 0, 2), ([ci], 6, 63, 0, 2)]
    for ci in comps:
        script += [([ci], 1, 63, 2, 1), ([ci], 1, 63, 1, 0)]
    return script


def _encode_prog_scan(
    scan_comps, ss, se, ah, al, samp, comp_zz, comp_bwbh, mcux, mcuy,
    restart_interval, on_sym, on_bits, on_rst,
) -> None:
    """One progressive scan, emitted through callbacks so the frequency
    pass and the write pass share the exact symbol sequence (same policy
    as the baseline encoder's walk()). Encoder-side Annex G: DC point
    transform is an arithmetic shift, AC is magnitude-truncation;
    refinement buffers correction bits until the symbol they ride on
    (newly-significant coeff, ZRL, or the EOBn that closes a run)."""
    interleaved = len(scan_comps) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        bw_, bh_ = comp_bwbh[scan_comps[0]]
        n_units = bw_ * bh_
    preds = {ci: 0 for ci in scan_comps}
    eobrun = 0
    run_bits: list[int] = []  # correction bits owned by the pending EOB run

    def flush_eob(ti: int) -> None:
        nonlocal eobrun, run_bits
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            on_sym(ti, r << 4)
            if r:
                on_bits(eobrun & ((1 << r) - 1), r)
            eobrun = 0
        for b in run_bits:
            on_bits(b, 1)
        run_bits = []

    def unit_blocks(m: int):
        if interleaved:
            my, mx = divmod(m, mcux)
            for ci in scan_comps:
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        yield ci, comp_zz[ci][my * vs + by, mx * hs + bx]
        else:
            ci = scan_comps[0]
            bw_, _ = comp_bwbh[ci]
            by, bx = divmod(m, bw_)
            yield ci, comp_zz[ci][by, bx]

    for m in range(n_units):
        if restart_interval and m and m % restart_interval == 0:
            flush_eob(0 if ss else min(scan_comps[-1], 1))
            preds = {ci: 0 for ci in scan_comps}
            on_rst((m // restart_interval - 1) % 8)
        for ci, zz in unit_blocks(m):
            ti = min(ci, 1) if ss == 0 else 0
            if ss == 0 and ah == 0:  # DC first
                v = int(zz[0]) >> al
                diff = v - preds[ci]
                preds[ci] = v
                t = _category(diff)
                on_sym(ti, t)
                if t:
                    on_bits(_mag_bits(diff, t), t)
            elif ss == 0:  # DC refine: one raw bit
                on_bits((int(zz[0]) >> al) & 1, 1)
            elif ah == 0:  # AC first
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    vt = -((-v) >> al) if v < 0 else v >> al
                    if vt == 0:
                        r += 1
                        continue
                    flush_eob(ti)
                    while r > 15:
                        on_sym(ti, 0xF0)
                        r -= 16
                    s = _category(vt)
                    on_sym(ti, (r << 4) | s)
                    on_bits(_mag_bits(vt, s), s)
                    r = 0
                if r:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob(ti)
            else:  # AC refine
                absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                eob_k = -1  # band index of the last NEWLY-significant coeff
                for i, t in enumerate(absv):
                    if t == 1:
                        eob_k = i
                r = 0
                blk_bits: list[int] = []  # this block's pending corrections
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob_k:  # ZRL not foldable into EOB
                        flush_eob(ti)
                        on_sym(ti, 0xF0)
                        r -= 16
                        for b in blk_bits:
                            on_bits(b, 1)
                        blk_bits = []
                    if t > 1:  # already significant: correction bit only
                        blk_bits.append(t & 1)
                        continue
                    flush_eob(ti)
                    on_sym(ti, (r << 4) | 1)
                    on_bits(0 if int(zz[ss + i]) < 0 else 1, 1)
                    for b in blk_bits:
                        on_bits(b, 1)
                    blk_bits = []
                    r = 0
                if r > 0 or blk_bits:
                    eobrun += 1
                    run_bits.extend(blk_bits)
                    if eobrun == 0x7FFF:
                        flush_eob(ti)
    flush_eob(0 if ss else min(scan_comps[-1], 1))


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w[, c]) uint8 → progressive (SOF2) JFIF bytes. Same coefficient
    pipeline as encode_jpeg (so decoding a progressive stream reconstructs
    the exact coefficient arrays of the equivalent baseline stream — the
    round-trip test asserts bit-identical pixels), split across the
    _prog_script scan sequence with per-scan optimized Huffman tables."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_progressive supports 1 or 3 channels")
    ycc = _rgb_to_ycbcr(img) if nc == 3 else img.astype(np.float64)
    q_luma = _scaled_quant(QUANT_LUMA, quality)
    q_chroma = _scaled_quant(QUANT_CHROMA, quality)
    samp = [(2, 2), (1, 1), (1, 1)] if (nc == 3 and subsample) else [(1, 1)] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    comp_zz: list[np.ndarray] = []  # (bh_pad, bw_pad, 64) zigzag coeffs
    comp_bwbh: list[tuple[int, int]] = []  # true (non-padded) block grids
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
        q = q_luma if ci == 0 else q_chroma
        arr = np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
        for by in range(mcuy * vs):
            for bx in range(mcux * hs):
                coeffs = fdct2(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
                arr[by, bx] = np.round(coeffs.reshape(64)[ZIGZAG] / q[ZIGZAG])
        comp_zz.append(arr)
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        comp_bwbh.append((-(-cw // 8), -(-ch // 8)))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(tbl[z]) for z in ZIGZAG)
        )

    out += dqt(0, q_luma)
    if nc == 3:
        out += dqt(1, q_chroma)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, 1)])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th: int, bits: list[int], values: list[int]) -> bytes:
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for scan_comps, ss, se, ah, al in _prog_script(nc):
        n_tabs = (1 if nc == 1 else 2) if ss == 0 and ah == 0 else 1
        freq: list[dict] = [{} for _ in range(n_tabs)]
        needs_table = not (ss == 0 and ah > 0)  # DC refine is raw bits
        if needs_table:
            _encode_prog_scan(
                scan_comps, ss, se, ah, al, samp, comp_zz, comp_bwbh,
                mcux, mcuy, restart_interval,
                lambda ti, sym: freq[ti].__setitem__(sym, freq[ti].get(sym, 0) + 1),
                lambda _v, _n: None,
                lambda _m: None,
            )
            tabs = [build_huffman(f) if f else ([0] * 16, []) for f in freq]
            encs = [huff_encode_table(*t) for t in tabs]
            tc = 0 if ss == 0 else 1
            for i, t in enumerate(tabs):
                out += dht(tc, i, *t)
        else:
            encs = [{}]
        bw = BitWriter()

        def emit_sym(ti, sym, _encs=encs, _bw=bw):
            code, ln = _encs[ti][sym]
            _bw.write(code, ln)

        def emit_rst(m8, _bw=bw):
            _bw.flush()
            _bw.out += bytes([0xFF, 0xD0 + m8])

        _encode_prog_scan(
            scan_comps, ss, se, ah, al, samp, comp_zz, comp_bwbh,
            mcux, mcuy, restart_interval,
            emit_sym, bw.write, emit_rst,
        )
        bw.flush()
        sos = bytearray([len(scan_comps)])
        for ci in scan_comps:
            td = min(ci, 1) if ss == 0 and ah == 0 else 0
            ta = 0 if ss == 0 else 0
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
