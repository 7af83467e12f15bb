"""Dependency-free baseline JPEG codec (pure numpy + Python bit I/O).

Closes the last big image-decode surface that is feasible offline (the
reference's corpus tooling chunks arbitrary file trees --
``/root/reference/cmd/cdc/stats.go:158-171`` -- and real corpora are
full of JPEGs): baseline sequential DCT (SOF0) AND progressive DCT (SOF2 --
spectral selection + successive approximation per T.81 Annex G, with
EOB-run and correction-bit refinement decoding), 8-bit precision,
grayscale / YCbCr 4:4:4 / YCbCr 4:2:0, restart markers, standard JFIF
color conversion. Everything is from the public ITU T.81 spec.

Honest limits (raise, never guess): lossless/hierarchical frame types,
arithmetic coding, 12-bit precision, and sampling layouts other than
1x1/2x2 reject with ``NotImplementedError``; malformed structure raises
``ValueError``.

Architecture note: entropy (Huffman) decoding is inherently sequential
bit-by-bit -- a Python loop, the PNG-Paeth-row pattern -- but the IDCT
is ONE matmul over all blocks at once (the 64x64 orthonormal DCT basis),
so the heavy math is vectorized across the image.

Correctness is pinned three independent ways (tests/test_jpeg.py + the
``image_jpeg_decode`` driver query):
  - entropy layer: quantized-coefficient round-trips are EXACT
    (encode(C) -> decode -> C, all sampling modes, baseline AND a
    9-scan progressive script) -- Huffman coding is lossless, so any
    bitstream bug breaks equality, and baseline-vs-progressive must
    agree coefficient-for-coefficient;
  - IDCT: vectorized matmul vs a naive per-pixel double loop written
    straight from the T.81 formula;
  - end-to-end: the driver oracle recomputes pixels from the
    materialized coefficient relation with DuckDB's own cos() -- an
    independent relational IDCT + color conversion.

Encoder tables are built per image from symbol frequencies (canonical
Huffman, length-limited to 16 bits via the spec's Adjust_BITS
procedure), so round-trip tests exercise diverse code lengths.
"""
from __future__ import annotations

import heapq

import numpy as np

# natural-order index for each zigzag position (T.81 Figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_basis() -> np.ndarray:
    """B[u*8+v, y*8+x] = C(u)C(v)/4 cos((2y+1)u pi/16) cos((2x+1)v pi/16):
    pixels = coeffs @ B (rows orthonormal, so the forward DCT is @ B.T)."""
    u = np.arange(8)
    c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
    cos = np.cos((2 * np.arange(8)[None, :] + 1) * u[:, None] * np.pi / 16)
    b = np.einsum("u,v,uy,vx->uvyx", c, c, cos, cos) / 4.0
    return b.reshape(64, 64)


_BASIS = _dct_basis()


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing. Markers are
    detected at byte-LOAD time (before any of their bits could be served
    as entropy data): a 0xFF followed by 0x00 is the data byte 0xFF; a
    0xFF followed by anything else is a marker. Restart markers
    (FFD0-FFD7) are consumed via align_and_skip_restart(); any other
    marker mid-stream raises."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def _marker_here(self) -> int | None:
        d, p = self.data, self.pos
        if (self.bit == 0 and p + 1 < len(d) and d[p] == 0xFF
                and d[p + 1] != 0x00):
            return d[p + 1]
        return None

    def read_bit(self) -> int:
        d = self.data
        if self.bit == 0:
            if self.pos >= len(d):
                raise ValueError("jpeg: entropy data truncated")
            m = self._marker_here()
            if m is not None:
                raise ValueError(
                    f"jpeg: marker 0xFF{m:02X} inside entropy data")
        v = (d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            was_ff = d[self.pos] == 0xFF
            self.pos += 1
            if was_ff and self.pos < len(d) and d[self.pos] == 0x00:
                self.pos += 1  # stuffed zero after a data 0xFF
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_restart(self) -> None:
        if self.bit:
            was_ff = self.data[self.pos] == 0xFF
            self.bit = 0
            self.pos += 1
            if was_ff and self.pos < len(self.data) \
                    and self.data[self.pos] == 0x00:
                self.pos += 1
        m = self._marker_here()
        if m is None or not (0xD0 <= m <= 0xD7):
            raise ValueError("jpeg: expected restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol, canonical per T.81 Annex C."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("jpeg: DHT counts/values mismatch")
    return table


def _huff_read(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        s = table.get((ln, code))
        if s is not None:
            return s
    raise ValueError("jpeg: invalid Huffman code")


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _segments(raw: bytes):
    if raw[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    pos = 2
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        m = raw[pos + 1]
        if m == 0xD9:  # EOI
            return
        if pos + 4 > len(raw):
            break
        ln = int.from_bytes(raw[pos + 2:pos + 4], "big")
        body = raw[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("jpeg: truncated segment")
        yield m, body, pos + 2 + ln
        pos += 2 + ln
        if m == 0xDA:
            # skip the entropy-coded stream: stuffed 0xFF00 and restart
            # markers stay inside it; any other marker ends the scan
            while pos + 1 < len(raw):
                if raw[pos] != 0xFF or raw[pos + 1] == 0x00 \
                        or 0xD0 <= raw[pos + 1] <= 0xD7:
                    pos += 1
                    continue
                break
            else:
                raise ValueError("jpeg: missing EOI after scan")
    raise ValueError("jpeg: missing SOS/EOI")


def jpeg_coeffs(raw: bytes):
    """Parse + entropy-decode to QUANTIZED coefficient blocks (natural
    order). Returns (comps, h, w) where comps is a list of dicts with
    id, hs, vs (sampling), qt (64 int32), blocks (by, bx, 64 int32).

    Handles baseline sequential (SOF0, one full scan) and progressive
    (SOF2, any number of DC/AC spectral-selection + successive-
    approximation scans, T.81 Annex G). Huffman tables are snapshotted
    at each SOS (progressive streams routinely redefine them between
    scans)."""
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    progressive = False
    dri = 0
    scans = []
    for m, body, after in _segments(raw):
        if m == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                z = np.frombuffer(body[p + 1:p + 65], dtype=np.uint8)
                if len(z) != 64:
                    raise ValueError("jpeg: short DQT")
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = z
                qts[tq] = nat
                p += 65
        elif m == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _huff_decode_table(bits, vals)
                p += 17 + n
        elif m in (0xC0, 0xC2):
            if body[0] != 8:
                raise NotImplementedError(f"jpeg: precision {body[0]}")
            if sof is not None:
                raise ValueError("jpeg: multiple SOF markers")
            progressive = m == 0xC2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nf = body[5]
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "hs": hv >> 4, "vs": hv & 15,
                              "tq": tq})
            sof = (h, w, comps)
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline sequential (SOF0) and progressive "
                f"(SOF2) DCT; got SOF marker 0xFF{m:02X}")
        elif m == 0xDD:
            dri = int.from_bytes(body[0:2], "big")
        elif m == 0xDA:
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel.append((cs, tt >> 4, tt & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise NotImplementedError("jpeg: non-baseline scan params")
            scans.append((sel, ss, se, ah, al, after,
                          dict(dc_tabs), dict(ac_tabs), dri))
    if sof is None or not scans:
        raise ValueError("jpeg: missing SOF or SOS")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise ValueError("jpeg: zero dimensions")
    if not progressive and len(scans) != 1:
        raise NotImplementedError("jpeg: multi-scan sequential stream")

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    # supported layouts: every component 1x1 (grayscale / 4:4:4), or a
    # 2x2 luma with 1x1 chroma (4:2:0)
    if (hmax, vmax) not in ((1, 1), (2, 2)) or any(
            (c["hs"], c["vs"]) not in ((1, 1), (hmax, vmax)) for c in comps):
        layouts = ",".join(f"{c['hs']}x{c['vs']}" for c in comps)
        raise NotImplementedError(f"jpeg: sampling layout {layouts} "
                                  "(1x1 everywhere or 2x2+1x1 only)")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    for c in comps:
        if c["tq"] not in qts:
            raise ValueError("jpeg: component references missing DQT")
        c["qt"] = qts[c["tq"]]
        c["bx"] = mcux * c["hs"]
        c["by"] = mcuy * c["vs"]
        # non-interleaved (single-component) scans cover only the blocks
        # of the component's own scaled sample grid, NOT the MCU padding
        c["nbx"] = (-(-w * c["hs"] // hmax) + 7) // 8
        c["nby"] = (-(-h * c["vs"] // vmax) + 7) // 8
        c["blocks"] = np.zeros((c["by"], c["bx"], 64), np.int32)

    by_id = {c["id"]: c for c in comps}
    for sel, ss, se, ah, al, pos, sdc, sac, sdri in scans:
        scomps = []
        for cs, td, ta in sel:
            if cs not in by_id:
                raise ValueError("jpeg: scan references unknown component")
            c = by_id[cs]
            # DC scans need a DC table (unless pure refinement); AC scans
            # need an AC table. Resolve only what the scan uses.
            dc = ac = None
            if ss == 0 and ah == 0:
                if td not in sdc:
                    raise ValueError("jpeg: scan references missing DHT")
                dc = sdc[td]
            if se > 0:
                if ta not in sac:
                    raise ValueError("jpeg: scan references missing DHT")
                ac = sac[ta]
            scomps.append((c, dc, ac))
        if not progressive and len(scomps) != len(comps):
            raise ValueError("jpeg: scan does not cover component")
        r = _BitReader(raw, pos)
        if not progressive:
            _decode_scan_sequential(r, scomps, mcux, mcuy, sdri)
        elif ss == 0:
            if se != 0:
                raise ValueError("jpeg: progressive scan mixes DC and AC")
            _decode_scan_dc(r, scomps, mcux, mcuy, sdri, ah, al)
        else:
            if len(scomps) != 1:
                raise ValueError(
                    "jpeg: progressive AC scan must be single-component")
            if ss > se or se > 63:
                raise ValueError("jpeg: bad spectral selection")
            _decode_scan_ac(r, *scomps[0][::2], ss, se, ah, al, sdri)
    return comps, h, w


def _decode_scan_sequential(r, scomps, mcux, mcuy, dri):
    """Baseline full scan: interleaved MCUs, DC + all 63 AC per block."""
    preds = {c["id"]: 0 for c, _, _ in scomps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.align_and_skip_restart()
                preds = {c["id"]: 0 for c, _, _ in scomps}
            for c, dc, ac in scomps:
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        blk = np.zeros(64, np.int32)
                        t = _huff_read(r, dc)
                        diff = _extend(r.receive(t), t)
                        preds[c["id"]] += diff
                        blk[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_read(r, ac)
                            rr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("jpeg: AC run past block")
                            blk[ZIGZAG[k]] = _extend(r.receive(s), s)
                            k += 1
                        c["blocks"][my * c["vs"] + by, mx * c["hs"] + bx] = blk
            mcu_count += 1


def _scan_units(scomps, mcux, mcuy):
    """Block visit order for a DC scan: interleaved MCU order when the
    scan has several components, the component's own (non-padded) raster
    when it has one (T.81 non-interleaved rule)."""
    if len(scomps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for c, dc, ac in scomps:
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            unit.append((c, dc,
                                         my * c["vs"] + by, mx * c["hs"] + bx))
                yield unit
    else:
        c, dc, _ = scomps[0]
        for row in range(c["nby"]):
            for col in range(c["nbx"]):
                yield [(c, dc, row, col)]


def _decode_scan_dc(r, scomps, mcux, mcuy, dri, ah, al):
    """Progressive DC scan: first pass decodes shifted diffs (<< Al);
    refinement reads one bit per block into bit position Al."""
    preds = {c["id"]: 0 for c, _, _ in scomps}
    n = 0
    for unit in _scan_units(scomps, mcux, mcuy):
        if dri and n and n % dri == 0:
            r.align_and_skip_restart()
            preds = {c["id"]: 0 for c, _, _ in scomps}
        for c, dc, row, col in unit:
            if ah == 0:
                t = _huff_read(r, dc)
                preds[c["id"]] += _extend(r.receive(t), t)
                c["blocks"][row, col, 0] = preds[c["id"]] << al
            elif r.read_bit():
                c["blocks"][row, col, 0] |= 1 << al
        n += 1


def _decode_scan_ac(r, c, ac, ss, se, ah, al, dri):
    """Progressive AC scan over one component's non-padded block raster.
    First pass (Ah=0) places coefficients << Al with EOB-run skipping;
    refinement (Ah>0) adds the Al bit via the T.81 G.2 correction-bit
    walk (the libjpeg decode_mcu_AC_refine algorithm, reimplemented
    from the public spec semantics)."""
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    n = 0
    for row in range(c["nby"]):
        for col in range(c["nbx"]):
            if dri and n and n % dri == 0:
                r.align_and_skip_restart()
                eobrun = 0
            n += 1
            blk = c["blocks"][row, col]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_read(r, ac)
                    rr, s = rs >> 4, rs & 15
                    if s == 0:
                        if rr != 15:
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += r.receive(rr)
                            break
                        k += 16  # ZRL
                        continue
                    k += rr
                    if k > se:
                        raise ValueError("jpeg: AC run past band")
                    blk[ZIGZAG[k]] = _extend(r.receive(s), s) << al
                    k += 1
                continue
            # refinement pass
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_read(r, ac)
                    rr, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if rr != 15:
                            eobrun = 1 << rr
                            if rr:
                                eobrun += r.receive(rr)
                            break
                        # rr == 15: ZRL, skip 16 zero-history coefficients
                    elif s == 1:
                        val = p1 if r.read_bit() else m1
                    else:
                        raise ValueError("jpeg: refinement magnitude != 1")
                    while k <= se:
                        z = ZIGZAG[k]
                        if blk[z] != 0:
                            if r.read_bit() and (blk[z] & p1) == 0:
                                blk[z] += p1 if blk[z] > 0 else m1
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if val and k <= se:
                        blk[ZIGZAG[k]] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    z = ZIGZAG[k]
                    if blk[z] != 0:
                        if r.read_bit() and (blk[z] & p1) == 0:
                            blk[z] += p1 if blk[z] > 0 else m1
                    k += 1
                eobrun -= 1


def _plane(c: dict) -> np.ndarray:
    """Dequantize + IDCT one component's blocks to its sample plane
    (by*8, bx*8) float64 -- one matmul across all blocks."""
    deq = c["blocks"].astype(np.float64) * c["qt"][None, None, :]
    by, bx = deq.shape[0], deq.shape[1]
    px = deq.reshape(-1, 64) @ _BASIS + 128.0
    return (px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8))


def jpeg_pixels(raw: bytes) -> np.ndarray:
    """Decode a baseline JPEG to HxWx3 uint8 RGB (grayscale replicates)."""
    comps, h, w = jpeg_coeffs(raw)
    planes = []
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    for c in comps:
        p = _plane(c)
        if c["hs"] != hmax or c["vs"] != vmax:
            p = p.repeat(vmax // c["vs"], axis=0).repeat(hmax // c["hs"],
                                                         axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(planes) != 3:
        raise NotImplementedError(f"jpeg: {len(planes)}-component color")
    y, cb, cr = planes
    # JFIF conversion; G coefficients derived from the Rec.601 weights so
    # the relational oracle can write textually identical expressions
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - (0.114 * 1.772 / 0.587) * (cb - 128.0) \
           - (0.299 * 1.402 / 0.587) * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (from quantized coefficients; tables built per image)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per convention


def _huff_lengths(freq: dict[int, int]) -> dict[int, int]:
    """Symbol -> code length, length-limited to 16 via Adjust_BITS
    (T.81 K.3). A sentinel symbol 256 reserves the all-ones code."""
    f = dict(freq)
    f[256] = 1
    heap = [(n, i, (sym,)) for i, (sym, n) in enumerate(sorted(f.items()))]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in f}
    tick = len(heap)
    while len(heap) > 1:
        n1, _, s1 = heapq.heappop(heap)
        n2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (n1 + n2, tick, s1 + s2))
        tick += 1
    if len(f) == 1:
        depth = {s: 1 for s in f}
    bits = [0] * 33
    for s, d in depth.items():
        if d > 32:
            raise ValueError("jpeg: huffman depth overflow")
        bits[d] += 1
    # Adjust_BITS: push pairs up from depths > 16
    for i in range(32, 16, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    # re-assign lengths canonically: shortest first, symbols ordered by
    # (original depth, symbol); sentinel (largest depth, value 256) lands
    # at the longest code = the all-ones one, then is dropped
    order = sorted(depth, key=lambda s: (depth[s], s))
    out: dict[int, int] = {}
    ln, used = 1, 0
    for s in order:
        while used >= bits[ln]:
            used = 0
            ln += 1
        out[s] = ln
        used += 1
    out.pop(256)
    return out


def _huff_encode_table(lengths: dict[int, int]):
    """(bits16, vals, symbol -> (code, len)) canonical."""
    bits = [0] * 16
    for ln in lengths.values():
        bits[ln - 1] += 1
    vals = sorted(lengths, key=lambda s: (lengths[s], s))
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return bits, vals, codes


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _block_symbols(blk: np.ndarray, pred: int):
    """(dc_symbol, dc_bits, [(ac_symbol, bits, nbits)...], new_pred)."""
    dc = int(blk[0])
    diff = dc - pred
    t = _category(diff)
    dcb = diff if diff >= 0 else diff + (1 << t) - 1
    acs = []
    zz = blk[ZIGZAG[1:]]
    run = 0
    last = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else -1
    for k in range(last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))
            run -= 16
        s = _category(v)
        vb = v if v >= 0 else v + (1 << s) - 1
        acs.append(((run << 4) | s, vb, s))
        run = 0
    if last < 62:
        acs.append((0x00, 0, 0))  # EOB
    return t, dcb, acs, dc


# ---------------------------------------------------------------------------
# Progressive scan token generators (encoder). Tokens are ("h", symbol)
# for Huffman-coded symbols and ("b", value, nbits) for appended raw
# bits; frequencies for the per-scan canonical table come from the "h"
# tokens alone. The refinement emitters follow T.81 G.1.2 with the
# libjpeg buffered-correction-bit ordering (reimplemented from the
# public spec semantics): pending EOB runs flush before any ZRL or
# newly-nonzero symbol, and each block's buffered bits ride immediately
# after the symbol that ends their span.
# ---------------------------------------------------------------------------

def _enc_units(scomps, mcux, mcuy):
    """Encoder-side block visit order, mirroring _scan_units."""
    if len(scomps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for c in scomps:
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            unit.append((c, my * c["vs"] + by,
                                         mx * c["hs"] + bx))
                yield unit
    else:
        c = scomps[0]
        for row in range(c["nby"]):
            for col in range(c["nbx"]):
                yield [(c, row, col)]


def _prog_dc_first_tokens(scomps, mcux, mcuy, al):
    toks = []
    preds = {c["id"]: 0 for c in scomps}
    for unit in _enc_units(scomps, mcux, mcuy):
        for c, row, col in unit:
            v = int(c["blocks"][row, col, 0]) >> al  # arithmetic, like C
            diff = v - preds[c["id"]]
            preds[c["id"]] = v
            t = _category(diff)
            toks.append(("h", t))
            if t:
                toks.append(("b", diff if diff >= 0
                             else diff + (1 << t) - 1, t))
    return toks


def _prog_dc_refine_tokens(scomps, mcux, mcuy, al):
    toks = []
    for unit in _enc_units(scomps, mcux, mcuy):
        for c, row, col in unit:
            toks.append(("b", (int(c["blocks"][row, col, 0]) >> al) & 1, 1))
    return toks


def _eob_tokens(eobrun):
    nb = eobrun.bit_length() - 1
    toks = [("h", nb << 4)]
    if nb:
        toks.append(("b", eobrun - (1 << nb), nb))
    return toks


def _prog_ac_first_tokens(c, ss, se, al):
    toks = []
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            toks.extend(_eob_tokens(eobrun))
            eobrun = 0

    for row in range(c["nby"]):
        for col in range(c["nbx"]):
            blk = c["blocks"][row, col]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[ZIGZAG[k]])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    flush_eob()
                    toks.append(("h", 0xF0))
                    run -= 16
                s = t.bit_length()
                val = t if v > 0 else -t
                flush_eob()
                toks.append(("h", (run << 4) | s))
                toks.append(("b", val if val >= 0
                             else val + (1 << s) - 1, s))
                run = 0
            if run > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
    return toks


def _prog_ac_refine_tokens(c, ss, se, al):
    toks = []
    eobrun = 0
    held: list = []  # correction bits riding with the pending EOB run

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            toks.extend(_eob_tokens(eobrun))
            toks.extend(held)
            held.clear()
            eobrun = 0

    for row in range(c["nby"]):
        for col in range(c["nbx"]):
            blk = c["blocks"][row, col]
            a = [abs(int(blk[ZIGZAG[k]])) >> al for k in range(ss, se + 1)]
            eob = ss - 1  # index of last NEWLY-nonzero coefficient
            for i, t in enumerate(a):
                if t == 1:
                    eob = ss + i
            run = 0
            br: list = []
            for i, t in enumerate(a):
                k = ss + i
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    flush_eob()
                    toks.append(("h", 0xF0))
                    toks.extend(br)
                    br.clear()
                    run -= 16
                if t > 1:
                    br.append(("b", t & 1, 1))
                    continue
                flush_eob()
                toks.append(("h", (run << 4) | 1))
                toks.append(("b", 1 if int(blk[ZIGZAG[k]]) > 0 else 0, 1))
                toks.extend(br)
                br.clear()
                run = 0
            if run > 0 or br:
                eobrun += 1
                held.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
    return toks


def _encode_progressive(comp_specs, h, w, hmax, vmax, mcux, mcuy) -> bytes:
    for c in comp_specs:
        c["nbx"] = (-(-w * c["hs"] // hmax) + 7) // 8
        c["nby"] = (-(-h * c["vs"] // vmax) + 7) // 8
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    for qi, c in enumerate(comp_specs[:2] if len(comp_specs) > 1
                           else comp_specs[:1]):
        zz = np.asarray(c["qt"], dtype=np.int64)[ZIGZAG]
        if np.any(zz < 1) or np.any(zz > 255):
            raise ValueError("jpeg: quant values must be 1..255")
        seg(0xDB, bytes([qi]) + bytes(int(v) for v in zz))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(comp_specs)])
    for ci, c in enumerate(comp_specs):
        sof += bytes([c["id"], (c["hs"] << 4) | c["vs"],
                      min(ci, 1) if len(comp_specs) > 1 else 0])
    seg(0xC2, bytes(sof))

    all_ci = list(range(len(comp_specs)))
    script = [(all_ci, 0, 0, 0, 1), (all_ci, 0, 0, 1, 0)]
    for ci in all_ci:
        script += [([ci], 1, 5, 0, 2), ([ci], 6, 63, 0, 2)]
    for ci in all_ci:
        script += [([ci], 1, 5, 2, 1), ([ci], 6, 63, 2, 1)]
    for ci in all_ci:
        script += [([ci], 1, 5, 1, 0), ([ci], 6, 63, 1, 0)]

    for cis, ss, se, ah, al in script:
        scomps = [comp_specs[ci] for ci in cis]
        if ss == 0:
            toks = (_prog_dc_first_tokens(scomps, mcux, mcuy, al) if ah == 0
                    else _prog_dc_refine_tokens(scomps, mcux, mcuy, al))
            tclass = 0
        elif ah == 0:
            toks = _prog_ac_first_tokens(scomps[0], ss, se, al)
            tclass = 1
        else:
            toks = _prog_ac_refine_tokens(scomps[0], ss, se, al)
            tclass = 1
        freq: dict[int, int] = {}
        for tok in toks:
            if tok[0] == "h":
                freq[tok[1]] = freq.get(tok[1], 0) + 1
        codes = None
        if freq:
            bits, vals, codes = _huff_encode_table(_huff_lengths(freq))
            seg(0xC4, bytes([tclass << 4]) + bytes(bits) + bytes(vals))
        sos = bytearray([len(cis)])
        for ci in cis:
            sos += bytes([comp_specs[ci]["id"], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(sos))
        wtr = _BitWriter()
        for tok in toks:
            if tok[0] == "h":
                code, ln = codes[tok[1]]
                wtr.write(code, ln)
            else:
                wtr.write(tok[1], tok[2])
        wtr.flush()
        out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def jpeg_encode_coeffs(comp_specs: list[dict], h: int, w: int,
                       restart_interval: int = 0,
                       progressive: bool = False) -> bytes:
    """Build a baseline (or, with progressive=True, SOF2 progressive)
    JPEG from QUANTIZED coefficient blocks.

    comp_specs: per component {id, hs, vs, qt (64 natural int), blocks
    (by, bx, 64 natural int)} with by/bx covering the MCU grid. Huffman
    tables are built from this image's symbol frequencies. Components
    1 -> grayscale, 3 -> interpreted as YCbCr by decoders.

    The progressive scan script exercises every T.81 Annex G mechanism:
    interleaved DC first (Al=1) + DC refinement, then per-component AC
    spectral bands 1-5 / 6-63 at Al=2 followed by two successive-
    approximation refinement layers down to Al=0. Note progressive AC
    scans transmit only each component's non-padded block raster, so
    MCU-padding blocks keep DC-only coefficients.
    """
    hmax = max(c["hs"] for c in comp_specs)
    vmax = max(c["vs"] for c in comp_specs)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comp_specs:
        if c["blocks"].shape[:2] != (mcuy * c["vs"], mcux * c["hs"]):
            raise ValueError("jpeg: blocks shape does not cover MCU grid")
    if len(comp_specs) == 3 and not np.array_equal(
            np.asarray(comp_specs[1]["qt"]), np.asarray(comp_specs[2]["qt"])):
        raise ValueError("jpeg: Cb and Cr must share a quant table "
                         "(one chroma DQT slot is emitted)")
    if progressive:
        if restart_interval:
            raise ValueError(
                "jpeg: restart markers unsupported in the progressive "
                "encoder (the decoder handles them)")
        return _encode_progressive(comp_specs, h, w, hmax, vmax, mcux, mcuy)

    # pass 1: symbol frequencies (restart-aware DC prediction)
    dcf = [dict() for _ in comp_specs]
    acf = [dict() for _ in comp_specs]
    sym_cache = []  # per MCU: list per comp of per-block tuples
    preds = [0] * len(comp_specs)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                preds = [0] * len(comp_specs)
            per_comp = []
            for ci, c in enumerate(comp_specs):
                tups = []
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        blk = c["blocks"][my * c["vs"] + by,
                                          mx * c["hs"] + bx]
                        t, dcb, acs, preds[ci] = _block_symbols(
                            blk, preds[ci])
                        dcf[ci][t] = dcf[ci].get(t, 0) + 1
                        for sym, _, _ in acs:
                            acf[ci][sym] = acf[ci].get(sym, 0) + 1
                        tups.append((t, dcb, acs))
                per_comp.append(tups)
            sym_cache.append(per_comp)
            mcu_i += 1

    # one DC + one AC table pair per component slot 0/1 (slot 1 shared by
    # chroma, the conventional layout); gray uses slot 0 only
    def merged(fs):
        out = {}
        for f in fs:
            for k, v in f.items():
                out[k] = out.get(k, 0) + v
        return out or {0: 1}

    slots = [(dcf[0], acf[0])]
    comp_slot = [0] * len(comp_specs)
    if len(comp_specs) > 1:
        slots.append((merged(dcf[1:]), merged(acf[1:])))
        comp_slot = [0] + [1] * (len(comp_specs) - 1)
    tabs = []
    for dfreq, afreq in slots:
        tabs.append((_huff_encode_table(_huff_lengths(dfreq)),
                     _huff_encode_table(_huff_lengths(afreq))))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    for qi, c in enumerate(comp_specs[:2] if len(comp_specs) > 1
                           else comp_specs[:1]):
        zz = np.asarray(c["qt"], dtype=np.int64)[ZIGZAG]
        if np.any(zz < 1) or np.any(zz > 255):
            raise ValueError("jpeg: quant values must be 1..255")
        seg(0xDB, bytes([qi]) + bytes(int(v) for v in zz))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(comp_specs)])
    for ci, c in enumerate(comp_specs):
        sof += bytes([c["id"], (c["hs"] << 4) | c["vs"],
                      min(ci, 1) if len(comp_specs) > 1 else 0])
    seg(0xC0, bytes(sof))
    for si, ((dbits, dvals, _), (abits, avals, _)) in enumerate(tabs):
        seg(0xC4, bytes([si]) + bytes(dbits) + bytes(dvals))
        seg(0xC4, bytes([0x10 | si]) + bytes(abits) + bytes(avals))
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([len(comp_specs)])
    for ci, c in enumerate(comp_specs):
        sos += bytes([c["id"], (comp_slot[ci] << 4) | comp_slot[ci]])
    sos += b"\x00\x3f\x00"
    seg(0xDA, bytes(sos))

    wtr = _BitWriter()
    mcu_i = 0
    rst = 0
    for per_comp in sym_cache:
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            wtr.flush()
            wtr.out.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
        for ci, tups in enumerate(per_comp):
            (_, _, dcodes), (_, _, acodes) = tabs[comp_slot[ci]]
            for t, dcb, acs in tups:
                code, ln = dcodes[t]
                wtr.write(code, ln)
                if t:
                    wtr.write(dcb, t)
                for sym, vb, s in acs:
                    code, ln = acodes[sym]
                    wtr.write(code, ln)
                    if s:
                        wtr.write(vb, s)
        mcu_i += 1
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# standard luminance quant table (T.81 Table K.1), natural order
_QT_LUMA_Z = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)


def _qt_scaled(quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((_QT_LUMA_Z * scale + 50) // 100, 1, 255).astype(np.int64)


def jpeg_encode(img: np.ndarray, quality: int = 85,
                progressive: bool = False) -> bytes:
    """Pixel-level encoder (forward DCT + quantization): HxW grayscale or
    HxWx3 RGB -> baseline or progressive JPEG (RGB goes through JFIF
    YCbCr, 4:4:4). Lossy by nature -- round-trips are PSNR-bounded, not
    exact."""
    img = np.asarray(img)
    qt = _qt_scaled(quality)

    def to_blocks(plane: np.ndarray) -> np.ndarray:
        h, w = plane.shape
        by, bx = (h + 7) // 8, (w + 7) // 8
        pad = np.pad(plane.astype(np.float64),
                     ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
        cells = (pad.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
                 .reshape(-1, 64))
        f = (cells - 128.0) @ _BASIS.T
        return np.round(f / qt[None, :]).astype(np.int32).reshape(by, bx, 64)

    if img.ndim == 2:
        comps = [{"id": 1, "hs": 1, "vs": 1, "qt": qt,
                  "blocks": to_blocks(img)}]
        return jpeg_encode_coeffs(comps, img.shape[0], img.shape[1],
                                  progressive=progressive)
    if img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 + (b - y) / 1.772
        cr = 128.0 + (r - y) / 1.402
        comps = [{"id": i + 1, "hs": 1, "vs": 1, "qt": qt,
                  "blocks": to_blocks(p)}
                 for i, p in enumerate((y, cb, cr))]
        return jpeg_encode_coeffs(comps, img.shape[0], img.shape[1],
                                  progressive=progressive)
    raise ValueError("jpeg: expected HxW gray or HxWx3 RGB")
