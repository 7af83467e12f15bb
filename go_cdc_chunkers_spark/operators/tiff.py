"""Dependency-free baseline TIFF codec (decode + encode) -- pure numpy.

Narrows the corpus-decode raise in multimodal.decode_image alongside
png.py/jpeg.py/gif.py (the reference's corpus tooling chunks arbitrary
file trees -- ``/root/reference/cmd/cdc/stats.go:158-171``). Everything
here is from the public TIFF 6.0 specification, Baseline TIFF section.

Supported (decoded for real, never guessed):
  - both byte orders (II little-endian, MM big-endian);
  - bilevel / grayscale (1, 4, 8 bits, PhotometricInterpretation 0 and
    1, i.e. WhiteIsZero inversion handled), 8-bit RGB and RGBA
    (ExtraSamples alpha), palette-color (ColorMap, 16-bit entries);
  - strip organisation (any RowsPerStrip, multiple strips, defaulted
    single strip), chunky PlanarConfiguration;
  - Compression 1 (none), 5 (LZW: MSB-first bit packing with the
    spec's EARLY-CHANGE width rule -- one code before the power of
    two, unlike GIF's LSB-first late change -- Clear at table size
    4094, per-strip streams) and 32773 (PackBits);
  - Predictor 2 (horizontal differencing) for 8-bit samples, the
    layout LZW files in the wild overwhelmingly use.

Honest limits: planar (PlanarConfiguration=2), tiles, CCITT/JPEG
compression, 16-bit samples, and Predictor 2 on sub-byte depths raise
NotImplementedError; malformed structure raises ValueError.

Low bit depths are expanded to full 0..255 range exactly like png.py
(bit replication: value * 255 / maxval is exact for 1/2/4-bit depths).
"""

from __future__ import annotations

import numpy as np

# baseline tags
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_EXTRA_SAMPLES = 338

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

_LZW_CLEAR = 256
_LZW_EOI = 257
_LZW_MAX = 4096  # 12-bit ceiling (TIFF 6.0, LZW section)


def _lzw_decode_tiff(data: bytes, expect: int) -> bytes:
    """Decode a TIFF LZW strip (Compression 5) to exactly ``expect``
    bytes. Differs from gif._lzw_decode in exactly the spec deltas:
    MSB-first bit packing, 256 byte roots with Clear=256/EOI=257, and
    the EARLY-CHANGE width rule -- the reader widens as soon as
    next_code == (1 << width) - 1, one code earlier than GIF, because
    the writer's table runs one entry ahead. Same flat chain-array
    architecture (prefix/suffix/first/length, backwards emission)."""
    prefix = [0] * _LZW_MAX
    suffix = bytearray(_LZW_MAX)
    first = bytearray(_LZW_MAX)
    length = [0] * _LZW_MAX
    for c in range(256):
        suffix[c] = first[c] = c
        length[c] = 1
    out = bytearray(expect)
    pos = 0
    next_code = _LZW_EOI + 1
    width = 9
    acc = 0
    nbits = 0
    prev = -1
    for b in data:
        acc = (acc << 8) | b
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == _LZW_CLEAR:
                next_code = _LZW_EOI + 1
                width = 9
                prev = -1
                continue
            if code == _LZW_EOI:
                if pos != expect:
                    raise ValueError(
                        f"tiff: LZW ended with {pos}/{expect} bytes")
                return bytes(out)
            if prev < 0:
                if code >= _LZW_CLEAR:
                    raise ValueError("tiff: non-root LZW code after clear")
                out[pos] = code
                pos += 1
                prev = code
                continue
            if code < next_code:
                cur = code
                kwk = False
            elif code == next_code and next_code < _LZW_MAX:
                cur = prev  # KwKwK: string(prev) + first(prev)
                kwk = True
            else:
                raise ValueError(f"tiff: bad LZW code {code}")
            ln = length[cur] + (1 if kwk else 0)
            if pos + ln > expect:
                raise ValueError("tiff: LZW output overruns strip")
            p = pos + ln - 1
            if kwk:
                out[p] = first[prev]
                p -= 1
            c = cur
            while True:
                out[p] = suffix[c]
                if length[c] == 1:
                    break
                c = prefix[c]
                p -= 1
            pos += ln
            if next_code < _LZW_MAX:
                prefix[next_code] = prev
                suffix[next_code] = first[cur] if not kwk else first[prev]
                first[next_code] = first[prev]
                length[next_code] = length[prev] + 1
                next_code += 1
                # EARLY CHANGE: widen one code before the boundary
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1
            prev = code
    raise ValueError("tiff: LZW strip ended without EOI")


def _lzw_encode_tiff(payload: bytes) -> bytes:
    """Encode a strip as TIFF LZW: MSB-first, Clear first and whenever
    the table reaches 4094 entries (the spec's mandated reset point),
    EOI last. Width grows when next_code == 1 << width -- one entry
    after the decoder's early-change rule, because the decoder's table
    is one entry behind at each read."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[tuple[int, int], int] = {}
    next_code = _LZW_EOI + 1
    put(_LZW_CLEAR)
    prev = -1
    for b in payload:
        if prev < 0:
            prev = b
            continue
        key = (prev, b)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        put(prev)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == _LZW_MAX - 2:  # 4094: spec-mandated reset
            put(_LZW_CLEAR)
            table.clear()
            next_code = _LZW_EOI + 1
            width = 9
        prev = b
    if prev >= 0:
        put(prev)
    put(_LZW_EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expect:
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1
            out += data[pos:pos + n + 1]
            if pos + n + 1 > len(data):
                raise ValueError("tiff: truncated PackBits literal")
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("tiff: truncated PackBits run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("tiff: PackBits output short")
    return bytes(out[:expect])


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (the spec's recommended row-boundary packing)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j > i:  # run of length j-i+1 >= 2
            out.append((257 - (j - i + 1)) & 0xFF)
            out.append(row[i])
            i = j + 1
            continue
        # literal: until a run of >=3 starts (2-byte runs inside literals
        # are cheaper left literal) or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def _read_ifd(raw: bytes, bo: str):
    off = int.from_bytes(raw[4:8], bo)
    if not 8 <= off < len(raw):
        raise ValueError("tiff: bad IFD offset")
    n = int.from_bytes(raw[off:off + 2], bo)
    tags = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag = int.from_bytes(raw[e:e + 2], bo)
        typ = int.from_bytes(raw[e + 2:e + 4], bo)
        cnt = int.from_bytes(raw[e + 4:e + 8], bo)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            data = raw[e + 8:e + 8 + size]
        else:
            voff = int.from_bytes(raw[e + 8:e + 12], bo)
            data = raw[voff:voff + size]
            if len(data) != size:
                raise ValueError("tiff: truncated tag value")
        if typ in (3, 8):
            vals = [int.from_bytes(data[k:k + 2], bo) for k in
                    range(0, size, 2)]
        elif typ in (4, 9):
            vals = [int.from_bytes(data[k:k + 4], bo) for k in
                    range(0, size, 4)]
        elif typ in (1, 6, 7):
            vals = list(data)
        else:
            vals = [0] * cnt  # rationals etc.: not needed by baseline
        tags[tag] = vals
    return tags


def tiff_pixels(raw: bytes) -> np.ndarray:
    """Decode the first IFD. Returns HxW uint8 (gray), HxWx3 (RGB /
    palette) or HxWx4 (RGBA)."""
    if raw[:4] == b"II*\x00":
        bo = "little"
    elif raw[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("tiff: bad signature")
    tags = _read_ifd(raw, bo)
    if _T_WIDTH not in tags or _T_LENGTH not in tags:
        raise ValueError("tiff: missing dimensions")
    w, h = tags[_T_WIDTH][0], tags[_T_LENGTH][0]
    if w == 0 or h == 0:
        raise ValueError("tiff: zero dimensions")
    comp = tags.get(_T_COMPRESSION, [1])[0]
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"tiff: compression {comp} (decoded: "
                                  "1=none / 5=LZW / 32773=PackBits)")
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"tiff: predictor {predictor}")
    if tags.get(_T_PLANAR, [1])[0] != 1:
        raise NotImplementedError("tiff: planar configuration 2")
    spp = tags.get(_T_SAMPLES, [1])[0]
    bits = tags.get(_T_BITS, [1] * spp)
    if len(set(bits)) != 1:
        raise NotImplementedError(f"tiff: mixed bits per sample {bits}")
    depth = bits[0]
    photo = tags.get(_T_PHOTOMETRIC, [1])[0]
    if spp > 1 and depth != 8:
        raise NotImplementedError(f"tiff: {depth}-bit multi-sample")
    if spp == 1 and depth not in (1, 2, 4, 8):
        raise NotImplementedError(f"tiff: {depth}-bit samples")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"tiff: {spp} samples per pixel")
    offsets = tags.get(_T_STRIP_OFFSETS)
    if not offsets:
        raise ValueError("tiff: missing strip offsets")
    counts = tags.get(_T_STRIP_COUNTS)
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    rps = min(rps, h)
    row_bytes = (w * spp * depth + 7) // 8
    data = bytearray()
    for si, soff in enumerate(offsets):
        rows = min(rps, h - si * rps)
        if rows <= 0:
            break
        want = rows * row_bytes
        if counts:
            chunk = raw[soff:soff + counts[si]]
        else:
            chunk = raw[soff:soff + want]
        if comp == 32773:
            chunk = _packbits_decode(chunk, want)
        elif comp == 5:
            chunk = _lzw_decode_tiff(chunk, want)
        if len(chunk) < want:
            raise ValueError("tiff: truncated strip")
        data += chunk[:want]
    arr = np.frombuffer(bytes(data), np.uint8).reshape(h, row_bytes)
    if depth < 8:
        arr = np.unpackbits(arr, axis=1)[:, :w * depth]
        arr = arr.reshape(h, w, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        vals = (arr.astype(np.uint16) * weights[None, None, :]).sum(axis=2)
    else:
        vals = arr[:, :w * spp].reshape(h, w, spp) if spp > 1 \
            else arr[:, :w]
    if predictor == 2:
        if depth != 8:
            raise NotImplementedError(
                "tiff: predictor 2 on sub-byte samples")
        # horizontal differencing: undo by a per-row, per-channel
        # running sum mod 256 (uint8 accumulator wraps exactly)
        vals = np.cumsum(vals, axis=1, dtype=np.uint8)
    if photo == 3:  # palette-color
        cmap = tags.get(_T_COLORMAP)
        if not cmap or len(cmap) != 3 * (1 << depth):
            raise ValueError("tiff: bad/missing ColorMap")
        pal16 = np.asarray(cmap, np.uint32).reshape(3, 1 << depth).T
        pal = (pal16 >> 8).astype(np.uint8)  # 16-bit entries -> 8-bit
        return pal[np.asarray(vals, np.int32)]
    if spp == 1:
        maxv = (1 << depth) - 1
        out = (np.asarray(vals, np.uint32) * 255 // maxv).astype(np.uint8)
        if photo == 0:  # WhiteIsZero
            out = 255 - out
        return out
    return np.asarray(vals, np.uint8)


# ---------------------------------------------------------------------------
# Encode (for honest round-trip tests and driver oracles)
# ---------------------------------------------------------------------------

def tiff_encode(img: np.ndarray, byteorder: str = "little",
                rows_per_strip: int = 0, packbits: bool = False,
                lzw: bool = False, predictor: int = 1,
                photometric: int | None = None,
                palette: np.ndarray | None = None) -> bytes:
    """Encode HxW (gray 8-bit or palette indices when ``palette`` is
    given) / HxWx3 / HxWx4 uint8 into a baseline TIFF. ``lzw`` selects
    Compression 5 (per-strip streams); ``predictor=2`` stores
    horizontal differences (only meaningful with lzw)."""
    if packbits and lzw:
        raise ValueError("tiff: pick one compression")
    bo = byteorder
    magic = b"II*\x00" if bo == "little" else b"MM\x00*"
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    if palette is not None:
        photo = 3
    elif photometric is not None:
        photo = photometric
    else:
        photo = 1 if spp == 1 else 2
    rps = rows_per_strip or h
    if predictor == 2:
        # per-row, per-channel horizontal differences (uint8 wraps)
        d = img.copy()
        if img.ndim == 2:
            d[:, 1:] -= img[:, :-1]
        else:
            d[:, 1:, :] -= img[:, :-1, :]
        img = d
    elif predictor != 1:
        raise ValueError(f"tiff: predictor {predictor}")
    strips = []
    flat = img.reshape(h, -1)
    for s0 in range(0, h, rps):
        rows = flat[s0:s0 + rps]
        if packbits:
            strips.append(b"".join(_packbits_encode(bytes(r))
                                   for r in rows))
        elif lzw:
            strips.append(_lzw_encode_tiff(rows.tobytes()))
        else:
            strips.append(rows.tobytes())

    def _n(v: int, nbytes: int) -> bytes:
        return int(v).to_bytes(nbytes, bo)

    entries = []  # (tag, type, count, value_bytes_or_int)
    extra = bytearray()  # out-of-line values, placed after the IFD
    hdr = 8
    data_off = hdr
    strip_offsets = []
    for s in strips:
        strip_offsets.append(data_off)
        data_off += len(s)
    ifd_off = data_off

    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(_T_WIDTH, 4, [w])
    add(_T_LENGTH, 4, [h])
    add(_T_BITS, 3, [8] * spp)
    add(_T_COMPRESSION, 3, [32773 if packbits else (5 if lzw else 1)])
    add(_T_PHOTOMETRIC, 3, [photo])
    if predictor == 2:
        add(_T_PREDICTOR, 3, [2])
    add(_T_STRIP_OFFSETS, 4, strip_offsets)
    add(_T_SAMPLES, 3, [spp])
    add(_T_ROWS_PER_STRIP, 4, [rps])
    add(_T_STRIP_COUNTS, 4, [len(s) for s in strips])
    if spp == 4:
        add(_T_EXTRA_SAMPLES, 3, [2])  # unassociated alpha
    if palette is not None:
        pal16 = (palette.astype(np.uint32) * 257)  # 8 -> 16 bit
        add(_T_COLORMAP, 3, list(pal16[:, 0]) + list(pal16[:, 1])
            + list(pal16[:, 2]))
    entries.sort()
    ifd = bytearray(_n(len(entries), 2))
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, vals in entries:
        sz = _TYPE_SIZE[typ]
        payload = b"".join(_n(v, sz) for v in vals)
        ifd += _n(tag, 2) + _n(typ, 2) + _n(len(vals), 4)
        if len(payload) <= 4:
            ifd += payload.ljust(4, b"\x00")
        else:
            ifd += _n(extra_off + len(extra), 4)
            extra += payload
    ifd += _n(0, 4)  # no next IFD
    return (magic + _n(ifd_off, 4) + b"".join(strips) + bytes(ifd)
            + bytes(extra))
