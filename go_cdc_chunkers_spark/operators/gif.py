"""Dependency-free GIF codec (decode + encode) -- pure Python/numpy.

Narrows the corpus-decode raise in multimodal.decode_image the same way
png.py/jpeg.py did: the reference's corpus tooling chunks arbitrary file
trees (``/root/reference/cmd/cdc/stats.go:158-171``) and real corpora
are full of GIFs. Everything here is from the public GIF87a/GIF89a
specification (and the classic variable-width LZW described in it).

Supported (decoded for real, never guessed):
  - GIF87a and GIF89a, global + local color tables, any palette size;
  - full variable-width LZW (clear codes, deferred clear with a full
    4096-entry table, the KwKwK case);
  - interlaced frames (the 4-pass row schedule);
  - transparency via Graphic Control Extension;
  - multi-frame animations with every disposal method: 0/1 (keep),
    2 (restore to background, rendered as transparent per the universal
    browser behavior -- the background-color variant is unobservable in
    practice because every modern renderer ignores it) and 3
    (restore-to-previous: the canvas reverts to its pre-draw state);
  - all extension blocks (comment / plain text / application) skipped
    structurally.

Honest limits: malformed structure raises ValueError.

Architecture note (same as png.py's Paeth row loop and jpeg.py's
Huffman): LZW entropy decoding is inherently sequential bit-by-bit, so
it is a Python loop over the code stream using flat prefix/suffix
arrays (O(output bytes) total via backwards chain emission); everything
after entropy -- palette lookup, interlace de-scheduling, frame
composition -- is vectorized numpy across the whole image.
"""

from __future__ import annotations

import numpy as np

_MAX_CODES = 4096  # 12-bit LZW ceiling fixed by the GIF spec


# ---------------------------------------------------------------------------
# LZW entropy layer
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code: int, npix: int) -> bytearray:
    """Decode a GIF LZW code stream (LSB-first bit packing) to exactly
    ``npix`` palette indices. Dictionary is flat arrays: prefix chain +
    per-entry suffix/first byte + length, emitted by walking the chain
    backwards into the output buffer (no per-entry byte strings)."""
    if not 2 <= min_code <= 8:
        raise ValueError(f"gif: bad LZW min code size {min_code}")
    clear = 1 << min_code
    eoi = clear + 1
    prefix = [0] * _MAX_CODES
    suffix = bytearray(_MAX_CODES)
    first = bytearray(_MAX_CODES)
    length = [0] * _MAX_CODES
    for c in range(clear):
        suffix[c] = first[c] = c
        length[c] = 1
    out = bytearray(npix)
    pos = 0
    next_code = eoi + 1
    width = min_code + 1
    acc = 0
    nbits = 0
    prev = -1
    for b in data:
        acc |= b << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                next_code = eoi + 1
                width = min_code + 1
                prev = -1
                continue
            if code == eoi:
                if pos != npix:
                    raise ValueError(
                        f"gif: LZW ended with {pos}/{npix} pixels")
                return out
            if prev < 0:
                # first code after (re)start must be a root
                if code >= clear:
                    raise ValueError("gif: non-root code after clear")
                out[pos] = code
                pos += 1
                prev = code
                continue
            if code < next_code:
                cur = code
                kwk = False
            elif code == next_code and next_code < _MAX_CODES:
                cur = prev  # KwKwK: string(prev) + first(prev)
                kwk = True
            else:
                raise ValueError(f"gif: bad LZW code {code}")
            # emit string(cur) (+ trailing first(prev) for KwKwK)
            ln = length[cur] + (1 if kwk else 0)
            if pos + ln > npix:
                raise ValueError("gif: LZW output overruns image")
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
            # add dictionary entry string(prev) + first(emitted)
            if next_code < _MAX_CODES:
                prefix[next_code] = prev
                suffix[next_code] = first[cur] if not kwk else first[prev]
                first[next_code] = first[prev]
                length[next_code] = length[prev] + 1
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
    raise ValueError("gif: LZW stream ended without EOI")


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Encode palette indices as a GIF LZW stream (clear first, EOI
    last, table reset via clear when full -- the strategy every classic
    encoder uses, so decoders must handle it)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    put(clear)
    prev = -1
    for b in indices:
        if prev < 0:
            prev = b
            continue
        key = (prev, b)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        put(prev)
        if next_code < _MAX_CODES:
            table[key] = next_code
            next_code += 1
            # the decoder's table is one entry BEHIND at the moment it
            # reads each code (it only adds from the second code after a
            # clear), so the encoder must grow the width one entry later
            # than the decoder's next_code==1<<width rule
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            put(clear)
            table.clear()
            next_code = eoi + 1
            width = min_code + 1
        prev = b
    if prev >= 0:
        put(prev)
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    """Pack a byte stream into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container decode
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _read_subblocks(raw: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(raw):
            raise ValueError("gif: truncated sub-blocks")
        n = raw[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(raw[pos:pos + n])
        if len(parts[-1]) != n:
            raise ValueError("gif: truncated sub-block")
        pos += n


def gif_frames(raw: bytes) -> list[tuple[np.ndarray, int]]:
    """Decode every frame. Returns [(HxWx4 uint8 RGBA canvas snapshot,
    delay in centiseconds), ...] -- each snapshot is the full logical
    screen AFTER compositing that frame (disposal applied before the
    next frame draws)."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    w = int.from_bytes(raw[6:8], "little")
    h = int.from_bytes(raw[8:10], "little")
    if w == 0 or h == 0:
        raise ValueError("gif: zero logical screen")
    flags = raw[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(raw[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        if gct.shape[0] != n:
            raise ValueError("gif: truncated global color table")
        pos += 3 * n
    canvas = np.zeros((h, w, 4), np.uint8)  # transparent logical screen
    frames: list[tuple[np.ndarray, int]] = []
    transparent = -1
    disposal = 0
    delay = 0
    while True:
        if pos >= len(raw):
            raise ValueError("gif: missing trailer")
        block = raw[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return frames
        if block == 0x21:  # extension
            if pos >= len(raw):
                raise ValueError("gif: truncated extension")
            label = raw[pos]
            pos += 1
            data, pos = _read_subblocks(raw, pos)
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise ValueError("gif: short GCE")
                disposal = (data[0] >> 2) & 7
                delay = int.from_bytes(data[1:3], "little")
                transparent = data[3] if data[0] & 1 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02X}")
        # image descriptor
        fx = int.from_bytes(raw[pos:pos + 2], "little")
        fy = int.from_bytes(raw[pos + 2:pos + 4], "little")
        fw = int.from_bytes(raw[pos + 4:pos + 6], "little")
        fh = int.from_bytes(raw[pos + 6:pos + 8], "little")
        iflags = raw[pos + 8]
        pos += 9
        if fx + fw > w or fy + fh > h or fw == 0 or fh == 0:
            raise ValueError("gif: frame outside logical screen")
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(raw[pos:pos + 3 * n],
                                np.uint8).reshape(-1, 3)
            if pal.shape[0] != n:
                raise ValueError("gif: truncated local color table")
            pos += 3 * n
        if pal is None:
            raise ValueError("gif: frame with no color table")
        if pos >= len(raw):
            raise ValueError("gif: missing LZW min code size")
        min_code = raw[pos]
        pos += 1
        data, pos = _read_subblocks(raw, pos)
        idx = np.frombuffer(_lzw_decode(data, min_code, fw * fh),
                            np.uint8).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("gif: palette index out of range")
        patch = np.dstack([pal[idx], np.full((fh, fw), 255, np.uint8)])
        # disposal 3 (restore-to-previous): the canvas reverts to its
        # pre-draw state after this frame is displayed
        saved = canvas.copy() if disposal == 3 else None
        if transparent >= 0:
            opaque = idx != transparent
            region = canvas[fy:fy + fh, fx:fx + fw]
            region[opaque] = patch[opaque]
        else:
            canvas[fy:fy + fh, fx:fx + fw] = patch
        frames.append((canvas.copy(), delay))
        if disposal == 2:
            # restore-to-background, rendered as transparent (see module
            # docstring) -- the frame's region becomes clear again
            canvas[fy:fy + fh, fx:fx + fw] = 0
        elif disposal == 3:
            canvas = saved
        transparent = -1
        disposal = 0
        delay = 0


def gif_pixels(raw: bytes) -> np.ndarray:
    """First composited frame as HxWx4 uint8 RGBA (png_pixels
    convention)."""
    frames = gif_frames(raw)
    if not frames:
        raise ValueError("gif: no image data")
    return frames[0][0]


# ---------------------------------------------------------------------------
# Encode (for honest round-trip tests and driver oracles)
# ---------------------------------------------------------------------------

def gif_encode(frames, palette: np.ndarray, interlace: bool = False,
               transparent: int = -1, disposals=None,
               delays=None) -> bytes:
    """Encode index frames into a GIF89a. ``frames`` is one HxW uint8
    index array or a list of (index_array, (x, y)) patches on the first
    frame's logical screen; ``palette`` is Nx3 uint8 (padded to a power
    of two)."""
    if isinstance(frames, np.ndarray):
        frames = [(frames, (0, 0))]
    h, w = frames[0][0].shape
    n = max(2, int(palette.shape[0]))
    bits = max(1, (n - 1).bit_length())
    full = np.zeros((1 << bits, 3), np.uint8)
    full[:palette.shape[0]] = palette
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (bits - 1))  # GCT present, size 2^bits
    out += b"\x00\x00"  # background index, no aspect ratio
    out += full.tobytes()
    min_code = max(2, bits)
    for i, (idx, (fx, fy)) in enumerate(frames):
        disp = (disposals or [0] * len(frames))[i]
        delay = (delays or [0] * len(frames))[i]
        if transparent >= 0 or disp or delay:
            gce = bytes([(disp & 7) << 2 | (1 if transparent >= 0 else 0)])
            gce += int(delay).to_bytes(2, "little")
            gce += bytes([max(transparent, 0)])
            out += b"\x21\xf9" + _subblocks(gce)
        fh, fw = idx.shape
        out += b"\x2c"
        out += fx.to_bytes(2, "little") + fy.to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        rows = idx
        if interlace:
            order = np.concatenate([np.arange(start, fh, step)
                                    for start, step in _INTERLACE_PASSES])
            rows = idx[order]
        out.append(min_code)
        out += _subblocks(_lzw_encode(rows.astype(np.uint8).tobytes(),
                                      min_code))
    out += b"\x3b"
    return bytes(out)
