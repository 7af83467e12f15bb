"""ctypes loader for the scalar C chunking kernels (_native.c).

The numpy kernels (kernels.py) are fully vectorized but still cost ~17
vector ops per input byte (~50 MB/s/core on this machine); the same
per-byte logic as straight-line C runs 20-40x faster. _native.c is a 1:1
port of naive.py's reference semantics, compiled on first use with the
system gcc into a content-addressed .so under /tmp (atomic rename, safe
under concurrent Spark Python workers) and loaded with stdlib ctypes -- no
third-party packages, no network.

If no compiler is available (or SPARK_GRAFT_NO_NATIVE=1), available()
returns False and kernels.py silently uses the numpy path; both paths are
differentially tested against each other and against naive.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("_native.c")
_LIB = None
_TRIED = False

_U64P = ctypes.POINTER(ctypes.c_uint64)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_I64P = ctypes.POINTER(ctypes.c_int64)


def _read_source() -> bytes | None:
    """Read _native.c from the package -- works from a plain checkout AND
    from a spark-submit --py-files zip (zipimport exposes resources)."""
    try:
        return _SRC.read_bytes()
    except OSError:
        pass
    try:
        from importlib import resources

        return (resources.files(__package__) / "_native.c").read_bytes()
    except Exception:
        return None


def _build() -> ctypes.CDLL | None:
    if os.environ.get("SPARK_GRAFT_NO_NATIVE"):
        return None
    src = _read_source()
    if src is None:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    # Per-user 0700 cache dir, never a shared world-writable path: the .so
    # path is predictable from the public source hash, so a shared /tmp dir
    # would let another local user pre-plant a library that every Spark
    # worker dlopens. XDG cache if available, else a per-uid tmp dir.
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    if not os.path.isabs(base) or base.startswith("~"):
        base = os.path.join(tempfile.gettempdir(), f"go_cdc_native_uid{os.getuid()}")
    cache_dir = Path(base) / "go_cdc_native"
    so = cache_dir / f"cdc_{tag}.so"
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        os.chmod(cache_dir, 0o700)
        st = os.stat(cache_dir)
        if st.st_uid != os.getuid() or (st.st_mode & 0o022):
            return None  # someone else owns (or can write) the cache dir
    except OSError:
        return None
    if so.exists():
        st = os.stat(so)
        if st.st_uid != os.getuid():
            return None  # refuse to dlopen a library we did not build
    else:
        try:
            # compile from the read bytes (the package may live in a
            # --py-files zip where _SRC is not a real filesystem path)
            csrc = cache_dir / f".cdc_{tag}.{os.getpid()}.c"
            csrc.write_bytes(src)
            tmp = cache_dir / f".cdc_{tag}.{os.getpid()}.so"
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(csrc)],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)  # atomic: concurrent workers race safely
            csrc.unlink(missing_ok=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    lib.split_fastcdc.restype = ctypes.c_int64
    lib.split_fastcdc.argtypes = [
        _U8P, ctypes.c_int64, _U64P, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _I64P,
    ]
    lib.split_jc.restype = ctypes.c_int64
    lib.split_jc.argtypes = [
        _U8P, ctypes.c_int64, _U64P, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, _I64P,
    ]
    lib.split_ultracdc.restype = ctypes.c_int64
    lib.split_ultracdc.argtypes = [
        _U8P, ctypes.c_int64, _U8P, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int64,
        ctypes.c_int, _I64P,
    ]
    lib.split_stadia.restype = ctypes.c_int64
    lib.split_stadia.argtypes = [
        _U8P, ctypes.c_int64, _U64P, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, _I64P,
    ]
    lib.digest_poly128.restype = None
    lib.digest_poly128.argtypes = [
        _U8P, ctypes.c_int64, _I64P, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_uint64, _U64P,
    ]
    lib.rice_decode.restype = ctypes.c_int64
    lib.rice_decode.argtypes = [
        _U8P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int64, _I64P,
    ]
    lib.lpc_restore.restype = None
    lib.lpc_restore.argtypes = [
        _I64P, ctypes.c_int64, ctypes.c_int, _I64P, ctypes.c_int,
    ]
    lib.crc_bytes.restype = ctypes.c_uint32
    lib.crc_bytes.argtypes = [
        _U8P, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int, ctypes.c_uint32,
    ]
    return lib


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _build()
        _TRIED = True
    return _LIB


def available() -> bool:
    return _lib() is not None


def _as_u8(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.uint8)


def split_lengths_native(r, arr: np.ndarray, gear_table: np.ndarray | None):
    """Chunk lengths via the C kernels, or None when no native path applies
    (no compiler / unsupported family). `r` is a ResolvedOpts; `gear_table`
    is the uint64 Gear table for gear-hash families (None for ultracdc)."""
    from .opts import ULTRACDC_LEST, ULTRACDC_MASK_L, ULTRACDC_MASK_S, family
    from .tables import GEAR64, HAMMING_0xAA

    lib = _lib()
    if lib is None:
        return None
    fam = family(r.algorithm)
    n = len(arr)
    if n == 0:
        return []
    arr = _as_u8(arr)
    out = np.empty(n // max(r.min_size, 1) + 2, dtype=np.int64)
    data_p = arr.ctypes.data_as(_U8P)
    out_p = out.ctypes.data_as(_I64P)

    if fam in ("fastcdc", "kfastcdc"):
        g = np.ascontiguousarray(gear_table, dtype=np.uint64)
        cnt = lib.split_fastcdc(
            data_p, n, g.ctypes.data_as(_U64P), r.mask_s, r.mask_l,
            r.min_size, r.normal_size, r.max_size, out_p,
        )
    elif fam == "jc":
        g = np.ascontiguousarray(gear_table, dtype=np.uint64)
        cnt = lib.split_jc(
            data_p, n, g.ctypes.data_as(_U64P), r.mask_c, r.mask_j,
            r.min_size, r.normal_size, r.max_size, r.jump_length,
            int(r.spec_faithful), out_p,
        )
    elif fam == "ultracdc":
        lut = np.ascontiguousarray(HAMMING_0xAA, dtype=np.uint8)
        cnt = lib.split_ultracdc(
            data_p, n, lut.ctypes.data_as(_U8P), r.min_size, r.normal_size,
            r.max_size, ULTRACDC_MASK_S, ULTRACDC_MASK_L, ULTRACDC_LEST,
            int(r.spec_faithful), out_p,
        )
    elif fam == "stadia":
        g = np.ascontiguousarray(GEAR64, dtype=np.uint64)
        cnt = lib.split_stadia(
            data_p, n, g.ctypes.data_as(_U64P), r.min_size, r.normal_size,
            r.max_size, out_p,
        )
    else:
        return None
    return out[:cnt].tolist()


def rice_decode_native(buf_u8: np.ndarray, nbits: int, pos: int, k: int,
                       n: int):
    """Decode n rice(k) codes from an MSB-first bit stream (the FLAC
    residual hot loop, operators/flac.py). Returns (values int64[n],
    new bit position), None when no native path exists, or raises
    ValueError on truncation -- mirroring the Python reference."""
    lib = _lib()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.int64)
    newpos = lib.rice_decode(
        buf_u8.ctypes.data_as(_U8P), nbits, pos, k, n,
        out.ctypes.data_as(_I64P),
    )
    if newpos < 0:
        raise ValueError("flac: bitstream truncated in unary code")
    return out, int(newpos)


def lpc_restore_native(warmup, res, coefs, shift: int):
    """FLAC LPC inversion via C (operators/flac.py _undo_lpc semantics),
    or None when no native path exists."""
    lib = _lib()
    if lib is None:
        return None
    order = len(coefs)
    out = np.empty(order + len(res), dtype=np.int64)
    out[:order] = warmup
    out[order:] = res
    c = np.ascontiguousarray(list(coefs)[::-1], dtype=np.int64)
    lib.lpc_restore(
        out.ctypes.data_as(_I64P), len(res), order,
        c.ctypes.data_as(_I64P), shift,
    )
    return out


def crc_bytes_native(data: np.ndarray, tab: np.ndarray, width: int,
                     init: int = 0):
    """Table-driven CRC over a uint8 array (FLAC frame CRCs), or None
    when no native path exists. `tab` is the 256-entry uint32 table."""
    lib = _lib()
    if lib is None:
        return None
    data = _as_u8(data)
    tab = np.ascontiguousarray(tab, dtype=np.uint32)
    return int(lib.crc_bytes(
        data.ctypes.data_as(_U8P), len(data),
        tab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), width, init,
    ))


def digest_poly128_native(arr: np.ndarray, lengths, p1: int, p2: int):
    """(n_chunks, 2) uint64 digest words via the C kernel, or None when no
    native path exists."""
    lib = _lib()
    if lib is None:
        return None
    arr = _as_u8(arr)
    ln = np.ascontiguousarray(lengths, dtype=np.int64)
    out = np.empty((len(ln), 2), dtype=np.uint64)
    lib.digest_poly128(
        arr.ctypes.data_as(_U8P), len(arr), ln.ctypes.data_as(_I64P),
        len(ln), p1, p2, out.ctypes.data_as(_U64P),
    )
    return out
