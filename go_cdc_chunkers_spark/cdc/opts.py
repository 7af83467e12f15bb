"""ChunkerOpts: option defaulting, Setup-time derivation, validation.

Mirrors the reference semantics exactly:
  - zero-field defaulting from per-algorithm defaults (chunkers.go:86-98,
    fastcdc.go:167-177);
  - FastCDC mask selection: fixed legacy masks for the legacy algorithms or
    the (2K, 8K, 64K) geometry, otherwise calculateMasks
    (fastcdc.go:92-122,179-184);
  - JC jump length + masks (jc.go:157-171);
  - per-algorithm Validate with identical error conditions/messages
    (fastcdc.go:195-223, ultracdc.go:72-87, jc.go:192-203, fixed.go:61-72);
  - fixed chunker's Setup forcing Min=Max=Normal and validating eagerly
    (fixed.go:49-59 -- the only algorithm whose construction validates).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace

_GIB = 1024 * 1024 * 1024
MASK64 = (1 << 64) - 1

# Fixed legacy masks (fastcdc.go:180-181, jc.go:167-168).
FASTCDC_LEGACY_MASK_S = 0x0003590703530000
FASTCDC_LEGACY_MASK_L = 0x0000D90003530000
JC_LEGACY_MASK_C = 0x590003570000
JC_LEGACY_MASK_J = 0x590003560000

# UltraCDC constants (ultracdc.go:109-117).
ULTRACDC_MASK_S = 0x2F
ULTRACDC_MASK_L = 0x2C
ULTRACDC_LEST = 64


class ChunkerError(ValueError):
    """Raised with the reference's error messages."""


@dataclass
class ChunkerOpts:
    min_size: int = 0
    max_size: int = 0
    normal_size: int = 0
    key: bytes | None = None


# Per-algorithm defaults (fastcdc.go:158-165, jc.go:183-190,
# ultracdc.go:60-66, fixed.go:40-47, fastcdc4stadia.go:46-52).
_DEFAULTS = {
    "fastcdc": (2 * 1024, 64 * 1024, 8 * 1024),
    "kfastcdc": (2 * 1024, 64 * 1024, 8 * 1024),
    "fastcdc-v1.0.0": (2 * 1024, 64 * 1024, 8 * 1024),
    "jc": (2 * 1024, 64 * 1024, 8 * 1024),
    "jc-v1.0.0": (2 * 1024, 64 * 1024, 8 * 1024),
    "jc-v1.1.0": (2 * 1024, 64 * 1024, 8 * 1024),
    "ultracdc": (2 * 1024, 64 * 1024, 10 * 1024),
    "ultracdc-v1.0.0": (2 * 1024, 64 * 1024, 10 * 1024),
    "fastcdc4stadia": (2 * 1024, 64 * 1024, 8 * 1024),
    "fixed-v1.0.0": (64 * 1024, 64 * 1024, 64 * 1024),
}

ALGORITHM_NAMES = tuple(_DEFAULTS)


def generate_spaced_mask(one_count: int, total_bits: int = 64) -> int:
    """fastcdc.go:105-122 / jc.go:91-108 (identical)."""
    if one_count >= total_bits:
        return MASK64
    if one_count <= 0:
        return 0
    step = total_bits // one_count
    mask = 0
    for i in range(one_count):
        pos = total_bits - 1 - i * step
        if pos >= 0:
            mask |= 1 << pos
    return mask


def calculate_masks(normal_size: int, normal_level: int) -> tuple[int, int]:
    """fastcdc.go:92-103."""
    bits = int(math.log2(float(normal_size)))
    return (
        generate_spaced_mask(bits + normal_level),
        generate_spaced_mask(bits - normal_level),
    )


def embed_mask(mask_c: int) -> int:
    """jc.go:110-116: unset the least significant 1-bit."""
    if mask_c == 0:
        return 0
    return mask_c & (mask_c - 1)


@dataclass(frozen=True)
class ResolvedOpts:
    """Options after defaulting + Setup derivation; what kernels consume."""

    algorithm: str
    min_size: int
    max_size: int
    normal_size: int
    key: bytes | None = None
    # FastCDC family
    mask_s: int = 0
    mask_l: int = 0
    # JC family
    mask_c: int = 0
    mask_j: int = 0
    jump_length: int = 0
    # flags
    legacy: bool = False
    spec_faithful: bool = False
    keyed: bool = False


_FLAGS = {
    # name -> (legacy, spec_faithful, keyed)
    "fastcdc": (True, False, False),
    "kfastcdc": (True, False, True),
    "fastcdc-v1.0.0": (False, False, False),
    "jc": (True, False, False),
    "jc-v1.0.0": (False, False, False),
    "jc-v1.1.0": (True, True, False),
    "ultracdc": (False, False, False),
    "ultracdc-v1.0.0": (False, True, False),
    "fastcdc4stadia": (False, False, False),
    "fixed-v1.0.0": (False, False, False),
}


def resolve(algorithm: str, opts: ChunkerOpts | None = None) -> ResolvedOpts:
    """newChunker's defaulting (chunkers.go:86-98) + per-algo Setup."""
    if algorithm not in _DEFAULTS:
        raise ChunkerError("unknown algorithm")
    dmin, dmax, dnormal = _DEFAULTS[algorithm]
    if opts is None:
        opts = ChunkerOpts()
    min_size = opts.min_size or dmin
    max_size = opts.max_size or dmax
    normal_size = opts.normal_size or dnormal
    legacy, spec, keyed = _FLAGS[algorithm]

    r = ResolvedOpts(
        algorithm=algorithm,
        min_size=min_size,
        max_size=max_size,
        normal_size=normal_size,
        key=opts.key,
        legacy=legacy,
        spec_faithful=spec,
        keyed=keyed,
    )

    fam = family(algorithm)
    if fam in ("fastcdc", "kfastcdc"):
        if legacy or (min_size == 2048 and max_size == 65536 and normal_size == 8192):
            mask_s, mask_l = FASTCDC_LEGACY_MASK_S, FASTCDC_LEGACY_MASK_L
        else:
            mask_s, mask_l = calculate_masks(normal_size, 2)
        r = replace(r, mask_s=mask_s, mask_l=mask_l)
    elif fam == "jc":
        bits = int(math.log2(float(normal_size)))
        c_ones = bits - 1
        j_ones = c_ones - 1
        jump = (1 << (c_ones + j_ones)) // ((1 << c_ones) - (1 << j_ones))
        if legacy or (min_size == 2048 and max_size == 65536 and normal_size == 8192):
            mask_c, mask_j = JC_LEGACY_MASK_C, JC_LEGACY_MASK_J
        else:
            mask_c = generate_spaced_mask(c_ones)
            mask_j = embed_mask(mask_c)
        r = replace(r, mask_c=mask_c, mask_j=mask_j, jump_length=jump)
    elif fam == "fixed":
        # fixed.go:49-59: Min/Max track NormalSize; Setup validates eagerly.
        r = replace(r, min_size=normal_size, max_size=normal_size)
        validate(r)
    return r


def family(algorithm: str) -> str:
    if algorithm in ("fastcdc", "fastcdc-v1.0.0"):
        return "fastcdc"
    if algorithm == "kfastcdc":
        return "kfastcdc"
    if algorithm.startswith("jc"):
        return "jc"
    if algorithm.startswith("ultracdc"):
        return "ultracdc"
    if algorithm == "fastcdc4stadia":
        return "stadia"
    if algorithm == "fixed-v1.0.0":
        return "fixed"
    raise ChunkerError("unknown algorithm")


def validate(r: ResolvedOpts) -> None:
    """Per-algorithm Validate with the reference's exact conditions."""
    fam = family(r.algorithm)
    if fam == "fixed":
        # fixed.go:61-72
        if r.normal_size < 64 or r.normal_size > _GIB:
            raise ChunkerError("ChunkSize is required and must be 64B <= ChunkSize <= 1GB")
        if r.normal_size & (r.normal_size - 1):
            raise ChunkerError("ChunkSize must be a power of two")
        if r.min_size != r.normal_size or r.max_size != r.normal_size:
            raise ChunkerError(
                "a fixed chunker uses a single size: MinSize and MaxSize must equal NormalSize"
            )
        return

    # Shared shape checks (fastcdc.go:195-207, ultracdc.go:72-87, jc.go:192-203,
    # fastcdc4stadia.go:54-65 -- textually identical).
    if r.normal_size == 0 or r.normal_size < 64 or r.normal_size > _GIB:
        raise ChunkerError("NormalSize is required and must be 64B <= NormalSize <= 1GB")
    if r.min_size < 64 or r.min_size > _GIB or r.min_size >= r.normal_size:
        raise ChunkerError(
            "MinSize is required and must be 64B <= MinSize <= 1GB && MinSize < NormalSize"
        )
    if r.max_size < 64 or r.max_size > _GIB or r.max_size <= r.normal_size:
        raise ChunkerError(
            "MaxSize is required and must be 64B <= MaxSize <= 1GB && MaxSize > NormalSize"
        )

    if fam in ("fastcdc", "kfastcdc"):
        # fastcdc.go:205-222 (note: the reference checks pow2 + normalLevel
        # bounds + a MinSize-derived bit count, and requires a key when keyed).
        if r.normal_size & (r.normal_size - 1):
            raise ChunkerError("NormalSize must be a power of two")
        normal_level = 2
        if normal_level < 0 or normal_level >= 32:
            raise ChunkerError("NormalLevel must be between 0 and 31")
        bits = int(math.log2(float(r.min_size)))
        if bits < normal_level:
            raise ChunkerError("NormalSize must be at least 2^NormalLevel")
        if r.keyed and r.key is None:
            raise ChunkerError("key is required for keyed FastCDC")
