"""Algorithm registry (reference chunkers.go:59-67 / D6).

Maps the reference's 10 registered names to their kernel entry points.
Like the reference, registering a duplicate name is an error
(chunkers.go:62-63: "algorithm already registered").
"""

from __future__ import annotations

from collections.abc import Callable

from . import kernels
from .opts import ALGORITHM_NAMES, ChunkerError, ChunkerOpts, resolve


class _Registry:
    def __init__(self) -> None:
        self._impl: dict[str, Callable] = {}

    def register(self, name: str, fn: Callable) -> None:
        if name in self._impl:
            raise ChunkerError("algorithm already registered")
        self._impl[name] = fn

    def names(self) -> tuple[str, ...]:
        return tuple(self._impl)

    def split_lengths(self, name: str, data: bytes, opts: ChunkerOpts | None = None):
        if name not in self._impl:
            raise ChunkerError("unknown algorithm")
        return self._impl[name](resolve(name, opts), data)

    def __contains__(self, name: str) -> bool:
        return name in self._impl


ALGORITHMS = _Registry()
for _name in ALGORITHM_NAMES:
    ALGORITHMS.register(_name, lambda r, data: kernels.split_lengths(r, data))
