"""Determinism checker.

Replaces base/include/determinism_checker.h / base/src/determinism_checker.cu
(hash_path_determinism_checker): order-insensitive checksums of arrays taken
mid-algorithm, so tests can assert that two runs of a setup phase produce
bit-identical intermediate state (used by aggregates_determinism_test.cu,
low_deg_determinism.cu). XLA itself is deterministic; this guards the
host-side graph algorithms (selectors, coloring, matching).
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np


def checksum(arr) -> int:
    """Order-insensitive 64-bit checksum of an array's contents."""
    a = np.asarray(arr)
    if a.dtype.kind == "f":
        a = a.astype(np.float64)
    elif a.dtype.kind in "iub":
        a = a.astype(np.int64)
    b = np.sort(a.reshape(-1).view(np.uint8).reshape(a.size, -1)
                .view([("", np.uint8)] * a.itemsize).ravel())
    return int.from_bytes(hashlib.sha256(b.tobytes()).digest()[:8], "little")


class DeterminismChecker:
    """Collects named checkpoints; compare two runs with ``matches``."""

    def __init__(self):
        self.points: List[tuple] = []

    def checkpoint(self, name: str, *arrays) -> None:
        self.points.append((name, tuple(checksum(a) for a in arrays)))

    def digest(self) -> int:
        h = hashlib.sha256()
        for name, sums in self.points:
            h.update(name.encode())
            for s in sums:
                h.update(s.to_bytes(8, "little"))
        return int.from_bytes(h.digest()[:8], "little")

    def matches(self, other: "DeterminismChecker") -> bool:
        return self.points == other.points
