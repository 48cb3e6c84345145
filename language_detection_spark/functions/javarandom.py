"""Pure-Python replica of ``java.util.Random`` (48-bit LCG).

The reference detector draws its feature samples and per-trial alpha jitter
from ``java.util.Random`` (Detector.java:310-320), optionally seeded via
``DetectorFactory.setSeed`` (DetectorFactory.java:210-213).  The generator's
algorithm is publicly specified in the JDK documentation; this replica
enables seeded runs that follow the reference's draw sequence.
"""

from __future__ import annotations

import math
import os

_MASK = (1 << 48) - 1
_MULT = 0x5DEECE66D
_ADD = 0xB


class JavaRandom:
    def __init__(self, seed: int | None = None) -> None:
        if seed is None:
            seed = int.from_bytes(os.urandom(6), "big")
        self.set_seed(seed)

    def set_seed(self, seed: int) -> None:
        self._seed = (seed ^ _MULT) & _MASK
        self._have_g = False
        self._next_g = 0.0

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * _MULT + _ADD) & _MASK
        r = self._seed >> (48 - bits)
        # sign-extend to Java int semantics
        if r >= 1 << (bits - 1) and bits == 32:
            r -= 1 << 32
        return r

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < 1 << 31:
                return val

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self) -> float:
        if self._have_g:
            self._have_g = False
            return self._next_g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        mul = math.sqrt(-2 * math.log(s) / s)
        self._next_g = v2 * mul
        self._have_g = True
        return v1 * mul
