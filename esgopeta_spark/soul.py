"""Soul (node-id) generation.

Reference: gun/node.go:14-21 ``DefaultSoulGen`` — base36(unix ms), plus
base36 of a process-unique nano counter when the same millisecond is
reused (gun/util.go:43-61), plus 12 random chars.  We keep the same
shape (sortable time prefix + collision-proof suffix) because it is a
good distributed-id design: ids generated on many executors never
collide and stay roughly time-ordered.

For *deterministic tests* use ``soul_gen(seed=...)`` which swaps the
random suffix for a counter.
"""

from __future__ import annotations

import random
import string
import threading
import time

_ALPHABET = string.ascii_lowercase + string.digits
_B36 = string.digits + string.ascii_lowercase

_lock = threading.Lock()
_last_ms = 0
_unique = 0


def _base36(n: int) -> str:
    if n == 0:
        return "0"
    out = []
    while n:
        n, r = divmod(n, 36)
        out.append(_B36[r])
    return "".join(reversed(out))


def _now_unique_ms() -> tuple[int, int]:
    """Monotonic (ms, unique) pair — mirrors gun/util.go:46-61."""
    global _last_ms, _unique
    ms = int(time.time() * 1000)
    with _lock:
        if ms == _last_ms:
            _unique += 1
            return ms, _unique
        _last_ms = ms
        _unique = 0
        return ms, 0


def default_soul_gen(rng: random.Random | None = None) -> str:
    ms, unique = _now_unique_ms()
    s = _base36(ms)
    if unique > 0:
        s += _base36(unique)
    r = rng if rng is not None else random
    return s + "".join(r.choice(_ALPHABET) for _ in range(12))


class SoulGen:
    """Callable soul generator; seedable for reproducible tests."""

    def __init__(self, seed: int | None = None):
        self._rng = random.Random(seed) if seed is not None else None
        self._seq = 0
        self._seeded = seed is not None

    def __call__(self) -> str:
        if self._seeded:
            self._seq += 1
            return f"soul{self._seq:06d}" + "".join(
                self._rng.choice(_ALPHABET) for _ in range(6)
            )
        return default_soul_gen()
