"""Hilbert curve index (locality-preserving sort key for kNN, SURVEY B7).

Vectorized xy->d and d->xy for an order-``z`` Hilbert curve over the
2^z x 2^z tile grid. Classic bit-twiddling algorithm (public domain,
cf. Wikipedia "Hilbert curve" C implementation), vectorized over arrays.
"""

from __future__ import annotations

import numpy as np


def xy2d(z: int, x, y) -> np.ndarray:
    """Hilbert distance of (x, y) on the order-z curve. Vectorized."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(np.broadcast(x, y).shape, dtype=np.int64)
    x, y = np.broadcast_arrays(x, y)
    x, y = x.copy(), y.copy()
    s = np.int64(1 << (z - 1)) if z > 0 else np.int64(0)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_flip = y[flip]
        y[flip] = s - 1 - y_flip
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        s >>= 1
    return d


def d2xy(z: int, d) -> tuple[np.ndarray, np.ndarray]:
    """Inverse: Hilbert distance -> (x, y). Vectorized."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros(t.shape, dtype=np.int64)
    y = np.zeros(t.shape, dtype=np.int64)
    s = np.int64(1)
    n = np.int64(1 << z)
    while s < n:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_f = y[flip]
        y[flip] = s - 1 - y_f
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y
