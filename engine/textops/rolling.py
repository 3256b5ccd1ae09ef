"""Rabin-Karp rolling hash + winnowing fingerprints (numpy kernels).

The SQL fingerprint operator (analysis.fingerprint_sql) uses sha-derived
k-gram hashes for oracle parity; this module is the production-speed
rolling-hash path a 100 TB pipeline would run inside mapInPandas — O(n) per
document instead of O(n * k) hashing, pure numpy modular arithmetic.
"""

from __future__ import annotations

import numpy as np

B = 1_000_003          # polynomial base
P = 2_147_483_647      # modulus (2^31 - 1): products stay < 2^62 in int64


def kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """Polynomial hash of every k-gram: h(i) = sum c[i+j]*B^(k-1-j) mod P.

    Vectorized as k full-array Horner steps (k is small, ~16) — no Python
    loop over positions; all modular products stay < 2^62 in int64.
    """
    c = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    n = len(c)
    if n < k:
        return np.empty(0, dtype=np.int64)
    out = np.zeros(n - k + 1, dtype=np.int64)
    for j in range(k):
        out = (out * B + c[j : n - k + 1 + j]) % P
    return out


def winnow(hashes: np.ndarray, window: int) -> np.ndarray:
    """Winnowing: min of each `window` of consecutive k-gram hashes,
    deduplicated (classic Schleimer/Wilkerson/Aiken fingerprint set)."""
    if len(hashes) == 0:
        return hashes
    if len(hashes) < window:
        return np.unique(hashes.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(sw.min(axis=1))


def fingerprints(text: str, k: int = 16, window: int = 8) -> np.ndarray:
    return winnow(kgram_hashes(text.encode("utf-8"), k), window)
