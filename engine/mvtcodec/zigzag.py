"""ZigZag codec for MVT ParameterIntegers.

Semantics re-expressed from the reference's parameter codec
(/root/reference/internal/geometry/parameter.go:13-45): values are signed
int32, encoded as ``uint32((v << 1) ^ (v >> 31))`` with an arithmetic right
shift; the valid magnitude is ±(2^31 - 1) — the reference rejects -2^31
(parameter.go:30-37).

All functions are vectorized numpy kernels (no per-element Python).
"""

from __future__ import annotations

import numpy as np

PARAM_MAX = 2**31 - 1  # inclusive bound, reference parameter.go:31
PARAM_MIN = -(2**31 - 1)  # -2^31 is rejected, reference parameter.go:33


def zigzag(values: np.ndarray) -> np.ndarray:
    """Encode signed int32 values to unsigned zigzag form.

    Matches Go's ``uint32((v << 1) ^ (v >> 31))`` exactly, including wrap
    on the left shift (reference parameter.go:39-41).
    """
    v = np.asarray(values, dtype=np.int64)
    out = np.empty(v.shape, dtype=np.uint32)
    v32 = v.astype(np.int32)  # wraps like Go for in-range inputs
    with np.errstate(over="ignore"):
        np.bitwise_xor(
            np.left_shift(v32, 1), np.right_shift(v32, 31), out=v32, casting="unsafe"
        )
    out[...] = v32.view(np.uint32)
    return out


def unzigzag(values: np.ndarray) -> np.ndarray:
    """Decode unsigned zigzag form back to signed int32.

    Matches Go's ``int32(((v >> 1) & 0xffffffff) ^ -(v & 1))`` (reference
    parameter.go:43-45).
    """
    v = np.asarray(values, dtype=np.uint32)
    half = (v >> np.uint32(1)).astype(np.int64)
    sign = -(v & np.uint32(1)).astype(np.int64)
    return np.bitwise_xor(half, sign).astype(np.int32)


def validate_parameter(values: np.ndarray) -> None:
    """Raise ValueError if any value is outside ±(2^31-1).

    Mirrors the reference's validateParameterInteger (parameter.go:30-37),
    which rejects -2^31 as "exceeds minimum".
    """
    v = np.asarray(values, dtype=np.int64)
    if v.size and (high := v.max()) > PARAM_MAX:
        raise ValueError(f"value exceeds maximum ({high} > {PARAM_MAX})")
    if v.size and (low := v.min()) < PARAM_MIN:
        raise ValueError(f"value exceeds minimum ({low} < {PARAM_MIN})")


def make_parameter(values: np.ndarray) -> np.ndarray:
    """Validate then zigzag-encode (reference MakeParameterInteger, :13-18)."""
    validate_parameter(values)
    return zigzag(values)
