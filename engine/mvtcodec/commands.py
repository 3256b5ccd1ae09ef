"""MVT CommandInteger codec.

Semantics re-expressed from the reference's command codec
(/root/reference/internal/geometry/command.go:14-71): a CommandInteger packs
a 3-bit command id (MoveTo=1, LineTo=2, ClosePath=7) with a 29-bit repeat
count: ``(id & 0x7) | (count << 3)``; count must be <= 2^29 - 1.
"""

from __future__ import annotations

import numpy as np

MOVE_TO = 1
LINE_TO = 2
CLOSE_PATH = 7
VALID_IDS = frozenset({MOVE_TO, LINE_TO, CLOSE_PATH})
COUNT_MAX = 2**29 - 1  # reference command.go:67


def make_command(cmd_id: int, count) -> np.ndarray | int:
    """Pack (id, count) into a CommandInteger (reference command.go:38-43).

    ``count`` may be a scalar or numpy array; validation mirrors
    validateCommandInteger (command.go:60-71).
    """
    if cmd_id not in VALID_IDS:
        raise ValueError(f"invalid command ID, '{cmd_id}'")
    c = np.asarray(count, dtype=np.int64)
    if c.size and (bad := c.max()) > COUNT_MAX:
        raise ValueError(f"count exceeds maximum ({bad} > {COUNT_MAX})")
    if c.size and c.min() < 0:
        raise ValueError("count must be non-negative")
    packed = ((np.uint32(cmd_id) & np.uint32(0x7)) | (c.astype(np.uint32) << np.uint32(3)))
    return packed if packed.ndim else int(packed)


def command_id(words) -> np.ndarray:
    """Extract the command id: ``word & 0x7`` (reference command.go:46-48)."""
    return np.asarray(words, dtype=np.uint32) & np.uint32(0x7)


def command_count(words) -> np.ndarray:
    """Extract the repeat count: ``word >> 3`` (reference command.go:51-53)."""
    return np.asarray(words, dtype=np.uint32) >> np.uint32(3)


def validate_command(words) -> None:
    """Vectorized validateCommandInteger (reference command.go:60-71)."""
    w = np.asarray(words, dtype=np.uint32)
    ids = w & np.uint32(0x7)
    ok = (ids == MOVE_TO) | (ids == LINE_TO) | (ids == CLOSE_PATH)
    if not bool(ok.all()):
        bad = int(ids[~ok].flat[0])
        raise ValueError(f"invalid command ID, '{bad}'")
    # count <= 2^29-1 holds for any uint32 >> 3; nothing further to check.
