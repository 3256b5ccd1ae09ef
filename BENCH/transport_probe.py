"""Arrow-transport-shaped scaling probe (no Spark): pins the pyramid
encode stage's residual 2->8 inefficiency on the host, not the plan.

Models exactly what the mapInArrow boundary does per task: a parent
process streams Arrow-IPC-framed batches over an OS pipe; each worker
reads the stream, materializes each batch's buffers (fresh allocations —
the cold path every first task of a worker pays), and reduces a column.
Total bytes are FIXED; workers split the batches evenly, so perfect
scaling halves wall time per doubling.

If the aggregate cold throughput does not scale from 2 to 8 workers while
the warm pass (same buffers re-read) does, the residual is the sandbox
VM's host-serialized first-touch page faults at the IPC boundary — the
same ceiling BENCH/encode_probe.py pinned for the encode kernel at 8->32.

Usage: python BENCH/transport_probe.py [total_mb] [batch_kb]
Prints one JSON line per (P, pass).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

TOTAL_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BATCH_KB = int(sys.argv[2]) if len(sys.argv) > 2 else 640  # ~16k rows x 40B


def _worker(n_batches: int, batch_bytes: int, warm: bool, q):
    src = np.random.default_rng(0).integers(0, 255, batch_bytes, dtype=np.uint8)
    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:  # feeder child: stream framed batches into the pipe
        os.close(r)
        mv = memoryview(src)
        for _ in range(n_batches):
            off = 0
            while off < len(mv):
                off += os.write(w, mv[off : off + 1 << 20])
        os.close(w)
        os._exit(0)
    os.close(w)
    sink = 0
    reuse = bytearray(batch_bytes) if warm else None
    t0 = time.perf_counter()
    for _ in range(n_batches):
        # cold: a fresh buffer per batch (what Arrow's allocator does on a
        # fresh worker); warm: reuse one already-faulted buffer
        buf = reuse if warm else bytearray(batch_bytes)
        view = memoryview(buf)
        got = 0
        while got < batch_bytes:
            got += os.readv(r, [view[got:]])
        arr = np.frombuffer(buf, dtype=np.int64)
        sink += int(arr.sum())  # touch every page, like a column reduce
    dt = time.perf_counter() - t0
    os.close(r)
    os.waitpid(pid, 0)
    q.put((dt, sink))


def run(procs: int, warm: bool) -> float:
    batch_bytes = BATCH_KB * 1024
    n_total = TOTAL_MB * 1024 * 1024 // batch_bytes
    per = n_total // procs
    q = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(per, batch_bytes, warm, q))
        for _ in range(procs)
    ]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    outs = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    worker_max = max(o[0] for o in outs)
    print(
        json.dumps(
            {
                "procs": procs,
                "pass": "warm" if warm else "cold",
                "wall_s": round(wall, 3),
                "worker_max_s": round(worker_max, 3),
                "mb": TOTAL_MB,
            }
        ),
        flush=True,
    )
    return wall


if __name__ == "__main__":
    mp.set_start_method("fork")
    for warm in (False, True):
        for procs in (2, 8, 32):
            run(procs, warm)
