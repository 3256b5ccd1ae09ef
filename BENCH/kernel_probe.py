"""Kernel-attribution probe for the pyramid ENCODE stage (VERDICT r6 #1).

Runs the ACTUAL engine encode kernel (fastpoints.encode_point_tiles_sorted_raw)
inside the same harness shape as BENCH/transport_probe.py — a parent process
streams fixed-size framed batches over an OS pipe, P workers split a FIXED
total batch count — alternated with a NO-OP kernel (column reduce only).
The kernel-attributable cost at parallelism P is t(kernel, P) - t(noop, P);
its 2->8 efficiency answers the question the transport probe could only
bound: does the ENGINE KERNEL scale on this host, or is the residual the
VM's transport/fault ceiling?

Batches mirror the real pyramid encode input: 16384 rows per batch
(= spark.sql.execution.arrow.maxRecordsPerBatch) of (fid, qx, qy, lang-code)
int64 columns, grouped into ~22-row tiles (the sf0.1 z0-14 tile mean), lang
pre-factorized to 5 uniques — the exact call signature the mapInArrow
worker makes (pre-factorized tag codes, flat-buffer output).

Usage: python BENCH/kernel_probe.py [total_batches] -> one JSON line per
(P, pass, kernel); two interleavings per config, min taken.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 16384
TILE_ROWS = 22
N_TILES = ROWS // TILE_ROWS  # last tile absorbs the remainder
UNIQS = ["en", "de", "fr", "es", "pt"]
TOTAL_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def _make_batch_bytes() -> bytes:
    rng = np.random.default_rng(7)
    fid = np.sort(rng.integers(0, 1 << 62, ROWS)).astype(np.int64)
    qx = rng.integers(0, 4096, ROWS).astype(np.int64)
    qy = rng.integers(0, 4096, ROWS).astype(np.int64)
    codes = rng.integers(0, len(UNIQS), ROWS).astype(np.int64)
    return b"".join(a.tobytes() for a in (fid, qx, qy, codes))


def _counts() -> np.ndarray:
    counts = np.full(N_TILES, TILE_ROWS, dtype=np.int64)
    counts[-1] += ROWS - TILE_ROWS * N_TILES
    return counts


def _worker(n_batches: int, batch_bytes: int, warm: bool, use_kernel: bool, q):
    from engine.mvtcodec import fastpoints

    counts = _counts()
    payload = _make_batch_bytes()
    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:  # feeder: stream the framed batch n times
        os.close(r)
        mv = memoryview(payload)
        for _ in range(n_batches):
            off = 0
            while off < len(mv):
                off += os.write(w, mv[off : off + (1 << 20)])
        os.close(w)
        os._exit(0)
    os.close(w)
    sink = 0
    reuse = bytearray(batch_bytes) if warm else None
    col = ROWS * 8
    t0 = time.perf_counter()
    for _ in range(n_batches):
        buf = reuse if warm else bytearray(batch_bytes)
        view = memoryview(buf)
        got = 0
        while got < batch_bytes:
            got += os.readv(r, [view[got:]])
        fid = np.frombuffer(buf, dtype=np.int64, count=ROWS, offset=0)
        qx = np.frombuffer(buf, dtype=np.int64, count=ROWS, offset=col)
        qy = np.frombuffer(buf, dtype=np.int64, count=ROWS, offset=2 * col)
        codes = np.frombuffer(buf, dtype=np.int64, count=ROWS, offset=3 * col)
        if use_kernel:
            out, starts, total = fastpoints.encode_point_tiles_sorted_raw(
                counts, fid, qx, qy,
                {"lang": ("string", (codes, UNIQS))}, "pages", 4096,
            )
            sink += len(out) + int(starts[-1]) + int(total[-1])
        else:
            sink += int(fid.sum()) + int(qx.sum()) + int(qy.sum()) + int(codes.sum())
    dt = time.perf_counter() - t0
    os.close(r)
    os.waitpid(pid, 0)
    q.put((dt, sink))


def run(procs: int, warm: bool, use_kernel: bool) -> float:
    batch_bytes = ROWS * 8 * 4
    per = TOTAL_BATCHES // procs
    q = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(per, batch_bytes, warm, use_kernel, q))
        for _ in range(procs)
    ]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    outs = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "procs": procs,
                "pass": "warm" if warm else "cold",
                "kernel": "encode" if use_kernel else "noop",
                "wall_s": round(wall, 3),
                "worker_max_s": round(max(o[0] for o in outs), 3),
                "batches": TOTAL_BATCHES,
            }
        ),
        flush=True,
    )
    return wall


if __name__ == "__main__":
    mp.set_start_method("fork")
    best: dict[tuple, float] = {}
    for rep in range(2):  # alternate configs so host noise spreads evenly
        for warm in (False, True):
            for use_kernel in (True, False):
                for procs in (2, 8, 32):
                    wall = run(procs, warm, use_kernel)
                    k = (procs, warm, use_kernel)
                    best[k] = min(best.get(k, wall), wall)
    for warm in (False, True):
        label = "warm" if warm else "cold"
        deltas = {}
        for procs in (2, 8, 32):
            deltas[procs] = best[(procs, warm, True)] - best[(procs, warm, False)]
        eff_28 = deltas[2] / (4 * deltas[8]) if deltas[8] > 0 else float("nan")
        eff_832 = deltas[8] / (4 * deltas[32]) if deltas[32] > 0 else float("nan")
        print(
            json.dumps(
                {
                    "summary": f"kernel-attributable ({label})",
                    "delta_s": {str(p): round(d, 3) for p, d in deltas.items()},
                    "eff_2_8": round(eff_28, 3),
                    "eff_8_32": round(eff_832, 3),
                }
            ),
            flush=True,
        )
