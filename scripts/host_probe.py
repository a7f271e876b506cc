"""Parallel-capacity host probe (VERDICT r5 #1, standalone because
bench.py is frozen for measurement this round).

The single-thread calibration probe in bench.py cannot see
parallel-capacity steal: a co-tenant burst can leave one thread at
full speed while 32-wide throughput drops 3-6x. This probe runs the
SAME fixed work (pure-Python XXH64 over a 64 KiB buffer) on N worker
PROCESSES simultaneously and reports:

  single_sec      one-process wall time (comparable to bench.py's probe)
  parallel_sec    wall time for N processes each doing the same work
  capacity        N * single_ref / parallel_sec -- effective parallel
                  speedup vs the pinned quiet-window single reference
  steal_factor    parallel_sec / single_sec -- 1.0 means N cores truly
                  available; >>1 means the host is stealing parallel
                  capacity even if single-thread looks quiet

Usage: python scripts/host_probe.py [N]   (default: cpu count)
Prints one JSON line. Run it immediately before/after a bench record
to attest the window; a future bench revision can inline it.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALIB_REF_SEC = 2.56  # bench.py's pinned quiet-window single-thread ref
_PASSES = 400


def _work(_i: int) -> float:
    from ais_etl_spark.transforms.builtin import xxhash64_py

    data = bytes(range(256)) * 256
    t0 = time.time()
    for _ in range(_PASSES):
        xxhash64_py(data, 42)
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 8)
    single = _work(0)
    ctx = mp.get_context("fork")
    t0 = time.time()
    with ctx.Pool(n) as pool:
        per_proc = pool.map(_work, range(n))
    parallel = time.time() - t0
    print(
        json.dumps(
            {
                "n_procs": n,
                "single_sec": round(single, 3),
                "single_drift": round(single / CALIB_REF_SEC, 3),
                "parallel_sec": round(parallel, 3),
                "per_proc_max": round(max(per_proc), 3),
                # effective parallel speedup vs quiet single ref: ~n
                # when n cores are truly available, << n under steal
                "capacity": round(n * CALIB_REF_SEC / parallel, 2)
                if parallel else None,
                "steal_factor": round(parallel / single, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
