"""Hardware scaling calibration for BENCH.md.

The sandbox's 32 vCPUs sit on an oversubscribed virtualized host: pure-CPU
work does NOT scale linearly with process count, independent of Spark.
This measures that ceiling so the pipeline's scaling efficiency can be
read against what the machine actually offers (a real 4N-executor cluster
adds nodes, not threads on one contended host).

Usage: python tools/cpu_calibration.py
Prints one JSON line: {"2": it_per_s, "8": ..., "16": ..., "32": ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

WORK = 60_000_000


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def main() -> None:
    out = {}
    for procs in (2, 8, 16, 32):
        per = WORK // procs
        with mp.Pool(procs) as pool:
            t0 = time.time()
            pool.map(burn, [per] * procs)
            dt = time.time() - t0
        out[str(procs)] = round(WORK / dt, 0)
    out["efficiency_2_to_8"] = round(out["8"] / (4 * out["2"]), 3)
    out["efficiency_8_to_32"] = round(out["32"] / (4 * out["8"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
