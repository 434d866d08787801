"""Host-contention probe: fixed arithmetic and fixed memory-streaming
work in 1 process and in 32 concurrent processes. On a quiet 32-core
box the 32-proc readings match the single readings; elevated ratios
mean a co-tenant is stealing cycles (alu) or DRAM bandwidth (mem) and
any absolute bench numbers taken nearby are suspect. The ER kernels
are memory-bandwidth-hungry, so `mem_ratio` is the better gate for
bench runs (BENCH.md's DRAM-contention analysis)."""

import time
from multiprocessing import Pool

import numpy as np


def spin(_):
    s = 0
    for i in range(20_000_000):
        s += i * i
    return s


def stream(_):
    a = np.empty(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    a.fill(1.0)
    s = 0.0
    for _ in range(4):
        s += float(a.sum())
    return s


if __name__ == "__main__":
    t0 = time.time(); spin(0); alu1 = time.time() - t0
    t0 = time.time(); stream(0); mem1 = time.time() - t0
    with Pool(32) as p:
        t0 = time.time(); p.map(spin, range(32)); alu32 = time.time() - t0
        t0 = time.time(); p.map(stream, range(32)); mem32 = time.time() - t0
    print(
        f"alu single={alu1:.2f}s procs32={alu32:.2f}s ratio={alu32/alu1:.2f} | "
        f"mem single={mem1:.2f}s procs32={mem32:.2f}s mem_ratio={mem32/mem1:.2f}"
    )
