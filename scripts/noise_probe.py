"""Host-contention probe: fixed arithmetic in 1 process and in 32
concurrent processes. On a quiet 32-core box the two readings are ~
equal; a 32-proc reading far above the single reading means the box is
contended and any absolute bench numbers taken nearby are suspect."""
import time, sys
from multiprocessing import Pool

def spin(_):
    s = 0
    for i in range(20_000_000):
        s += i * i
    return s

if __name__ == "__main__":
    t0 = time.time(); spin(0); single = time.time() - t0
    with Pool(32) as p:
        t0 = time.time(); p.map(spin, range(32)); many = time.time() - t0
    print(f"single={single:.2f}s procs32={many:.2f}s ratio={many/single:.2f}")
