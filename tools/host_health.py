"""Quick host-health probe: prints a CPU throughput score (higher=better).

This sandbox VM suffers bursty hypervisor steal (identical Spark jobs vary
>20x between windows); scaling_bench results are only meaningful in a
healthy window.  Baseline on an uncontended host: score ~150+; degraded
windows measure <20.
"""
import time

import numpy as np

x = np.random.default_rng(0).integers(0, 1 << 62, size=20_000_000, dtype=np.int64).astype(np.uint64)


def probe() -> float:
    t0 = time.perf_counter()
    for _ in range(5):
        y = x * np.uint64(0xFF51AFD7ED558CCD)
        y ^= y >> np.uint64(33)
    return 100_000_000 / (time.perf_counter() - t0) / 1e6  # M elementwise ops/s


# median of 3: single point probes swing 3x within seconds on this VM
score = sorted(probe() for _ in range(3))[1]
print(f"{score:.0f}")
