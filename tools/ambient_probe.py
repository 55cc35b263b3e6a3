"""Ambient host-state probe (round 16): the sandbox host showed
10-17 % CPU steal and multi-second all-process stall windows during
this round, drifting on a ~tens-of-minutes scale — enough to swamp
sub-second bench entries. This probe times a fixed CPU+allocation
workload (single-thread and 8-way) so measurement batteries can be
scheduled into calm windows and adjudications can cite the ambient
state they ran under.

Usage: python tools/ambient_probe.py            # one reading
"""
from __future__ import annotations

import multiprocessing as mp
import time


def _work(_):
    import numpy as np
    t0 = time.monotonic()
    rng = np.random.default_rng(0)
    for _ in range(6):
        a = rng.normal(size=(136, 136, 136))
        b = a * 1.00001
        c = b.tobytes()
        del a, b, c
    return time.monotonic() - t0


def main() -> None:
    t1 = _work(0)
    with mp.Pool(8) as p:
        r8 = p.map(_work, range(8))
    print(f"ambient: single={t1:.2f}s  8way_med={sorted(r8)[4]:.2f}s "
          f"8way_max={max(r8):.2f}s  (calm ≈ 0.4/0.45/0.5)")


if __name__ == "__main__":
    main()
