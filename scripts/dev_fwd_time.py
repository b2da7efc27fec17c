"""Quick forward-render slope timing (no profiler): prints ms/frame."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    forward, w, h = bench.build(pair_capacity=cap)
    f, fargs = forward("pallas")
    t0 = time.time()
    dt = bench.time_fn(f, fargs)
    print(f"forward: {dt*1e3:.2f} ms/frame ({w*h/dt/1e6:.2f} Mpix/s) "
          f"[wall {time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
