"""Quick train-step slope timing (no profiler): prints ms/step.

Usage: python scripts/dev_train_time.py [pair_capacity]
Uses bench.build_train + bench.time_train (chained input-perturbed steps,
min-of-reps slope) — the same methodology as bench.py, minus the forward
benches. ~3 min including compile; use dev_train_prof.py when per-op
attribution is needed (that one costs ~20 min through the tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    raw_step, state, aux, batch, knn_cache = bench.build_train(
        pair_capacity=cap)
    t0 = time.time()
    dt = bench.time_train(raw_step, state, aux, batch, knn_cache)
    print(f"pair_capacity={cap}: {dt*1e3:.2f} ms/step "
          f"({1.0/dt:.1f} steps/s) [wall {time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
