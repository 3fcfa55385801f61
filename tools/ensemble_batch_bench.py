"""Measure the one-launch ensemble after batching the per-member
stage-boundary work (stage tables + flux->wind) into one kernel body per
stage boundary.

Prior measurement (benchmarks/RESULTS.md, tile-height section): the 8x125k
one-launch ensemble ran at 848.7 us/step (1.178e9 ray-steps/s); the
identified ~165 us/step gap to a flat 1e6 single-member run (657 us) was
the 48 scattered per-member stage-boundary bodies this change batches.

Run:  python tools/ensemble_batch_bench.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA_FLAGS (while-loop-unroller off) is set by the imported module before
# it initializes jax
from tools.stream_tile_more import ensemble_case, lifecycle_case  # noqa: E402

if __name__ == "__main__":
    for tr in (64, 128):
        ensemble_case(tile_rows=tr)
    lifecycle_case(tile_rows=64)
