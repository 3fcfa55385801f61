"""Small-tile follow-up for the VMEM-resident megakernel at the 1e5 metric
of record: the prior sweep (tools/resident_tile_sweep.py) tried 64/128/256
rows and found 64 best — smaller tiles were never measured.  Mechanism
for a possible win: at 1e5, 46-54% of 8192-ray blocks fall to the exact
full-width path (span > W); halving the tile height tightens each tile's
union span, trading 2x per-tile fixed work (window-bound reduction, stage
glue, Kahan update) for fewer 128-cell fallback deposits.

Run:  python tools/resident_tile32.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA_FLAGS (while-loop-unroller off) is set by the imported module before
# it initializes jax
from tools.resident_tile_sweep import measure  # noqa: E402

if __name__ == "__main__":
    for t, w1 in ((32, 16), (32, 24), (32, 32), (16, 24)):
        try:
            r = measure(100_000, 2000, t, w1=w1)
        except Exception as e:
            r = {"n_ray": 100_000, "tile_rows": t, "w1": w1,
                 "error": str(e)[:160]}
        print(json.dumps(r), flush=True)
