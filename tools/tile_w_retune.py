"""Re-tune the window ladder at the new auto-selected streamed-tile sizes.

The W=16/W2=96 champions were measured at tile_rows=64; larger tiles merge
more rays per window so the optimum may shift.  Measures W1 x W2 grids at
1e6 (tile 128) and 1e7 (tile 256).  One JSON line per point.

Run:  nohup python tools/tile_w_retune.py > /tmp/w_retune.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

from tile_sweep import measure  # noqa: E402


def main():
    for w1, w2 in ((0, 96), (0, 128), (24, 96), (0, 0), (32, 0)):
        try:
            r = measure(1_000_000, 1000, 128, w1=w1, w2=w2)
        except Exception as e:
            r = {"n_ray": 1_000_000, "w1": w1, "w2": w2,
                 "error": str(e)[:160]}
        print(json.dumps(r), flush=True)
    for w1, w2 in ((0, 96), (0, 128), (24, 96), (24, 128)):
        try:
            r = measure(10_000_000, 300, 256, w1=w1, w2=w2)
        except Exception as e:
            r = {"n_ray": 10_000_000, "w1": w1, "w2": w2,
                 "error": str(e)[:160]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
