"""One-client TPU worklist: every pending measurement in a single process.

The axon relay stalls ~25 min per NEW client (and has been returning
UNAVAILABLE for hours), so when a client finally gets through it should
answer everything at once:

1. coherence probe (tools/coherence_probe.py main): 1e5 horizon curve +
   W sweep at 8000 steps, 1e6 horizons + W sweep — does window fallback
   explain the 1e5 per-ray deficit, and what W wins at each size?
2. tier-2 measurement: bench run_one with window_cells2 in {64, 104} at
   1e5x8000 and 1e6x1000 — validates the span-study cost model
   (predicted 1.07-1.11x).

Prints one JSON line per measurement.  Run:
  nohup python tools/tpu_worklist.py > /tmp/tpu_worklist.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from coherence_probe import main as probe_main

    print(json.dumps({"phase": "coherence_probe"}), flush=True)
    probe_main()

    from bench import run_one

    print(json.dumps({"phase": "tier2"}), flush=True)
    # ladders from the span-study brute force: (24,96) best at 1e5,
    # (16,96) at 1e6; 104 catches the 100-cell tail at this grid
    for n_ray, steps in ((100_000, 8000), (1_000_000, 1000)):
        for w1, w2 in ((0, 0), (0, 96), (0, 104), (24, 96)):
            r = run_one(n_ray, steps, "mega", w2=w2, w1=w1)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
