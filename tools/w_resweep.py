"""W1/W2 window re-sweep on SORTED multi-launch runs (VERDICT r4 #8).

The round-5 launch-sort measurements changed the data the champion
windows were tuned on: with the boundary re-sort on, the streaming
kernel's *internal* layout ends a 5000-step run at fallback rate 0.244
(1e6) / 0.072 (1e7) with ZERO exact full-width blocks — much more
coherent than the unsorted layouts the round-3 W1=16/W2=96 champions
were swept against.  More coherence means the W1→W2 tail is shorter and
shallower, so a narrower W2 (or W1) may now win: the roofline
(ROOFLINE_r05.json) shows the kernel 90% VPU-bound, so the only
remaining lever is shrinking W_eff — exactly what this sweep measures.

Method: `bench.run_one` exactly as the sorted matrix rows run it
(mega backend, save_every=1000 multi-launch, launch_sort=on, fallback
diagnostics), sweeping (W1, W2) around the champions at 1e6 and 1e7.
Keep any >3% win; document the null otherwise.  Appends one JSON line
per config to ``benchmarks/W_RESWEEP_r05.jsonl`` (incremental: a crash
or OOM keeps completed rows).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

import bench

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "W_RESWEEP_r05.jsonl")

SWEEP = {
    1_000_000: [(16, 96), (16, 80), (16, 64), (16, 48),
                (12, 96), (12, 64), (24, 96), (16, 0)],
    10_000_000: [(16, 96), (16, 80), (16, 64), (16, 48),
                 (12, 96), (12, 64), (16, 0)],
}
STEPS = {1_000_000: 5000, 10_000_000: 3000}


def main(sizes=None):
    from msgwam_tpu.utils.xla import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    for n in (sizes or SWEEP):
        for w1, w2 in SWEEP[n]:
            try:
                r = bench.run_one(n, STEPS[n], "mega", fallback=True,
                                  w1=w1, w2=w2, save_every=1000,
                                  launch_sort="on")
            except Exception as e:  # OOM / compile failure: record and go on
                r = {"error": f"{type(e).__name__}: {e}"}
            r.update({"n_ray": n, "w1": w1, "w2": w2})
            with open(OUT, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(json.dumps({k: r.get(k) for k in
                              ("n_ray", "w1", "w2", "value",
                               "fallback_rate_end_internal",
                               "full_rate_end_internal", "error")}),
                  flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=None)
    a = ap.parse_args()
    main(a.sizes)
