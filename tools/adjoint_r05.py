"""Full-length adjoint rows (VERDICT r4 #3i) → benchmarks/ADJOINT_r05.json.

Round 4 measured the adjoint only at 100 steps; the flagship claim is
differentiability of the COMPLETE experiment loop (raytracer.py:157-191),
so this runs `bench.run_grad` (two-level remat="full", the measured-
fastest schedule at every size) at:

  * 1e5 / 1e6 rays x 100 steps  — continuity with ADJOINT_r04.json
  * 1e6 rays x 720 steps        — a simulated day (dt=120 s)
  * 1e6 rays x 1440 steps       — the reference-length default experiment

run_grad picks save_every ~ sqrt(n_steps) (720→24, 1440→36), so peak
adjoint memory is (n_steps/save_every + save_every) state snapshots —
54 (720) / 76 (1440) at ~40 MB each at 1e6 rays, ~2-3 GB: comfortably
inside one chip.  The artifact is written incrementally after each row
(an OOM on a later row keeps the earlier measurements).
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
                   "benchmarks", "ADJOINT_r05.json")

ROWS = [
    # (n_ray, n_steps, alpha_scale[, backend]).  100-step rows at default
    # (continuity with ADJOINT_r04); full-day/full-experiment rows at
    # alpha_scale=0.1 — at default forcing the adjoint grows ~2x/step
    # past ~step 120 and overflows (measured; RESULTS.md round 5), so
    # the long-horizon rows run at a forcing where the day-long
    # linearization is bounded (timing is forcing-independent).  One
    # default-forcing 720-step row documents the divergence in-artifact.
    (100_000, 100, 1.0),
    (1_000_000, 100, 1.0),
    (100_000, 720, 0.1),
    (1_000_000, 720, 0.1),
    (1_000_000, 1440, 0.1),
    (1_000_000, 720, 1.0),
    # 1e7-ray capacity point: 64 steps is the largest sqrt-schedule that
    # fits 16 GB HBM (100 steps needs 20 state snapshots ~ 10.4 GB plus
    # working set — measured OOM at 19.3 GB); 64 -> 16 snapshots, fits
    (10_000_000, 64, 1.0),
    # pallasw-forward rows: the fused windowed kernel runs the primal and
    # both remat replays ~2.8x faster; the custom-vjp backward transposes
    # the equivalent XLA path either way.  Measured +26% end-to-end.
    # Long-horizon forcing is 0.05x here, not 0.1x: 0.1x sits on a knife
    # edge (mxu max|g| = 577 at 720 steps; the fused kernel's different
    # f32 rounding tips the same config non-finite), and halving the
    # forcing drops max|g| to 0.014 — measured, RESULTS.md round 5.
    (1_000_000, 100, 1.0, "pallasw"),
    (1_000_000, 720, 0.05, "pallasw"),
    (1_000_000, 1440, 0.05, "pallasw"),
    (10_000_000, 64, 1.0, "pallasw"),
]


def main():
    from msgwam_tpu.utils.xla import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    results = []
    for row in ROWS:
        n_ray, n_steps, scale = row[:3]
        backend = row[3] if len(row) > 3 else "mxu"
        try:
            r = bench.run_grad(n_ray, n_steps, remat="full",
                               alpha_scale=scale, backend=backend)
            if backend != "mxu":
                r["backend"] = backend
        except Exception as e:
            r = {"metric": f"adjoint at {n_ray:,} rays, {n_steps} steps",
                 "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(r), flush=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
