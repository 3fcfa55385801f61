"""bench.py and __graft_entry__ stay importable and runnable (tiny sizes,
CPU) — guards the driver-facing entry points in CI."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_main_tiny(capsys):
    sys.path.insert(0, REPO)
    import bench

    bench.main(n_ray=512, n_steps=5)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    # the driver contract keys, plus optional extras (e.g. the embedded
    # 1e6 north-star measurement on full-size runs)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["value"] > 0


def test_graft_entry_single_chip():
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, statics = out
    assert state.rays.dens.shape == args[0].rays.dens.shape


def test_graft_dryrun_subprocess():
    # the axon TPU plugin ignores JAX_PLATFORMS=cpu (conftest.py); the
    # config-backed JAX_PLATFORM_NAME is the switch that actually pins the
    # subprocess to CPU — without it this test initializes the TPU relay
    # and can hang to the timeout on a contended/absent relay
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip OK" in r.stdout


def test_bench_subcommand_forwards_flags():
    """`python -m msgwam_tpu bench <flags>` forwards the flags to
    bench.cli; unknown `run` flags still error."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "msgwam_tpu", "bench",
         "--n-ray", "512", "--steps", "5", "--backend", "mxu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert "512" in payload["metric"] and "mxu" in payload["metric"]

    r2 = subprocess.run(
        [sys.executable, "-m", "msgwam_tpu", "run", "--bogus-flag"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    assert r2.returncode != 0
    assert "unrecognized arguments" in r2.stderr
