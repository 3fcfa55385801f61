"""Smoke test for the spectrum-inversion example: a short adjoint
optimization through the coupled simulation must reduce the misfit and
start recovering the hidden per-ray pattern (examples/source_inversion.py
runs the full-size version; this is a scaled-down deterministic check
that the end-to-end gradient actually carries usable information)."""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

optax = pytest.importorskip("optax")


def _load_example():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "source_inversion.py")
    spec = importlib.util.spec_from_file_location("source_inversion", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spectrum_inversion_gradient_recovers_pattern():
    si = _load_example()
    # scale the problem down for CI
    si.N_RAY, si.N_STEPS, si.N_FRAMES = 100, 60, 6
    simulate_wind = si.build_problem()
    truth = si.hidden_pattern(si.N_RAY)
    observed = simulate_wind(truth)
    frame_scale = jnp.sum(observed * observed, axis=-1) + 1e-30

    def loss_fn(log_amp):
        diff = simulate_wind(log_amp) - observed
        return (jnp.sum(jnp.sum(diff * diff, axis=-1) / frame_scale)
                + 1e-4 * jnp.mean(log_amp * log_amp))

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))
    params = jnp.zeros(si.N_RAY)
    opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(0.3))
    opt_state = opt.init(params)
    loss0, g0 = value_and_grad(params)
    assert np.isfinite(float(loss0))
    assert np.all(np.isfinite(np.asarray(g0)))
    loss = loss0
    for _ in range(25):
        loss, grads = value_and_grad(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)

    corr = float(jnp.corrcoef(params, truth)[0, 1])
    assert float(loss) < 0.3 * float(loss0), (float(loss0), float(loss))
    assert corr > 0.5, corr
