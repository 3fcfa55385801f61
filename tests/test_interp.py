"""Interpolation kernels vs np.interp (the reference's primitive,
``lib/libprop.py:355-358``)."""

import numpy as np
import jax.numpy as jnp

from msgwam_tpu.ops.interp import basis_interp, grid_interp, interp, uniform_interp


def _case(rng, n_table=100, n_query=500, x0=500.0, dx=1000.0):
    xp = x0 + dx * np.arange(n_table)
    fp = rng.normal(size=n_table)
    # queries: interior, below, above, and exactly-on-grid points
    x = np.concatenate([
        rng.uniform(xp[0] - 2 * dx, xp[-1] + 2 * dx, n_query),
        xp[:5], [xp[0], xp[-1]],
    ])
    return x, xp, fp


def test_interp_matches_numpy(rng):
    x, xp, fp = _case(rng)
    expect = np.interp(x, xp, fp)
    np.testing.assert_allclose(np.asarray(interp(x, xp, fp)), expect, rtol=1e-14)


def test_grid_interp_matches_numpy(rng):
    x, xp, fp = _case(rng)
    expect = np.interp(x, xp, fp)
    np.testing.assert_allclose(np.asarray(grid_interp(x, xp, fp)), expect, rtol=1e-13)


def test_uniform_interp_matches_numpy(rng):
    x, xp, fp = _case(rng)
    expect = np.interp(x, xp, fp)
    got = uniform_interp(x, xp[0], xp[1] - xp[0], fp)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12, atol=1e-12)


def test_basis_interp_matches_numpy(rng):
    """The MXU (hat-basis matmul) backend reproduces clamped linear
    interpolation."""
    x, xp, fp = _case(rng)
    expect = np.interp(x, xp, fp)
    got = basis_interp(x, xp[0], xp[1] - xp[0], fp)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12, atol=1e-12)
    # stacked tables in one matmul
    fp2 = np.stack([fp, 2 * fp + 1], axis=1)
    got2 = basis_interp(x, xp[0], xp[1] - xp[0], fp2)
    np.testing.assert_allclose(np.asarray(got2[:, 0]), expect, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(got2[:, 1]), np.interp(x, xp, fp2[:, 1]), rtol=1e-12, atol=1e-12
    )
