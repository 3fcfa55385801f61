"""Projection kernel vs an independent NumPy double-loop oracle implementing
the documented semantics of ``lib/libprop.py:92-221`` (index arithmetic,
clamping, out-of-domain sentinel, |overlap| weights)."""

import numpy as np
import pytest
import jax.numpy as jnp

from msgwam_tpu.ops.dispersion import cg_r
from msgwam_tpu.ops.projection_pallas import project_pallas
from msgwam_tpu.ops.projection import (
    project,
    project_dense,
    project_interfaces,
    project_reference_variant,
    required_span,
)

BVF = 0.01


def oracle_cells(values, r_low, r_up, phase_vol, valid, grid):
    """Straight double-loop deposition with the reference's cell-index and
    weight rules."""
    values = np.atleast_2d(values)
    n_points = len(grid)
    n_cells = n_points - 1
    dz = grid[1] - grid[0]
    nzmax = n_points - 2
    out = np.zeros((values.shape[0], n_cells))
    for i in range(values.shape[1]):
        if valid is not None and not valid[i]:
            continue
        nlow = int(r_low[i] / dz)   # trunc toward zero
        nup = int(r_up[i] / dz + 1.0)
        if (nlow >= nzmax and nup >= nzmax) or (nlow <= 0 and nup <= 0):
            continue
        nlow = min(max(nlow, 0), nzmax)
        nup = min(max(nup, 0), nzmax)
        for c in range(nlow, nup):
            zmin = max(grid[c], r_low[i])
            zmax = min(grid[c + 1], r_up[i])
            w = abs(zmax - zmin) / dz * phase_vol[i]
            out[:, c] += w * values[:, i]
    return out


def oracle_interfaces(values, r_low, r_up, phase_vol, valid, grid):
    values = np.atleast_2d(values)
    n_points = len(grid)
    dz = grid[1] - grid[0]
    nzmax = n_points - 2
    out = np.zeros((values.shape[0], n_points))
    nlow = (r_low / dz).astype(int)
    nup = (r_up / dz + 1.0).astype(int)
    ood = ((nlow >= nzmax) & (nup >= nzmax)) | ((nlow <= 0) & (nup <= 0))
    nlow = np.clip(nlow, 0, nzmax)
    nup = np.clip(nup, 0, nzmax)
    ok = ~ood if valid is None else (~ood & valid)
    for nb in range(1, n_points - 1):
        idx = np.where((nlow < nb) & (nup > nb) & ok)[0]
        out[:, nb] = (values[:, idx] * phase_vol[idx]).sum(axis=1)
    return out


def _random_rays(rng, n, grid_max=100e3):
    """Random ray volumes: interior, straddling the edges, and fully out of
    domain on both sides."""
    r = rng.uniform(-10e3, grid_max + 10e3, n)
    dr = rng.uniform(10.0, 2500.0, n)
    vals = rng.normal(size=(2, n))
    pv = np.abs(rng.normal(size=n))
    valid = rng.random(n) > 0.1
    return vals, r - dr / 2, r + dr / 2, pv, valid


@pytest.mark.parametrize("backend", [project, project_dense])
@pytest.mark.parametrize("n_points", [101, 100])
def test_project_matches_oracle(rng, backend, n_points):
    grid = np.linspace(0.0 if n_points == 101 else 500.0, 100e3, n_points)
    vals, r_low, r_up, pv, valid = _random_rays(rng, 400)
    expect = oracle_cells(vals, r_low, r_up, pv, valid, grid)
    got = backend(
        jnp.asarray(vals), jnp.asarray(r_low), jnp.asarray(r_up),
        jnp.asarray(pv), jnp.asarray(valid), jnp.asarray(grid),
        max_span=required_span(2500.0, grid[1] - grid[0]),
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n_points", [101, 100])
def test_project_pallas_matches_oracle(rng, n_points):
    """The pallas TPU kernel (float32; interpret mode on CPU) against the
    float64 oracle at f32 tolerance."""
    grid = np.linspace(0.0 if n_points == 101 else 500.0, 100e3, n_points)
    vals, r_low, r_up, pv, valid = _random_rays(rng, 400)
    expect = oracle_cells(vals, r_low, r_up, pv, valid, grid)
    got = np.asarray(project_pallas(
        jnp.asarray(vals, jnp.float32), jnp.asarray(r_low, jnp.float32),
        jnp.asarray(r_up, jnp.float32), jnp.asarray(pv, jnp.float32),
        jnp.asarray(valid), jnp.asarray(grid, jnp.float32),
    ))
    scale = np.max(np.abs(expect)) + 1e-30
    assert np.max(np.abs(got - expect)) / scale < 2e-5


def test_project_valid_none(rng):
    grid = np.linspace(0.0, 100e3, 101)
    vals, r_low, r_up, pv, _ = _random_rays(rng, 100)
    expect = oracle_cells(vals, r_low, r_up, pv, None, grid)
    got = project(vals, r_low, r_up, pv, None, jnp.asarray(grid), max_span=5)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12, atol=1e-12)


def test_project_interfaces_matches_oracle(rng):
    grid = np.linspace(0.0, 100e3, 101)
    vals, r_low, r_up, pv, valid = _random_rays(rng, 300)
    expect = oracle_interfaces(vals, r_low, r_up, pv, valid, grid)
    got = project_interfaces(vals, r_low, r_up, pv, jnp.asarray(valid), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12, atol=1e-12)


def test_top_cell_never_receives(rng):
    """Reference quirk 4 (lib/libprop.py:127-135): indices clamp to
    len(grid)-2, so the top cell gets nothing even from rays inside it."""
    grid = np.linspace(0.0, 10e3, 11)  # cells 0..9, dz=1000
    r_low = np.array([9200.0])
    r_up = np.array([9800.0])
    vals = np.array([[1.0]])
    pv = np.array([1.0])
    got = np.asarray(project(vals, r_low, r_up, pv, None, jnp.asarray(grid), 4))
    assert got[0, -1] == 0.0
    expect = oracle_cells(vals, r_low, r_up, pv, None, grid)
    np.testing.assert_allclose(got, expect)


def test_wave_action_totals(rng):
    """Deposited wave action equals the column total for fully-interior
    rays (fractional overlaps sum to dr/dz per ray)."""
    grid = np.linspace(0.0, 100e3, 101)
    n = 50
    r = rng.uniform(5e3, 90e3, n)
    dr = rng.uniform(100.0, 1800.0, n)
    dens = np.abs(rng.normal(size=n)) + 0.1
    pv = np.ones(n)
    got = np.asarray(project(dens, r - dr / 2, r + dr / 2, pv, None, jnp.asarray(grid), 4))
    np.testing.assert_allclose(got.sum(), (dens * dr / 1000.0).sum(), rtol=1e-12)


@pytest.mark.parametrize("var", [0, 1, 2, 3, 4])
def test_reference_variants(rng, var, reference_libprop):
    """All five wave_projection variants against the actual reference."""
    lprop = reference_libprop
    lprop.set_model_setup(bvf=BVF)
    grid = np.linspace(0.0, 100e3, 101)
    n = 120
    r = rng.uniform(-5e3, 105e3, n)
    dr = rng.uniform(10.0, 2500.0, n)
    dens = np.abs(rng.normal(size=n))
    kk = rng.uniform(1e-5, 1e-3, n)
    ll = rng.uniform(-1e-3, 1e-3, n)
    mm = rng.uniform(-1e-2, -1e-4, n)
    dmm = np.abs(rng.normal(size=n)) * 1e-4
    dkk = np.ones(n) * 1e-4
    dll = np.ones(n) * 1e-4
    lam = np.zeros(n)
    phi = np.full(n, 0.3)
    args = (dens, lam, phi, r - dr / 2, r + dr / 2, kk, ll,
            mm - dmm / 2, mm + dmm / 2, dkk, dll, dmm, grid)
    expect = lprop.wave_projection(*args, var=var)
    got = project_reference_variant(*args, BVF, var=var, max_span=5)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-11, atol=1e-20)


@pytest.mark.parametrize("n", [100_000, 1_000_000])
def test_fast_mode_flux_accumulation_meets_target(rng, n):
    """The f32 fast path's deposit error vs the f64 oracle must stay under
    the 1e-6 north-star target at 1e5 and 1e6 rays (VERDICT r1 item 1).
    'native' f32 summation violates it at 1e6; the blockwise 'compensated'
    and 'f64' modes restore ~1e-7."""
    from msgwam_tpu.ops.projection import project, project_dense

    # realistic population, forced exactly f32-representable so the
    # comparison isolates computation error from input representation
    r = rng.uniform(1e3, 80e3, n).astype(np.float32)
    dr = rng.uniform(300.0, 900.0, n).astype(np.float32)
    vals = (rng.lognormal(0.0, 1.0, n) * rng.uniform(0.1, 1.0, n) * 0.12) \
        .astype(np.float32)[None, :]
    pv = np.abs(rng.normal(1e-12, 1e-13, n)).astype(np.float32)
    grid = np.linspace(0.0, 100e3, 101)
    rl, ru = r - 0.5 * dr, r + 0.5 * dr

    oracle = np.asarray(project(
        jnp.asarray(vals, jnp.float64), jnp.asarray(rl, jnp.float64),
        jnp.asarray(ru, jnp.float64), jnp.asarray(pv, jnp.float64),
        None, jnp.asarray(grid), max_span=4,
    ))
    scale = np.max(np.abs(oracle))

    f = jnp.asarray
    g32 = jnp.asarray(grid, jnp.float32)

    def err(accum):
        fast = np.asarray(project_dense(
            f(vals), f(rl), f(ru), f(pv), None, g32, accum=accum,
        ), np.float64)
        return np.max(np.abs(fast - oracle)) / scale

    assert err("compensated") < 1e-6
    assert err("f64") < 1e-6
    if n == 1_000_000:
        # the wide modes are load-bearing: plain f32 accumulation misses
        # the target at 1e6 rays (measured ~4e-6)
        assert err("native") > 1e-6


def test_accum_modes_preserve_exactness_in_f64(rng):
    """In float64, all accumulation modes agree to roundoff with the
    segment-sum parity backend."""
    from msgwam_tpu.ops.projection import project, project_dense

    n = 4096 * 3 + 17  # exercises the remainder block
    r = rng.uniform(1e3, 80e3, n)
    dr = rng.uniform(300.0, 3000.0, n)
    vals = rng.normal(0.0, 1.0, (2, n))
    pv = np.abs(rng.normal(1e-12, 1e-13, n))
    grid = jnp.linspace(0.0, 100e3, 101)
    rl, ru = jnp.asarray(r - 0.5 * dr), jnp.asarray(r + 0.5 * dr)
    valid = jnp.asarray(rng.random(n) > 0.1)

    ref = np.asarray(project(jnp.asarray(vals), rl, ru, jnp.asarray(pv),
                             valid, grid, max_span=5))
    for accum in ["native", "compensated", "f64"]:
        out = np.asarray(project_dense(jnp.asarray(vals), rl, ru,
                                       jnp.asarray(pv), valid, grid,
                                       accum=accum))
        np.testing.assert_allclose(out, ref, rtol=1e-13, atol=1e-16)


def test_dense_deposit_custom_vjp_matches_autodiff(rng):
    """project_dense's residual-free custom VJP (the (n, n_cells) weight
    matrix is rebuilt in the backward instead of stored — the residual
    that made the adjoint bandwidth-bound, ADJOINT_PROFILE_r05.json)
    must match plain autodiff of the same construction for every
    differentiable argument: values, r_low, r_up, phase_vol, grid."""
    import jax
    from msgwam_tpu.ops.projection import _dense_weights, project_dense

    n = 3000
    r = rng.uniform(1e3, 80e3, n)
    dr = rng.uniform(300.0, 3000.0, n)
    vals = jnp.asarray(rng.normal(0.0, 1.0, (2, n)))
    pv = jnp.abs(jnp.asarray(rng.normal(1e-12, 1e-13, n)))
    grid = jnp.linspace(0.0, 100e3, 101)
    rl_np, ru_np = r - 0.5 * dr, r + 0.5 * dr
    # exact ties with grid values: the max/min tie subgradients (0.5/0.5
    # split) must match autodiff's convention too
    rl_np[:40] = np.asarray(grid)[rng.integers(1, 80, 40)]
    ru_np[40:80] = np.asarray(grid)[rng.integers(1, 80, 40)]
    ru_np = np.maximum(ru_np, rl_np + 10.0)
    rl, ru = jnp.asarray(rl_np), jnp.asarray(ru_np)
    valid = jnp.asarray(rng.random(n) > 0.1)

    def raw(v, rl_, ru_, pv_, g_):
        w = _dense_weights(rl_, ru_, pv_, valid, g_)
        return jax.lax.dot_general(
            v, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=v.dtype)

    cv = lambda v, rl_, ru_, pv_, g_: project_dense(
        v, rl_, ru_, pv_, valid, g_, accum="native")

    args = (vals, rl, ru, pv, grid)
    out_c, vjp_c = jax.vjp(cv, *args)
    out_r, vjp_r = jax.vjp(raw, *args)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=1e-14)
    ct = jnp.asarray(rng.standard_normal(out_c.shape))
    for got, want, name in zip(vjp_c(ct), vjp_r(ct),
                               ("values", "r_low", "r_up", "phase_vol",
                                "grid")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-15,
            err_msg=f"cotangent mismatch for {name}")
