"""Pallas TPU kernel for the ray→grid projection.

The ``mxu`` backend (:func:`msgwam_tpu.ops.projection.project_dense`) lets
XLA materialize the dense (n_ray, n_cell) overlap-weight matrix in HBM
(~40 MB at 1e5 rays) before the contraction.  This kernel instead streams
ray tiles through VMEM, builds each tile's (lane, cell) weight matrix on
the VPU, feeds it straight to the MXU, and accumulates the (cell, nvar)
partial fluxes in VMEM scratch across the sequential TPU grid — HBM
traffic drops to the ray fields themselves.

Semantics match ``project_dense`` (reference index arithmetic of
``lib/libprop.py:121-137,157-160``: truncation-toward-zero indices from the
origin-0 ratio r/dz, clamping to ``n_points-2``, out-of-domain mask,
|overlap| weights) with one fast-path deviation: grid face values are
reconstructed as ``g0 + c*dz`` instead of gathered from the grid array
(ulp-level difference on linspace grids; the f64 parity path uses the
``xla`` backend anyway).

Layout: ray vectors are reshaped to ``(rows, LANE)`` and each grid step
processes a ``(SUBLANES, LANE)`` tile = 2048 rays, looping over the 8
sublane rows to produce ``(LANE, c_pad) x (LANE, nvar)`` MXU contractions
(TPU block shapes must have the last two dims divisible by (8, 128)).

Float32 only.  Falls back to interpreter mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128 * 2    # rays per sublane row
SUBLANES = 8      # rows per grid step
BLOCK = LANE * SUBLANES


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(scalars_ref, v0_ref, v1_ref, rlow_ref, rup_ref, pv_ref, ok_ref,
            out_ref, acc_ref, *, n_cells: int, c_pad: int, n_valid: int):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    g0 = scalars_ref[0]
    dz = scalars_ref[1]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c = jax.lax.broadcasted_iota(jnp.int32, (LANE, c_pad), 1)
    cf = c.astype(jnp.float32)
    gc_lo = g0 + cf * dz
    gc_hi = g0 + (cf + 1.0) * dz
    nzmax = n_cells - 1  # len(grid) - 2

    for j in range(SUBLANES):
        rl = rlow_ref[j, :][:, None]                       # (LANE, 1)
        ru = rup_ref[j, :][:, None]
        pv = pv_ref[j, :][:, None]
        ok = ok_ref[j, :][:, None]

        nlow = (rl / dz).astype(jnp.int32)                 # trunc toward zero
        nup = (ru / dz + 1.0).astype(jnp.int32)
        ood = ((nlow >= nzmax) & (nup >= nzmax)) | ((nlow <= 0) & (nup <= 0))
        nlow = jnp.clip(nlow, 0, nzmax)
        nup = jnp.clip(nup, 0, nzmax)
        ray_idx = (
            i * BLOCK + j * LANE
            + jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
        )
        live = (ok > 0) & ~ood & (ray_idx < n_valid)

        in_span = (c >= nlow) & (c < nup) & (c < n_cells) & live
        zmin = jnp.maximum(gc_lo, rl)
        zmax = jnp.minimum(gc_hi, ru)
        w = jnp.where(in_span, jnp.abs(zmax - zmin) / dz, 0.0) * pv

        vrow = jnp.concatenate(
            [v0_ref[j, :][:, None], v1_ref[j, :][:, None]], axis=1
        )                                                  # (LANE, nvar)
        acc_ref[:] += jax.lax.dot_general(
            w, vrow,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (c_pad, nvar)

    @pl.when(i == n_prog - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("n_cells", "n_valid", "interpret"))
def _project_pallas(v0, v1, rlow, rup, pv, ok, scalars,
                    n_cells: int, n_valid: int, interpret: bool):
    n_rows = rlow.shape[0]
    n_blocks = n_rows // SUBLANES
    c_pad = _ceil_to(n_cells, 128)
    nvar = 2
    kernel = functools.partial(
        _kernel, n_cells=n_cells, c_pad=c_pad, n_valid=n_valid
    )
    row_spec = pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0))
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # scalars (2,)
            row_spec, row_spec, row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((c_pad, nvar), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((c_pad, nvar), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c_pad, nvar), jnp.float32)],
        interpret=interpret,
    )(scalars, v0, v1, rlow, rup, pv, ok)
    return out


def project_pallas(values, r_low, r_up, phase_vol, valid, grid, max_span=None,
                   accum: str = "native"):
    """Drop-in for :func:`msgwam_tpu.ops.projection.project` (float32,
    nvar <= 2).  ``max_span`` is accepted and ignored.  Only native (f32)
    accumulation is implemented; wide modes need the 'mxu' backend."""
    if accum != "native":
        raise ValueError(
            f"the pallas projection backend only supports accum='native', "
            f"got {accum!r}; use projection_backend='mxu' for wide "
            f"accumulation"
        )
    values = jnp.atleast_2d(values).astype(jnp.float32)
    nvar, n = values.shape
    if nvar > 2:
        raise ValueError("project_pallas supports at most 2 value rows")
    n_points = grid.shape[0]
    n_cells = n_points - 1
    dz = (grid[1] - grid[0]).astype(jnp.float32)
    g0 = grid[0].astype(jnp.float32)

    n_pad = _ceil_to(max(n, BLOCK), BLOCK)
    pad = n_pad - n

    def shape2(x, fill=0.0):
        x = x.astype(jnp.float32)
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(-1, LANE)

    v0 = shape2(values[0])
    v1 = shape2(values[1]) if nvar == 2 else jnp.zeros_like(v0)
    rlow = shape2(r_low)
    rup = shape2(r_up)
    pv = shape2(phase_vol)
    ok = (
        jnp.ones((n,), jnp.float32) if valid is None
        else valid.astype(jnp.float32)
    )
    ok = shape2(ok)

    scalars = jnp.stack([g0, dz])
    interpret = jax.default_backend() != "tpu"
    out = _project_pallas(
        v0, v1, rlow, rup, pv, ok, scalars,
        n_cells=n_cells, n_valid=n, interpret=interpret,
    )
    return out[:n_cells, :nvar].T.astype(values.dtype)
