"""Linear interpolation of grid profiles onto ray heights.

The reference uses ``np.interp`` (``lib/libprop.py:355-358,400,424,595``) —
clamped linear interpolation onto a sorted 1-D grid.  On TPU this is a
gather + fused multiply-add; because the reference grids are uniform we also
provide a closed-form fast path that avoids ``searchsorted`` entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interp(x, xp, fp):
    """``np.interp`` semantics for a sorted 1-D ``xp``: linear inside,
    clamped to ``fp[0]`` / ``fp[-1]`` outside.  General (non-uniform) grid.
    """
    x = jnp.asarray(x)
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    n = xp.shape[0]
    i = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, n - 2)
    x0 = xp[i]
    x1 = xp[i + 1]
    f0 = fp[i]
    f1 = fp[i + 1]
    # numpy's compiled inner-loop arithmetic: slope*(x - x0) + f0, clamped
    inner = (f1 - f0) / (x1 - x0) * (x - x0) + f0
    return jnp.where(x <= xp[0], fp[0], jnp.where(x >= xp[-1], fp[-1], inner))


def uniform_interp(x, x0, dx, fp):
    """``np.interp`` on a *uniform* grid ``xp[j] = x0 + j*dx`` — index math
    instead of searchsorted (no log-n gather chain; single gather pair).

    The arithmetic mirrors numpy's compiled ``interp`` inner loop
    (``slope*(x - xp[i]) + fp[i]``, clamped outside) so that float64 results
    track ``np.interp`` as closely as possible for trajectory parity.
    """
    x = jnp.asarray(x)
    fp = jnp.asarray(fp)
    n = fp.shape[0]
    t = (x - x0) / dx
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    xi = x0 + i * dx
    f0 = fp[i]
    f1 = fp[i + 1]
    inner = (f1 - f0) / dx * (x - xi) + f0
    return jnp.where(x <= x0, fp[0], jnp.where(x >= x0 + (n - 1) * dx, fp[-1], inner))


def basis_matrix(x, x0, dx, n):
    """Dense linear-interpolation (hat-function) basis: ``B[i, j] =
    hat_j(clip(x_i))`` for the uniform grid ``xp[j] = x0 + j*dx``, such that
    ``B @ fp`` equals clamped linear interpolation (``np.interp``) of any
    table ``fp`` on that grid.

    MXU interp backend: TPU gathers over ~1e5 arbitrary indices serialize,
    but the table is tiny (~100 entries), so interpolation of many tables at
    the same query points is one ``(n_query, n_table)`` basis construction
    (fused elementwise) + one matmul on the systolic array.
    """
    x = jnp.asarray(x)
    xc = jnp.clip(x, x0, x0 + (n - 1) * dx)
    t = (xc[:, None] - x0) / dx - jnp.arange(n, dtype=x.dtype)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def basis_interp(x, x0, dx, tables):
    """Interpolate one or more stacked ``(n_table,)`` / ``(n_table, k)``
    tables at query points ``x`` via :func:`basis_matrix` (one matmul)."""
    tables = jnp.asarray(tables)
    squeeze = tables.ndim == 1
    if squeeze:
        tables = tables[:, None]
    B = basis_matrix(x, x0, dx, tables.shape[0])
    out = jax.lax.dot_general(
        B, tables,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=tables.dtype,
    )
    return out[:, 0] if squeeze else out


def grid_interp(x, xp, fp):
    """``np.interp`` on a *uniform, explicitly materialized* grid ``xp``:
    indices come from closed-form index math (fast), but the interpolation
    arithmetic uses the actual ``xp[i]`` values and per-interval widths so
    float64 results match ``np.interp`` to the last few ULPs (trajectory
    parity with the reference's ``lib/libprop.py:355-358,595``)."""
    x = jnp.asarray(x)
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    n = fp.shape[0]
    x0 = xp[0]
    dx = xp[1] - xp[0]
    i = jnp.clip(jnp.floor((x - x0) / dx).astype(jnp.int32), 0, n - 2)
    xi = xp[i]
    # if rounding put x below xp[i], step back one interval (searchsorted semantics)
    i = jnp.where(x < xi, jnp.maximum(i - 1, 0), i)
    xi = xp[i]
    f0 = fp[i]
    f1 = fp[i + 1]
    inner = (f1 - f0) / (xp[i + 1] - xi) * (x - xi) + f0
    return jnp.where(x <= x0, fp[0], jnp.where(x >= xp[-1], fp[-1], inner))
