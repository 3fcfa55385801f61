"""Fused whole-RHS pallas TPU kernel (vertical-propagation configuration).

One kernel evaluates the complete coupled RHS for a tile of rays with all
intermediates in VMEM: wind/shear interpolation (hat-basis matmuls),
dispersion + group velocity, refraction, online saturation (including the
end-of-step density interpolation), and the pseudo-momentum-flux deposit —
per RHS evaluation the ray state is read from HBM exactly once and only the
three active tendencies are written back.  The XLA ``mxu`` backend instead
materializes the (n_ray, n_cell) basis/weight matrices between fusions,
which dominates HBM traffic at large n_ray.

Scope: the reference's production configuration — ``hprop=False`` (vertical
propagation only, the reference driver's own setting, ``raytracer.py:38``),
where dλ/dt = dφ/dt = dk/dt = dl/dt = 0 exactly and (because cg_r has no
height dependence, ``lib/libprop.py:434-448``) d(dr)/dt = d(dm)/dt-extent =
0, leaving three tendencies: density (online saturation,
``lib/libprop.py:561-615``), height (cg_r), and vertical wavenumber
(−(k du/dz + l dv/dz), ``lib/libprop.py:519-520``).  ``hprop=True`` falls
back to the XLA path (``models/rhs.py``).

Float32 only; interpret mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ROT_EARTH

LANE = 128
SUBLANES = 8
TILE = LANE * SUBLANES


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# scalar-parameter slots (float32 SMEM)
_G0C, _DZ, _G0F, _DT, _BVF, _KAPPA, _F0, _NPARAM = range(8)


def _hat(x, x0, dz, n_tab, c_pad):
    """Hat-function interpolation basis rows for query column x (LANE, 1):
    returns (LANE, c_pad) with np.interp clamping semantics."""
    xc = jnp.clip(x, x0, x0 + (n_tab - 1.0) * dz)
    cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, c_pad), 1).astype(
        jnp.float32
    )
    return jnp.maximum(0.0, 1.0 - jnp.abs((xc - x0) / dz - cols))


def _kernel(
    params_ref, tables_ref,
    dens_ref, r_ref, dr_ref, k_ref, l_ref, m_ref, dm_ref, phi_ref,
    dkk_ref, dll_ref, area_ref, act_ref,
    dens_st_ref, drr_st_ref, dmm_st_ref, flux_ref,
    acc_ref, u_s, v_s, du_s, dv_s, rho_s,
    *, n_tab: int, n_flux_cells: int, c_pad: int,
    saturate_online: bool, faithful: bool,
):
    # v2 layout: all elementwise physics runs on the native (SUBLANES, LANE)
    # tile (zero lane-padding waste); only the basis/weight matrices are
    # built per sublane row, feeding thin MXU contractions, with the interp
    # results scattered into (SUBLANES, LANE) VMEM scratch tiles.
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    g0c = params_ref[_G0C]
    dz = params_ref[_DZ]
    g0f = params_ref[_G0F]
    dt = params_ref[_DT]
    bvf = params_ref[_BVF]
    kappa = params_ref[_KAPPA]
    f0 = params_ref[_F0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # --- pass 1: winds + shear at ray heights (per-row basis matmuls) ----
    for j in range(SUBLANES):
        rj = r_ref[j, :][:, None]                          # (LANE, 1)
        Bc = _hat(rj, g0c, dz, n_tab, c_pad)
        uv = jax.lax.dot_general(
            Bc, tables_ref[:, 0:2],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (LANE, 2)
        Bf = _hat(rj, g0f, dz, n_tab - 1, c_pad)
        sh = jax.lax.dot_general(
            Bf, tables_ref[:, 2:4],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u_s[j, :] = uv[:, 0]
        v_s[j, :] = uv[:, 1]
        du_s[j, :] = sh[:, 0]
        dv_s[j, :] = sh[:, 1]

    # --- tile-wise physics (all (SUBLANES, LANE)) -------------------------
    dens = dens_ref[:]
    r = r_ref[:]
    dr = dr_ref[:]
    k = k_ref[:]
    l = l_ref[:]
    m = m_ref[:]
    dm = dm_ref[:]
    phi = phi_ref[:]
    dkk = dkk_ref[:]
    dll = dll_ref[:]
    area = area_ref[:]
    act = act_ref[:]

    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    kh2 = k * k + l * l
    k2 = kh2 + m * m
    om = jnp.sqrt((bvf * bvf * kh2 + ff * ff * m * m) / k2)
    cgr = -m * (om * om - ff * ff) / om / k2
    dmm_st = -(k * du_s[:] + l * dv_s[:])                  # lib/libprop.py:519-520

    # --- online saturation (lib/libprop.py:561-615) -----------------------
    if saturate_online:
        r_fin = r + cgr * dt
        for j in range(SUBLANES):
            Bs = _hat(r_fin[j, :][:, None], g0c, dz, n_tab, c_pad)
            rho = jax.lax.dot_general(
                Bs, tables_ref[:, 4:5],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rho_s[j, :] = rho[:, 0]
        m_fin = m + dmm_st * dt
        dmm_fin = area / dr                                # dr tendency = 0
        omh = jnp.sqrt((bvf * bvf * kh2 + f0 * f0 * m * m) / k2)
        cap = (
            kappa * kappa * 0.5 * rho_s[:] * omh * bvf * bvf
            / (m_fin * m_fin) / (omh * omh - f0 * f0)
        )
        pvol = dkk * dll * dmm_fin
        cap_applied = cap if faithful else cap / pvol
        exceed = cap < dens * pvol
        dens_st = jnp.where(exceed, (cap_applied - dens) / dt, 0.0)
    else:
        dens_st = jnp.zeros_like(dens)

    # --- masked tendency writes (tile-wise) -------------------------------
    amask = act > 0
    dens_st_ref[:] = jnp.where(amask, dens_st, 0.0)
    drr_st_ref[:] = jnp.where(amask, cgr, 0.0)
    dmm_st_ref[:] = jnp.where(amask, dmm_st, 0.0)

    # --- pass 3: pseudo-momentum flux deposit (per-row weight matmuls) ----
    r_lo = r - 0.5 * dr
    r_up = r + 0.5 * dr
    nzmax = n_flux_cells - 1                               # len(proj grid) - 2
    nlow_t = (r_lo / dz).astype(jnp.int32)                 # trunc toward zero
    nup_t = (r_up / dz + 1.0).astype(jnp.int32)
    ood = ((nlow_t >= nzmax) & (nup_t >= nzmax)) | ((nlow_t <= 0) & (nup_t <= 0))
    live_t = (act > 0) & ~ood
    pv = jnp.abs(dkk * dll * dm)
    fv = cgr * dens
    fvk = jnp.where(live_t, fv * k * pv, 0.0)
    fvl = jnp.where(live_t, fv * l * pv, 0.0)
    nlow_t = jnp.clip(nlow_t, 0, nzmax)
    nup_t = jnp.clip(nup_t, 0, nzmax)

    cols_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, c_pad), 1)
    colsf = cols_i.astype(jnp.float32)
    gflo = g0c + colsf * dz
    gfhi = g0c + (colsf + 1.0) * dz
    for j in range(SUBLANES):
        rl = r_lo[j, :][:, None]
        ru = r_up[j, :][:, None]
        in_span = (
            (cols_i >= nlow_t[j, :][:, None]) & (cols_i < nup_t[j, :][:, None])
            & (cols_i < n_flux_cells)
        )
        w = jnp.where(
            in_span,
            jnp.abs(jnp.minimum(gfhi, ru) - jnp.maximum(gflo, rl)) / dz,
            0.0,
        )                                                  # (LANE, c_pad)
        vrow = jnp.concatenate(
            [fvk[j, :][:, None], fvl[j, :][:, None]], axis=1
        )                                                  # (LANE, 2)
        acc_ref[:] += jax.lax.dot_general(
            w, vrow,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_prog - 1)
    def _():
        flux_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tab", "n_flux_cells", "saturate_online", "faithful", "interpret"
    ),
)
def _rhs_fused_call(
    params, tables,
    dens, r, dr, k, l, m, dm, phi, dkk, dll, area, act,
    n_tab: int, n_flux_cells: int,
    saturate_online: bool, faithful: bool, interpret: bool,
):
    n_rows = r.shape[0]
    n_blocks = n_rows // SUBLANES
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    kernel = functools.partial(
        _kernel, n_tab=n_tab, n_flux_cells=n_flux_cells, c_pad=c_pad,
        saturate_online=saturate_online, faithful=faithful,
    )
    row = pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # params
            pl.BlockSpec((c_pad, 8), lambda i: (0, 0)),            # tables
            row, row, row, row, row, row, row, row, row, row, row, row,
        ],
        out_specs=(
            row, row, row,
            pl.BlockSpec((c_pad, 2), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_pad, 2), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(params, tables, dens, r, dr, k, l, m, dm, phi, dkk, dll, area, act)
    return outs


def rhs_fused(dt, state, statics, bg, cfg):
    """Fused-RHS entry point: returns ``(ray_tendencies_dict, pm_interior)``
    where ``pm_interior`` is the (2, n_flux_cells) interior flux profile
    (the caller builds the mean-flow tendencies exactly as ``models/rhs.py``
    does).  Requires ``cfg.hprop == False`` and float32 state."""
    if cfg.hprop:
        raise ValueError("rhs_fused supports hprop=False only")
    rays, mean = state
    n = rays.r.shape[0]
    n_tab = bg.centers.shape[0]
    n_flux_cells = n_tab - 1
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)

    dz = bg.centers[1] - bg.centers[0]
    du_dz = (mean.u[1:] - mean.u[:-1]) / dz
    dv_dz = (mean.v[1:] - mean.v[:-1]) / dz

    def tab(x):
        x = x.astype(jnp.float32)
        return jnp.pad(x, (0, c_pad - x.shape[0]))

    tables = jnp.stack(
        [
            tab(mean.u), tab(mean.v), tab(du_dz), tab(dv_dz),
            tab(bg.rhobar),
            jnp.zeros((c_pad,), jnp.float32),
            jnp.zeros((c_pad,), jnp.float32),
            jnp.zeros((c_pad,), jnp.float32),
        ],
        axis=1,
    )

    f0 = 2.0 * ROT_EARTH * jnp.sin(jnp.float32(cfg.phi0))
    params = jnp.stack([
        bg.centers[0].astype(jnp.float32),
        dz.astype(jnp.float32),
        bg.faces[1].astype(jnp.float32),
        jnp.asarray(dt, jnp.float32),
        jnp.asarray(cfg.bvf, jnp.float32),
        jnp.asarray(cfg.kappa, jnp.float32),
        f0,
    ])

    n_pad = _ceil_to(max(n, TILE), TILE)
    pad = n_pad - n

    def shape2(x, fill=0.0):
        x = x.astype(jnp.float32)
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(-1, LANE)

    interpret = jax.default_backend() != "tpu"
    dens_st, drr_st, dmm_st, flux = _rhs_fused_call(
        params, tables,
        shape2(rays.dens), shape2(rays.r), shape2(rays.dr, 1.0),
        shape2(rays.k, 1e-5), shape2(rays.l), shape2(rays.m, -1e-3),
        shape2(rays.dm, 1e-6), shape2(rays.phi),
        shape2(statics.dkk, 1.0), shape2(statics.dll, 1.0),
        shape2(statics.rr_mm_area),
        shape2(statics.active.astype(jnp.float32)),
        n_tab=n_tab, n_flux_cells=n_flux_cells,
        saturate_online=bool(cfg.saturate_online),
        faithful=bool(cfg.faithful_saturation),
        interpret=interpret,
    )
    unshape = lambda x: x.reshape(-1)[:n]
    tend = {
        "dens": unshape(dens_st),
        "r": unshape(drr_st),
        "m": unshape(dmm_st),
    }
    return tend, flux[:n_flux_cells].T
