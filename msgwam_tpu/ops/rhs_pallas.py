"""Fused whole-RHS pallas TPU kernel (vertical-propagation configuration).

One kernel evaluates the complete coupled RHS for a tile of rays with all
intermediates in VMEM: wind/shear interpolation (hat-basis contractions),
dispersion + group velocity, refraction, online saturation (including the
end-of-step density interpolation), and the pseudo-momentum-flux deposit —
per RHS evaluation the ray state is read from HBM exactly once and only the
three active tendencies are written back.  The XLA ``mxu`` backend instead
materializes (n_ray, n_cell) basis/weight matrices between fusions, which
dominates HBM traffic at large n_ray.

v3 layout (the round-2 rewrite that beats the XLA dense path): everything is
built **transposed** — grid cells on the *sublane* axis, rays on the *lane*
axis — so every per-sublane slice ``r_ref[j, :]`` is a native lane row and
nothing is ever relayouted.  The round-1 kernel's fatal flaw was
``r_ref[j, :][:, None]``: a lane→sublane transpose (cross-lane shuffle)
issued 24× per 1024-ray tile, which made it 4-6× slower than XLA.  Here:

* the interpolation basis is ``B[c, p] = max(0, 1 − |q_p − c|)`` with cells
  ``c`` on sublanes, built by broadcasting the (1, LANE) query row against a
  hoisted per-row cell-index constant — pure VPU, no shuffles;
* each profile lookup (du/dz, dv/dz at ray heights on interior faces; ρ̄ at
  the saturation-extrapolated height — the winds u, v themselves are never
  consumed with hprop off, so they are not interpolated at all) is one small
  MXU contraction ``(2, C) @ (C, LANE)`` against its own slab-built basis
  (measured faster than composing one stacked multi-query basis with
  selects);
* the flux deposit is a lane-axis contraction
  ``dot_general((2, LANE), (C, LANE), contract lanes) → (2, C)`` against the
  overlap-weight matrix built in the same transposed layout, accumulated
  across grid steps with Kahan compensation (the pallas path therefore has
  'compensated'-grade deposit accuracy built in: per-tile MXU partials, ~eps
  combination error independent of n_ray);
* 64-sublane (8192-ray) blocks amortize grid-step pipeline overhead —
  measured 2.89 → 2.57 ms/step at 1e6 going from 8 to 64 sublanes.

Measured on TPU v5 lite at the bench configuration (coupled, online
saturation, f32): 0.81 ms/step at 1e5 rays and 2.57 ms/step at 1e6 vs the
XLA mxu path's 0.79-0.88 / 2.69 — ~5% ahead at 1e6 with deposit error ~1e-7
(the XLA path needs flux_accum='compensated', 6× slower at 1e6, to match
that accuracy).  Both paths sit at the VPU roofline of the O(n_ray ×
n_cells) basis/weight construction — the round-1 "2-4× headroom via
fusion" estimate assumed the step was HBM-bound, which measurement refutes:
after fusion the step is compute-bound, so the remaining headroom is
algorithmic (e.g. height-sorted ray blocks with windowed bases would cut
the O(n_cells) factor ~8×, at the cost of periodic re-sorts and slot-order
churn that the per-slot history semantics disallow by default).

Scope: the reference's production configuration — ``hprop=False`` (vertical
propagation only, the reference driver's own setting, ``raytracer.py:38``),
where dλ/dt = dφ/dt = dk/dt = dl/dt = 0 exactly and (because cg_r has no
height dependence, ``lib/libprop.py:434-448``) d(dr)/dt = d(dm)-extent = 0,
leaving three tendencies: density (online saturation,
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
SUBLANES = 64
TILE = LANE * SUBLANES


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def resolve_window_cells(cfg, c_pad: int) -> tuple:
    """Single source of truth for the two window-tier widths used by every
    windowed kernel (adaptive scan, resident megakernel, streaming
    megakernel) and by the fallback diagnostics mirror
    (``diagnostics.window_fallback_stats``): the first tier has a floor of
    16 cells, both tiers round up to a multiple of 8 and are capped by the
    padded column count, and the second tier is disabled unless strictly
    wider than the first."""
    w1 = min(_ceil_to(max(cfg.window_cells, 16), 8), c_pad)
    w2 = (min(_ceil_to(cfg.window_cells2, 8), c_pad - 8)
          if cfg.window_cells2 > 0 else 0)
    if w2 <= w1:
        w2 = 0
    return w1, w2


def resolve_champion(n_ray: int, lifecycle: bool = False,
                     sorted_multi_launch: bool = False) -> dict:
    """The measured-champion kernel settings for the megakernel family at
    a given problem size: ``{"window_cells", "window_cells2", "tile_rows"}``.

    Single source of truth for the per-size champions (previously
    bench-script knowledge only — VERDICT r3 weak #2): consumed by the
    megakernel drivers when the config carries the ``window_cells=-1`` /
    ``window_cells2=-1`` auto sentinels, by the CLI's ``--kernels mega``
    path, and by ``bench.py``.

    Measured ladder (TPU v5e, benchmarks/WORKLIST_r03.jsonl +
    BENCH_MATRIX.json + W_RESWEEP_r05.jsonl):

    * ``n_ray <= 200_000`` (VMEM-resident regime): W=24.  W=16 drops more
      8192-ray blocks to the full-width path (fallback 54% vs 46%), so the
      wider first tier wins (1.08e9 vs 0.99e9 ray-steps/s at 1e5); the
      96-cell second tier is NEGATIVE here (-2..-9%).
    * ``n_ray > 200_000`` (HBM-streaming regime): W=16 with a 96-cell
      second tier that catches the dispersive 80-100-cell span tail
      (1.55e9 vs 1.47e9 at 1e6).
    * ``sorted_multi_launch=True`` (streaming runs with launch-boundary
      height re-sorts, i.e. ``n_steps > save_every`` and the sort on):
      the re-sorts keep the internal layout coherent enough (fallback
      0.24 at 1e6 / 0.07 at 1e7, zero exact-full-width blocks) that a
      narrower 48-cell second tier wins: +11% at 1e6 (1.97e9 vs 1.77e9)
      and +2.5% at 1e7 (2.28e9 vs 2.22e9), round-5 sweep.  Single-launch
      whole-run kernels keep W2=96 (measured OPPOSITE there: 1.83e9 vs
      1.79e9 at 1e6 — 1000 steps of unsorted coherence decay reach the
      80-100-cell tail that 48 hands to the 128-wide full path).

    ``tile_rows`` is the streamed-tile height (ignored by the resident
    kernel); see :func:`~msgwam_tpu.ops.step_pallas_stream._auto_tile_rows`
    for its own measured ladder.
    """
    if n_ray <= 200_000:
        w1, w2 = 24, 0
    elif sorted_multi_launch:
        w1, w2 = 16, 48
    else:
        w1, w2 = 16, 96
    from .step_pallas_stream import _auto_tile_rows

    return {"window_cells": w1, "window_cells2": w2,
            "tile_rows": _auto_tile_rows(n_ray, lifecycle)}


def apply_champion(cfg, n_ray: int,
                   sorted_multi_launch: bool = False) -> "ModelConfig":  # noqa: F821
    """Resolve the ``window_cells``/``window_cells2`` auto sentinels (-1)
    against the measured champion ladder for ``n_ray`` rays.  Explicit
    non-negative settings are honored unchanged; returns ``cfg`` itself
    when nothing is auto."""
    upd = {}
    if cfg.window_cells < 0 or cfg.window_cells2 < 0:
        ch = resolve_champion(n_ray, lifecycle=cfg.cull or cfg.relaunch,
                              sorted_multi_launch=sorted_multi_launch)
        if cfg.window_cells < 0:
            upd["window_cells"] = ch["window_cells"]
        if cfg.window_cells2 < 0:
            upd["window_cells2"] = ch["window_cells2"]
    return cfg.replace(**upd) if upd else cfg


# scalar-parameter slots (float32 SMEM)
_G0C, _DZ, _G0F, _DT, _BVF, _KAPPA, _F0, _NPARAM = range(8)


def _kernel(
    params_ref, tables_ref,
    dens_ref, r_ref, dr_ref, k_ref, l_ref, m_ref, dm_ref, phi_ref,
    dkk_ref, dll_ref, area_ref, act_ref,
    dens_st_ref, drr_st_ref, dmm_st_ref, flux_ref,
    acc_ref, comp_ref, du_s, dv_s, rho_s,
    *, n_tab: int, n_flux_cells: int, c_pad: int,
    saturate_online: bool, faithful: bool,
):
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
        comp_ref[:] = jnp.zeros_like(comp_ref)


    # --- tile-wise physics that interpolation depends on -------------------
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
    # one reciprocal + one rsqrt instead of 3 divides + 1 sqrt per ray
    # (lib/libprop.py:434-448 algebra unchanged)
    om2 = (bvf * bvf * kh2 + ff * ff * m * m) * (1.0 / k2)
    cgr = -m * (om2 - ff * ff) * jax.lax.rsqrt(om2) * (1.0 / k2)
    r_fin = r + cgr * dt                            # saturation extrapolation

    # --- flux deposit inputs (independent of the winds: hprop off) ---------
    # Reference index semantics (lib/libprop.py:121-160): truncated cell
    # spans, clamped to nzmax, |overlap| weights.  1/dz is folded into the
    # per-ray values so the per-cell weight build stays at 8 VPU ops.
    r_lo = r - 0.5 * dr
    r_up = r + 0.5 * dr
    nzmax = n_flux_cells - 1
    idz = 1.0 / dz                     # scalar; hoisted by the compiler
    nlow_t = (r_lo * idz).astype(jnp.int32)
    nup_t = (r_up * idz + 1.0).astype(jnp.int32)
    ood = ((nlow_t >= nzmax) & (nup_t >= nzmax)) | ((nlow_t <= 0) & (nup_t <= 0))
    live_t = (act > 0) & ~ood
    pv = jnp.abs(dkk * dll * dm)
    fv = cgr * dens * idz
    fvk = jnp.where(live_t, fv * k * pv, 0.0)
    fvl = jnp.where(live_t, fv * l * pv, 0.0)
    # nup <= nzmax < n_flux_cells after this clip, so no explicit
    # c < n_flux_cells guard is needed in the span test below
    nlow_t = jnp.clip(nlow_t, 0, nzmax)
    nup_t = jnp.clip(nup_t, 0, nzmax)

    # --- per-sublane basis/weight builds + MXU contractions ----------------
    # Everything transposed: cells on sublanes, rays (this sublane's 128) on
    # lanes, so the r/rl/ru row slices are native lane rows (no shuffles).
    col_i = jax.lax.broadcasted_iota(jnp.int32, (c_pad, LANE), 0)
    col_f = col_i.astype(jnp.float32)
    gflo = g0c + col_f * dz                         # cell lower faces
    gfhi = g0c + (col_f + 1.0) * dz

    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz

    def hat(q):
        return jnp.maximum(0.0, 1.0 - jnp.abs(q - col_f))      # (c_pad, LANE)

    # hat coordinates hoisted out of the per-row loop: one clipped,
    # dz-normalized height slab per query point for the whole tile
    qf_t = (jnp.clip(r, g0f, hi_f) - g0f) * idz
    if saturate_online:
        qr_t = (jnp.clip(r_fin, g0c, hi_c) - g0c) * idz

    def interp(lhs, B):
        return jax.lax.dot_general(
            lhs, B,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for j in range(SUBLANES):
        # one hat basis per query point, one small contraction per table
        # pair — no stacked-query composition (pure slab builds measure
        # fastest; each build is 4 VPU ops on (c_pad, LANE)).  With hprop
        # off the winds u, v themselves never enter a live tendency (only
        # the shears and ρ̄ do, models/rhs.py:109-114), so no u/v
        # interpolation is performed at all — 2 query points, not 3.
        sh = interp(tables_ref[0:2, 0:c_pad],
                    hat(qf_t[j, :][None, :]))
        du_s[j, :] = sh[0, :]
        dv_s[j, :] = sh[1, :]
        if saturate_online:
            rho = interp(tables_ref[2:3, c_pad:2 * c_pad],
                         hat(qr_t[j, :][None, :]))
            rho_s[j, :] = rho[0, :]

    for j in range(SUBLANES):
        # flux deposit (lane-axis contraction against transposed weights),
        # a separate unrolled loop: measured faster than fusing it into the
        # interpolation loop (better VPU/MXU overlap scheduling)
        rl = r_lo[j, :][None, :]
        ru = r_up[j, :][None, :]
        in_span = (col_i >= nlow_t[j, :][None, :]) \
            & (col_i < nup_t[j, :][None, :])
        w = jnp.where(
            in_span,
            jnp.abs(jnp.minimum(gfhi, ru) - jnp.maximum(gflo, rl)),
            0.0,
        )                                                      # (c_pad, LANE)
        fv2 = jnp.concatenate(
            [fvk[j, :][None, :], fvl[j, :][None, :]], axis=0
        )                                                      # (2, LANE)
        part = jax.lax.dot_general(
            fv2, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (2, c_pad)
        # Kahan-compensated accumulation across tiles: deposit error stays
        # ~eps regardless of ray count (the 'compensated' flux_accum mode,
        # here for free — partials never leave VMEM)
        y = part - comp_ref[:]
        t = acc_ref[:] + y
        comp_ref[:] = (t - acc_ref[:]) - y
        acc_ref[:] = t

    dmm_st = -(k * du_s[:] + l * dv_s[:])           # lib/libprop.py:519-520

    # --- online saturation (lib/libprop.py:561-615) -------------------------
    if saturate_online:
        m_fin = m + dmm_st * dt
        dmm_fin = area / dr                         # dr tendency = 0
        # same 1-div + 1-rsqrt factoring as the dispersion block
        omh2 = (bvf * bvf * kh2 + f0 * f0 * m * m) * (1.0 / k2)
        cap = (
            kappa * kappa * 0.5 * rho_s[:] * omh2
            * jax.lax.rsqrt(omh2) * bvf * bvf
            / (m_fin * m_fin * (omh2 - f0 * f0))
        )
        pvol = dkk * dll * dmm_fin
        cap_applied = cap if faithful else cap / pvol
        exceed = cap < dens * pvol
        dens_st = jnp.where(exceed, (cap_applied - dens) * (1.0 / dt), 0.0)
    else:
        dens_st = jnp.zeros_like(dens)

    # --- masked tendency writes (tile-wise) ---------------------------------
    amask = act > 0
    dens_st_ref[:] = jnp.where(amask, dens_st, 0.0)
    drr_st_ref[:] = jnp.where(amask, cgr, 0.0)
    dmm_st_ref[:] = jnp.where(amask, dmm_st, 0.0)

    @pl.when(i == n_prog - 1)
    def _():
        flux_ref[:] = jnp.zeros_like(flux_ref)
        flux_ref[0:2, :] = acc_ref[:]


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
            pl.BlockSpec((8, 2 * c_pad), lambda i: (0, 0)),        # tablesT
            row, row, row, row, row, row, row, row, row, row, row, row,
        ],
        out_specs=(
            row, row, row,
            pl.BlockSpec((8, c_pad), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((8, c_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c_pad), jnp.float32),   # flux accumulator
            pltpu.VMEM((2, c_pad), jnp.float32),   # Kahan compensation
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(params, tables, dens, r, dr, k, l, m, dm, phi, dkk, dll, area, act)
    return outs


def prepare_inputs(dt, state, statics, bg, cfg):
    """Shared input prep for the fused kernels: returns
    ``(params, tables, fields, dims)`` where ``fields`` is the tuple of
    (n_rows, LANE)-shaped padded f32 ray arrays in kernel argument order and
    ``dims = (n, n_tab, n_flux_cells, c_pad)``.  Used by both the full
    kernel below and the windowed kernel (``rhs_pallas_windowed.py``)."""
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

    zeros = jnp.zeros((c_pad,), jnp.float32)
    # stacked left operand, one (8, 2·c_pad) matrix: row v holds table v in
    # its query block and zeros elsewhere (u and v themselves are never
    # consumed with hprop off, so only shears + ρ̄ are tabulated)
    tables = jnp.stack([
        jnp.concatenate([tab(du_dz), zeros]),      # du/dz @ B_faces(r)
        jnp.concatenate([tab(dv_dz), zeros]),      # dv/dz @ B_faces(r)
        jnp.concatenate([zeros, tab(bg.rhobar)]),  # ρ̄    @ B_centers(r_fin)
        jnp.zeros((2 * c_pad,), jnp.float32),
        jnp.zeros((2 * c_pad,), jnp.float32),
        jnp.zeros((2 * c_pad,), jnp.float32),
        jnp.zeros((2 * c_pad,), jnp.float32),
        jnp.zeros((2 * c_pad,), jnp.float32),
    ])

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

    fields = (
        shape2(rays.dens), shape2(rays.r), shape2(rays.dr, 1.0),
        shape2(rays.k, 1e-5), shape2(rays.l), shape2(rays.m, -1e-3),
        shape2(rays.dm, 1e-6), shape2(rays.phi),
        shape2(statics.dkk, 1.0), shape2(statics.dll, 1.0),
        shape2(statics.rr_mm_area),
        shape2(statics.active.astype(jnp.float32)),
    )
    return params, tables, fields, (n, n_tab, n_flux_cells, c_pad)


def rhs_fused(dt, state, statics, bg, cfg):
    """Fused-RHS entry point: returns ``(ray_tendencies_dict, pm_interior)``
    where ``pm_interior`` is the (2, n_flux_cells) interior flux profile
    (the caller builds the mean-flow tendencies exactly as ``models/rhs.py``
    does).  Requires ``cfg.hprop == False`` and float32 state."""
    params, tables, fields, (n, n_tab, n_flux_cells, _) = prepare_inputs(
        dt, state, statics, bg, cfg
    )
    interpret = jax.default_backend() != "tpu"
    dens_st, drr_st, dmm_st, flux = _rhs_fused_call(
        params, tables, *fields,
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
    return tend, flux[:2, :n_flux_cells]
