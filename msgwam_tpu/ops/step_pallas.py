"""VMEM-resident whole-run megakernel: many full RK3 steps per launch.

The scan-based step path pays, per time step: ~0.1 ms of XLA while-loop
overhead (measured on the tunneled TPU backend), 3 kernel launches, the RK3
stage arithmetic's HBM round-trips, and 3× streaming of the ray state
through VMEM.  At the metric-of-record size (1e5 rays) those fixed costs
*dominate*: the physics itself is ~0.1 ms/step.

This kernel removes all of them at once for states that fit in VMEM
(~16 MB/core → capacity ≤ 131,072 rays; the whole 1e5-ray benchmark state
is ~5 MB): ONE ``pallas_call`` executes ``n_steps`` complete Williamson RK3
steps (``lib/libprop.py:680-700``) with the ray state, the RK3 ``q``
registers, and the mean wind all resident in VMEM.  Per grid step i (= one
time step):

* 3 unrolled stages, each the full coupled RHS (``lib/libprop.py:618-676``)
  in the v3 transposed layout (cells on sublanes, rays on lanes):
  elementwise dispersion/refraction physics on whole (rows, LANE) arrays, a
  ``fori_loop`` over sublane rows for the hat-basis interpolation (shears +
  ρ̄ at the saturation-extrapolated height) and the Kahan-accumulated
  pseudo-momentum-flux deposit;
* the flux→wind coupling (boundary padding, divergence, Coriolis, pressure
  gradient — ``lib/libprop.py:523-558,653-663``) is two host-precomputed
  linear maps applied on the MXU: ``du_dz = u @ SH`` (centered-FD shear
  table) and ``grad = flux @ G`` (pad-edges-then-divergence), each built by
  pushing basis vectors through the exact XLA-path formulas;
* the RK3 q/y updates run in place on VMEM refs (stage 1's ``y += q/3``
  uses the reference's division form).

Scope: ``hprop=False``, ``saturate_online=True``, float32, no
culling/relaunch/prescribed wind inside the kernel (those run through the
scan path).  Equivalence to the XLA path is tested at f32 tolerance over
multi-step trajectories (tests/test_megakernel.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ROT_EARTH

LANE = 128
MAX_ROWS = 1024          # 131,072 rays: ~12.6 MB of VMEM working set


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# scalar-parameter slots (float32 SMEM)
(_G0C, _DZ, _G0F, _DT, _BVF, _KAPPA, _F0, _NPAR) = range(8)

# Williamson low-storage coefficients (lib/libprop.py:693-698)
_RK3_STAGES = ((0.0, None), (5.0 / 9.0, 15.0 / 16.0), (153.0 / 128.0, 8.0 / 15.0))


def _kernel(
    params_ref, maps_ref, rows_ref,
    dens_in, r_in, m_in, u_in, v_in,
    k_ref, l_ref, dr_ref, dm_ref, phi_ref, dkk_ref, dll_ref, area_ref, act_ref,
    dens_o, r_o, m_o, uv_o,
    qd, qr, qm, du_s, dv_s, rho_s, rfin_s, fvk_s, fvl_s, quv,
    *, n_rows: int, n_tab: int, n_flux_cells: int, c_pad: int,
    prognostic: bool, faithful: bool,
):
    i = pl.program_id(0)
    g0c = params_ref[_G0C]
    dz = params_ref[_DZ]
    g0f = params_ref[_G0F]
    dt = params_ref[_DT]
    bvf = params_ref[_BVF]
    kappa = params_ref[_KAPPA]
    f0 = params_ref[_F0]

    @pl.when(i == 0)
    def _():
        dens_o[:] = dens_in[:]
        r_o[:] = r_in[:]
        m_o[:] = m_in[:]
        uv_o[0:1, :] = u_in[0:1, :]
        uv_o[1:2, :] = v_in[0:1, :]
        uv_o[2:8, :] = jnp.zeros((6, c_pad), jnp.float32)

    # static per-ray quantities (hprop off: k, l, phi, dr, dm frozen)
    k = k_ref[:]
    l = l_ref[:]
    dr = dr_ref[:]
    phi = phi_ref[:]
    act = act_ref[:]
    amask = act > 0
    ff2 = (2.0 * ROT_EARTH) * (2.0 * ROT_EARTH) * jnp.sin(phi) * jnp.sin(phi)
    kh2 = k * k + l * l
    pv = jnp.abs(dkk_ref[:] * dll_ref[:] * dm_ref[:])
    nzmax = n_flux_cells - 1
    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz

    col_i = jax.lax.broadcasted_iota(jnp.int32, (c_pad, LANE), 0)
    col_f = col_i.astype(jnp.float32)
    gflo = g0c + col_f * dz
    gfhi = gflo + dz

    def hat(q):
        return jnp.maximum(0.0, 1.0 - jnp.abs(q - col_f))

    def interp2(lhs, B):
        return jax.lax.dot_general(
            lhs, B, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def stage(c_coef, b_coef, first):
        dens = dens_o[:]
        r = r_o[:]
        m = m_o[:]
        u_row = uv_o[0:1, :]
        v_row = uv_o[1:2, :]

        # --- per-ray elementwise physics (lib/libprop.py:369-448,519-520)
        om = jnp.sqrt((bvf * bvf * kh2 + ff2 * m * m) / (kh2 + m * m))
        cgr = -m * (om * om - ff2) / om / (kh2 + m * m)
        rfin_s[:] = r + cgr * dt
        fv = cgr * dens / dz
        r_lo = r - 0.5 * dr
        r_up = r + 0.5 * dr
        nlow = (r_lo / dz).astype(jnp.int32)
        nup = (r_up / dz + 1.0).astype(jnp.int32)
        ood = ((nlow >= nzmax) & (nup >= nzmax)) | ((nlow <= 0) & (nup <= 0))
        live = amask & ~ood
        fvk_s[:] = jnp.where(live, fv * k * pv, 0.0)
        fvl_s[:] = jnp.where(live, fv * l * pv, 0.0)

        # --- shear table from the current wind (one MXU map: u @ SH)
        sh_du = interp2(u_row, maps_ref[0:c_pad, :])        # (1, c_pad)
        sh_dv = interp2(v_row, maps_ref[0:c_pad, :])
        shear = jnp.concatenate([sh_du, sh_dv], axis=0)     # (2, c_pad)
        rho_row = rows_ref[0:1, :]                          # ρ̄ padded

        # --- interpolation + flux deposit over sublane rows ----------------
        def body(j, carry):
            acc, comp = carry
            rj = r_o[j, :][None, :]
            Bf = hat((jnp.clip(rj, g0f, hi_f) - g0f) / dz)
            sh2 = interp2(shear, Bf)                        # (2, LANE)
            du_s[j, :] = sh2[0, :]
            dv_s[j, :] = sh2[1, :]
            rfj = rfin_s[j, :][None, :]
            Br = hat((jnp.clip(rfj, g0c, hi_c) - g0c) / dz)
            rho = interp2(rho_row, Br)
            rho_s[j, :] = rho[0, :]

            rl = r_o[j, :][None, :] - 0.5 * dr_ref[j, :][None, :]
            ru = r_o[j, :][None, :] + 0.5 * dr_ref[j, :][None, :]
            nl = jnp.clip((rl / dz).astype(jnp.int32), 0, nzmax)
            nu = jnp.clip((ru / dz + 1.0).astype(jnp.int32), 0, nzmax)
            in_span = (col_i >= nl) & (col_i < nu)
            wmat = jnp.where(
                in_span,
                jnp.abs(jnp.minimum(gfhi, ru) - jnp.maximum(gflo, rl)),
                0.0,
            )                                               # (c_pad, LANE)
            fv2 = jnp.concatenate(
                [fvk_s[j, :][None, :], fvl_s[j, :][None, :]], axis=0
            )
            part = jax.lax.dot_general(
                fv2, wmat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (2, c_pad)
            y = part - comp
            t = acc + y
            comp = (t - acc) - y
            return t, comp

        acc0 = jnp.zeros((2, c_pad), jnp.float32)
        acc, _ = jax.lax.fori_loop(0, n_rows, body, (acc0, acc0))

        # --- remaining ray tendencies --------------------------------------
        dmm_st = -(k * du_s[:] + l * dv_s[:])               # lib/libprop.py:519
        m_fin = m + dmm_st * dt
        dmm_fin = area_ref[:] / dr
        omh = jnp.sqrt((bvf * bvf * kh2 + f0 * f0 * m * m) / (kh2 + m * m))
        cap = (
            kappa * kappa * 0.5 * rho_s[:] * omh * bvf * bvf
            / (m_fin * m_fin) / (omh * omh - f0 * f0)
        )
        pvol = dkk_ref[:] * dll_ref[:] * dmm_fin
        cap_applied = cap if faithful else cap / pvol
        exceed = cap < dens * pvol
        dens_st = jnp.where(exceed & amask, (cap_applied - dens) / dt, 0.0)
        drr_st = jnp.where(amask, cgr, 0.0)
        dmm_st = jnp.where(amask, dmm_st, 0.0)

        # --- mean-flow tendencies (flux @ G; lib/libprop.py:523-558) -------
        if prognostic:
            grad_u = interp2(acc[0:1, :], maps_ref[c_pad:2 * c_pad, :])
            grad_v = interp2(acc[1:2, :], maps_ref[c_pad:2 * c_pad, :])
            du_mean = f0 * v_row - (rows_ref[1:2, :] + grad_u) * rows_ref[3:4, :]
            dv_mean = -f0 * u_row - (rows_ref[2:3, :] + grad_v) * rows_ref[3:4, :]
        else:
            du_mean = jnp.zeros((1, c_pad), jnp.float32)
            dv_mean = jnp.zeros((1, c_pad), jnp.float32)

        # --- RK3 q/y updates (lib/libprop.py:693-698) ----------------------
        if first:
            qd[:] = dt * dens_st
            qr[:] = dt * drr_st
            qm[:] = dt * dmm_st
            quv[0:1, :] = dt * du_mean
            quv[1:2, :] = dt * dv_mean
            dens_o[:] = dens + qd[:] / 3.0
            r_o[:] = r + qr[:] / 3.0
            m_o[:] = m + qm[:] / 3.0
            uv_o[0:1, :] = u_row + quv[0:1, :] / 3.0
            uv_o[1:2, :] = v_row + quv[1:2, :] / 3.0
        else:
            qd[:] = dt * dens_st - c_coef * qd[:]
            qr[:] = dt * drr_st - c_coef * qr[:]
            qm[:] = dt * dmm_st - c_coef * qm[:]
            quv[0:1, :] = dt * du_mean - c_coef * quv[0:1, :]
            quv[1:2, :] = dt * dv_mean - c_coef * quv[1:2, :]
            dens_o[:] = dens + b_coef * qd[:]
            r_o[:] = r + b_coef * qr[:]
            m_o[:] = m + b_coef * qm[:]
            uv_o[0:1, :] = u_row + b_coef * quv[0:1, :]
            uv_o[1:2, :] = v_row + b_coef * quv[1:2, :]

    stage(0.0, None, True)
    stage(5.0 / 9.0, 15.0 / 16.0, False)
    stage(153.0 / 128.0, 8.0 / 15.0, False)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "n_tab", "n_flux_cells",
                     "prognostic", "faithful", "interpret"),
)
def _megakernel_call(
    params, maps, rows,
    dens, r, m, u_row, v_row,
    k, l, dr, dm, phi, dkk, dll, area, act,
    n_steps: int, n_tab: int, n_flux_cells: int,
    prognostic: bool, faithful: bool, interpret: bool,
):
    n_rows = r.shape[0]
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    kernel = functools.partial(
        _kernel, n_rows=n_rows, n_tab=n_tab, n_flux_cells=n_flux_cells,
        c_pad=c_pad, prognostic=prognostic, faithful=faithful,
    )
    whole = pl.BlockSpec((n_rows, LANE), lambda i: (0, 0))
    row8 = pl.BlockSpec((8, c_pad), lambda i: (0, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # params
            pl.BlockSpec((2 * c_pad, c_pad), lambda i: (0, 0)),   # SH ; G
            row8,                                                 # rows table
            whole, whole, whole, row8, row8,
            whole, whole, whole, whole, whole, whole, whole, whole, whole,
        ],
        out_specs=(whole, whole, whole, row8),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((8, c_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # qd
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # qr
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # qm
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # du
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # dv
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # rho
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # r_fin
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # fvk
            pltpu.VMEM((n_rows, LANE), jnp.float32),   # fvl
            pltpu.VMEM((8, c_pad), jnp.float32),       # q_u / q_v
        ],
        interpret=interpret,
    )(params, maps, rows, dens, r, m, u_row, v_row,
      k, l, dr, dm, phi, dkk, dll, area, act)
    return outs


def _host_linear_map(fn, dim: int) -> np.ndarray:
    """(dim, dim) matrix M with row_out = row_in @ M, built by pushing basis
    vectors through ``fn`` (guarantees the same linear map as the XLA path,
    up to f32 summation of ≤2 terms per output)."""
    cols = [fn(np.eye(dim, dtype=np.float64)[j]) for j in range(dim)]
    return np.stack(cols, axis=0).astype(np.float32)


def build_operators(bg, cfg, n_tab: int, c_pad: int):
    """Host-side static operators + row tables for the megakernel.

    ``bg`` must be concrete (it is run-constant); everything here is NumPy
    so the builder also works when called under an outer ``jit`` trace that
    closes over the background."""
    centers = np.asarray(bg.centers, np.float64)
    dz = float(centers[1] - centers[0])
    n_flux = n_tab - 1
    n_cell = n_tab

    def shear_map(u):
        out = np.zeros(c_pad)
        out[: n_tab - 1] = (u[1:n_tab] - u[: n_tab - 1]) / dz
        return out

    def grad_map(a):
        a = a[:n_flux]
        pmf = np.concatenate([a[:1], a, a[-1:]])
        out = np.zeros(c_pad)
        out[: n_cell] = (pmf[1:] - pmf[:-1]) / dz
        return out

    SH = _host_linear_map(shear_map, c_pad)
    G = _host_linear_map(grad_map, c_pad)
    maps = jnp.asarray(np.concatenate([SH, G], axis=0))   # (2*c_pad, c_pad)

    rhobar_np = np.asarray(bg.rhobar, np.float64)
    pg_np = np.asarray(bg.pressure_gradient, np.float64)
    rho = np.zeros(c_pad, np.float32)
    rho[:n_tab] = rhobar_np[:n_tab]
    pgx = np.zeros(c_pad, np.float32)
    pgy = np.zeros(c_pad, np.float32)
    pgx[:n_cell] = pg_np[0, :n_cell]
    pgy[:n_cell] = pg_np[1, :n_cell]
    inv_rho = np.zeros(c_pad, np.float32)
    inv_rho[:n_cell] = 1.0 / np.maximum(rho[:n_cell], 1e-30)
    rows = np.zeros((8, c_pad), np.float32)
    rows[0] = rho
    rows[1] = pgx
    rows[2] = pgy
    rows[3] = inv_rho
    return maps, jnp.asarray(rows)


def simulate_resident(state, statics, bg, cfg, run, include_t0: bool = False):
    """Drop-in fast path for ``simulate`` on VMEM-sized problems: runs
    ``run.n_steps`` steps as ``n_steps // save_every`` megakernel launches
    (each launch = ``save_every`` full RK3 steps resident in VMEM).

    Returns ``(final_state, statics, history)`` where history is the default
    observable ``(State, active, dens_prop)`` stacked per save point —
    matching ``simulate``'s default history for the supported configuration
    (online saturation ⇒ dens_prop ≡ dens).  Constant-by-structure ray
    fields (lam, phi, dr, k, l, dm) are broadcast from the initial state.

    Requires ``hprop=False``, ``saturate_online=True``, f32 state, capacity
    ≤ 131,072 rays.  For anything else use :func:`msgwam_tpu.simulate`.
    """
    from ..state import RayState, MeanState, State

    if cfg.hprop or not cfg.saturate_online:
        raise ValueError(
            "simulate_resident requires hprop=False, saturate_online=True"
        )
    if run.n_steps % run.save_every:
        raise ValueError("n_steps must be divisible by save_every")
    rays, mean = state.rays, state.mean
    n = rays.r.shape[0]
    n_rows_needed = _ceil_to(n, LANE) // LANE
    if n_rows_needed > MAX_ROWS:
        raise ValueError(
            f"{n} rays exceed the VMEM-resident capacity "
            f"({MAX_ROWS * LANE}); use simulate()"
        )

    n_tab = bg.centers.shape[0]
    n_flux_cells = n_tab - 1
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    maps, rows = build_operators(bg, cfg, n_tab, c_pad)

    f0 = 2.0 * ROT_EARTH * np.sin(float(cfg.phi0))
    centers_np = np.asarray(bg.centers, np.float64)
    faces_np = np.asarray(bg.faces, np.float64)
    dz = np.float32(centers_np[1] - centers_np[0])
    params = jnp.asarray(np.array([
        np.float32(centers_np[0]), dz, np.float32(faces_np[1]),
        np.float32(run.dt), np.float32(cfg.bvf), np.float32(cfg.kappa),
        np.float32(f0), 0.0,
    ], dtype=np.float32))

    n_pad = _ceil_to(max(n, 8 * LANE), 8 * LANE)
    pad = n_pad - n

    def shape2(x, fill=0.0):
        x = jnp.asarray(x).astype(jnp.float32)
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(-1, LANE)

    def rowpad(x):
        x = jnp.asarray(x).astype(jnp.float32)
        out = jnp.zeros((8, c_pad), jnp.float32)
        return out.at[0, : x.shape[0]].set(x)

    statics_fields = (
        shape2(rays.k, 1e-5), shape2(rays.l), shape2(rays.dr, 1.0),
        shape2(rays.dm, 1e-6), shape2(rays.phi),
        shape2(statics.dkk, 1.0), shape2(statics.dll, 1.0),
        shape2(statics.rr_mm_area),
        shape2(statics.active.astype(jnp.float32)),
    )

    interpret = jax.default_backend() != "tpu"
    unshape = lambda x: x.reshape(-1)[:n]

    def chunk(carry, _):
        dens, r, m, u_row, v_row = carry
        dens, r, m, uv = _megakernel_call(
            params, maps, rows, dens, r, m, u_row, v_row, *statics_fields,
            n_steps=run.save_every, n_tab=n_tab, n_flux_cells=n_flux_cells,
            prognostic=bool(cfg.prognostic_mean),
            faithful=bool(cfg.faithful_saturation),
            interpret=interpret,
        )
        u_row = jnp.pad(uv[0:1, :], ((0, 7), (0, 0)))
        v_row = jnp.pad(uv[1:2, :], ((0, 7), (0, 0)))
        return (dens, r, m, u_row, v_row), (dens, r, m, u_row, v_row)

    carry0 = (shape2(rays.dens), shape2(rays.r), shape2(rays.m, -1e-3),
              rowpad(mean.u), rowpad(mean.v))
    n_outer = run.n_steps // run.save_every
    carry, hist = jax.lax.scan(chunk, carry0, None, length=n_outer)

    n_cell = mean.u.shape[0]

    def to_state(dens, r, m, u_row, v_row, like_dtype):
        rs = RayState(
            dens=unshape(dens).astype(like_dtype),
            lam=rays.lam, phi=rays.phi,
            r=unshape(r).astype(like_dtype), dr=rays.dr,
            k=rays.k, l=rays.l,
            m=unshape(m).astype(like_dtype), dm=rays.dm,
        )
        ms = MeanState(u_row[0, :n_cell].astype(like_dtype),
                       v_row[0, :n_cell].astype(like_dtype))
        return State(rs, ms)

    final = to_state(*carry, rays.dens.dtype)

    hd, hr, hm, hu, hv = hist
    frames = [
        to_state(hd[t], hr[t], hm[t], hu[t], hv[t], rays.dens.dtype)
        for t in range(n_outer)
    ]
    if include_t0:
        frames = [state] + frames
    history_state = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    active_hist = jnp.broadcast_to(
        statics.active, (len(frames),) + statics.active.shape
    )
    history = (history_state, active_hist, history_state.rays.dens)
    return final, statics, history
