"""HBM-streaming whole-run megakernel: full RK3 steps at any ray count.

Round 2's VMEM-resident megakernel (``step_pallas.py``) is the fastest
backend at the 1e5 metric of record but is capped at 131,072 rays — the
whole state must fit VMEM.  Round 2 also measured *why* plain stage fusion
was neutral above that size: fusing the RK3 q/y arithmetic into a per-stage
kernel saves ~0.18 ms of XLA glue per step but pays it back streaming the q
registers through HBM uncompensated (``benchmarks/RESULTS.md``).

This kernel keeps the megakernel's whole-run structure — ONE ``pallas_call``
whose sequential 3-D grid ``(n_steps, stages, n_tiles)`` executes
``n_steps`` complete Williamson RK3 steps (``lib/libprop.py:680-700``) —
but streams the per-ray state through VMEM tile by tile:

* the mutable per-ray arrays live in HBM as unblocked ``ANY``-memory-space
  refs: dens/r/m are input/output-aliased (in-place on the caller's
  buffers, which hold the initial state), while the RK3 q registers, the
  offline-mode pre-step state, and dens_prop are plain ``ANY`` *outputs* —
  within one call each is always written (stage 1 / phase 1) before it is
  read (stages 2-3 / phase 4), so they need no initialization at all;
* each (stage, tile) grid point DMAs its (64, 128)-ray slabs into VMEM
  work buffers (``pltpu.make_async_copy``, one semaphore lane per array),
  computes, and DMAs the updated slabs back; every body first waits the
  previous body's store semaphores before reusing the buffers, which
  makes the in-place protocol correct for any tile count;
* the frozen per-ray fields (k, l, dr and the precomputed run constants
  ff², k_h², phase volumes, activity) stream as read-only blocked inputs —
  pallas's pipeline double-buffers those automatically;
* the *small* state — mean wind, RK3 wind register, stage shear/ρ̄ tables,
  and the Kahan-compensated flux accumulator — stays in VMEM scratch
  across the entire run, exactly like the resident megakernel;
* per tile, the same adaptive height window + exact full-width fallback
  as ``rhs_pallas_windowed.py``, MXU flux contractions, in-register q/y
  stage updates;
* stage boundaries ride the grid: at ``tile == 0`` the stage tables are
  rebuilt from the current wind (``shear = SH^T·u``); at the last tile the
  accumulated flux becomes the wind update (``grad = G^T·flux``,
  ``lib/libprop.py:523-558,653-663``).

What this buys over the scan path at 1e6 rays: no per-step kernel
launches, no XLA q/y glue passes (~0.18 ms/step measured), no separate
flux→wind launches — only the irreducible tile streaming remains.

Scope: ``hprop=False``, float32, both saturation modes (online in-stage,
or the reference's offline direct saturation as a 4th grid phase with FD
rates across the step incl. quirk 2 — ``raytracer.py:182-188``).  The
per-step *lifecycle* also runs in-kernel (online mode): critical-level /
out-of-domain culling and template relaunch execute at the stage-3
boundary of every step (``_post_stage``; models/sources.py:174-217
semantics), the activity mask streams with the state, and a transient
imposed wind is read from a per-step host-built table
(``models/integrate.py:370-377`` semantics) — so BASELINE config 4
(tidal + cull + relaunch) runs at full megakernel speed.  Dispatched
automatically by :func:`msgwam_tpu.ops.step_pallas.simulate_resident`
above the VMEM capacity or whenever the lifecycle is enabled;
equivalence vs the scan path is tested in tests/test_megakernel.py and
tests/test_lifecycle_kernel.py.
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
TILE_ROWS = 64            # 8192 rays per streamed tile
# launch-boundary height re-sort default: on at and above this ray count
# (where the windowed tiers dominate and the ~5 ms amortized sort is <2%
# of a launch), off below (the resident kernel owns that regime anyway).
# Measured on TPU v5e: see benchmarks/RESULTS.md (launch-sort section).
LAUNCH_SORT_MIN = 500_000

(_G0C, _DZ, _G0F, _DT, _BVF, _KAPPA, _F0, _RDIV,
 _MMAX, _FLO, _FHI) = range(11)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    params_ref, maps_ref, cols_ref, uv0_ref,
    k_ref, l_ref, dr_ref, pv_ref, ff2_ref, kh2_ref, pvb_ref, act_ref,
    *rest,
    n_tab: int, n_flux_cells: int, c_pad: int, w_cells: int,
    online: bool, prognostic: bool, faithful: bool, t_rows: int,
    cull: bool = False, relaunch: bool = False, prescribed: bool = False,
    n_members: int = 1, ablate: str = "", w2_cells: int = 0,
):
    # optional lifecycle inputs (in signature order): the per-step wind
    # table, the relaunch template, then the aliased dens/r/m(/act)
    # inputs, the outputs, and scratch
    rest = list(rest)
    wind_ref = rest.pop(0) if prescribed else None
    if relaunch:
        srcd_ref, srcr_ref, srcm_ref, srca_ref = rest[:4]
        rest = rest[4:]
    rest = rest[3 + (1 if cull else 0):]   # aliased inputs, unused as such
    # outputs: dens/r/m(/act) (aliased — same HBM as the inputs), then
    # the write-before-read ANY outputs, pp, uv, then scratch
    n_arr = (6 if online else 8) + (1 if cull else 0)   # slabs per body
    if online:
        if cull:
            (dens_h, r_h, m_h, act_h, qd_h, qr_h, qm_h, pp_h, uv_o,
             *rest) = rest
            hbm = (dens_h, r_h, m_h, qd_h, qr_h, qm_h, act_h)
        else:
            (dens_h, r_h, m_h, qd_h, qr_h, qm_h, pp_h, uv_o,
             *rest) = rest
            hbm = (dens_h, r_h, m_h, qd_h, qr_h, qm_h)
    else:
        (dens_h, r_h, m_h, qd_h, qr_h, qm_h, rp_h, mp_h, pp_h, uv_o,
         *rest) = rest
        hbm = (dens_h, r_h, m_h, qd_h, qr_h, qm_h, rp_h, mp_h)
    ib = rest[:n_arr]                  # double-buffered load targets
    ob = rest[n_arr:2 * n_arr]         # double-buffered store sources
    (pp_b, tabs_m, acc_ref, comp_m, quv, uv_s,
     load_sem, store_sem, pp_sem) = rest[2 * n_arr:]

    step = pl.program_id(0)
    st = pl.program_id(1)             # 0-2: RK3 stages; 3 (offline): sat
    tl = pl.program_id(2)
    n_tiles = pl.num_programs(2)
    n_steps = pl.num_programs(0)
    n_st = pl.num_programs(1)

    g0c = params_ref[_G0C]
    dz = params_ref[_DZ]
    g0f = params_ref[_G0F]
    dt = params_ref[_DT]
    bvf = params_ref[_BVF]
    kappa = params_ref[_KAPPA]
    f0 = params_ref[_F0]
    W = w_cells
    W2 = w2_cells                  # 0 = tier disabled
    T = t_rows

    first_body = (step == 0) & (st == 0) & (tl == 0)
    last_body = (step == n_steps - 1) & (st == n_st - 1) \
        & (tl == n_tiles - 1)
    pp_phase = (step == n_steps - 1) & (st == n_st - 1)

    # --- ensemble tiling --------------------------------------------------
    # n_members > 1 runs a whole independent-member ensemble in this one
    # launch: the tile range is partitioned contiguously among members
    # (each member's ray slabs padded to whole tiles host-side).  The wind
    # state (uv_s), its RK3 register (quv), the stage tables, and the flux
    # accumulator all carry a member axis as stacked (E*c_pad, 8) column
    # blocks, so ALL per-member stage-boundary work batches into two
    # kernel bodies per stage — every member's stage table is built at the
    # stage's first tile (the winds are final from the previous stage) and
    # every member's flux→wind update runs at the stage's last tile —
    # instead of 2·E bodies interleaved with the tile stream.  Members
    # share bg/config (ensemble.py's config-5 contract); per-member state
    # diversity lives in the ray slabs.
    tpm = n_tiles // n_members
    me = tl // tpm                     # this tile's member index
    moff = me * c_pad if n_members > 1 else 0   # member's column-block row

    # --- double-buffered DMA pipeline -------------------------------------
    # Linear body index g selects the buffer-set parity.  Loads for body g
    # are issued as a *prefetch* during body g-1 (overlapped with its
    # compute); stores from body g are issued at its end and waited only
    # when the same out-buffer set is reused at body g+2.  In-buffers and
    # out-buffers are separate, so prefetch loads never race pending
    # stores.  HBM RAW (a tile's stage-s store vs its stage-(s+1) load,
    # n_tiles bodies apart) is covered by the reuse wait for n_tiles >= 3
    # (enforced by the driver).
    g = (step * n_st + st) * n_tiles + tl
    cur = g % 2
    nxt = 1 - cur
    ci = pl.ds(cur * T, T)
    t_next = jnp.where(tl == n_tiles - 1, 0, tl + 1)

    def issue_loads(set_idx, tile_idx):
        hs = pl.ds(tile_idx * T, T)
        bs = pl.ds(set_idx * T, T)
        for a in range(n_arr):
            pltpu.make_async_copy(
                hbm[a].at[hs, :], ib[a].at[bs, :],
                load_sem.at[set_idx, a]).start()

    def wait_set(sem, set_idx):
        ref = ib[0].at[pl.ds(0, T), :]
        for a in range(n_arr):
            pltpu.make_async_copy(ref, ref, sem.at[set_idx, a]).wait()

    class _RW:
        """Read-from-in-buffer / write-to-out-buffer slab view."""

        def __init__(self, i, o):
            self.i, self.o = i, o

        def __getitem__(self, _):
            return self.i[ci, :]

        def __setitem__(self, _, v):
            self.o[ci, :] = v

    dens_b, r_b, m_b, qd_b, qr_b, qm_b = (
        _RW(ib[a], ob[a]) for a in range(6))
    if not online:
        rp_b, mp_b = _RW(ib[6], ob[6]), _RW(ib[7], ob[7])
    if cull:
        act_sb = _RW(ib[6], ob[6])     # streamed activity mask (online)

    @pl.when(g >= 2)
    def _():
        wait_set(store_sem, cur)       # out-buffer set reuse (body g-2)

    # the previous tile's dens_prop store reads pp_b — drain before reuse
    @pl.when(pp_phase & (tl > 0))
    def _():
        pltpu.make_async_copy(pp_b, pp_b, pp_sem).wait()

    @pl.when(first_body)
    def _():
        issue_loads(0, 0)
        uv_s[:] = uv0_ref[:]

    wait_set(load_sem, cur)            # this body's loads (prefetched)

    @pl.when(~last_body)
    def _():
        issue_loads(nxt, t_next)       # prefetch the next body's tile

    if prescribed:
        # imposed transient wind: overwrite the mean wind from this step's
        # row of the host-built table before the stage tables are built
        # (the scan path sets state.mean from wind_fn(t) at the top of
        # each step — models/integrate.py:370-377)
        @pl.when((tl == 0) & (st == 0))
        def _():
            pad8 = jnp.concatenate(
                [jnp.eye(2, dtype=jnp.float32),
                 jnp.zeros((2, 6), jnp.float32)], axis=1)
            w_all = wind_ref[0]        # (2, c_pad) shared | (2E, c_pad)
            if w_all.shape[0] == 2:
                # member-SHARED wind (e.g. one tidal phase): one dot, the
                # same row written to every member's block — a static
                # loop, once per step
                wrow = jax.lax.dot_general(
                    w_all, pad8,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # (c_pad, 8)
                for e in range(n_members):
                    uv_s[pl.ds(e * c_pad, c_pad), :] = wrow
            else:
                # per-MEMBER wind table (stochastic-background ensembles,
                # BASELINE config 5's spirit): rows [2e, 2e+2) hold member
                # e's (u, v) for this step
                for e in range(n_members):
                    wrow = jax.lax.dot_general(
                        jax.lax.slice(w_all, (2 * e, 0),
                                      (2 * e + 2, w_all.shape[1])),
                        pad8,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    uv_s[pl.ds(e * c_pad, c_pad), :] = wrow

    # --- per-stage setup (once per stage, every member's table) -----------
    @pl.when((tl == 0) & (st < 3))
    def _():
        for e in range(n_members):
            esl = pl.ds(e * c_pad, c_pad)                   # static offset
            sh_cols = jax.lax.dot_general(
                maps_ref[0:c_pad, :], uv_s[esl, :],
                dimension_numbers=((((0,), (0,))), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (c_pad, 8)
            tabs_m[esl, 0:2] = sh_cols[:, 0:2]
            tabs_m[esl, 2:3] = cols_ref[:, 0:1]             # ρ̄
            tabs_m[esl, 3:8] = jnp.zeros((c_pad, 5), jnp.float32)
        acc_ref[:] = jnp.zeros((n_members * c_pad, 8), jnp.float32)
        comp_m[:] = jnp.zeros((n_members * c_pad, 8), jnp.float32)

    nzmax_i = n_flux_cells - 1
    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz

    col_full = jax.lax.broadcasted_iota(jnp.int32, (c_pad, LANE), 0)
    col_full_f = col_full.astype(jnp.float32)
    col_win_i = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
    col_win = col_win_i.astype(jnp.float32)
    if W2:
        col_win2_i = jax.lax.broadcasted_iota(jnp.int32, (W2, LANE), 0)
        col_win2 = col_win2_i.astype(jnp.float32)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kahan_acc(part, sl):
        y = part - comp_m[sl, :]
        t = acc_ref[sl, :] + y
        comp_m[sl, :] = (t - acc_ref[sl, :]) - y
        acc_ref[sl, :] = t

    def _rk3_update(dens_st, drr_st, dmm_st, dens, r, m):
        c_coef = jnp.where(st == 1, 5.0 / 9.0,
                           jnp.where(st == 2, 153.0 / 128.0, 0.0))
        b_coef = jnp.where(st == 1, 15.0 / 16.0,
                           jnp.where(st == 2, 8.0 / 15.0, 1.0))
        first = st == 0

        def upd(q_b, y_b, tend, y_val):
            q_new = jnp.where(first, dt * tend, dt * tend - c_coef * q_b[:])
            # stage 1 adds q/3 via *division*, exactly like lib/libprop.py:694
            y_new = jnp.where(first, y_val + q_new / 3.0,
                              y_val + b_coef * q_new)
            q_b[:] = q_new
            y_b[:] = y_new
            return y_new

        if not online:
            # pre-step state for the stage-4 FD rates, captured before the
            # work buffers are overwritten with the stage-1 result
            rp_b[:] = jnp.where(first, r, rp_b[:])
            mp_b[:] = jnp.where(first, m, mp_b[:])
        dens_new = upd(qd_b, dens_b, dens_st, dens)
        r_new = upd(qr_b, r_b, drr_st, r)
        m_new = upd(qm_b, m_b, dmm_st, m)
        if online:
            # dens_prop ≡ the post-step density in online mode; only the
            # final step's value is streamed out (pp_phase)
            pp_b[:] = dens_new
        return dens_new, r_new, m_new

    def _stage_tile():
        dens = dens_b[:]
        r = r_b[:]
        m = m_b[:]
        k = k_ref[:]
        l = l_ref[:]
        dr = dr_ref[:]
        act = act_sb[:] if cull else act_ref[:]
        amask = act > 0

        ff2 = ff2_ref[:]
        kh2 = kh2_ref[:]
        pv = pv_ref[:]
        k2 = kh2 + m * m
        # dispersion via one reciprocal + one rsqrt instead of 3 divides +
        # 1 sqrt per ray (lib/libprop.py:434-448 algebra unchanged:
        # (ω̂²-f²)/ω̂/k² = (ω̂²-f²)·rsqrt(ω̂²)/k²); the VPU retires divides
        # and square roots at a fraction of mul throughput, and this block
        # runs per ray per stage — part of the W-independent time floor
        om2 = (bvf * bvf * kh2 + ff2 * m * m) * (1.0 / k2)
        cgr = -m * (om2 - ff2) * jax.lax.rsqrt(om2) * (1.0 / k2)
        r_fin = r + cgr * dt
        idz = 1.0 / dz                 # scalar; hoisted by the compiler
        fv = cgr * dens * idz
        r_lo = r - 0.5 * dr
        r_up = r + 0.5 * dr
        nlow = (r_lo * idz).astype(jnp.int32)
        nup = (r_up * idz + 1.0).astype(jnp.int32)
        ood = ((nlow >= nzmax_i) & (nup >= nzmax_i)) \
            | ((nlow <= 0) & (nup <= 0))
        live = amask & ~ood
        fvk = jnp.where(live, fv * k * pv, 0.0)
        fvl = jnp.where(live, fv * l * pv, 0.0)
        nlow = jnp.clip(nlow, 0, nzmax_i)
        nup = jnp.clip(nup, 0, nzmax_i)

        # --- per-tile window from the tile's own touched-cell bounds -------
        qf_t = (jnp.clip(r, g0f, hi_f) - g0f) * idz
        qr_t = (jnp.clip(r_fin, g0c, hi_c) - g0c) * idz
        lo_t = jnp.minimum(
            jnp.minimum(jnp.floor(qf_t), jnp.floor(qr_t)) - 1.0,
            nlow.astype(jnp.float32))
        hi_t = jnp.maximum(
            jnp.maximum(jnp.floor(qf_t), jnp.floor(qr_t)) + 2.0,
            nup.astype(jnp.float32))
        lo_t = jnp.where(amask, lo_t, 1e9)
        hi_t = jnp.where(amask, hi_t, -1e9)
        lo_min8 = (jnp.min(lo_t).astype(jnp.int32) // 8) * 8
        hi_max = jnp.max(hi_t)
        win = jnp.clip(lo_min8, 0, c_pad - W)
        winf = win.astype(jnp.float32)
        ok = hi_max - winf <= W
        if W2:
            # second tier: the span distribution is bimodal (coherent
            # blocks vs the dispersive fast tail at 80-100 cells —
            # tools/span_study.py), so one wide retry recovers most of
            # the full-width penalty before the exact fallback
            win2 = jnp.clip(lo_min8, 0, c_pad - W2)
            fits2 = hi_max - win2.astype(jnp.float32) <= W2
            ok2 = (~ok) & fits2
            full_cond = (~ok) & (~fits2)
        else:
            full_cond = ~ok

        def finish(du_rows, dv_rows, rho_rows):
            du_t = jnp.stack(du_rows)
            dv_t = jnp.stack(dv_rows)
            dmm_st = -(k * du_t + l * dv_t)         # lib/libprop.py:519
            if online:
                rho_t = jnp.stack(rho_rows)
                m_fin = m + dmm_st * dt
                # same 1-div + 1-rsqrt factoring as the dispersion block:
                # ω̂·/(m²(ω̂²-f₀²)) = ω̂²·rsqrt(ω̂²)/(m²(ω̂²-f₀²))
                omh2 = (bvf * bvf * kh2 + f0 * f0 * m * m) * (1.0 / k2)
                cap = (
                    kappa * kappa * 0.5 * rho_t * omh2
                    * jax.lax.rsqrt(omh2) * bvf * bvf
                    / (m_fin * m_fin * (omh2 - f0 * f0))
                )
                # pvb = dkk·dll·area; dmm_final = area/dr (area preservation)
                pvol = pvb_ref[:] / dr
                cap_applied = cap if faithful else cap / pvol
                exceed = cap < dens * pvol
                dens_st = jnp.where(exceed & amask,
                                    (cap_applied - dens) * (1.0 / dt), 0.0)
            else:
                dens_st = jnp.zeros_like(dens)
            drr_st = jnp.where(amask, cgr, 0.0)
            dmm_st = jnp.where(amask, dmm_st, 0.0)
            return dens_st, drr_st, dmm_st

        def _post_stage(dens_st, drr_st, dmm_st):
            """RK3 update, then (when enabled) the per-step lifecycle:
            cull (mask flip — models/sources.py:174-193) and relaunch from
            the frozen template (sources.py:196-217), exactly at the step
            boundary (stage 3), matching the scan body's step → cull →
            relaunch ordering (models/integrate.py:378-398).  The RK3 q
            registers need no reset: stage 1 of the next step overwrites
            them unconditionally."""
            d_n, r_n, m_n = _rk3_update(dens_st, drr_st, dmm_st, dens, r, m)
            if not cull:
                return

            @pl.when(st < 2)
            def _():
                act_sb[:] = act        # copy-through on non-final stages

            @pl.when(st == 2)
            def _():
                out = ((r_n - 0.5 * dr) >= params_ref[_FHI]) \
                    | ((r_n + 0.5 * dr) <= params_ref[_FLO])
                crit = jnp.abs(m_n) > params_ref[_MMAX]
                finite = jnp.isfinite(d_n) & jnp.isfinite(r_n) \
                    & jnp.isfinite(m_n)
                new_act = amask & ~out & ~crit & finite
                if relaunch:
                    # refill every inactive slot from the template
                    # (sources.py:206-217); dens_prop (pp_b) keeps the
                    # pre-relaunch value, like the scan path's aux
                    dens_b[:] = jnp.where(new_act, d_n, srcd_ref[:])
                    r_b[:] = jnp.where(new_act, r_n, srcr_ref[:])
                    m_b[:] = jnp.where(new_act, m_n, srcm_ref[:])
                    act_f = new_act | (srca_ref[:] > 0)
                else:
                    act_f = new_act
                act_sb[:] = act_f.astype(jnp.float32)

        def _windowed_tier(Wv, winv, col_i, col_f):
            winfv = winv.astype(jnp.float32)
            tabw = tabs_m[pl.ds(moff + winv, Wv), :]        # (Wv, 8)
            tab_duv = tabw[:, 0:2]
            tab_rho = tabw[:, 2:3]
            gflo = g0c + (winfv + col_f) * dz
            gfhi = gflo + dz
            colw = col_i + winv
            # per-row hat-basis coordinates, hoisted out of the loop: the
            # window-bound scan above already computed qf_t/qr_t, and the
            # windowed basis only shifts them by winfv (same f32
            # association as the original in-loop expression)
            qf_w = qf_t - winfv
            if online:
                qr_w = qr_t - winfv

            du_rows, dv_rows, rho_rows = [], [], []
            acc2 = jnp.zeros((Wv, 2), jnp.float32)
            zrow = jnp.zeros((LANE,), jnp.float32)
            for j in range(T):
                if ablate == "noloop":
                    du_rows.append(zrow)
                    dv_rows.append(zrow)
                    if online:
                        rho_rows.append(zrow)
                    continue
                Bf = jnp.maximum(
                    0.0, 1.0 - jnp.abs(qf_w[j, :][None, :] - col_f))
                # one small MXU contraction replaces two VPU mul +
                # cross-sublane reductions
                duv = dot(tab_duv, Bf, ((0,), (0,)))        # (2, LANE)
                du_rows.append(duv[0, :])
                dv_rows.append(duv[1, :])
                if online:
                    Br = jnp.maximum(
                        0.0, 1.0 - jnp.abs(qr_w[j, :][None, :] - col_f))
                    rho_rows.append(dot(tab_rho, Br, ((0,), (0,)))[0, :])

                if ablate == "nodeposit":
                    continue
                in_span = (colw >= nlow[j, :][None, :]) \
                    & (colw < nup[j, :][None, :])
                wmat = jnp.where(
                    in_span,
                    jnp.abs(jnp.minimum(gfhi, r_up[j, :][None, :])
                            - jnp.maximum(gflo, r_lo[j, :][None, :])),
                    0.0,
                )                                           # (Wv, LANE)
                fv2 = jnp.concatenate(
                    [fvk[j, :][None, :], fvl[j, :][None, :]], axis=0)
                acc2 = acc2 + dot(wmat, fv2, ((1,), (1,)))

            tile_acc = jnp.concatenate(
                [acc2, jnp.zeros((Wv, 6), jnp.float32)], axis=1)
            dens_st, drr_st, dmm_st = finish(du_rows, dv_rows, rho_rows)
            _post_stage(dens_st, drr_st, dmm_st)
            if not ablate:
                kahan_acc(tile_acc, pl.ds(moff + winv, Wv))

        @pl.when(ok)
        def _windowed():
            _windowed_tier(W, win, col_win_i, col_win)

        if W2:
            @pl.when(ok2)
            def _windowed2():
                _windowed_tier(W2, win2, col_win2_i, col_win2)

        @pl.when(full_cond)
        def _full():
            tab_rows = dot(
                jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                                 jnp.zeros((3, 5), jnp.float32)], axis=1),
                tabs_m[pl.ds(moff, c_pad), :], ((1,), (1,)),
            )                                               # (3, c_pad)
            shear_rows = tab_rows[0:2, :]
            rho_row = tab_rows[2:3, :]
            gflo = g0c + col_full_f * dz
            gfhi = gflo + dz

            du_rows, dv_rows, rho_rows = [], [], []
            acc2 = jnp.zeros((c_pad, 2), jnp.float32)
            zrow = jnp.zeros((LANE,), jnp.float32)
            for j in range(T):
                if ablate == "noloop":
                    du_rows.append(zrow)
                    dv_rows.append(zrow)
                    if online:
                        rho_rows.append(zrow)
                    continue
                Bf = jnp.maximum(
                    0.0, 1.0 - jnp.abs(qf_t[j, :][None, :] - col_full_f))
                sh2 = dot(shear_rows, Bf, ((1,), (0,)))
                du_rows.append(sh2[0, :])
                dv_rows.append(sh2[1, :])
                if online:
                    Br = jnp.maximum(
                        0.0, 1.0 - jnp.abs(
                            qr_t[j, :][None, :] - col_full_f))
                    rho_rows.append(dot(rho_row, Br, ((1,), (0,)))[0, :])

                if ablate == "nodeposit":
                    continue
                in_span = (col_full >= nlow[j, :][None, :]) \
                    & (col_full < nup[j, :][None, :])
                wmat = jnp.where(
                    in_span,
                    jnp.abs(jnp.minimum(gfhi, r_up[j, :][None, :])
                            - jnp.maximum(gflo, r_lo[j, :][None, :])),
                    0.0,
                )                                           # (c_pad, LANE)
                fv2 = jnp.concatenate(
                    [fvk[j, :][None, :], fvl[j, :][None, :]], axis=0)
                acc2 = acc2 + dot(wmat, fv2, ((1,), (1,)))

            tile_acc = jnp.concatenate(
                [acc2, jnp.zeros((c_pad, 6), jnp.float32)], axis=1)
            dens_st, drr_st, dmm_st = finish(du_rows, dv_rows, rho_rows)
            _post_stage(dens_st, drr_st, dmm_st)
            if not ablate:
                kahan_acc(tile_acc, pl.ds(moff, c_pad))

        # --- stage completion: flux -> wind (stage's last tile; all
        # members batched — only the per-member gradient contraction is a
        # loop, the RK3 wind update runs elementwise over the stacked
        # (E*c_pad, 8) blocks in one go) --------------------------------
        @pl.when(tl == n_tiles - 1)
        def _():
            if prognostic:
                grads = [
                    jax.lax.dot_general(
                        maps_ref[c_pad:2 * c_pad, :],
                        acc_ref[pl.ds(e * c_pad, c_pad), :],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                       # (c_pad, 8)
                    for e in range(n_members)
                ]
                grad = grads[0] if n_members == 1 \
                    else jnp.concatenate(grads, axis=0)     # (E*c_pad, 8)
                cols_t = cols_ref[:] if n_members == 1 else jnp.concatenate(
                    [cols_ref[:]] * n_members, axis=0)
                uvT = uv_s[:]
                du_col = f0 * uvT[:, 1:2] \
                    - (cols_t[:, 1:2] + grad[:, 0:1]) * cols_t[:, 3:4]
                dv_col = -f0 * uvT[:, 0:1] \
                    - (cols_t[:, 2:3] + grad[:, 1:2]) * cols_t[:, 3:4]
                duv = jnp.concatenate(
                    [du_col, dv_col,
                     jnp.zeros((n_members * c_pad, 6), jnp.float32)],
                    axis=1)
                first = st == 0
                c_coef = jnp.where(st == 1, 5.0 / 9.0,
                                   jnp.where(st == 2, 153.0 / 128.0, 0.0))
                b_coef = jnp.where(st == 1, 15.0 / 16.0,
                                   jnp.where(st == 2, 8.0 / 15.0, 1.0))
                q_new = jnp.where(first, dt * duv,
                                  dt * duv - c_coef * quv[:])
                uv_s[:] = jnp.where(first, uvT + q_new / 3.0,
                                    uvT + b_coef * q_new)
                quv[:] = q_new
            uv_o[:] = uv_s[:]

    def _offline_saturation_tile():
        # driver-side direct saturation with FD rates across the completed
        # step (raytracer.py:182-188 -> lib/libprop.py:561-610), including
        # quirk 2 (the height rate divided by RDIV=1 in faithful mode)
        rdiv = params_ref[_RDIV]
        r_p = rp_b[:]
        m_p = mp_b[:]
        r_n = r_b[:]
        m_n = m_b[:]
        dens_n = dens_b[:]
        dr = dr_ref[:]
        act = act_ref[:]
        amask = act > 0

        r_rate = (r_n - r_p) / rdiv
        m_rate = (m_n - m_p) / dt
        r_fin = r_p + r_rate * dt                  # lib/libprop.py:591
        m_fin = m_p + m_rate * dt
        pvb = pvb_ref[:]

        # ρ̄ at the extrapolated height: per-tile window, full-width fallback
        qr_t = (jnp.clip(r_fin, g0c, hi_c) - g0c) / dz
        lo_t = jnp.where(amask, jnp.floor(qr_t) - 1.0, 1e9)
        hi_t = jnp.where(amask, jnp.floor(qr_t) + 2.0, -1e9)
        win = jnp.clip((jnp.min(lo_t).astype(jnp.int32) // 8) * 8,
                       0, c_pad - W)
        winf = win.astype(jnp.float32)
        ok = jnp.max(hi_t) - winf <= W

        @pl.when(ok)
        def _win():
            tab_rho = tabs_m[pl.ds(moff + win, W), 2:3]
            qr_w = qr_t - winf
            rows = []
            for j in range(T):
                Br = jnp.maximum(
                    0.0, 1.0 - jnp.abs(qr_w[j, :][None, :] - col_win))
                rows.append(jnp.sum(tab_rho * Br, axis=0))
            pp_b[:] = jnp.stack(rows)      # pp buffer doubles as ρ̄ temp

        @pl.when(~ok)
        def _fullw():
            rho_row = jax.lax.dot_general(
                jnp.concatenate([jnp.zeros((1, 2), jnp.float32),
                                 jnp.ones((1, 1), jnp.float32),
                                 jnp.zeros((1, 5), jnp.float32)], axis=1),
                tabs_m[pl.ds(moff, c_pad), :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (1, c_pad)
            rows = []
            for j in range(T):
                Br = jnp.maximum(
                    0.0, 1.0 - jnp.abs(qr_t[j, :][None, :] - col_full_f))
                rho = jax.lax.dot_general(
                    rho_row, Br,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                rows.append(rho[0, :])
            pp_b[:] = jnp.stack(rows)

        rho_t = pp_b[:]
        kh2 = kh2_ref[:]
        # pre-step m, phi0; 1-div + 1-rsqrt factoring (see _stage_tile)
        omh2 = (bvf * bvf * kh2 + f0 * f0 * m_p * m_p) \
            * (1.0 / (kh2 + m_p * m_p))
        cap = (
            kappa * kappa * 0.5 * rho_t * omh2
            * jax.lax.rsqrt(omh2) * bvf * bvf
            / (m_fin * m_fin * (omh2 - f0 * f0))
        )
        # dmm_fin = area/dr (dr rate is exactly 0); pvb = dkk·dll·area
        pvol = pvb / dr
        cap_applied = cap if faithful else cap / pvol
        exceed = (cap < dens_n * pvol) & amask
        dens_b[:] = jnp.where(exceed, cap_applied, dens_n)
        pp_b[:] = dens_n                           # propagated (pre-sat)
        # copy-through: the store DMA reads the OUT-buffers, so every
        # unchanged array must be forwarded through this phase explicitly
        r_b[:] = r_n
        m_b[:] = m_n
        qd_b[:] = qd_b[:]
        qr_b[:] = qr_b[:]
        qm_b[:] = qm_b[:]
        rp_b[:] = r_p
        mp_b[:] = m_p

    if online:
        _stage_tile()
    else:
        pl.when(st < 3)(_stage_tile)
        pl.when(st == 3)(_offline_saturation_tile)

    # updated slabs back to the HBM state; waited when this out-buffer set
    # is reused two bodies later (or at the last body)
    hs = pl.ds(tl * T, T)
    for a in range(n_arr):
        pltpu.make_async_copy(
            ob[a].at[ci, :], hbm[a].at[hs, :], store_sem.at[cur, a]).start()

    @pl.when(pp_phase)
    def _():
        # final step's dens_prop slab (waited at the next body's start, or
        # below for the very last body)
        pltpu.make_async_copy(pp_b, pp_h.at[hs, :], pp_sem).start()

    @pl.when(last_body)
    def _():
        wait_set(store_sem, cur)
        wait_set(store_sem, nxt)       # stores issued by body g-1
        pltpu.make_async_copy(pp_b, pp_b, pp_sem).wait()


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "n_tab", "n_flux_cells", "w_cells",
                     "online", "prognostic", "faithful", "interpret",
                     "t_rows", "cull", "relaunch", "ablate", "w2_cells"),
)
def _streamkernel_call(
    params, maps, cols, uvT,
    k, l, dr, pv, ff2, kh2, pvb, act,
    dens, r, m,
    n_steps: int, n_tab: int, n_flux_cells: int, w_cells: int,
    online: bool, prognostic: bool, faithful: bool, interpret: bool,
    t_rows: int = TILE_ROWS,
    wind=None, src=None, act_s=None,
    cull: bool = False, relaunch: bool = False,
    ablate: str = "", w2_cells: int = 0,
):
    n_rows = r.shape[0]
    n_tiles = n_rows // t_rows
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    prescribed = wind is not None
    # ensemble: uvT stacks one (c_pad, 8) wind-column block per member
    n_members = uvT.shape[0] // c_pad
    if n_members * c_pad != uvT.shape[0] or n_tiles % max(n_members, 1):
        raise ValueError("uvT rows / tile count not member-divisible")
    kernel = functools.partial(
        _kernel, n_tab=n_tab, n_flux_cells=n_flux_cells, c_pad=c_pad,
        w_cells=w_cells, online=online, prognostic=prognostic,
        faithful=faithful, t_rows=t_rows,
        cull=cull, relaunch=relaunch, prescribed=prescribed,
        n_members=n_members, ablate=ablate, w2_cells=w2_cells,
    )
    n_st = 3 if online else 4
    n_arr = (6 if online else 8) + (1 if cull else 0)
    n_aliased = 3 + (1 if cull else 0)

    tile = pl.BlockSpec((t_rows, LANE), lambda i, s, t: (t, 0))
    col8 = pl.BlockSpec((c_pad, 8), lambda i, s, t: (0, 0))
    uv8 = pl.BlockSpec((n_members * c_pad, 8), lambda i, s, t: (0, 0))
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    big = jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32)

    # optional lifecycle inputs between the frozen fields and the aliased
    # state: the per-step wind table (one (2, c_pad) row per step) and the
    # relaunch template slabs
    extra_in, extra_specs = [], []
    if prescribed:
        if wind.shape[1] not in (2, 2 * n_members):
            raise ValueError(
                f"wind table rows {wind.shape[1]} must be 2 (member-"
                f"shared) or 2*n_members={2 * n_members} (per-member)")
        extra_in.append(wind)
        extra_specs.append(
            pl.BlockSpec((1, wind.shape[1], c_pad),
                         lambda i, s, t: (i, 0, 0)))
    if relaunch:
        extra_in += list(src)
        extra_specs += [tile] * 4
    if cull:
        # the frozen act input is dead when act streams: point every body
        # at block 0 of a dummy so the pipeline never re-fetches it
        act_in = jnp.zeros((t_rows, LANE), jnp.float32)
        act_spec = pl.BlockSpec((t_rows, LANE), lambda i, s, t: (0, 0))
        aliased = [dens, r, m, act_s]
    else:
        act_in, act_spec = act, tile
        aliased = [dens, r, m]
    base = 12 + len(extra_in)
    aliases = {base + j: j for j in range(n_aliased)}

    # outputs: dens/r/m(/act) (aliased), q registers (+ offline pre-step
    # state), dens_prop — all unblocked ANY (HBM) — and the final wind
    n_out_any = n_arr + 1
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps, n_st, n_tiles),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec((2 * c_pad, c_pad), lambda i, s, t: (0, 0)),
             col8, uv8]
            + [tile] * 7 + [act_spec]        # frozen per-ray fields
            + extra_specs
            + [anyspec] * n_aliased          # state (aliased in-place)
        ),
        out_specs=tuple([anyspec] * n_out_any + [uv8]),
        out_shape=tuple([big] * n_out_any
                        + [jax.ShapeDtypeStruct((n_members * c_pad, 8),
                                                jnp.float32)]),
        input_output_aliases=aliases,
        scratch_shapes=(
            [pltpu.VMEM((2 * t_rows, LANE), jnp.float32)
             for _ in range(n_arr)]          # in-buffers (2 sets)
            + [pltpu.VMEM((2 * t_rows, LANE), jnp.float32)
               for _ in range(n_arr)]        # out-buffers (2 sets)
            + [
                pltpu.VMEM((t_rows, LANE), jnp.float32),  # pp buffer
                pltpu.VMEM((n_members * c_pad, 8),
                           jnp.float32),              # stage tables
                pltpu.VMEM((n_members * c_pad, 8),
                           jnp.float32),              # flux accumulator
                pltpu.VMEM((n_members * c_pad, 8),
                           jnp.float32),              # Kahan compensation
                pltpu.VMEM((n_members * c_pad, 8), jnp.float32),  # q_uv
                pltpu.VMEM((n_members * c_pad, 8), jnp.float32),  # wind
                pltpu.SemaphoreType.DMA((2, n_arr)),   # load semaphores
                pltpu.SemaphoreType.DMA((2, n_arr)),   # store semaphores
                pltpu.SemaphoreType.DMA(()),           # dens_prop semaphore
            ]
        ),
        interpret=interpret,
    )(params, maps, cols, uvT, k, l, dr, pv, ff2, kh2, pvb, act_in,
      *extra_in, *aliased)
    dens_n, r_n, m_n = outs[0], outs[1], outs[2]
    pp = outs[n_arr]
    uv = outs[-1]
    if cull:
        return dens_n, r_n, m_n, uv, pp, outs[3]
    return dens_n, r_n, m_n, uv, pp


def _check_relaunch_template(src_rays, src_statics, rays, statics):
    """Best-effort eager guard shared by both streaming drivers: in-kernel
    relaunch keeps each ray's frozen fields resident for the whole run, so
    a template that changes them would silently produce wrong physics (and
    a forward/backward mismatch — the scan-path VJP's relaunch substitutes
    every template field, models/sources.py:196-217).  Under jit the
    values are abstract and the check is skipped; launch-site templates
    (the supported case) always pass."""
    for fname, a, b in (
        ("k", src_rays.k, rays.k),
        ("l", src_rays.l, rays.l),
        ("dr", src_rays.dr, rays.dr),
        ("dm", src_rays.dm, rays.dm),
        ("phi", src_rays.phi, rays.phi),
        ("dkk", src_statics.dkk, statics.dkk),
        ("dll", src_statics.dll, statics.dll),
        ("rr_mm_area", src_statics.rr_mm_area, statics.rr_mm_area),
    ):
        if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
            continue
        if not np.array_equal(np.asarray(a, np.float32),
                              np.asarray(b, np.float32)):
            raise ValueError(
                "in-kernel relaunch keeps the per-ray frozen fields "
                f"resident for the whole run, but the template's {fname!r} "
                "differs from the running state's; use simulate() for "
                "templates that change a ray's frozen properties")


def _src_slabs(src_rays, src_statics, shape2):
    """Relaunch template slabs in the kernel's streamed layout (shared by
    the single-member and ensemble drivers)."""
    return (shape2(src_rays.dens), shape2(src_rays.r), shape2(src_rays.m),
            shape2(src_statics.active.astype(jnp.float32), fill=0.0))


def _grid_params(bg, cfg, run):
    """SMEM params vector (positionally coupled to ``_G0C.._FHI``) plus
    the grid constants and window width shared by both streaming drivers."""
    n_tab = bg.centers.shape[0]
    n_flux_cells = n_tab - 1
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    f0 = 2.0 * ROT_EARTH * np.sin(float(cfg.phi0))
    centers_np = np.asarray(bg.centers, np.float64)
    faces_np = np.asarray(bg.faces, np.float64)
    dz = np.float32(centers_np[1] - centers_np[0])
    rdiv = 1.0 if cfg.faithful_offline_rates else float(run.dt)
    params = jnp.asarray(np.array([
        np.float32(centers_np[0]), dz, np.float32(faces_np[1]),
        np.float32(run.dt), np.float32(cfg.bvf), np.float32(cfg.kappa),
        np.float32(f0), np.float32(rdiv),
        np.float32(cfg.m_max), np.float32(faces_np[0]),
        np.float32(faces_np[-1]),
    ], dtype=np.float32))
    from .rhs_pallas import resolve_window_cells

    w_cells, w2_cells = resolve_window_cells(cfg, c_pad)
    return params, n_tab, n_flux_cells, c_pad, w_cells, w2_cells


def _frozen_fields(rays, statics, shape2):
    """Frozen per-ray slabs + run constants (hprop off), in the kernel's
    input order: k, l, dr, pv, ff2, kh2, pvb, act."""
    kf = shape2(rays.k)
    lf = shape2(rays.l)
    drf = shape2(rays.dr)
    phif = shape2(rays.phi)
    dkkf = shape2(statics.dkk)
    dllf = shape2(statics.dll)
    dmf = shape2(rays.dm)
    areaf = shape2(statics.rr_mm_area)
    sphi = jnp.sin(phif)
    return (
        kf, lf, drf,
        jnp.abs(dkkf * dllf * dmf),                       # pv
        (2.0 * ROT_EARTH) ** 2 * sphi * sphi,             # ff2
        kf * kf + lf * lf,                                # kh2
        dkkf * dllf * areaf,                              # pvb
        shape2(statics.active.astype(jnp.float32), fill=0.0),
    )


def _wind_table(wind_fn, t0, ci, S, dt_f, n_tab, c_pad):
    """One (2, c_pad) imposed-wind row per in-kernel step, evaluated on
    the host graph exactly as the scan body does at the top of each step
    (models/integrate.py:370-377) — including its broadcast of scalar or
    rank-0 wind_fn returns to the full mean-wind column."""
    ts = (jnp.float32(t0)
          + (ci * S + jnp.arange(S)).astype(jnp.float32) * dt_f)
    uu, vv = jax.vmap(
        lambda t: tuple(jnp.broadcast_to(w, (n_tab,))
                        for w in wind_fn(t)))(ts)
    wt = jnp.zeros((S, 2, c_pad), jnp.float32)
    wt = wt.at[:, 0, :n_tab].set(uu.astype(jnp.float32))
    wt = wt.at[:, 1, :n_tab].set(vv.astype(jnp.float32))
    return wt


def _auto_tile_rows(n: int, lifecycle: bool = False) -> int:
    """Streamed-tile height by problem size (tools/tile_sweep.py sweep):
    per-tile fixed costs (DMA/semaphore ops, window-bound reductions,
    stage-table reads) amortize with larger tiles, while window quality
    (a merged tile's union span widens) and double-buffer VMEM push back.
    Measured champions: 64 below ~5e5 rays, 192 at 1e6 (1.76→1.81e9
    ray-steps/s over 128, interleaved-rep confirmed), 256 at 1e7
    (1.72→2.26e9; 384 is noise-level, 512 fails to compile).  With the
    in-kernel lifecycle the extra act slab + stage-3 work tip the 1e6
    band back to 128 (1.62e9 vs 1.56e9 at 192)."""
    if n >= 4_000_000:
        return 256
    if n >= 500_000:
        return 128 if lifecycle else 192
    return TILE_ROWS


def simulate_streaming(state, statics, bg, cfg, run, include_t0: bool = False,
                       tile_rows: int = 0,
                       source=None, wind_fn=None, t0: float = 0.0,
                       launch_sort=None, observe=None,
                       return_final_perm: bool = False,
                       source_key=None,
                       _ablate: str = ""):
    """Whole-run streaming megakernel driver: same contract and history
    framing as :func:`msgwam_tpu.ops.step_pallas.simulate_resident`, with
    no VMEM capacity limit.  ``run.n_steps`` runs as
    ``n_steps // save_every`` launches of ``save_every`` in-kernel RK3
    steps each.  ``tile_rows`` (streamed-tile height in 128-lane rows)
    defaults to 0 = pick by problem size (:func:`_auto_tile_rows`).

    **History memory**: the default history stacks
    ``n_steps // save_every`` FULL ray-state frames — at 1e6 rays that is
    ~48 MB per frame, so a 1000-step run saved every 10 steps holds
    ~4.8 GB on device and a fine cadence at 1e7 rays is an OOM.  Two ways
    out: (a) pass ``observe(state, statics, aux) -> pytree`` (same
    contract as :func:`msgwam_tpu.simulate`; ``aux.dens_prop`` carries
    the pre-saturation density) to reduce each frame ON DEVICE before it
    is stacked — e.g. ``lambda s, st, aux: s.mean.u`` keeps O(n_cell)
    per frame; or (b) chunk the run from the host and stream full frames
    to disk through the native async writer
    (``utils/history_io.StateHistoryWriter``), which is what the CLI's
    ``--log-every --stream-history`` path does.

    ``launch_sort`` re-sorts every per-ray array by height at each launch
    boundary (once per ``save_every`` in-kernel steps), restoring the
    height coherence the adaptive window tiers rely on as rays disperse
    over a long run.  ONE stable multi-operand ``lax.sort`` moves all
    slabs together (~5 ms at 1e6 rays, measured — vs ~190 ms for
    per-array gathers, the cost that rightly killed *per-step* sorting,
    models/integrate.py ``sort_every``).  Slot identity is preserved
    exactly: an int32 slot array rides the sort, history frames and the
    final state are unpermuted back to the caller's original slot order,
    so per-slot semantics (the reference's ``raytracer.py:124-150``
    history layout) hold; only flux-reduction order differs (last-ulp).
    ``None`` (default) resolves to the measured champion rule:
    on at ``n >= LAUNCH_SORT_MIN`` rays, off below.

    ``source`` is either a fixed ``(RayState, RayStatics)`` relaunch
    template or — like the scan path (``models/integrate.py``) — a
    callable ``source(key) -> (RayState, RayStatics)`` drawing a fresh
    stochastic template (pass ``source_key``).  Keyed templates refresh
    once per LAUNCH (every ``save_every`` steps): the draw runs in the
    host graph between kernel launches and its slabs are permuted into
    the current internal layout when ``launch_sort`` is on.  At
    ``save_every=1`` the refresh cadence and key-split sequence match the
    scan path exactly.  A stochastic template may vary only
    ``dens/r/m/active`` — the frozen per-ray fields stay resident for the
    whole run, same as fixed templates (guarded eagerly).

    ``return_final_perm`` appends the final slot permutation to the
    return tuple: ``perm[i]`` is the caller slot id sitting at INTERNAL
    buffer position ``i`` at run end (``jnp.arange(n_pad)`` when the sort
    is off; slot ids >= n are the kernel's pad rows).  This is what the
    kernel's last launch actually iterated over — 1 boundary sort plus
    ``save_every`` steps of drift — so window-coherence diagnostics can
    run on the layout the kernel SAW rather than the returned slot order
    (:func:`msgwam_tpu.diagnostics.internal_ray_layout`).

    ``_ablate`` is a profiling-only switch (``tools/floor_ablation.py``)
    that compile-time-strips parts of the per-tile work to decompose the
    step-time floor: ``"nodeposit"`` drops the flux deposit,
    ``"noloop"`` drops the whole per-row loop (interp + deposit).
    Results are physically wrong under ablation; never set it otherwise.
    """
    from ..state import RayState, MeanState, State
    from .step_pallas import build_operators

    if cfg.hprop:
        raise ValueError("simulate_streaming requires hprop=False")
    do_cull = bool(cfg.cull or cfg.relaunch)
    do_relaunch = bool(cfg.relaunch)
    if do_cull and not cfg.saturate_online:
        raise ValueError(
            "in-kernel culling/relaunch requires saturate_online=True; "
            "use simulate() for the offline-saturation lifecycle path"
        )
    if do_relaunch and source is None:
        raise ValueError("cfg.relaunch requires a source template")
    keyed_source = callable(source)
    if keyed_source and source_key is None:
        raise ValueError("a callable source requires source_key")
    if do_relaunch:
        # keyed sources (VERDICT r4 #6): draw one eager probe template for
        # the frozen-field guard — stochastic templates may vary only
        # dens/r/m/active (the slabs the kernel streams); frozen fields are
        # resident for the whole run, exactly like fixed templates
        src_rays, src_statics = source(source_key) if keyed_source else source
        _check_relaunch_template(src_rays, src_statics, state.rays, statics)
    for name, arr in (("state.rays.dens", state.rays.dens),
                      ("state.mean.u", state.mean.u)):
        got = jnp.asarray(arr).dtype
        if got != np.float32:
            raise TypeError(
                f"simulate_streaming computes in float32 but {name} has "
                f"dtype {got}; build the state with dtype=float32 (or use "
                f"simulate() for the f64 parity path)"
            )
    if run.n_steps % run.save_every:
        raise ValueError("n_steps must be divisible by save_every")

    rays, mean = state.rays, state.mean
    n = rays.r.shape[0]
    # resolve the window auto sentinels (-1) against the measured champion
    # ladder for this problem size (rhs_pallas.resolve_champion).  The
    # launch-sort auto rule below must be mirrored here: sorted
    # multi-launch runs take the narrower 48-cell second tier (the
    # boundary re-sorts keep the internal layout coherent — round-5
    # W-sweep, W_RESWEEP_r05.jsonl)
    from .rhs_pallas import apply_champion

    _multi = run.n_steps > run.save_every
    _sorted = (launch_sort if launch_sort is not None
               else (n >= LAUNCH_SORT_MIN and _multi))
    cfg = apply_champion(cfg, n,
                         sorted_multi_launch=bool(_sorted) and _multi)
    if tile_rows <= 0:
        tile_rows = _auto_tile_rows(n, lifecycle=cfg.cull or cfg.relaunch)
    params, n_tab, n_flux_cells, c_pad, w_cells, w2_cells = \
        _grid_params(bg, cfg, run)
    maps, cols = build_operators(bg, cfg, n_tab, c_pad)

    pad_unit = tile_rows * LANE
    # >= 3 tiles: the double-buffered pipeline's HBM RAW bound (a tile's
    # stage store is provably drained before its next-stage load only when
    # the two are >= 3 bodies apart); smaller problems pad up — inactive
    # slots cost little and the resident kernel owns that regime anyway
    n_pad = _ceil_to(max(n, 3 * pad_unit), pad_unit)
    pad = n_pad - n

    def shape2(x, fill=None):
        # pad by replicating the last slot (same rationale as the resident
        # kernel: constant fills put pad rows on a different window path)
        x = jnp.asarray(x).astype(jnp.float32)
        if fill is not None:
            return jnp.pad(x, (0, pad), constant_values=fill).reshape(-1, LANE)
        return jnp.pad(x, (0, pad), mode="edge").reshape(-1, LANE)

    def colpad(u, v):
        out = jnp.zeros((c_pad, 8), jnp.float32)
        out = out.at[: u.shape[0], 0].set(jnp.asarray(u).astype(jnp.float32))
        out = out.at[: v.shape[0], 1].set(jnp.asarray(v).astype(jnp.float32))
        return out

    # frozen fields + per-ray run constants, precomputed once (hprop off)
    statics_fields = _frozen_fields(rays, statics, shape2)
    interpret = jax.default_backend() != "tpu"
    unshape = lambda x: x.reshape(-1)[:n]
    online = bool(cfg.saturate_online)

    S = run.save_every
    dt_f = jnp.float32(run.dt)

    if do_relaunch and not keyed_source:
        src_slabs = _src_slabs(src_rays, src_statics, shape2)
    else:
        src_slabs = None  # keyed: a fresh template is drawn per launch

    if launch_sort is None:
        # auto: only multi-launch runs have mid-run boundaries to re-sort
        # at — a single whole-run launch from the usual (height-sorted)
        # source ICs would pay the ~5 ms sort for nothing (measured:
        # decay-driven fallback saturates within the first ~1000 steps,
        # so only boundary re-sorts recover throughput; RESULTS.md)
        launch_sort = (n >= LAUNCH_SORT_MIN
                       and run.n_steps > run.save_every)
    use_sort = bool(launch_sort)
    n_frozen = len(statics_fields)
    # keyed sources are never carried: their slabs are drawn fresh each
    # launch (and permuted into the current internal layout when sorting)
    n_src = 4 if (do_relaunch and not keyed_source) else 0
    slab_shape = (n_pad // LANE, LANE)
    flat = lambda x: x.reshape(-1)
    resh = lambda x: x.reshape(slab_shape)

    def _sort_slabs(dens, r, m, act_c, frozen, src, slot):
        # Height-sort EVERY per-ray slab (state + frozen fields + relaunch
        # template + slot identity) in ONE stable multi-operand lax.sort.
        # Inactive / pad slots (act == 0) key to +inf so live rays stay in
        # one height-local block at the front.
        act = act_c if act_c is not None else frozen[7]
        key = jnp.where(flat(act) > 0.0, flat(r), jnp.float32(jnp.inf))
        ops = [flat(dens), flat(r), flat(m)]
        if act_c is not None:
            ops.append(flat(act_c))
        ops += [flat(x) for x in frozen]
        if src is not None:
            ops += [flat(x) for x in src]
        ops.append(slot)
        out = jax.lax.sort((key, *ops), num_keys=1, is_stable=True)[1:]
        dens, r, m = resh(out[0]), resh(out[1]), resh(out[2])
        i = 3
        if act_c is not None:
            act_c = resh(out[i])
            i += 1
        frozen = tuple(resh(x) for x in out[i:i + n_frozen])
        i += n_frozen
        if src is not None:
            src = tuple(resh(x) for x in out[i:i + n_src])
            i += n_src
        return dens, r, m, act_c, frozen, src, out[i]

    def _unpermute(slot, slabs):
        # express per-ray slabs in the caller's original slot order: one
        # multi-operand sort keyed on the slot ids (cheaper than
        # argsort + per-array gathers, same reasoning as _sort_slabs)
        out = jax.lax.sort((slot, *[flat(x) for x in slabs]),
                           num_keys=1, is_stable=True)[1:]
        return tuple(resh(x) for x in out)

    n_cell = mean.u.shape[0]

    def to_state(dens, r, m, uvT, like_dtype):
        rs = RayState(
            dens=unshape(dens).astype(like_dtype),
            lam=rays.lam, phi=rays.phi,
            r=unshape(r).astype(like_dtype), dr=rays.dr,
            k=rays.k, l=rays.l,
            m=unshape(m).astype(like_dtype), dm=rays.dm,
        )
        ms = MeanState(uvT[:n_cell, 0].astype(like_dtype),
                       uvT[:n_cell, 1].astype(like_dtype))
        return State(rs, ms)

    def _observe_frame(hist_out):
        # reduce the frame ON DEVICE inside the scan: only the observation
        # is stacked, so history memory is O(n_outer * |obs|) instead of
        # n_outer full ray states (the OOM cliff documented above)
        from ..models.integrate import StepAux

        fr = to_state(hist_out[0], hist_out[1], hist_out[2], hist_out[3],
                      rays.dens.dtype)
        act = (unshape(hist_out[5]) > 0) if do_cull else statics.active
        return observe(fr, statics._replace(active=act),
                       StepAux(dens_prop=unshape(hist_out[4])
                               .astype(rays.dens.dtype)))

    def chunk(carry, ci):
        key = carry[-1] if keyed_source else None
        if use_sort:
            dens, r, m, uvT = carry[:4]
            i = 4
            act_c = carry[i] if do_cull else None
            i += 1 if do_cull else 0
            frozen = carry[i:i + n_frozen]
            i += n_frozen
            src = carry[i:i + n_src] if n_src else None
            i += n_src
            slot = carry[i]
            dens, r, m, act_c, frozen, src, slot = _sort_slabs(
                dens, r, m, act_c, frozen, src, slot)
        else:
            dens, r, m, uvT = carry[:4]
            act_c = carry[4] if do_cull else None
            frozen, src, slot = statics_fields, src_slabs, None
        if keyed_source:
            # fresh stochastic template per LAUNCH (VERDICT r4 #6): the
            # scan path refreshes per relaunch step, so at save_every=1
            # the cadences and key-split sequences coincide exactly
            # (tests/test_megakernel.py); at save_every>1 one template
            # serves the launch's in-kernel relaunches — the documented
            # cadence of the fastest backend
            key, sub = jax.random.split(key)
            t_rays, t_statics = source(sub)
            src = _src_slabs(t_rays, t_statics, shape2)
            if use_sort:
                # express the slot-ordered template in the current
                # internal (launch-sorted) layout, the streamed analogue
                # of the scan path's template[slot] gather
                src = tuple(resh(flat(x)[slot]) for x in src)
        wt = None if wind_fn is None else \
            _wind_table(wind_fn, t0, ci, S, dt_f, n_tab, c_pad)
        outs = _streamkernel_call(
            params, maps, cols, uvT, *frozen,
            dens, r, m,
            n_steps=S, n_tab=n_tab,
            n_flux_cells=n_flux_cells, w_cells=w_cells,
            online=online,
            prognostic=bool(cfg.prognostic_mean),
            faithful=bool(cfg.faithful_saturation),
            interpret=interpret, t_rows=tile_rows,
            wind=wt, src=src, act_s=act_c,
            cull=do_cull, relaunch=do_relaunch,
            ablate=_ablate, w2_cells=w2_cells,
        )
        dens, r, m, uvT, pp = outs[:5]
        state_new = (dens, r, m, uvT) + ((outs[5],) if do_cull else ())
        if not use_sort:
            hist_out = state_new[:4] + (pp,) + state_new[4:]
            new_carry = state_new
        else:
            new_carry = state_new + tuple(frozen) \
                + (tuple(src) if n_src else ()) + (slot,)
            # history frames leave the chunk already in original slot
            # order, so the post-scan framing below is permutation-blind
            emit = (dens, r, m) + ((state_new[4],) if do_cull else ()) + (pp,)
            emit = _unpermute(slot, emit)
            hist_out = emit[:3] + (uvT, emit[-1]) \
                + (emit[3:4] if do_cull else ())
        if keyed_source:
            new_carry = new_carry + (key,)
        if observe is not None:
            hist_out = _observe_frame(hist_out)
        return new_carry, hist_out

    carry0 = (shape2(rays.dens), shape2(rays.r), shape2(rays.m),
              colpad(mean.u, mean.v))
    if do_cull:
        carry0 = carry0 + (
            shape2(statics.active.astype(jnp.float32), fill=0.0),)
    if use_sort:
        carry0 = carry0 + tuple(statics_fields) \
            + (tuple(src_slabs) if n_src else ()) \
            + (jnp.arange(n_pad, dtype=jnp.int32),)
    if keyed_source:
        carry0 = carry0 + (jnp.asarray(source_key),)
    n_outer = run.n_steps // run.save_every
    carry, hist = jax.lax.scan(chunk, carry0, jnp.arange(n_outer))
    if keyed_source:
        carry = carry[:-1]  # drop the spent RNG key
    if use_sort:
        # final carry is in launch-sorted order; restore slot identity
        slot_f = carry[-1]
        state_f = _unpermute(slot_f, carry[:3]
                             + (carry[4:5] if do_cull else ()))
        carry = state_f[:3] + (carry[3],) \
            + (state_f[3:4] if do_cull else ())
        perm_f = slot_f
    else:
        perm_f = jnp.arange(n_pad, dtype=jnp.int32)
    with_perm = lambda ret: ret + (perm_f,) if return_final_perm else ret

    final = to_state(*carry[:4], rays.dens.dtype)
    active0 = statics.active

    if observe is not None:
        history = hist  # already the stacked per-frame observations
        if include_t0:
            from ..models.integrate import StepAux

            obs0 = observe(state, statics,
                           StepAux(dens_prop=state.rays.dens))
            history = jax.tree.map(
                lambda o0, h: jnp.concatenate([jnp.asarray(o0)[None], h]),
                obs0, history)
        if do_cull:
            statics = statics._replace(active=unshape(carry[4]) > 0)
        return with_perm((final, statics, history))

    if do_cull:
        statics = statics._replace(active=unshape(carry[4]) > 0)

    hd, hr, hm, huv, hpp = hist[:5]
    frames = [
        to_state(hd[t], hr[t], hm[t], huv[t], rays.dens.dtype)
        for t in range(n_outer)
    ]
    prop_frames = [
        unshape(hpp[t]).astype(rays.dens.dtype) for t in range(n_outer)
    ]
    if do_cull:
        hact = hist[5]
        act_frames = [unshape(hact[t]) > 0 for t in range(n_outer)]
    else:
        act_frames = [active0 for _ in range(n_outer)]
    if include_t0:
        frames = [state] + frames
        prop_frames = [state.rays.dens] + prop_frames
        act_frames = [active0] + act_frames
    history_state = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    history = (history_state, jnp.stack(act_frames),
               jnp.stack(prop_frames))
    return with_perm((final, statics, history))


def _simulate_streaming_ensemble_impl(states, statics, bg, cfg, run,
                                      tile_rows: int = 0,
                                      sources=None, wind_fn=None,
                                      t0: float = 0.0):
    """Kernel implementation behind :func:`simulate_streaming_ensemble`.

    Runs a whole independent-member ensemble (BASELINE config 5) as ONE
    whole-run streaming-megakernel launch per ``save_every`` window.

    ``states``/``statics`` carry a leading ensemble axis on every leaf
    (the :func:`msgwam_tpu.parallel.stack_ensemble` layout); members share
    ``bg``/``cfg``.  Each member's ray slabs are padded to whole tiles and
    concatenated, the tile range is partitioned contiguously among members
    inside the kernel, and every grid-axis array — the wind state, its
    RK3 register, the per-stage tables, and the Kahan-compensated flux
    accumulator — carries a member axis (stacked ``(E*c_pad, 8)`` column
    blocks), so all per-member stage-boundary work batches into the
    stage's first/last tiles (see ``_kernel``'s ensemble-tiling note).
    This replaces
    ``ensemble_simulate(..., sequential=True)``'s E separate
    per-member launches (and their per-launch dispatch cost) with one
    launch at full streaming-kernel throughput.

    Scope: float32, ``hprop=False``, online saturation.  A prescribed
    transient wind (``wind_fn``, e.g. tidal shear) may be either a
    member-SHARED function of time (the host-built per-step table is
    broadcast to every member's wind block in-kernel) or a SEQUENCE of E
    per-member functions — each member then reads its own rows of a
    stacked ``(S, 2E, c_pad)`` table, enabling genuinely
    stochastic-background ensembles.  Cull/relaunch run IN-KERNEL exactly as
    in the single-member driver — the lifecycle machinery is per-ray, so the
    member partitioning is transparent to it; pass ``sources`` as a
    stacked ``(RayState, RayStatics)`` template pair (leading ensemble
    axis, the :func:`stack_ensemble` layout) when ``cfg.relaunch``.

    Returns ``(final_states, statics, mean_history)`` where
    ``final_states`` has the leading ensemble axis back on every leaf and
    ``mean_history`` is a :class:`MeanState` of shape
    ``(n_chunks, E, n_cell)`` — one frame per ``save_every`` window,
    matching ``ensemble_simulate``'s default ``observe`` cadence.
    """
    from ..state import RayState, MeanState, State
    from .step_pallas import build_operators

    if cfg.hprop:
        raise ValueError("simulate_streaming_ensemble requires hprop=False")
    if not cfg.saturate_online:
        raise ValueError(
            "simulate_streaming_ensemble requires saturate_online=True")
    do_cull = bool(cfg.cull or cfg.relaunch)
    do_relaunch = bool(cfg.relaunch)
    if do_relaunch and sources is None:
        raise ValueError(
            "cfg.relaunch requires stacked per-member source templates "
            "(sources=(RayState, RayStatics) with a leading ensemble axis)")
    if callable(sources):
        raise ValueError(
            "keyed (callable) sources are supported by the single-member "
            "simulate_streaming only; run members separately, or draw the "
            "stacked templates before the call")
    if run.n_steps % run.save_every:
        raise ValueError("n_steps must be divisible by save_every")
    rays, mean = states.rays, states.mean
    for name, arr in (("dens", rays.dens), ("u", mean.u)):
        if jnp.asarray(arr).dtype != np.float32:
            raise TypeError(
                f"simulate_streaming_ensemble computes in float32 but "
                f"{name} has dtype {jnp.asarray(arr).dtype}")

    E, n = rays.r.shape
    # window champions key on the TOTAL ray count (the throughput regime);
    # the tile height below keys on the per-member slab size
    from .rhs_pallas import apply_champion

    cfg = apply_champion(cfg, E * n)
    if tile_rows <= 0:
        # per-member size: members pad to tile multiples, so the per-tile
        # amortization argument is per-member (tools/tile_sweep.py)
        tile_rows = _auto_tile_rows(n, lifecycle=cfg.cull or cfg.relaunch)
    params, n_tab, n_flux_cells, c_pad, w_cells, w2_cells = \
        _grid_params(bg, cfg, run)
    maps, cols = build_operators(bg, cfg, n_tab, c_pad)

    pad_unit = tile_rows * LANE
    m_pad = _ceil_to(n, pad_unit)
    while E * (m_pad // pad_unit) < 3:   # pipeline RAW bound (see _kernel)
        m_pad += pad_unit
    pad = m_pad - n

    def shape2(x, fill=None):
        x = jnp.asarray(x).astype(jnp.float32)
        if fill is not None:
            x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
        else:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="edge")
        return x.reshape(-1, LANE)       # member slabs contiguous

    statics_fields = _frozen_fields(rays, statics, shape2)
    if do_relaunch:
        src_rays, src_statics = sources
        _check_relaunch_template(src_rays, src_statics, rays, statics)
        src_slabs = _src_slabs(src_rays, src_statics, shape2)
    else:
        src_slabs = None

    n_cell = mean.u.shape[1]
    uv0 = jnp.zeros((E, c_pad, 8), jnp.float32)
    uv0 = uv0.at[:, :n_cell, 0].set(jnp.asarray(mean.u, jnp.float32))
    uv0 = uv0.at[:, :n_cell, 1].set(jnp.asarray(mean.v, jnp.float32))
    uv0 = uv0.reshape(E * c_pad, 8)

    interpret = jax.default_backend() != "tpu"
    unshape = lambda x: x.reshape(E, m_pad)[:, :n]
    S = run.save_every

    dt_f = jnp.float32(run.dt)

    per_member_wind = isinstance(wind_fn, (list, tuple))
    if per_member_wind and len(wind_fn) != E:
        raise ValueError(
            f"per-member wind_fn sequence has {len(wind_fn)} entries "
            f"for {E} ensemble members")

    def chunk(carry, ci):
        dens, r, m, uvT = carry[:4]
        act_c = carry[4] if do_cull else None
        # wind rows: member-shared (models/integrate.py:370-377 semantics)
        # or one (u, v) row pair per member, stacked along the row axis
        if wind_fn is None:
            wt = None
        elif per_member_wind:
            wt = jnp.concatenate(
                [_wind_table(f, t0, ci, S, dt_f, n_tab, c_pad)
                 for f in wind_fn], axis=1)          # (S, 2E, c_pad)
        else:
            wt = _wind_table(wind_fn, t0, ci, S, dt_f, n_tab, c_pad)
        outs = _streamkernel_call(
            params, maps, cols, uvT, *statics_fields,
            dens, r, m,
            n_steps=S, n_tab=n_tab,
            n_flux_cells=n_flux_cells, w_cells=w_cells,
            online=True,
            prognostic=bool(cfg.prognostic_mean),
            faithful=bool(cfg.faithful_saturation),
            interpret=interpret, t_rows=tile_rows,
            wind=wt, src=src_slabs, act_s=act_c,
            cull=do_cull, relaunch=do_relaunch,
            w2_cells=w2_cells,
        )
        dens, r, m, uvT, _pp = outs[:5]
        new_carry = (dens, r, m, uvT) + ((outs[5],) if do_cull else ())
        return new_carry, uvT

    carry0 = (shape2(rays.dens), shape2(rays.r), shape2(rays.m), uv0)
    if do_cull:
        carry0 = carry0 + (
            shape2(statics.active.astype(jnp.float32), fill=0.0),)
    n_outer = run.n_steps // run.save_every
    carry, huv = jax.lax.scan(chunk, carry0, jnp.arange(n_outer))

    dens_f, r_f, m_f, uvT_f = carry[:4]
    if do_cull:
        statics = statics._replace(active=unshape(carry[4]) > 0)
    uv_f = uvT_f.reshape(E, c_pad, 8)
    final = State(
        RayState(
            dens=unshape(dens_f), lam=rays.lam, phi=rays.phi,
            r=unshape(r_f), dr=rays.dr, k=rays.k, l=rays.l,
            m=unshape(m_f), dm=rays.dm,
        ),
        MeanState(uv_f[:, :n_cell, 0], uv_f[:, :n_cell, 1]),
    )
    huv = huv.reshape(n_outer, E, c_pad, 8)
    mean_history = MeanState(huv[:, :, :n_cell, 0], huv[:, :, :n_cell, 1])
    return final, statics, mean_history


def simulate_streaming_ensemble(states, statics, bg, cfg, run,
                                tile_rows: int = 0,
                                sources=None, wind_fn=None,
                                t0: float = 0.0):
    """Differentiable front for :func:`_simulate_streaming_ensemble_impl`.

    **Differentiable in (states, statics)** via a ``custom_vjp`` whose
    backward pass differentiates the numerically equivalent XLA scan path
    vmapped over members (the ``simulate_resident`` pattern,
    ``step_pallas.py:633-659``); ``bg``, the relaunch ``sources``
    templates, and ``wind_fn`` are closed over (non-differentiable) — the kernel's
    flux→wind operators are host-built from a concrete background.  The
    backward compiles a vmapped scan, so gradients cost scan-path, not
    kernel, throughput.  See the impl's docstring for the kernel design,
    scope, and return contract.
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
    def diff(s, st, cfg_, run_, t_rows):
        return _simulate_streaming_ensemble_impl(s, st, bg, cfg_, run_,
                                                 t_rows, sources=sources,
                                                 wind_fn=wind_fn, t0=t0)

    def fwd(s, st, cfg_, run_, t_rows):
        return diff(s, st, cfg_, run_, t_rows), (s, st)

    def bwd(cfg_, run_, t_rows, res, g):
        from ..models.integrate import simulate
        from ..state import MeanState

        s, st = res
        xla_cfg = cfg_.replace(rhs_backend="xla", window_cells=0,
                               projection_backend="mxu",
                               interp_backend="mxu")

        # a per-member wind_fn sequence cannot ride a vmap (functions are
        # not pytree leaves): tabulate each member's wind at the step
        # start times once, and rebuild a member-local wind_fn from its
        # table row inside the vmapped body (t = t0 + i*dt exactly, so
        # the round-trip index is exact)
        wuv = None
        if isinstance(wind_fn, (list, tuple)):
            n_cell = s.mean.u.shape[1]
            ts = t0 + jnp.arange(run_.n_steps, dtype=jnp.float32) * run_.dt
            tabs = [jax.vmap(lambda t, f=f: tuple(
                jnp.broadcast_to(w, (n_cell,)).astype(s.mean.u.dtype)
                for w in f(t)))(ts) for f in wind_fn]
            wuv = (jnp.stack([u for u, _ in tabs]),
                   jnp.stack([v for _, v in tabs]))

        def generic(s_, st_):
            def one(ms, mst, msrc, w):
                wf = wind_fn
                if w is not None:
                    wu_m, wv_m = w
                    idx = lambda t: jnp.round(
                        (t - t0) / run_.dt).astype(jnp.int32)
                    wf = lambda t: (wu_m[idx(t)], wv_m[idx(t)])
                fin, _, hist = simulate(ms, mst, bg, xla_cfg, run_,
                                        source=msrc, wind_fn=wf,
                                        t0=t0, validate=False)
                return fin, hist[0].mean

            if sources is None and wuv is None:
                fins, means = jax.vmap(
                    lambda ms, mst: one(ms, mst, None, None))(s_, st_)
            elif sources is None:
                fins, means = jax.vmap(
                    lambda ms, mst, w: one(ms, mst, None, w))(s_, st_, wuv)
            elif wuv is None:
                fins, means = jax.vmap(
                    lambda ms, mst, sr: one(ms, mst, sr, None))(
                        s_, st_, sources)
            else:
                fins, means = jax.vmap(one)(s_, st_, sources, wuv)
            mean_hist = MeanState(jnp.moveaxis(means.u, 0, 1),
                                  jnp.moveaxis(means.v, 0, 1))
            return fins, st_, mean_hist

        _, vjp = jax.vjp(generic, s, st)
        return vjp(g)

    diff.defvjp(fwd, bwd)
    return diff(states, statics, cfg, run, tile_rows)
