"""Drop-in mirror of the reference ``lib/libprop.py`` API surface.

Existing experiment scripts written against the reference — including its
own driver pattern (``raytracer.py``) — can ``import msgwam_tpu.api as
lprop`` instead of ``import lib.libprop as lprop`` and run unchanged, with
the physics executing through the JAX engine (jitted, on whatever device is
default).  NumPy in, NumPy out.

This is the *stateful compatibility layer* over the functional core: the
reference's module globals (``lib/libprop.py:3-11``) and kwargs-merging
setters (``lib/libprop.py:14-44``) are reproduced here, translated to the
frozen :class:`~msgwam_tpu.config.ModelConfig` + pytree state at each call.
The ``model_config['rhs']`` dependency-injection extension point
(``lib/libprop.py:691``) is preserved: ``RK3`` integrates any callable with
the reference signature ``rhs(dt, var) -> var_dot`` over the object-dtype
state vector; when it is this module's :func:`rhs_default`, the whole step
runs as one jitted device computation.

New code should use the functional API (:mod:`msgwam_tpu.models`) directly.
"""

from __future__ import annotations

import functools

import os

import numpy as np
import jax

# The reference is float64 NumPy end to end; this compatibility layer
# enables x64 at import so drop-in users get the reference's precision.
# NOTE this is a process-global side effect on JAX dtype semantics —
# anything else running JAX in the same process will also see x64.  Set
# MSGWAM_TPU_SHIM_X64=0 to opt out (e.g. when embedding the shim in an f32
# application); parity with the reference then requires enabling x64
# yourself before any computation.
if os.environ.get("MSGWAM_TPU_SHIM_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from .config import ModelConfig
from .constants import RAD_EARTH, ROT_EARTH  # noqa: F401  (re-exported)
from .state import Background, MeanState, RayState, RayStatics, State
from .models import backgrounds as _bg
from .models.rhs import rhs as _rhs
from .ops import dispersion as _disp
from .ops.interp import grid_interp as _grid_interp
from .ops import projection as _proj
from .ops import saturation as _sat

# ---------------------------------------------------------------------------
# module-global state, mirroring lib/libprop.py:3-11
# ---------------------------------------------------------------------------

HPROP_GLOBAL = True          # lib/libprop.py:5
pressure_gradient = 0        # lib/libprop.py:6
grid = None                  # lib/libprop.py:7
grids = None                 # lib/libprop.py:8
rhobar = 1                   # lib/libprop.py:9
model_config = {}            # lib/libprop.py:10
statics = {}                 # lib/libprop.py:11


def set_statics(**kwargs):
    """Merge per-ray constants into ``statics`` (``lib/libprop.py:14-27``).
    Defaults: ``int_dll=1, int_dkk=1, rr_mm_area=0``."""
    statics.update(kwargs)


def set_model_setup(**kwargs):
    """Merge options into ``model_config`` (``lib/libprop.py:30-44``)."""
    model_config.update(kwargs)


def get_model_setup():
    """Return the configuration dict (``lib/libprop.py:85-89``)."""
    return model_config


def set_hydrostatics():
    """ρ̄(z) on the staggered grid (``lib/libprop.py:47-62``)."""
    global rhobar
    rhobar0 = model_config['rhobar0']
    hh = model_config['hh']
    if model_config['boussinesq']:
        rhobar = rhobar0 * np.ones(np.shape(grids))
    else:
        rhobar = rhobar0 * np.exp(-np.asarray(grids) / hh)


def set_pressure_gradient(uu, vv):
    """Geostrophic pressure gradient from the initial winds
    (``lib/libprop.py:65-82``)."""
    global pressure_gradient
    ff = 2 * ROT_EARTH * np.sin(model_config['phi0'])
    pressure_gradient = np.empty((2, len(grids)))
    pressure_gradient[0] = rhobar * ff * vv
    pressure_gradient[1] = -rhobar * ff * uu


# ---------------------------------------------------------------------------
# config / state translation
# ---------------------------------------------------------------------------

_CFG_KEYS = (
    'u0', 'phi0', 'sig_phi', 'rr0', 'rr1', 'sig_rr', 'drr', 'bvf',
    'geostrophy', 'boussinesq', 'hh', 'rhobar0', 'kappa', 'saturate_online',
)


def _current_config() -> ModelConfig:
    kw = {k: model_config[k] for k in _CFG_KEYS if k in model_config}
    for key in ('phi0', 'sig_phi'):
        if key in kw:
            kw[key] = float(kw[key])
    return ModelConfig(hprop=bool(HPROP_GLOBAL), **kw)


def _current_background() -> Background:
    pg = pressure_gradient
    if np.ndim(pg) == 0:
        pg = np.zeros((2, len(grids)))
    rb = rhobar
    if np.ndim(rb) == 0:
        rb = float(rb) * np.ones(len(grids))
    return Background(
        faces=jnp.asarray(grid, dtype=jnp.float64),
        centers=jnp.asarray(grids, dtype=jnp.float64),
        rhobar=jnp.asarray(rb, dtype=jnp.float64),
        pressure_gradient=jnp.asarray(pg, dtype=jnp.float64),
    )


def _current_statics(nray: int) -> RayStatics:
    def arr(v):
        v = np.asarray(v, dtype=np.float64)
        return jnp.asarray(np.broadcast_to(v, (nray,)))

    return RayStatics(
        dkk=arr(statics.get('dkk', statics.get('int_dkk', 1.0))),
        dll=arr(statics.get('dll', statics.get('int_dll', 1.0))),
        rr_mm_area=arr(statics.get('rr_mm_area', 0.0)),
        active=jnp.ones((nray,), dtype=bool),
    )


# ---------------------------------------------------------------------------
# physics functions with the reference signatures
# ---------------------------------------------------------------------------

def omega(kk, ll, mm, phi):
    """Intrinsic frequency (``lib/libprop.py:369-383``)."""
    return np.asarray(_disp.omega(
        jnp.asarray(kk), jnp.asarray(ll), jnp.asarray(mm), jnp.asarray(phi),
        model_config['bvf'],
    ))


def cg_lambda(kk, ll, mm, lam, phi, rr, uu, vv):
    """Zonal group velocity (``lib/libprop.py:386-407``)."""
    if not HPROP_GLOBAL:
        return np.zeros(np.shape(kk))
    uu_ray = _grid_interp(jnp.asarray(rr), jnp.asarray(grids), jnp.asarray(uu))
    cgl, _, _ = _disp.group_velocities(
        jnp.asarray(kk), jnp.asarray(ll), jnp.asarray(mm), jnp.asarray(phi),
        uu_ray, jnp.zeros_like(uu_ray), model_config['bvf'], True,
    )
    return np.asarray(cgl)


def cg_phi(kk, ll, mm, lam, phi, rr, uu, vv):
    """Meridional group velocity (``lib/libprop.py:410-431``)."""
    if not HPROP_GLOBAL:
        return np.zeros(np.shape(kk))
    vv_ray = _grid_interp(jnp.asarray(rr), jnp.asarray(grids), jnp.asarray(vv))
    _, cgp, _ = _disp.group_velocities(
        jnp.asarray(kk), jnp.asarray(ll), jnp.asarray(mm), jnp.asarray(phi),
        jnp.zeros_like(vv_ray), vv_ray, model_config['bvf'], True,
    )
    return np.asarray(cgp)


def cg_rr(kk, ll, mm, lam, phi, rr):
    """Vertical group velocity (``lib/libprop.py:434-448``)."""
    return np.asarray(_disp.cg_r(
        jnp.asarray(kk), jnp.asarray(ll), jnp.asarray(mm), jnp.asarray(phi),
        model_config['bvf'],
    ))


def gradients(lam_ray, phi_ray, rr_ray, uu, vv):
    """Winds + gradients at ray positions, ``(4, 3, n)`` layout
    (``lib/libprop.py:328-366``)."""
    rr_ray = jnp.asarray(rr_ray)
    uu = jnp.asarray(uu)
    vv = jnp.asarray(vv)
    gridj = jnp.asarray(grid)
    dz = gridj[1] - gridj[0]
    du_dz = (uu[1:] - uu[:-1]) / dz
    dv_dz = (vv[1:] - vv[:-1]) / dz
    out = np.zeros((4, 3) + np.shape(lam_ray))
    out[0, 0] = np.asarray(_grid_interp(rr_ray, jnp.asarray(grids), uu))
    out[0, 1] = np.asarray(_grid_interp(rr_ray, jnp.asarray(grids), vv))
    out[1, 2] = np.asarray(_grid_interp(rr_ray, gridj[1:-1], du_dz))
    out[2, 2] = np.asarray(_grid_interp(rr_ray, gridj[1:-1], dv_dz))
    return out


def _wavenumber_tendency(which, kk, ll, mm, lam, phi, rr, uu, vv):
    g = gradients(lam, phi, rr, uu, vv)
    dk, dl, dm = _disp.wavenumber_tendencies(
        jnp.asarray(kk), jnp.asarray(ll), jnp.asarray(mm),
        jnp.asarray(phi), jnp.asarray(rr),
        jnp.asarray(g[0, 0]), jnp.asarray(g[0, 1]),
        jnp.asarray(g[1, 2]), jnp.asarray(g[2, 2]),
        model_config['bvf'], bool(HPROP_GLOBAL),
    )
    return np.asarray({'k': dk, 'l': dl, 'm': dm}[which])


def dk_dt(kk, ll, mm, lam, phi, rr, uu, vv):
    """(``lib/libprop.py:451-471``)"""
    return _wavenumber_tendency('k', kk, ll, mm, lam, phi, rr, uu, vv)


def dl_dt(kk, ll, mm, lam, phi, rr, uu, vv):
    """(``lib/libprop.py:474-499``)"""
    return _wavenumber_tendency('l', kk, ll, mm, lam, phi, rr, uu, vv)


def dm_dt(kk, ll, mm, lam, phi, rr, uu, vv):
    """(``lib/libprop.py:502-520``)"""
    return _wavenumber_tendency('m', kk, ll, mm, lam, phi, rr, uu, vv)


def du_dt(vv, pm_flux_gradient):
    """Zonal mean-flow tendency (``lib/libprop.py:523-539``)."""
    ff = 2 * ROT_EARTH * np.sin(model_config['phi0'])
    return ff * np.asarray(vv) - np.asarray(rhobar) ** -1 * (
        np.asarray(pressure_gradient)[0] + np.asarray(pm_flux_gradient)
    )


def dv_dt(uu, pm_flux_gradient):
    """Meridional mean-flow tendency (``lib/libprop.py:542-558``)."""
    ff = 2 * ROT_EARTH * np.sin(model_config['phi0'])
    return -ff * np.asarray(uu) - np.asarray(rhobar) ** -1 * (
        np.asarray(pressure_gradient)[1] + np.asarray(pm_flux_gradient)
    )


def wave_projection(dens, lam, phi, rr_low, rr_up, kk, ll, mm_low, mm_up,
                    dkk, dll, dmm, grid, var=0):
    """All five projection variants (``lib/libprop.py:92-221``)."""
    dz = float(np.asarray(grid)[1] - np.asarray(grid)[0])
    dr_max = float(np.max(np.asarray(rr_up) - np.asarray(rr_low)))
    span = max(4, _proj.required_span(max(dr_max, 0.0), dz))
    out = _proj.project_reference_variant(
        jnp.asarray(dens), jnp.asarray(lam), jnp.asarray(phi),
        jnp.asarray(rr_low), jnp.asarray(rr_up),
        jnp.asarray(kk), jnp.asarray(ll),
        jnp.asarray(mm_low), jnp.asarray(mm_up),
        jnp.asarray(dkk), jnp.asarray(dll), jnp.asarray(dmm),
        jnp.asarray(grid), model_config['bvf'], var=var, max_span=span,
    )
    return np.asarray(out)


def saturation(dt, dens, rr_center, rr_center_st, drr, drr_st, kk, ll,
               mm_center, mm_center_st, direct=False):
    """Saturation clamp / tendency (``lib/libprop.py:561-615``)."""
    nray = len(np.asarray(dens))
    st = _current_statics(nray)
    args = (
        dt, jnp.asarray(dens), jnp.asarray(rr_center),
        jnp.asarray(rr_center_st), jnp.asarray(drr), jnp.asarray(drr_st),
        jnp.asarray(kk), jnp.asarray(ll), jnp.asarray(mm_center),
        jnp.asarray(mm_center_st),
        st.dkk, st.dll, st.rr_mm_area,
        jnp.asarray(grids), jnp.asarray(rhobar),
        model_config['bvf'], model_config['kappa'],
        float(model_config['phi0']),
    )
    fn = _sat.saturate_direct if direct else _sat.saturation_tendency
    return np.asarray(fn(*args))


# ---------------------------------------------------------------------------
# background wind profiles (lib/libprop.py:224-325)
# ---------------------------------------------------------------------------

def velocities_tanh(lam, phi, rr):
    return np.asarray(_bg.velocities_tanh(
        jnp.asarray(lam), jnp.asarray(phi), jnp.asarray(rr), _current_config()
    ))


def velocities_tanh_homogeneous(rr):
    return np.asarray(_bg.velocities_tanh_homogeneous(jnp.asarray(rr), _current_config()))


def velocities_gauss_homogeneous(rr):
    return np.asarray(_bg.velocities_gauss_homogeneous(jnp.asarray(rr), _current_config()))


def velocities_sine_homogeneous(rr):
    return np.asarray(_bg.velocities_sine_homogeneous(jnp.asarray(rr), _current_config()))


# ---------------------------------------------------------------------------
# RHS + integrator over the reference's object-dtype state vector
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _rhs_jit(cfg, dt, state, st, bg):
    return _rhs(dt, state, st, bg, cfg)


def _pack(var):
    dens, lam, phi, rr, drr, kk, ll, mm, dmm, uu, vv = (
        jnp.asarray(v, dtype=jnp.float64) for v in var
    )
    return State(
        RayState(dens=dens, lam=lam, phi=phi, r=rr, dr=drr,
                 k=kk, l=ll, m=mm, dm=dmm),
        MeanState(u=uu, v=vv),
    )


def _unpack(s: State):
    r = s.rays
    # r.r (= cg_r) is an array in every configuration; dens & co. may be
    # structural scalar zeros
    nray = np.asarray(r.r).shape[0]
    ncell = np.asarray(s.mean.u).shape[0] if np.ndim(s.mean.u) else len(grids)

    def arr(f, n):
        # the functional core returns structurally-zero tendencies as
        # scalars; the reference API contract is full-length arrays
        a = np.asarray(f)
        return np.broadcast_to(a, (n,)).copy() if a.ndim == 0 else a

    fields = [arr(f, nray) for f in
              (r.dens, r.lam, r.phi, r.r, r.dr, r.k, r.l, r.m, r.dm)]
    fields += [arr(s.mean.u, ncell), arr(s.mean.v, ncell)]
    return np.array(fields, dtype=object)


def rhs_default(dt, var_in):
    """The coupled RHS over the reference state-vector layout
    (``lib/libprop.py:618-676``)."""
    state = _pack(var_in)
    cfg = _current_config()
    st = _current_statics(state.rays.dens.shape[0])
    bg = _current_background()
    return _unpack(_rhs_jit(cfg, float(dt), state, st, bg))


def RK3(dt, var):
    """Williamson RK3 over the object-dtype state vector
    (``lib/libprop.py:680-700``).  Uses ``model_config['rhs']`` — the
    preserved extension point.  With the default RHS the three stages run as
    one jitted device computation; a user-supplied RHS falls back to the
    reference's generic object-array arithmetic."""
    rhs_ = model_config['rhs']
    if rhs_ is rhs_default:
        cfg = _current_config()
        state = _pack(var)
        st = _current_statics(state.rays.dens.shape[0])
        bg = _current_background()
        out = _rk3_jit(cfg, float(dt), state, st, bg)
        return _unpack(out)

    qq = dt * rhs_(dt, var)
    var = var + qq / 3
    qq = dt * rhs_(dt, var) - 5 / 9 * qq
    var = var + 15 / 16 * qq
    qq = dt * rhs_(dt, var) - 153 / 128 * qq
    var = var + 8 / 15 * qq
    return var


@functools.partial(jax.jit, static_argnums=(0,))
def _rk3_jit(cfg, dt, state, st, bg):
    from .models.integrate import rk3_step

    return rk3_step(dt, state, st, bg, cfg)


# install the reference defaults (lib/libprop.py:703-726)
set_model_setup(
    u0=80,
    phi0=np.deg2rad(-60),
    sig_phi=np.deg2rad(3),
    rr0=30000,
    rr1=40000,
    sig_rr=10000,
    drr=1,
    bvf=0.01,
    rhs=rhs_default,
    geostrophy=True,
    boussinesq=False,
    hh=8500,
    rhobar0=1.2,
    kappa=0.95,
    saturate_online=True,
)

set_statics(
    int_dll=1,
    int_dkk=1,
    rr_mm_area=0,
)
