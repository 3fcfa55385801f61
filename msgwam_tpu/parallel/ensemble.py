"""Ensemble fan-out (BASELINE config 5): many independent simulations —
stochastic-source members, parameter sweeps — vmapped over a leading
``ensemble`` axis and sharded across the mesh.

Members never communicate, so this is pure data parallelism: ``vmap`` the
single-member ``simulate`` and let GSPMD place one slice of the batch per
device (the modern replacement for the reference-era ``pmap`` suggestion in
BASELINE.json).  Combine with :mod:`.sharding` by using a 2-D mesh
``('ensemble', 'rays')`` — not needed until single-member state outgrows a
chip, which at ~10 floats/ray means ~10^8 rays.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, RunConfig
from ..state import Background, RayStatics, State
from ..models.integrate import simulate


ENSEMBLE_AXIS = "ensemble"


def stack_ensemble(members):
    """Stack a list of (state, statics) members into batched pytrees with a
    leading ensemble axis."""
    import jax.numpy as jnp

    states = [m[0] for m in members]
    statics = [m[1] for m in members]
    return (
        jax.tree.map(lambda *xs: jnp.stack(xs), *states),
        jax.tree.map(lambda *xs: jnp.stack(xs), *statics),
    )


def ensemble_simulate(
    states: State,
    statics: RayStatics,
    bg: Background,
    cfg: ModelConfig,
    run: RunConfig,
    mesh: Optional[Mesh] = None,
    observe: Optional[Callable] = None,
    axis: str = ENSEMBLE_AXIS,
    sequential: bool = False,
    backend: str = "scan",
    sources=None,
):
    """Run a batch of simulations (leading ensemble axis on every leaf of
    ``states``/``statics``), sharded over ``mesh`` if given.

    ``sequential=True`` runs members one after another (``lax.map``) instead
    of batching them — the right choice when members outnumber devices:
    batching (vmap) the dense-matmul projection defeats XLA's
    weight-generation fusion (measured 180 ms/step for 8×125k members on one
    chip vs ~2.8 ms/step for the same 1e6 rays in one member), while
    sequential members each run at full single-member speed.

    ``backend="mega"`` routes the whole batch through
    :func:`msgwam_tpu.simulate_streaming_ensemble` — each device runs its
    local members as ONE whole-run streaming-megakernel launch per
    ``save_every`` window (members partitioned over the kernel's tile
    range), ~1.4× the scan path's throughput per device.  Scope: online
    saturation, f32; in-kernel cull/relaunch run per member when
    ``cfg.cull``/``cfg.relaunch`` (pass ``sources`` as a stacked
    per-member template pair); ``observe`` is rejected — the return is
    that function's ``(final, statics, mean_history)`` contract, with
    every leaf sharded ``P(axis)`` over ``mesh`` (members must divide the
    mesh axis).
    """
    if backend == "mega":
        from ..ops.step_pallas_stream import simulate_streaming_ensemble
        from ..state import MeanState

        if observe is not None:
            raise ValueError(
                "backend='mega' returns the per-member mean history "
                "directly and does not support an observe callback; "
                "post-process its mean_history or use backend='scan'")

        if mesh is None:
            return simulate_streaming_ensemble(states, statics, bg, cfg,
                                               run, sources=sources)
        shard = NamedSharding(mesh, P(axis))
        states = jax.tree.map(lambda x: jax.device_put(x, shard), states)
        statics = jax.tree.map(lambda x: jax.device_put(x, shard), statics)
        if sources is not None:
            sources = jax.tree.map(
                lambda x: jax.device_put(x, shard), sources)
        out_spec = (
            jax.tree.map(lambda _: P(axis), states),
            jax.tree.map(lambda _: P(axis), statics),
            MeanState(P(None, axis), P(None, axis)),
        )
        # bg is closed over (replicated): the streaming driver reads the
        # grid geometry host-side at trace time (_grid_params), so it must
        # stay concrete rather than become a shard_map tracer; per-member
        # relaunch templates shard P(axis) like the states
        if sources is None:
            body = lambda s, st: simulate_streaming_ensemble(
                s, st, bg, cfg, run)
            in_specs = (jax.tree.map(lambda _: P(axis), states),
                        jax.tree.map(lambda _: P(axis), statics))
            args = (states, statics)
        else:
            body = lambda s, st, src: simulate_streaming_ensemble(
                s, st, bg, cfg, run, sources=src)
            in_specs = (jax.tree.map(lambda _: P(axis), states),
                        jax.tree.map(lambda _: P(axis), statics),
                        jax.tree.map(lambda _: P(axis), sources))
            args = (states, statics, sources)
        fn = jax.jit(jax.shard_map(
            body,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_spec,
            # pallas_call out_shapes carry no varying-across-mesh
            # annotation (same as parallel/sharding.py)
            check_vma=False,
        ))
        return fn(*args)
    if backend != "scan":
        raise ValueError(f"unknown ensemble backend {backend!r}")
    fn = build_ensemble_fn(
        cfg, run, mesh=mesh, observe=observe, axis=axis, sequential=sequential
    )
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis))
        states = jax.tree.map(lambda x: jax.device_put(x, shard), states)
        statics = jax.tree.map(lambda x: jax.device_put(x, shard), statics)
    return fn(states, statics, bg)


def _default_observe(s, st, aux):
    return s.mean


@functools.lru_cache(maxsize=64)
def build_ensemble_fn(
    cfg: ModelConfig,
    run: RunConfig,
    mesh: Optional[Mesh] = None,
    observe: Optional[Callable] = None,
    axis: str = ENSEMBLE_AXIS,
    sequential: bool = False,
) -> Callable:
    """Build (and cache) the jitted ensemble runner
    ``f(states, statics, bg) -> (final, statics, history)``.

    Cached on (cfg, run, mesh, observe, axis, sequential), so repeated
    calls — and :func:`ensemble_simulate` — reuse the compiled program.
    ``observe`` must be hashable (a top-level function) to hit the cache.
    """
    obs = observe or _default_observe
    member = lambda s, st, bg: simulate(s, st, bg, cfg, run, observe=obs)

    if sequential:
        f = lambda ss, stst, bg: jax.lax.map(
            lambda x: member(*x, bg), (ss, stst)
        )
        return jax.jit(f)

    f = jax.vmap(member, in_axes=(0, 0, None))
    if mesh is None:
        return jax.jit(f)

    # shard_map over the member axis: each device runs a plain vmap over its
    # local members; no cross-member communication exists, so in/out specs
    # are all P(axis) and the background is replicated.  The output spec
    # depends on shapes, so the jitted shard_map is built lazily per input
    # shape (memoized; bounded LRU so parameter sweeps over many shapes
    # don't accumulate compiled programs) — and the eval_shape runs on plain
    # ShapeDtypeStructs so sharded avals never reach the vmap trace.
    from collections import OrderedDict

    compiled = OrderedDict()
    max_cached_shapes = 8

    def runner(states, statics, bg):
        leaves = jax.tree.leaves((states, statics, bg))
        key = tuple((l.shape, str(l.dtype)) for l in leaves)
        if key in compiled:
            compiled.move_to_end(key)
        else:
            if len(compiled) >= max_cached_shapes:
                compiled.popitem(last=False)
            shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                (states, statics, bg),
            )
            out_shape = jax.eval_shape(f, *shapes)
            out_spec = jax.tree.map(lambda _: P(axis), out_shape)
            spec = jax.tree.map(lambda _: P(axis), states)
            spec_st = jax.tree.map(lambda _: P(axis), statics)
            bg_spec = jax.tree.map(lambda _: P(), bg)
            compiled[key] = jax.jit(jax.shard_map(
                f, mesh=mesh,
                in_specs=(spec, spec_st, bg_spec), out_specs=out_spec,
            ))
        return compiled[key](states, statics, bg)

    return runner
