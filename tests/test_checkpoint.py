"""Checkpoint/resume roundtrip: bit-identical state, resumable mid-run."""

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt
from msgwam_tpu.utils import load_checkpoint, save_checkpoint


def test_roundtrip_and_resume(tmp_path):
    cfg = mt.REFERENCE_RUN_CONFIG
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(jnp.asarray(centers), cfg))
    vv = np.zeros_like(uu)
    bg = mt.make_background(gc, cfg, uu, vv)
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=30)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))

    run20 = mt.RunConfig(dt=120.0, n_steps=20, save_every=20)
    run10 = mt.RunConfig(dt=120.0, n_steps=10, save_every=10)
    f20 = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run20))
    f10 = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run10))

    # straight-through 20 steps
    sA, stA, _ = f20(state, statics)

    # 10 steps -> checkpoint -> restore -> 10 more
    s1, st1, _ = f10(state, statics)
    path = tmp_path / "ckpt.npz"
    key = jax.random.key(42)
    save_checkpoint(path, s1, st1, step=10, key=key, extra={"note": "mid"})
    s2, st2, step, key2, extra = load_checkpoint(path)
    assert step == 10 and extra == {"note": "mid"}
    assert np.all(np.asarray(jax.random.key_data(key2)) == np.asarray(jax.random.key_data(key)))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sB, stB, _ = f10(s2, st2)

    for a, b in zip(jax.tree.leaves(sA), jax.tree.leaves(sB)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(stA.active), np.asarray(stB.active))
