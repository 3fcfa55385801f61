"""Spectrum inversion by gradient descent THROUGH the coupled simulation.

A capability the NumPy reference (raytracer.py) cannot offer: because the
whole wave/mean-flow system is a pure JAX function, the classic
parameterization-tuning problem — *which gravity-wave source spectrum
produced this observed wind evolution?* — becomes an optimization solved
with `jax.grad` end-to-end through propagation, projection, saturation,
and the mean-flow feedback.

Truth: the Gaussian-spectrum source (models/sources.py:96, the BASELINE
config-1 shape) modulated by a hidden smooth two-bump pattern across the
launch spectrum.  Observation: ten frames of the mean zonal wind over a
200-step coupled run.  Unknowns: one log-amplitude per spectral ray (200
parameters) — the high-dimensional regime where adjoint gradients are
the only practical tool (finite differences would need 200 forward runs
*per iteration*; the adjoint gets the whole gradient for ~2x one run).

Run:  python examples/source_inversion.py     (~1 min on CPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import optax

import msgwam_tpu as mt

N_RAY = 200
N_STEPS = 200
N_FRAMES = 10
DT = 120.0
BASE_ALPHA = 0.0015            # sub-breaking base amplitude


def hidden_pattern(n_ray: int) -> jnp.ndarray:
    """The modulation to recover: two smooth bumps across the spectrum,
    one enhancing short waves, one suppressing long ones."""
    x = jnp.linspace(-1.0, 1.0, n_ray)
    return (0.7 * jnp.exp(-((x + 0.4) ** 2) / 0.08)
            - 0.5 * jnp.exp(-((x - 0.5) ** 2) / 0.05))


def build_problem():
    # float64: adjoints through 200 coupled steps of clamped saturation
    # overflow in f32; the demo is CPU-scale, so run at the parity dtype
    cfg = mt.REFERENCE_RUN_CONFIG.replace(saturate_online=True)
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(jnp.asarray(centers), cfg))
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    run = mt.RunConfig(dt=DT, n_steps=N_STEPS,
                       save_every=N_STEPS // N_FRAMES)
    rays0, statics = mt.gaussian_spectrum_source(
        cfg, bg, N_RAY, amplitude_alpha=BASE_ALPHA)

    def simulate_wind(log_amp):
        """Mean-zonal-wind history for a per-ray log-amplitude field."""
        rays = rays0._replace(dens=rays0.dens * jnp.exp(log_amp))
        state = mt.State(rays, mt.MeanState(jnp.asarray(uu),
                                            jnp.zeros_like(jnp.asarray(uu))))
        _, _, history = mt.simulate(state, statics, bg, cfg, run,
                                    validate=False)
        # observe the wave-DRIVEN wind change: the background jet itself
        # (|u| ~ 4 m/s) would otherwise dominate every frame norm
        return history[0].mean.u - jnp.asarray(uu)

    return simulate_wind


def main():
    simulate_wind = build_problem()
    truth = hidden_pattern(N_RAY)
    observed = simulate_wind(truth)

    # normalize per frame so early (small-response) frames count too
    frame_scale = jnp.sum(observed * observed, axis=-1) + 1e-30

    def loss_fn(log_amp):
        diff = simulate_wind(log_amp) - observed
        misfit = jnp.sum(jnp.sum(diff * diff, axis=-1) / frame_scale)
        # weak prior toward the base spectrum: rays whose waves never
        # reach the observed layers are otherwise unconstrained
        return misfit + 1e-4 * jnp.mean(log_amp * log_amp)

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    params = jnp.zeros(N_RAY)          # start from the unmodulated source
    sched = optax.cosine_decay_schedule(0.5, 150, alpha=0.05)
    opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(sched))
    opt_state = opt.init(params)

    loss0 = corr = None
    for it in range(150):
        loss, grads = value_and_grad(params)
        if loss0 is None:
            loss0 = float(loss)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if it % 25 == 0:
            corr = float(jnp.corrcoef(params, truth)[0, 1])
            print(f"iter {it:3d}  loss {float(loss):.3e}  "
                  f"pattern corr {corr:.4f}")

    corr = float(jnp.corrcoef(params, truth)[0, 1])
    rms = float(jnp.sqrt(jnp.mean((params - truth) ** 2)))
    print(f"recovered 200-parameter spectrum: corr {corr:.4f}, "
          f"rms error {rms:.3f} (pattern rms "
          f"{float(jnp.sqrt(jnp.mean(truth**2))):.3f})")
    print(f"loss: {loss0:.3e} -> {float(loss):.3e}")
    return corr, rms, loss0, float(loss)


if __name__ == "__main__":
    main()
