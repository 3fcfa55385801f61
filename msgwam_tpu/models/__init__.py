"""Model layer: background profiles, the coupled RHS, time integration, and
ray sources (launch / culling / relaunch)."""

from .backgrounds import (  # noqa: F401
    velocities_tanh,
    velocities_tanh_homogeneous,
    velocities_gauss_homogeneous,
    velocities_sine_homogeneous,
    tidal_shear,
)
from .rhs import rhs  # noqa: F401
from .integrate import rk3_step, step, simulate, williamson_rk3  # noqa: F401
from .sources import (  # noqa: F401
    wave_packet_ic,
    gaussian_spectrum_source,
    cull,
    relaunch,
)
