"""Runtime utilities: checkpoint/resume, metrics logging, profiling.
All build-side — the reference has none of these (SURVEY.md §5)."""

from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .metrics import MetricsLogger  # noqa: F401
from .profiling import StepTimer, trace  # noqa: F401
from .xla import (  # noqa: F401
    recommended_xla_flags,
    apply_recommended_xla_flags,
    enable_persistent_compile_cache,
)
