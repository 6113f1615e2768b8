from .cache import enable_compilation_cache  # noqa: F401
from .profiling import StageTimer, stage_report  # noqa: F401
