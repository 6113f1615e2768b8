from .system import System, SlamConfig, TrackingState  # noqa: F401
