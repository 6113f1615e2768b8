from .store import MapStore, MapConfig  # noqa: F401
from .mirror import DeviceMirror  # noqa: F401
