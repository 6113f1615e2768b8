from .store import MapStore, MapConfig  # noqa: F401
