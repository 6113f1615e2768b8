from .orb import FrameFeatures, OrbConfig, make_extractor  # noqa: F401
