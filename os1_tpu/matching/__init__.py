from .core import (  # noqa: F401
    MatchResult,
    match_with_gate,
    mutual_best,
    rotation_consistency,
)
from . import matchers  # noqa: F401
