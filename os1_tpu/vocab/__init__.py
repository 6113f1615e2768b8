from .tree import Vocabulary, transform, bow_vector, l1_score  # noqa: F401
from .database import KeyFrameDatabase  # noqa: F401
