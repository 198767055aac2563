from .logging import JSONLLogger  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .profiling import timed, ScoringThroughput  # noqa: F401
