from .solver import CutSolver, RoundStats  # noqa: F401
from .sdp_bound import sdp_relaxation_bound  # noqa: F401
