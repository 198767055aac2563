from .suite import run_suite, bounds_registry, instance_gap_closed  # noqa: F401
