from .cpu_reference import cpu_cut_select, CPURoundStats  # noqa: F401
