from .mccormick import (  # noqa: F401
    SA, SB,
    mccormick_residuals,
    apply_K,
    apply_KT,
    objective_minform,
    project_primal,
)
from .cutbuffer import (  # noqa: F401
    CutPool,
    empty_pool,
    append_cuts,
    cut_residuals,
    cut_adjoint,
    purge_pool,
)
