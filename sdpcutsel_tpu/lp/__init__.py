from .pdhg import (  # noqa: F401
    PDHGState,
    init_state,
    estimate_norm,
    solve_lp,
    pdhg_run_fixed,
    dual_bound_f64,
)
