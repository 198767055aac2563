from .enumerate import combinations_table, num_candidates  # noqa: F401
from .assemble import assemble_Z  # noqa: F401
from .eigen import batched_eigh_small, feasibility_scores  # noqa: F401
from .generate import cuts_from_selected  # noqa: F401
