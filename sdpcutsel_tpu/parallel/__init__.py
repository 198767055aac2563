from .mesh import make_mesh, default_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    pad_table,
    shard_candidates,
    sharded_score_and_select,
)
