"""Top-k selection helpers with deterministic tie-breaking.

Deterministic selection matters for cross-shard reproducibility: the sharded
global top-k (parallel/sharding.py) must pick the same cuts regardless of mesh
layout (SURVEY.md section 7, hard part 5).  jax.lax.top_k breaks ties toward
the lower index, which composes deterministically with shard-local offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_topk(scores, k: int, mask=None):
    """Top-k scores with invalid entries masked to -inf.

    Returns (values: (k,), indices: (k,), valid: (k,) — finite entries)."""
    if mask is not None:
        neg = jnp.asarray(-jnp.inf, scores.dtype)
        scores = jnp.where(mask, scores, neg)
    vals, idx = jax.lax.top_k(scores, k)
    valid = jnp.isfinite(vals)
    return vals, idx, valid
