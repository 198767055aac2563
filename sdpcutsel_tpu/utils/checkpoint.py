"""Round-granular checkpoint/resume (SURVEY.md sections 5.3, 5.4).

The cutting-plane loop's full state is (cut pool, PDHG warm-start state,
bound history, RNG key) — a small pytree.  Snapshots make the loop trivially
restartable: multi-host failures restart from the last round snapshot (no
elastic scale-up is needed for this workload).  Format: flax msgpack of the
numpy-ified pytree plus a JSON sidecar of scalars.
"""

from __future__ import annotations

import json
import os

import flax.serialization
import jax
import numpy as np


def save_checkpoint(path: str, pool, pdhg_state, key, history: list, meta: dict):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "pool": jax.tree.map(np.asarray, pool._asdict()),
        "state": jax.tree.map(np.asarray, pdhg_state._asdict()),
        "key": np.asarray(key),
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    side = {"history": history, "meta": meta}
    with open(path + ".json", "w") as f:
        json.dump(side, f, default=float)


def load_checkpoint(path: str):
    """Returns (pool_dict, state_dict, key, history, meta) as numpy pytrees;
    callers rebuild CutPool/PDHGState namedtuples from the dicts."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    with open(path + ".json") as f:
        side = json.load(f)
    return (payload["pool"], payload["state"], payload["key"],
            side["history"], side["meta"])
