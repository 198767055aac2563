"""Instance-batched solve benchmark (BASELINE.json config 4).

Measures cutting-plane rounds/sec with B instances solved concurrently via
the sharded round step (parallel/round.py) — on one chip this exercises the
vmapped instance batch; on a pod slice the same code shards 'data' across
chips.  Reports rounds/s and instance-rounds/s.

    python scripts/bench_batched.py --n 30 --batch 8 --rounds 6
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--lp-iters", type=int, default=400)
    ap.add_argument("--sel-size", type=int, default=16)
    ap.add_argument("--data", type=int, default=1, help="mesh data axis")
    ap.add_argument("--cand", type=int, default=1, help="mesh cand axis")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from sdpcutsel_tpu.cuts.enumerate import combinations_table
    from sdpcutsel_tpu.instances import generate_spar
    from sdpcutsel_tpu.parallel.mesh import make_mesh
    from sdpcutsel_tpu.parallel.round import (
        init_batched_state, make_sharded_round_step, shard_batched_state,
    )
    from sdpcutsel_tpu.parallel.sharding import shard_candidates

    mesh = make_mesh(data=args.data, cand=args.cand)
    insts = [generate_spar(args.n, 100, s + 1) for s in range(args.batch)]
    Qb = jnp.asarray(np.stack([i.Q for i in insts]), jnp.float32)
    cb = jnp.asarray(np.stack([i.c for i in insts]), jnp.float32)

    state = init_batched_state(Qb, cb, capacity=1024, kmax=3)
    state = shard_batched_state(state, mesh)
    table, valid = shard_candidates(combinations_table(args.n, 3), mesh)
    step = make_sharded_round_step(mesh, lp_iters=args.lp_iters,
                                   sel_size=args.sel_size)

    # warmup / compile
    state = step(state, table, valid)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(args.rounds):
        state = step(state, table, valid)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    bounds = np.asarray(state.bound)
    print({
        "batch": args.batch, "n": args.n, "mesh": f"{args.data}x{args.cand}",
        "rounds_per_sec": round(args.rounds / dt, 3),
        "instance_rounds_per_sec": round(args.batch * args.rounds / dt, 2),
        "lp_iters_per_round": args.lp_iters,
        "mean_bound": float(bounds.mean()),
        "cuts": np.asarray(state.pool.count).tolist(),
    })


if __name__ == "__main__":
    main()
