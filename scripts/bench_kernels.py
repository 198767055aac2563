"""Compare the scoring-kernel variants on the current backend.

Variants (all compute nn + feas for every C(n,3) candidate):
  * generic  — ops/fused_score.py (one-hot MXU gather + Jacobi + MLP, one
               Pallas kernel)
  * pair     — ops/pair_score.py pallas kernel (plane assembly + Jacobi
               fused; MLP as XLA matmuls)
  * pair-jnp — ops/pair_score.py pure-jnp path

Rates are REAL candidates/s (C(n,3), not padded slots), sustained inside one
jit with a loop-carried dependence (matches bench.py's methodology).

Usage: python scripts/bench_kernels.py [--n 125] [--rounds 40] [--repeats 5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=125)
    ap.add_argument("--rounds", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sdpcutsel_tpu.config import ScorerConfig
    from sdpcutsel_tpu.cuts.enumerate import combinations_table
    from sdpcutsel_tpu.instances import generate_spar
    from sdpcutsel_tpu.models.features import candidate_q_features
    from sdpcutsel_tpu.models.scorer import load_params
    from sdpcutsel_tpu.ops.fused_score import fused_score, mlp_params_for_kernel
    from sdpcutsel_tpu.ops.pair_score import (
        build_pair_layout, pair_consts_static, pair_score_fused,
        pair_score_jnp,
    )
    from sdpcutsel_tpu.parallel.sharding import pad_table
    from sdpcutsel_tpu.utils.profiling import timed

    n, k = args.n, 3
    R = args.rounds
    inst = generate_spar(n, 100, 1)
    Q = jnp.asarray(inst.Q, jnp.float32)
    params, _ = load_params(k, tuple(ScorerConfig().hidden))
    W = [jnp.asarray(a) for a in mlp_params_for_kernel(params)]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n), jnp.float32)
    X = np.clip(np.outer(x, x) + 0.2 * rng.standard_normal((n, n)), 0, 1)
    X = jnp.asarray(0.5 * (X + X.T), jnp.float32)
    T_real = combinations_table(n, k).shape[0]

    results = {}

    # ---- generic fused kernel --------------------------------------------
    tbl_np, _ = pad_table(combinations_table(n, k), 1024)
    table = jnp.asarray(tbl_np)
    triQ, scale = candidate_q_features(Q, table)

    @jax.jit
    def sustained_generic(x, X, table, triQ, scale, *W):
        def body(i, acc):
            nn, feas = fused_score(x + acc * 1e-12, X, table, triQ, scale,
                                   *W, block=1024, sweeps=5)
            return acc + feas.sum() + nn.sum()
        return jax.lax.fori_loop(0, R, body, 0.0)

    if jax.default_backend() == "tpu":
        sec, _ = timed(sustained_generic, x, X, table, triQ, scale, *W,
                       repeats=args.repeats)
        results["generic"] = R * T_real / sec

    # ---- pair layout ------------------------------------------------------
    pi, pj, table_pl, valid = build_pair_layout(n)
    consts = pair_consts_static(Q, pi, pj)
    slots = valid.shape[0]

    def make_sustained(kernel):
        @jax.jit
        def sustained(x, X, consts, *W):
            def body(i, acc):
                nn, feas = kernel(x + acc * 1e-12, X, consts, *W, sweeps=5)
                return acc + feas.sum() + nn.sum()
            return jax.lax.fori_loop(0, R, body, 0.0)
        return sustained

    if jax.default_backend() == "tpu":
        sec, _ = timed(make_sustained(pair_score_fused), x, X, consts, *W,
                       repeats=args.repeats)
        results["pair"] = R * T_real / sec
    sec, _ = timed(make_sustained(pair_score_jnp), x, X, consts, *W,
                   repeats=args.repeats)
    results["pair_jnp"] = R * T_real / sec

    # ---- tiered packed pair layout (round 5, VERDICT r4 #8) ---------------
    from sdpcutsel_tpu.ops.pair_packed import (
        build_packed_pair_layout, packed_consts_static, packed_score,
    )

    import functools

    lay = build_packed_pair_layout(n)
    pconsts = packed_consts_static(Q, lay)
    packed_slots = lay["valid"].shape[0]
    if jax.default_backend() == "tpu":
        # n is static: bind it outside the sustained jit (consts are traced)
        sec, _ = timed(
            make_sustained(functools.partial(packed_score, n=n)),
            x, X, pconsts, *W, repeats=args.repeats)
        results["packed"] = R * T_real / sec

    print(json.dumps({
        "n": n, "T_real": T_real, "pair_slots": int(slots),
        "packed_slots": int(packed_slots),
        "backend": jax.default_backend(),
        "rates_cands_per_sec": {m: round(v, 1) for m, v in results.items()},
    }))


if __name__ == "__main__":
    main()
