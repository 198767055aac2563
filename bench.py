"""Benchmark entry point. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): candidate cuts scored per second per chip on
the largest BoxQP size (n=125, C(125,3)=317,750 candidates/round), for the
full scoring stage (assemble Z(rho) + eigendecomposition-based feasibility
check + NN improvement estimate).  vs_baseline = TPU rate / measured CPU
reference rate (the numpy/LAPACK replica in sdpcutsel_tpu/baseline — the
reference's own scoring path, SURVEY.md section 6).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
# Pinned CPU-baseline protocol (VERDICT r3 weak #4): the vs_baseline
# denominator must not swing with whatever BLAS threading the host picked
# that day.  Fix the thread count BEFORE numpy loads its BLAS; this host has
# 2 vCPUs, so 2 threads is the honest best-effort CPU reference.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "2")

import numpy as np


def tpu_scoring_rate(n=125, k=3, repeats=5, rounds_per_dispatch=40):
    """Sustained ON-DEVICE scoring rate: the pair-structured scoring path
    (ops/pair_score.py — the kernel the production solver uses for dense
    k=3 at this n) run ``rounds_per_dispatch`` times inside one jit with a
    loop-carried dependence (defeats loop hoisting, so every pass really
    executes).  Batching passes per dispatch amortizes this dev setup's
    ~28 ms tunnel dispatch overhead out of the measurement — a tunnel
    artifact, not production cadence: the production loop (loop/solver.py)
    dispatches scoring about once per round.  The rate counts REAL
    candidates (C(n,3)), not the pair layout's padded slots.  The generic
    any-table kernel (ops/fused_score.py, QCQP/sharded path) and single-
    dispatch numbers are reported separately in BASELINE.md
    (scripts/bench_kernels.py)."""
    import jax
    import jax.numpy as jnp

    from sdpcutsel_tpu.config import ScorerConfig
    from sdpcutsel_tpu.instances import generate_spar
    from sdpcutsel_tpu.models.scorer import load_params
    from sdpcutsel_tpu.ops.fused_score import mlp_params_for_kernel
    from sdpcutsel_tpu.ops.pair_score import (
        build_pair_layout, pair_consts_static, pair_score_fused,
    )
    from sdpcutsel_tpu.utils.profiling import timed

    inst = generate_spar(n, 100, 1)
    Q = jnp.asarray(inst.Q, jnp.float32)
    cfg = ScorerConfig()
    params, _ = load_params(k, tuple(cfg.hidden))
    W = [jnp.asarray(a) for a in mlp_params_for_kernel(params)]
    pi, pj, _, _ = build_pair_layout(n)
    consts = pair_consts_static(Q, pi, pj)
    T = n * (n - 1) * (n - 2) // 6           # real candidates per pass

    R = rounds_per_dispatch

    # everything an ARGUMENT (not a closure constant): retrained weights or a
    # different instance then hit the same cached compile instead of a fresh
    # multi-minute remote compile
    @jax.jit
    def sustained(x, X, consts, *W):
        def body(i, acc):
            nn, feas = pair_score_fused(x + acc * 1e-12, X, consts, *W,
                                        sweeps=5)
            return acc + feas.sum() + nn.sum()
        return jax.lax.fori_loop(0, R, body, 0.0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n), jnp.float32)
    X = jnp.asarray(np.clip(np.outer(x, x)
                            + 0.2 * rng.standard_normal((n, n)), 0, 1), jnp.float32)
    X = 0.5 * (X + X.T)

    sec, _ = timed(sustained, x, X, consts, *W, repeats=repeats)
    return R * T / sec


def cpu_scoring_rate(n=125, k=3, sample=30_000, repeats=5, warmup=1):
    """Reference-shaped numpy scoring (gather + batched LAPACK eigh + MLP
    matmuls) on a candidate subsample, extrapolated per-candidate.

    Median of ``repeats`` timed passes after ``warmup`` untimed ones —
    mirrors utils/profiling.timed, so the vs_baseline denominator does not
    swing with transient load on this small host the way a single cold pass
    does (ADVICE round 1)."""
    from sdpcutsel_tpu.cuts.enumerate import combinations_table
    from sdpcutsel_tpu.instances import generate_spar

    inst = generate_spar(n, 100, 1)
    table = combinations_table(n, k)[:sample]
    rng = np.random.default_rng(0)
    x = rng.random(n)
    X = np.clip(np.outer(x, x) + 0.2 * rng.standard_normal((n, n)), 0, 1)
    X = 0.5 * (X + X.T)

    W1 = rng.standard_normal((15, 64)); b1 = rng.standard_normal(64)
    W2 = rng.standard_normal((64, 64)); b2 = rng.standard_normal(64)
    W3 = rng.standard_normal((64, 1))

    def one_pass():
        t0 = time.perf_counter()
        xr = x[table]
        Xr = X[table[:, :, None], table[:, None, :]]
        Z = np.empty((table.shape[0], k + 1, k + 1))
        Z[:, 0, 0] = 1.0
        Z[:, 0, 1:] = xr
        Z[:, 1:, 0] = xr
        Z[:, 1:, 1:] = Xr
        np.linalg.eigvalsh(Z)  # feasibility scores
        Qr = inst.Q[table[:, :, None], table[:, None, :]]
        sc = np.abs(Qr).max((1, 2))
        iu = np.triu_indices(k)
        feats = np.concatenate(
            [Qr[:, iu[0], iu[1]] / np.maximum(sc, 1e-12)[:, None],
             xr, Xr[:, iu[0], iu[1]]], axis=1)
        h = np.maximum(feats @ W1 + b1, 0)
        h = np.maximum(h @ W2 + b2, 0)
        h @ W3  # NN scores
        return time.perf_counter() - t0

    for _ in range(warmup):
        one_pass()
    times = sorted(one_pass() for _ in range(repeats))
    return table.shape[0] / times[len(times) // 2]


def end_to_end_rate(n=125, rounds=10, repeats=3):
    """Second driver-visible metric (VERDICT r3 next #10, r4 next #2): full
    rounds/s at the flagship size — scan-mode CutSolver (all rounds in one
    dispatch), neural strategy, purge + support-diverse selection, at the
    SUITE's recorded config (sel_size=20, lp tol 2e-6 — what
    scripts/run_suite_incremental.py actually runs; the old bench config
    sel_size=50 was mislabeled "production defaults", VERDICT r4 weak #2).

    Robustness (VERDICT r4 weak #1): median of ``repeats`` timed solves, and
    the timed quantity is the DEVICE dispatch time (RoundStats.wall_time_s,
    measured around block_until_ready inside run_scan).  The host-side f64
    recertification still runs on every round's stacked duals — bounds stay
    certified — but it is host work that a suite run overlaps with the next
    instance's device dispatch, so it does not belong in the device rate;
    it is reported alongside as ``host_recert_s_per_run``.  Returns
    (rounds_per_sec, replica_rounds_per_sec, host_recert_s) where the
    denominator is the median replica in-loop rate at this n from
    results/replica_timing.jsonl (the pinned protocol's recorded runs)."""
    from sdpcutsel_tpu.config import (
        CutConfig, LoopConfig, LPConfig, RunConfig, ScorerConfig,
    )
    from sdpcutsel_tpu.instances import generate_spar
    from sdpcutsel_tpu.loop import CutSolver

    inst = generate_spar(n, 100, 1)
    cfg = RunConfig(
        lp=LPConfig(max_iters=20000, tol=2e-6),
        cuts=CutConfig(k=3, sel_size=20, capacity=1024),
        scorer=ScorerConfig(strategy="neural"),
        loop=LoopConfig(use_scan=True, polish_iters=0),
    )
    CutSolver(inst, cfg).run(rounds=rounds)          # warmup/compile
    rates, recerts = [], []
    for _ in range(repeats):
        solver = CutSolver(inst, cfg)
        t0 = time.perf_counter()
        hist = solver.run(rounds=rounds)             # incl. f64 recertify
        total = time.perf_counter() - t0
        device_s = sum(h.wall_time_s for h in hist)  # scan dispatch time
        rates.append(rounds / device_s)
        recerts.append(total - device_s)
    rates.sort()
    rate = rates[len(rates) // 2]

    replica = None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "replica_timing.jsonl")
    if os.path.exists(path):
        rs = [json.loads(line)["rounds_per_s"] for line in open(path)
              if json.loads(line).get("n") == n]
        if rs:
            replica = sorted(rs)[len(rs) // 2]
    return rate, replica, sorted(recerts)[len(recerts) // 2]


def batched_scan_rate(n=30, batch=8, rounds=10, lp_iters=400, sel_size=16,
                      repeats=3):
    """Third driver-visible metric (VERDICT r4 next #3): instance-batched
    scan-mode throughput — B instances solved concurrently through the
    sharded round machinery (parallel/round.make_sharded_scan_step), all
    rounds in ONE dispatch, neural strategy, f64-certifiable duals stacked
    per round.  Median of ``repeats`` timed dispatches."""
    import jax
    import jax.numpy as jnp

    from sdpcutsel_tpu.instances import generate_spar
    from sdpcutsel_tpu.parallel.mesh import make_mesh
    from sdpcutsel_tpu.parallel.round import (
        init_batched_state, make_sharded_scan_step, shard_batched_state,
    )
    from sdpcutsel_tpu.cuts.enumerate import combinations_table
    from sdpcutsel_tpu.parallel.sharding import shard_candidates

    mesh = make_mesh(data=1, cand=1)
    insts = [generate_spar(n, 100, s + 1) for s in range(batch)]
    Qb = jnp.asarray(np.stack([i.Q for i in insts]), jnp.float32)
    cb = jnp.asarray(np.stack([i.c for i in insts]), jnp.float32)
    state0 = shard_batched_state(
        init_batched_state(Qb, cb, capacity=1024, kmax=3), mesh)
    table, valid = shard_candidates(combinations_table(n, 3), mesh)
    scan = make_sharded_scan_step(mesh, rounds=rounds, lp_iters=lp_iters,
                                  sel_size=sel_size, strategy="neural")
    out = scan(state0, table, valid)                 # warmup/compile
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(scan(state0, table, valid))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return batch * rounds / dt


def main():
    rate_cpu = cpu_scoring_rate()
    rate_tpu = tpu_scoring_rate()
    e2e, replica, recert_s = end_to_end_rate()
    batched = batched_scan_rate()
    print(json.dumps({
        "metric": "end_to_end_rounds_per_sec_n125",
        "value": round(e2e, 3),
        "unit": "suite-config rounds/s (n=125 scan mode, neural, sel_size=20,"
                " device dispatch time, median of 3; every round's bound f64-"
                "certified on host, overlappable — cost reported separately)",
        "vs_baseline": (round(e2e / replica, 2) if replica else None),
        "baseline_replica_rounds_per_sec": (round(replica, 3)
                                            if replica else None),
        "host_recert_s_per_run": round(recert_s, 3),
    }))
    print(json.dumps({
        "metric": "batched_instance_rounds_per_sec",
        "value": round(batched, 1),
        "unit": "instance-rounds/s/chip (8 x n=30 concurrent, scan mode, "
                "neural, one dispatch for the whole batched multi-round "
                "solve; median of 3)",
        "vs_baseline": None,
    }))
    print(json.dumps({
        "metric": "candidate_cuts_scored_per_sec_per_chip",
        "value": round(rate_tpu, 1),
        "unit": "candidates/s/chip (n=125, k=3, eigh+NN scoring)",
        "vs_baseline": round(rate_tpu / max(rate_cpu, 1e-9), 2),
        # denominator recorded so the ratio is reproducible (ADVICE round 1)
        "baseline_cpu_rate_per_sec": round(rate_cpu, 1),
    }))


if __name__ == "__main__":
    main()
