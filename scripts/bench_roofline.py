"""Roofline / MFU accounting for the flagship kernels (VERDICT r3 next #6).

For each hot path — pair-structured scorer (ops/pair_score.py), generic
fused scorer (ops/fused_score.py), PDHG block kernel (lp/pdhg_kernel.py) —
measure the sustained rate, split it into stages where possible
(plane-assembly+Jacobi kernel vs MLP matmuls), and report analytic FLOPs
and bytes against the chip ceilings, so BASELINE.md can state MFU honestly
instead of only a CPU multiplier.

Ceilings used (TPU v5e, public specs): 197 TFLOP/s bf16 MXU, ~49 TFLOP/s
f32 MXU, 819 GB/s HBM.  The VPU f32 vector ceiling is not published; the
report therefore gives the VPU-stage rate in slot-ops/s and flags the
binding resource by elimination (a stage far from both MXU and HBM ceilings
that scales with padded slots is VPU/issue-bound).

FLOP models (counted from the kernels' own arithmetic):
  Jacobi 4x4 (ops/jacobi.py): sweeps * 6 rotations * ~40 flops on the
    10-plane struct-of-arrays carry  -> 5 sweeps ~ 1.2 kflop/slot.
  MLP (15->64->64->1): 5120 MACs = 10.2 kflop/slot, but the first layer's
    contraction dim is 15 of the MXU's 128 -> effective MXU occupancy 12%
    on that layer; effective-time model uses ceil(contract/128)*128.
  PDHG block iteration: dominated by the two (n, n) x (cap,) support
    embeddings -> ~4 * cap * n bytes + 2 * cap * n^2-ish MACs, see
    lp/pdhg_kernel.py docstring.

Usage: python scripts/bench_roofline.py [--n 125]   (TPU)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

MXU_F32 = 49e12
MXU_BF16 = 197e12
HBM_BPS = 819e9


def timed(fn, *args, repeats=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], out


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
    from sdpcutsel_tpu.instances import generate_spar
    from sdpcutsel_tpu.models.scorer import load_params
    from sdpcutsel_tpu.ops.fused_score import mlp_params_for_kernel
    from sdpcutsel_tpu.ops.pair_score import (
        _mlp, _planes, _round_inputs, build_pair_layout, pair_consts_static,
        pair_score_fused,
    )

    n = args.n
    R = args.rounds
    inst = generate_spar(n, 100, 1)
    Q = jnp.asarray(inst.Q, jnp.float32)
    cfg = ScorerConfig()
    params, _ = load_params(3, tuple(cfg.hidden))
    W = [jnp.asarray(a) for a in mlp_params_for_kernel(params)]
    pi, pj, _, _ = build_pair_layout(n)
    consts = pair_consts_static(Q, pi, pj)
    P_pad = consts["pi"].shape[0]
    slots = P_pad * 128
    T_real = n * (n - 1) * (n - 2) // 6

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n), jnp.float32)
    X = jnp.asarray(
        np.clip(np.outer(x, x) + 0.2 * rng.standard_normal((n, n)), 0, 1),
        jnp.float32)
    X = 0.5 * (X + X.T)

    report = {"n": n, "slots_padded": slots, "candidates_real": T_real,
              "padding_factor": round(slots / T_real, 2)}

    # ---- full pair path (kernel + MLP), sustained --------------------------
    @jax.jit
    def full(x, X, consts, *W):
        def body(i, acc):
            nn, feas = pair_score_fused(x + acc * 1e-12, X, consts, *W,
                                        sweeps=5)
            return acc + feas.sum() + nn.sum()
        return jax.lax.fori_loop(0, R, body, 0.0)

    sec, _ = timed(full, x, X, consts, *W, repeats=args.repeats)
    t_full = sec / R
    report["pair_full"] = {
        "time_per_pass_ms": round(t_full * 1e3, 3),
        "real_cands_per_sec": round(T_real / t_full / 1e6, 1),
        "padded_slots_per_sec": round(slots / t_full / 1e6, 1),
    }

    # ---- stage A: plane assembly + Jacobi kernel only ----------------------
    @jax.jit
    def kernel_only(x, X, consts, *W):
        def body(i, acc):
            nn, feas = pair_score_fused(x + acc * 1e-12, X, consts, *W,
                                        sweeps=5, skip_mlp=True)
            return acc + feas.sum() + nn.sum()
        return jax.lax.fori_loop(0, R, body, 0.0)

    try:
        sec, _ = timed(kernel_only, x, X, consts, *W, repeats=args.repeats)
        t_kernel = sec / R
    except TypeError:
        t_kernel = None  # older kernel without skip_mlp

    # ---- stage B: MLP matmuls only (on precomputed feature planes) ---------
    xp, xd, Xri, Xrj, psc = _round_inputs(x, X, consts["pi"], consts["pj"])
    feats, scale, z = _planes(xp, xd, consts["qd"], Xri, Xrj,
                              consts["Qri"], consts["Qrj"], psc,
                              consts["qsc"])
    feats_fB = jnp.stack([f.reshape(-1) for f in feats], axis=0)  # (15, B)
    scale_flat = scale.reshape(-1)

    @jax.jit
    def mlp_only(feats_fB, scale_flat, *W):
        def body(i, acc):
            nn = _mlp(feats_fB + acc * 1e-12, scale_flat, *W)
            return acc + nn.sum()
        return jax.lax.fori_loop(0, R, body, 0.0)

    sec, _ = timed(mlp_only, feats_fB, scale_flat, *W, repeats=args.repeats)
    t_mlp = sec / R

    jacobi_flops = slots * 5 * 6 * 40
    mlp_macs = slots * (15 * 64 + 64 * 64 + 64)
    mlp_macs_eff = slots * (128 * 64 + 64 * 64 + 64)  # MXU pads contract dim
    plane_bytes = slots * 15 * 4 * 2                   # planes out + read back

    stages = {
        "mlp_only": {
            "time_per_pass_ms": round(t_mlp * 1e3, 3),
            "flops": mlp_macs * 2,
            "mxu_f32_pct_nominal": round(100 * mlp_macs * 2 / t_mlp / MXU_F32,
                                         1),
            "mxu_f32_pct_padded_contract": round(
                100 * mlp_macs_eff * 2 / t_mlp / MXU_F32, 1),
            "hbm_pct": round(100 * plane_bytes / t_mlp / HBM_BPS, 1),
        },
    }
    if t_kernel is not None:
        stages["assembly_jacobi_kernel"] = {
            "time_per_pass_ms": round(t_kernel * 1e3, 3),
            "jacobi_flops": jacobi_flops,
            "vpu_flops_per_sec": round(jacobi_flops / t_kernel / 1e12, 3),
            "hbm_pct": round(100 * plane_bytes / t_kernel / HBM_BPS, 1),
        }
    report["pair_stages"] = stages

    # ---- PDHG block kernel -------------------------------------------------
    try:
        from sdpcutsel_tpu.lp import pdhg_kernel  # noqa: F401
        from sdpcutsel_tpu.lp.pdhg import (
            estimate_norm, init_state, solve_lp,
        )
        from sdpcutsel_tpu.config import LPConfig
        from sdpcutsel_tpu.relax.cutbuffer import empty_pool

        cap = 1024
        pool = empty_pool(cap, 3, jnp.float32)
        st = init_state(n, cap, 0, jnp.float32)
        lpc = LPConfig(max_iters=2000, tol=0.0, feas_tol=0.0,
                       use_kernel="on" if jax.default_backend() == "tpu"
                       else "off")
        Qj = jnp.asarray(inst.Q, jnp.float32)
        cj = jnp.asarray(inst.c, jnp.float32)

        def lp_pass():
            out, info = solve_lp(Qj, cj, pool, st, lpc)
            return out.x

        sec, _ = timed(lp_pass, repeats=3)
        t_iter = sec / 2000
        # per iteration: K and K^T each touch x(n), X(n,n), yA/yB(n,n),
        # cut rows via the (n, cap) support embedding matmuls
        iter_flops = 2 * 2 * (n * n * 3 + 2 * cap * n * 3)
        iter_bytes = 4 * (6 * n * n + 4 * cap)
        report["pdhg_block"] = {
            "us_per_iter": round(t_iter * 1e6, 2),
            "approx_flops_per_iter": iter_flops,
            "hbm_pct_if_uncached": round(100 * iter_bytes / t_iter / HBM_BPS,
                                         1),
            "note": "VMEM-resident: the hbm_pct figure is what the kernel "
                    "AVOIDS paying per iteration",
        }
    except Exception as e:  # pragma: no cover
        report["pdhg_block"] = {"error": str(e)}

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
