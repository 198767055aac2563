"""Validate the SDP-bound registry (VERDICT round-1 item 6).

For each instance in data/boxqp/bounds.json (or the names given), sandwich
the SDP value: recompute the eigencut UPPER bound and the independent
feasible-point LOWER bound (loop/sdp_bound.sdp_lower_bound), then record
into the registry entry:

    sdp_lower     — the independent f64 lower bound
    sdp_rel_width — (upper - lower) / (1 + |upper|), the certified cap on
                    the error the stall-stop can introduce
    sdp_ok        — registry value lies in [lower - tol, upper + tol]

Usage:
    python scripts/validate_sdp_bounds.py --names spar020-100-1,spar030-50-1
    python scripts/validate_sdp_bounds.py --max-n 50        # whole registry
"""

import argparse
import fcntl
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data/boxqp")
    ap.add_argument("--names", default=None, help="comma list; default all")
    ap.add_argument("--max-n", type=int, default=50)
    ap.add_argument("--max-rounds", type=int, default=60)
    ap.add_argument("--lp-max-iters", type=int, default=20000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from sdpcutsel_tpu.config import LPConfig
    from sdpcutsel_tpu.instances import load_or_generate
    from sdpcutsel_tpu.loop.sdp_bound import validate_sdp_bound

    reg_path = os.path.join(args.data_dir, "bounds.json")
    with open(reg_path) as f:
        reg = json.load(f)
    names = (args.names.split(",") if args.names else sorted(reg))
    lp = LPConfig(max_iters=args.lp_max_iters, tol=2e-6)

    for name in names:
        if name not in reg:
            print(f"[validate] {name}: not in registry, skipping", flush=True)
            continue
        n = int(name[4:7])
        if n > args.max_n:
            continue
        inst = load_or_generate(name, data_dir=args.data_dir)
        ub, lb, rel = validate_sdp_bound(inst, lp, max_rounds=args.max_rounds)
        rec = reg[name]
        tol = 1e-3 * (1 + abs(ub))
        ok = lb - tol <= rec["sdp"] <= ub + tol
        fresh = {"sdp_lower": lb, "sdp_rel_width": rel, "sdp_ok": bool(ok)}
        if rec["sdp"] > ub + tol:
            # registry value is a stall-stopped eigencut bound that sits
            # ABOVE the fresh upper bound — i.e. too loose, which would
            # inflate gap-closed%.  Tighten in place (both are valid upper
            # bounds, so min is too); keep the stale value for audit.
            fresh.update({"sdp_prev_stale": rec["sdp"], "sdp": ub,
                          "sdp_ok": True})
        elif rec["sdp"] < lb - tol:
            # registry value sits BELOW the certified feasible-point lower
            # bound — provably NOT a valid SDP upper bound (it would deflate
            # gap-closed% by inflating the denominator).  Replace with the
            # fresh eigencut upper bound, the certified valid value; keep
            # the wrong one for audit.
            fresh.update({"sdp_prev_stale": rec["sdp"], "sdp": ub,
                          "sdp_ok": True})
        rec.update(fresh)
        print(f"[validate] {name}: registry={rec['sdp']:.4f} "
              f"fresh_ub={ub:.4f} lb={lb:.4f} rel_width={rel:.2e} ok={ok}"
              + (" TIGHTENED" if "sdp_prev_stale" in fresh else ""),
              flush=True)
        # Locked read-merge-write: take an exclusive flock on a sidecar lock
        # file (never replaced, so the lock can't be split across inodes by
        # os.replace), re-read the registry under the lock, merge ONLY the
        # freshly computed keys into the on-disk entry (never the stale
        # in-memory rec — a concurrent run may have updated other keys), and
        # publish atomically via os.replace so a crash mid-write can never
        # leave bounds.json truncated.
        with open(reg_path + ".lock", "w") as lock_f:
            fcntl.flock(lock_f, fcntl.LOCK_EX)
            with open(reg_path) as f:
                merged = json.load(f)
            merged[name] = {**merged.get(name, rec), **fresh}
            reg = merged
            fd, tmp = tempfile.mkstemp(
                dir=os.path.dirname(os.path.abspath(reg_path)), suffix=".tmp")
            try:
                with os.fdopen(fd, "w") as tf:
                    json.dump(reg, tf, indent=1, sort_keys=True)
                os.replace(tmp, reg_path)
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise
    print("[validate] done", flush=True)


if __name__ == "__main__":
    main()
