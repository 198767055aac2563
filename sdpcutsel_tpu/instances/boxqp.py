"""BoxQP instances: the "spar" family, parser, writer, generator, registry.

The reference benchmarks on the standard BoxQP "spar" set
(Vandenbussche-Nemhauser, extended by Chen-Burer): instances named
``spar{n:03d}-{density}-{seed}`` with

    max f(x) = 1/2 x^T Q x + c^T x,   x in [0,1]^n

Q symmetric with integer entries drawn uniformly from [-50, 50] at the given
density (off-diagonal nonzero with probability density/100), c integer uniform
in [-100, 100].  (SURVEY.md section 0.1; the reference data mount was empty, so
instances are regenerated here from the same published distribution, with
deterministic seeds — parity numbers are therefore measured against our own CPU
replica of the reference algorithm on the same instances, see baseline/.)

File format (standard BoxQP .in layout):

    line 1: n
    line 2: c_1 ... c_n
    lines 3..n+2: rows of Q (n values each)
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BoxQPInstance:
    name: str
    Q: np.ndarray   # (n, n) symmetric float64
    c: np.ndarray   # (n,) float64

    @property
    def n(self) -> int:
        return int(self.c.shape[0])

    def objective(self, x: np.ndarray) -> float:
        """f(x) = 1/2 x'Qx + c'x (maximization objective)."""
        x = np.asarray(x, dtype=np.float64)
        return float(0.5 * x @ self.Q @ x + self.c @ x)


_NAME_RE = re.compile(r"^spar(\d+)-(\d+)-(\d+)$")


def generate_spar(n: int, density: int, seed: int) -> BoxQPInstance:
    """Generate a spar-style instance from the published distribution.

    Deterministic in (n, density, seed).  Uses a dedicated Philox generator so
    instance content never depends on global numpy state.
    """
    name = f"spar{n:03d}-{density}-{seed}"
    key = (n << 32) | (density << 16) | seed
    rng = np.random.Generator(np.random.Philox(key=[key, 0x5DC]))
    Q = np.zeros((n, n), dtype=np.float64)
    iu = np.triu_indices(n, k=1)
    m = iu[0].shape[0]
    mask = rng.random(m) < (density / 100.0)
    vals = rng.integers(-50, 51, size=m).astype(np.float64) * mask
    Q[iu] = vals
    Q = Q + Q.T
    diag = rng.integers(-50, 51, size=n).astype(np.float64)
    np.fill_diagonal(Q, diag)
    c = rng.integers(-100, 101, size=n).astype(np.float64)
    return BoxQPInstance(name=name, Q=Q, c=c)


def parse_boxqp(path: str, name: str | None = None,
                use_native: bool = True) -> BoxQPInstance:
    """Parse the standard BoxQP .in format (see module docstring).

    Uses the C++ reader (native/boxqp_io.cpp) when built — the suite data
    loader reads 100+ instances per experiment — with a transparent Python
    fallback."""
    if use_native:
        from ..native import boxqp_parse_native

        out = boxqp_parse_native(path)
        if out is not None:
            Q, c = out
            if not np.allclose(Q, Q.T):
                Q = 0.5 * (Q + Q.T)
            if name is None:
                name = os.path.splitext(os.path.basename(path))[0]
            return BoxQPInstance(name=name, Q=Q, c=c)
    with open(path) as f:
        tokens = f.read().split()
    n = int(tokens[0])
    vals = np.asarray(tokens[1:], dtype=np.float64)
    if vals.shape[0] != n + n * n:
        raise ValueError(
            f"{path}: expected {n + n * n} values after n={n}, got {vals.shape[0]}"
        )
    c = vals[:n]
    Q = vals[n:].reshape(n, n)
    if not np.allclose(Q, Q.T):
        Q = 0.5 * (Q + Q.T)  # symmetrize defensively
    if name is None:
        name = os.path.splitext(os.path.basename(path))[0]
    return BoxQPInstance(name=name, Q=Q, c=c)


def write_boxqp(inst: BoxQPInstance, path: str) -> None:
    with open(path, "w") as f:
        f.write(f"{inst.n}\n")
        f.write(" ".join(f"{v:.17g}" for v in inst.c) + "\n")
        for row in inst.Q:
            f.write(" ".join(f"{v:.17g}" for v in row) + "\n")


def suite_names(sizes=(20, 30, 40, 50, 60, 70, 80, 90, 100, 125),
                densities=(25, 50, 75, 100), seeds=(1, 2, 3)) -> list[str]:
    """The benchmark suite grid: 10 sizes x 4 densities x 3 seeds = 120 names
    (superset of the ~99-instance published spar set)."""
    return [
        f"spar{n:03d}-{d}-{s}" for n in sizes for d in densities for s in seeds
    ]


def load_or_generate(name: str, data_dir: str | None = None) -> BoxQPInstance:
    """Load ``{data_dir}/{name}.in`` if present, else generate deterministically
    from the name and (if data_dir given) persist it."""
    m = _NAME_RE.match(name)
    if data_dir is not None:
        path = os.path.join(data_dir, f"{name}.in")
        if os.path.exists(path):
            return parse_boxqp(path, name=name)
    if m is None:
        raise ValueError(f"cannot generate unknown instance name: {name}")
    n, density, seed = (int(g) for g in m.groups())
    inst = generate_spar(n, density, seed)
    if data_dir is not None:
        os.makedirs(data_dir, exist_ok=True)
        write_boxqp(inst, os.path.join(data_dir, f"{name}.in"))
    return inst
