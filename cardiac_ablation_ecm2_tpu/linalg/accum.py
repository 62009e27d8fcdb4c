"""Accurate f32 reductions without f64 emulation on the bulk stream.

TPU has no native f64: XLA emulates it as float-float pairs, which makes
f64-accumulated inner products ~14x slower than the f32 stream they guard
(measured on v5e at 912k dofs: 5.7 ms vs 0.4 ms per dot; an implicit
bioheat stage solve dropped 71 ms -> 11 ms when the CG dots stopped
paying the emulation tax).  Plain f32 tree sums are not a substitute:
they stagnate at ~4e-7 relative error under cancellation, which is what
originally forced the f64 accumulation (BASELINE.md, mixed-precision CG).

The fix is a lane-parallel Kahan accumulation at full f32 bandwidth:
stream the addends through LANES independent compensated accumulators
(``fori_loop`` of n/LANES steps, each one VPU-wide elementwise op), then
reduce the LANES partial (sum, carry) pairs in emulated f64 — negligible
work at that size.  Measured relative error ~4e-11 on positive products
(the CG quantities), ~4e-8 under heavy sign cancellation.

Reference analog: ``IterativeSolver::Dot`` (linalg/solvers.cpp:58) is a
plain f64 MPI_Allreduce; on TPU the accumulation strategy has to be
explicit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

LANES = 16384
# Below this size the f64-emulation cost is noise; use the exact path.
_SMALL = 4 * LANES


def compensated_sum(p: jnp.ndarray) -> jnp.ndarray:
    """Sum a (flat) f32 array to ~f64 accuracy; returns an f64 scalar.

    Requires ``jax_enable_x64`` (the final LANES-sized reduction uses
    emulated f64, which is cheap at that size).
    """
    p = p.ravel()
    n = p.size
    if n <= _SMALL:
        return jnp.sum(p.astype(jnp.float64))
    k = -(-n // LANES)
    pad = k * LANES - n
    p = jnp.pad(p, (0, pad)).reshape(k, LANES)

    def body(i, sc):
        s, c = sc
        y = p[i] - c
        t = s + y
        return t, (t - s) - y

    z = jnp.zeros(LANES, p.dtype)
    s, c = lax.fori_loop(0, k, body, (z, z))
    return jnp.sum(s.astype(jnp.float64)) - jnp.sum(c.astype(jnp.float64))


def compensated_dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """~f64-accurate real inner product of f32 arrays; f64 scalar out."""
    return compensated_sum(x.ravel() * y.ravel())


def native_f64(platform: str | None = None) -> bool:
    """True when the default backend executes f64 natively (CPU/GPU)."""
    p = platform or jax.default_backend()
    return p in ("cpu", "gpu", "cuda", "rocm")
