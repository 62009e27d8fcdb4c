"""Pallas TPU kernels for the hot operator applies.

The sum-factorized diffusion apply is a 7-stage contraction chain
(G/B passes → packed-D product → transpose passes).  XLA fuses much of it,
but the measured apply (3.45 ms at 912k dofs) sits ~13× above the pure
qdata-bandwidth bound — intermediates still round-trip through HBM.  This
kernel performs the whole chain for a block of elements inside VMEM:

    e (BLK, n1³) ──G/B passes──► g (BLK, nq³, 3) ──packed D──► Dg
                 ◄──Gᵀ/Bᵀ──── y (BLK, n1³)

The 1D factor matrices are tiny (nq1×n1 ≤ 8×8) and live in VMEM; each grid
step streams one element block's E-vector + qdata.  Correctness is validated
against ``ops.diffusion.apply`` (interpret mode on CPU; same kernel runs
compiled on TPU).  Opt-in via ``diffusion_apply_pallas``; the einsum path
remains the default pending TPU-side profiling.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific namespace (absent on pure-CPU installs)
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _kernel_3d(e_ref, qd_ref, b1_ref, g1_ref, out_ref, *, n1, nq1):
    """One element block: fused diffusion apply (3D, packed qdata)."""
    blk = e_ref.shape[0]
    B = b1_ref[:]                                   # (nq1, n1)
    G = g1_ref[:]
    e = e_ref[:].reshape(blk, n1, n1, n1)           # (e, k, j, i)

    def chain(Fx, Fy, Fz):
        # contract x (i), then y (j), then z (k); all tiny matmuls
        t = jax.lax.dot_general(
            e.reshape(blk * n1 * n1, n1), Fx.T,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(blk, n1, n1, nq1)
        t = jnp.moveaxis(t, 2, 3)                   # (e, k, a, j)
        t = jax.lax.dot_general(
            t.reshape(blk * n1 * nq1, n1), Fy.T,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(blk, n1, nq1, nq1)
        t = jnp.moveaxis(t, 1, 3)                   # (e, a, b, k)
        t = jax.lax.dot_general(
            t.reshape(blk * nq1 * nq1, n1), Fz.T,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(blk, nq1, nq1, nq1)               # (e, a, b, c)
        return t.transpose(0, 3, 2, 1)              # (e, c, b, a) lex

    # gradients in reference space; axes come back as (e, qa, qb, qc) with
    # the moveaxis bookkeeping making the final layout (e, qz, qy, qx)
    gx = chain(G, B, B)
    gy = chain(B, G, B)
    gz = chain(B, B, G)

    q = qd_ref[:]                                   # (6, blk, nq)
    nq = nq1 * nq1 * nq1
    gxf = gx.reshape(blk, nq)
    gyf = gy.reshape(blk, nq)
    gzf = gz.reshape(blk, nq)
    Dx = q[0] * gxf + q[3] * gyf + q[4] * gzf
    Dy = q[3] * gxf + q[1] * gyf + q[5] * gzf
    Dz = q[4] * gxf + q[5] * gyf + q[2] * gzf

    def chain_t(v, Fx, Fy, Fz):
        t = v.reshape(blk, nq1, nq1, nq1)
        t = jax.lax.dot_general(
            t.reshape(blk * nq1 * nq1, nq1), Fx,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(blk, nq1, nq1, n1)
        t = jnp.moveaxis(t, 2, 3)
        t = jax.lax.dot_general(
            t.reshape(blk * nq1 * n1, nq1), Fy,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(blk, nq1, n1, n1)
        t = jnp.moveaxis(t, 1, 3)
        t = jax.lax.dot_general(
            t.reshape(blk * n1 * n1, nq1), Fz,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(blk, n1, n1, n1)                   # (e, i, j, k)
        return t.transpose(0, 3, 2, 1)               # (e, k, j, i) lex

    y = (
        chain_t(Dx, G, B, B)
        + chain_t(Dy, B, G, B)
        + chain_t(Dz, B, B, G)
    )
    out_ref[:] = y.reshape(blk, n1 * n1 * n1)


def diffusion_apply_pallas(
    db, qdata: jnp.ndarray, e: jnp.ndarray,
    block: int = 512, interpret: bool = False,
) -> jnp.ndarray:
    """Fused 3D diffusion apply (packed qdata) via Pallas.

    Matches ``diffusion.apply(db, qdata, e)`` for scalar fields on hexes;
    requires ne % block == 0 (pad externally if needed)."""
    assert db.tensor and db.dim == 3 and qdata.shape[0] == 6
    ne, nd = e.shape
    n1, nq1 = db.n1d, db.nq1d
    nq = nq1**3
    assert ne % block == 0
    grid = (ne // block,)

    kernel = functools.partial(_kernel_3d, n1=n1, nq1=nq1)
    mem = {} if _VMEM is None else {"memory_space": _VMEM}
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, nd), lambda i: (i, 0), **mem),
            pl.BlockSpec((6, block, nq), lambda i: (0, i, 0), **mem),
            pl.BlockSpec((nq1, n1), lambda i: (0, 0), **mem),
            pl.BlockSpec((nq1, n1), lambda i: (0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((block, nd), lambda i: (i, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((ne, nd), e.dtype),
        interpret=interpret,
    )(e, qdata, db.B1, db.G1)
