"""Round 2 of gather strategy tests: Pallas in-VMEM gather, row gathers.

Strategies for E = u[gmap] with ndof~912k, 3M indices:
  P0  elementwise memcpy baseline (12 MB through HBM)
  P1  pallas: u entirely in VMEM, jnp.take(u, idx_block) per grid step
  P2  xla row-gather at sublane granularity: u2=(nr,8), gather rows + select
  P3  xla gather transposed output (27 gathers of ne)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(f, *args, reps=20):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--order", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cardiac_ablation_ecm2_tpu.fem import FESpace
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d

    n, order = args.n, args.order
    mesh = make_cartesian_3d(n, n, n)
    fes = FESpace(mesh, order)
    gmap = np.asarray(fes.gather_map)          # (ne, nd)
    ne, nd = gmap.shape
    ndof = fes.ndof_scalar
    nidx = ne * nd
    print(f"ne={ne} nd={nd} ndof={ndof} E-slots={nidx}")

    u = jnp.arange(ndof, dtype=jnp.float32) * 1e-6
    flat = gmap.reshape(-1).astype(np.int32)

    # P0 baseline: elementwise on same volume
    big = jnp.ones(nidx, jnp.float32)
    f0 = jax.jit(lambda x: x * 2.0 + 1.0)
    print(f"P0 memcpy-ish baseline {timeit(f0, big)*1e3:8.3f} ms")

    # ---- P1: pallas whole-u-in-VMEM take ----------------------------
    BLK = 8 * 2048                       # idx block: (16384,) -> (128,128)
    nblk = (nidx + BLK - 1) // BLK
    pad = nblk * BLK - nidx
    idx_pad = np.concatenate([flat, np.zeros(pad, np.int32)])
    idx2 = jnp.asarray(idx_pad.reshape(nblk, 128, BLK // 128))

    # pad u to multiple of 128 lanes
    nup = ((ndof + 127) // 128) * 128
    u_pad = jnp.concatenate([u, jnp.zeros(nup - ndof, u.dtype)])

    def kern(u_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(u_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def p1(u_pad, idx2):
        out = pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((nup,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, BLK // 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 128, BLK // 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk, 128, BLK // 128),
                                           jnp.float32),
        )(u_pad, idx2)
        return out

    try:
        t = timeit(p1, u_pad, idx2)
        ref = np.asarray(u_pad)[idx_pad].reshape(nblk, 128, BLK // 128)
        err = np.abs(np.asarray(p1(u_pad, idx2)) - ref).max()
        print(f"P1 pallas VMEM take    {t*1e3:8.3f} ms   err={err:.1e}")
    except Exception as e:
        print(f"P1 pallas VMEM take    FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # ---- P2: sublane row gather --------------------------------------
    nr = (ndof + 7) // 8
    u2 = jnp.concatenate([u, jnp.zeros(nr * 8 - ndof, u.dtype)]).reshape(nr, 8)
    rows = jnp.asarray(flat // 8)
    lanes = jnp.asarray(flat % 8)

    @jax.jit
    def p2(u2):
        rv = u2[rows]                          # (nidx, 8) row gather
        return jnp.take_along_axis(rv, lanes[:, None], axis=1)[:, 0]

    try:
        t = timeit(p2, u2)
        err = np.abs(np.asarray(p2(u2)) - np.asarray(u)[flat]).max()
        print(f"P2 row-8 gather        {t*1e3:8.3f} ms   err={err:.1e}")
    except Exception as e:
        print(f"P2 row-8 gather        FAILED: {str(e)[:200]}")

    # ---- P3: transposed 27 gathers -----------------------------------
    gm_t = jnp.asarray(gmap.T.copy())          # (nd, ne)

    @jax.jit
    def p3(u):
        return u[gm_t]

    t = timeit(p3, u)
    print(f"P3 transposed gather   {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
