"""Benchmark the block-gather restriction vs the XLA gather/segment-sum path
on the real TPU (48^3 hexes, order 2 — the headline config)."""

from __future__ import annotations

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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--order", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cardiac_ablation_ecm2_tpu.fem import FESpace
    from cardiac_ablation_ecm2_tpu.fem.restriction import (
        ElementRestriction,
        FastElementRestriction,
    )
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d

    mesh = make_cartesian_3d(args.n, args.n, args.n)
    fes = FESpace(mesh, args.order)
    gmap = np.asarray(fes.gather_map)
    ne, nd = gmap.shape

    t0 = time.perf_counter()
    fast = FastElementRestriction.from_map(gmap, fes.ndof_scalar)
    print(f"table build: {time.perf_counter()-t0:.2f}s "
          f"K_gather={fast.tg.K} "
          f"K_scatter={[t.K for t in fast.ts]} J={[t.J for t in fast.ts]}")
    base = ElementRestriction.from_map(gmap, fes.ndof_scalar)

    u = jnp.arange(fes.ndof_scalar, dtype=jnp.float32) * 1e-6
    ue = jnp.ones((ne, nd), dtype=jnp.float32)

    fm = jax.jit(fast.mult)
    fmt = jax.jit(fast.mult_transpose)
    bm = jax.jit(base.mult)
    bmt = jax.jit(base.mult_transpose)

    # correctness
    err_g = np.abs(np.asarray(fm(u)) - np.asarray(bm(u))).max()
    err_s = np.abs(np.asarray(fmt(ue)) - np.asarray(bmt(ue))).max()
    print(f"errors: gather {err_g:.2e}  scatter {err_s:.2e}")

    print(f"L->E fast   {timeit(fm, u)*1e3:8.3f} ms")
    print(f"L->E base   {timeit(bm, u)*1e3:8.3f} ms")
    print(f"E->L fast   {timeit(fmt, ue)*1e3:8.3f} ms")
    print(f"E->L base   {timeit(bmt, ue)*1e3:8.3f} ms")

    # round trip inside one jit (as in the PA apply)
    rt_f = jax.jit(lambda u: fast.mult_transpose(fast.mult(u) * 2.0))
    rt_b = jax.jit(lambda u: base.mult_transpose(base.mult(u) * 2.0))
    err = np.abs(np.asarray(rt_f(u)) - np.asarray(rt_b(u))).max()
    print(f"round trip fast {timeit(rt_f, u)*1e3:8.3f} ms (err {err:.1e})")
    print(f"round trip base {timeit(rt_b, u)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
