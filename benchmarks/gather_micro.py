"""Microbenchmark: L<->E restriction strategies on the real TPU.

Measures, for a 48^3 hex mesh at order 2 (the headline bioheat config,
ne=110592, nd=27, ndof=912673):

  1. L->E gather            u[gather]                 (current)
  2. E->L sorted segsum     segment_sum(vals[perm])   (current)
  3. E->L transposed gather sum_k flat[tidx[:, k]]    (candidate)
  4. E->L cumsum-diff       cumsum + boundary gather  (candidate)
  5. full BP3 apply, unstructured vs structured       (context)

Usage: python benchmarks/gather_micro.py [--n 48] [--order 2] [--cpu]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cardiac_ablation_ecm2_tpu.fem import FESpace
    from cardiac_ablation_ecm2_tpu.fem.restriction import ElementRestriction
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
    from cardiac_ablation_ecm2_tpu.ops import BilinearForm

    n, order = args.n, args.order
    mesh = make_cartesian_3d(n, n, n)
    fes = FESpace(mesh, order)
    R = ElementRestriction.for_space(fes)
    ne, nd = R.gather.shape
    ndof = R.ndof
    print(f"ne={ne} nd={nd} ndof={ndof} E-slots={ne*nd}")

    u = jnp.arange(ndof, dtype=jnp.float32) * 1e-6
    ue = jnp.ones((ne, nd), dtype=jnp.float32)

    # -- 1. L->E gather
    g = jax.jit(lambda u: u[R.gather])
    print(f"L->E gather            {timeit(g, u)*1e3:8.3f} ms")

    # flat take variant
    flat_idx = R.gather.reshape(-1)
    g2 = jax.jit(lambda u: jnp.take(u, flat_idx))
    print(f"L->E flat take         {timeit(g2, u)*1e3:8.3f} ms")

    # -- 2. E->L sorted segment sum (current)
    s1 = jax.jit(R.mult_transpose)
    print(f"E->L sorted segsum     {timeit(s1, ue)*1e3:8.3f} ms")

    # -- 3. E->L transposed-gather table (ndof, K)
    gm = np.asarray(R.gather).reshape(-1)
    order_ = np.argsort(gm, kind="stable")
    seg = gm[order_]
    counts = np.bincount(gm, minlength=ndof)
    K = int(counts.max())
    tidx = np.full((ndof, K), ne * nd, dtype=np.int64)  # pad slot
    starts = np.zeros(ndof + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    for k in range(K):
        sel = counts > k
        tidx[sel, k] = order_[starts[:-1][sel] + k]
    tidx_d = jnp.asarray(tidx, dtype=jnp.int32)
    print(f"K (max multiplicity) = {K}")

    def scatter_t(ue):
        flat = jnp.concatenate(
            [ue.reshape(-1), jnp.zeros(1, ue.dtype)])
        acc = flat[tidx_d[:, 0]]
        for k in range(1, K):
            acc = acc + flat[tidx_d[:, k]]
        return acc

    s2 = jax.jit(scatter_t)
    print(f"E->L transposed gather {timeit(s2, ue)*1e3:8.3f} ms")

    # -- 4. E->L cumsum-diff
    starts_d = jnp.asarray(starts, dtype=jnp.int32)
    perm = R.perm

    def scatter_cs(ue):
        vals = ue.reshape(-1)[perm]
        cs = jnp.concatenate(
            [jnp.zeros(1, vals.dtype), jnp.cumsum(vals)])
        return cs[starts_d[1:]] - cs[starts_d[:-1]]

    s3 = jax.jit(scatter_cs)
    print(f"E->L cumsum-diff       {timeit(s3, ue)*1e3:8.3f} ms")

    # check agreement
    ref = np.asarray(s1(ue))
    for name, f in (("transposed", s2), ("cumsum", s3)):
        err = np.abs(np.asarray(f(ue)) - ref).max()
        print(f"   {name} max err = {err:.2e}")

    # -- 5. full BP3 apply for context
    a = BilinearForm(fes).add_domain_integrator("diffusion")
    A = a.assemble().operator()
    ap_ = jax.jit(A.mult)
    print(f"BP3 apply (full)       {timeit(ap_, u)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
