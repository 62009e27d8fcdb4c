"""Profile the fused Pallas diffusion apply vs the einsum path on real TPU.

Usage: python benchmarks/pallas_profile.py [N] [order] [block]
Prints one JSON line per variant with median ms/apply.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cardiac_ablation_ecm2_tpu.utils.config import configure
from cardiac_ablation_ecm2_tpu.fem.cartesian import CartesianFESpace
from cardiac_ablation_ecm2_tpu.fem.build import basis_for, geom_factors_for
from cardiac_ablation_ecm2_tpu.ops import diffusion as dmod
from cardiac_ablation_ecm2_tpu.ops.pallas_kernels import diffusion_apply_pallas


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    order = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    configure(dtype="float32", matmul_precision="high")

    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d

    mesh = make_cartesian_3d(N, N, N)
    fes = CartesianFESpace(mesh, order, (N, N, N))
    db = basis_for(fes)
    gf = geom_factors_for(fes)
    qd = dmod.setup_packed(gf, 1.0)
    ne, nd = fes.mesh.ne, fes.nd_elem
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.random((ne, nd)).astype(np.float32))
    dev = jax.devices()[0]
    print(f"# ne={ne} nd={nd} nq={db.nq1d**3} device={dev.device_kind}",
          flush=True)

    def bench(fn, name):
        y = fn(e)
        y.block_until_ready()
        ts = []
        for _ in range(30):
            t0 = time.perf_counter()
            fn(e).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) * 1e3)
        print(json.dumps({"variant": name, "ms": round(ms, 4),
                          "ne": ne, "order": order}), flush=True)
        return y, ms

    f_ein = jax.jit(lambda v: dmod.apply(db, qd, v))
    y0, ms0 = bench(f_ein, "einsum")

    f_pl = jax.jit(lambda v: diffusion_apply_pallas(db, qd, v, block=block))
    try:
        y1, ms1 = bench(f_pl, f"pallas_b{block}")
        err = float(jnp.abs(y0 - y1).max() / jnp.abs(y0).max())
        print(json.dumps({"check": "max_rel_diff", "value": err}), flush=True)
    except Exception as ex:  # pallas lowering may be unsupported on backend
        print(json.dumps({"variant": f"pallas_b{block}",
                          "error": repr(ex)[:300]}), flush=True)


if __name__ == "__main__":
    main()
