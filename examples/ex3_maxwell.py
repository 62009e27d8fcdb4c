"""Example 3: definite Maxwell — curl curl E + E = f on H(curl)
(reference examples/ex3.cpp).  Arbitrary-order Nédélec space, essential
tangential BC E×n = 0, diagonal-preconditioned CG, L2 error vs the exact
divergence-free field E_i = sin(πx_j) sin(πx_k)."""

import numpy as np

from common import setup_jax, standard_parser


def main():
    ap = standard_parser("Definite Maxwell on ND_k (ex3 analog)")
    ap.add_argument("-n", type=int, default=4)
    args = ap.parse_args()
    setup_jax(args)

    import jax.numpy as jnp

    from cardiac_ablation_ecm2_tpu.fem.fe_vector_ho import NDSpaceHO
    from cardiac_ablation_ecm2_tpu.linalg.solvers import cg
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
    from cardiac_ablation_ecm2_tpu.ops.vecfe import (
        build_nd_operator,
        vecfe_linear_form,
    )

    order = max(args.order, 1)
    mesh = make_cartesian_3d(args.n, args.n, args.n)
    space = NDSpaceHO(mesh, order)
    print(f"ND_{order} on {mesh.ne} hexes: {space.ndof} dofs")
    op = build_nd_operator(space, mass_coeff=1.0, curlcurl_coeff=1.0,
                           nq1d=order + 2)

    def E(x):
        s = np.sin(np.pi * x)
        return np.stack([s[..., 1] * s[..., 2],
                         s[..., 2] * s[..., 0],
                         s[..., 0] * s[..., 1]], axis=-1)

    b = vecfe_linear_form(op, lambda x: (2 * np.pi**2 + 1) * E(x))
    ess = space.essential_dofs(None)
    mask = np.zeros(space.ndof)
    mask[ess] = 1.0
    mask = jnp.asarray(mask)

    def Aop(x):
        y = op.mult(x * (1 - mask))
        return y * (1 - mask) + x * mask

    dg = op.diagonal()
    x, info = cg(Aop, b * (1 - mask),
                 M=lambda r: r / jnp.where(mask > 0, 1.0, dg),
                 rel_tol=1e-10, max_iter=4000)
    _, _, Bq = next(t for t in op.terms if t[0] == "mass")
    e = x[op.gather] * op.signs
    vals = np.asarray(jnp.einsum("eqnc,en->eqc", Bq, e))
    ex = E(np.asarray(op.gf.x))
    w = np.asarray(op.gf.wdet)
    err = np.sqrt(np.sum(w[..., None] * (vals - ex) ** 2))
    print(f"CG iters {int(info.iterations)}; ||E_h − E||_L2 = {err:.4e}")


if __name__ == "__main__":
    main()
