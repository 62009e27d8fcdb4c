"""Flagship app: RF cardiac ablation — electrostatic potential → SAR →
Pennes bioheat → Arrhenius lesion (BASELINE configs 3-4).

  python examples/ablation_demo.py --n 8 --t-final 30 --dt 0.5
"""

import numpy as np

from common import setup_jax, standard_parser


def main():
    ap = standard_parser("Coupled RF ablation on a tissue block")
    ap.add_argument("--n", type=int, default=6, help="elements per axis")
    ap.add_argument("--size", type=float, default=0.02, help="block size [m]")
    ap.add_argument("--voltage", type=float, default=50.0)
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--t-final", type=float, default=10.0)
    args = ap.parse_args()
    setup_jax(args)

    import jax.numpy as jnp

    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
    from cardiac_ablation_ecm2_tpu.models import ablation

    L = args.size
    mesh = make_cartesian_3d(args.n, args.n, args.n, L, L, L)
    sim = ablation.AblationSim(
        mesh=mesh, order=args.order, voltage=args.voltage,
        electrode_bdr=[6], ground_bdr=[1],
    )
    print(f"RF solve: {sim.rf.iterations} CG iters, "
          f"P = {float(jnp.sum(sim.op.gf.wdet * sim.rf.sar_q)):.3f} W")
    T, om = sim.initial_state()
    t = 0.0
    n = int(round(args.t_final / args.dt))
    for k in range(n):
        T, om, t = sim.step(T, om, t, args.dt)
        if (k + 1) % max(n // 10, 1) == 0:
            print(f"t={t if isinstance(t,float) else float(t):6.1f}s  "
                  f"Tmax={float(jnp.max(T)):.2f}C  "
                  f"lesion={sim.lesion_volume(om)*1e9:.1f} mm^3")


if __name__ == "__main__":
    main()
