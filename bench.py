"""Benchmark driver: implicit Pennes-bioheat timestep throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric (BASELINE.md): wall-clock per implicit SDIRK33 bioheat timestep on a
3D hex mesh, reported as DOF/s/chip.  ``vs_baseline`` compares against the
measured MFEM CPU reference (see BASELINE.md; recorded in
``bench_baseline.json`` when taken) — values > 1 mean faster than the
reference CPU baseline.

Environment knobs: BENCH_N (elements/axis, default 48), BENCH_ORDER (2),
BENCH_STEPS (5), BENCH_DTYPE (float32).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    # make the CPU backend available alongside the tunneled TPU: operator
    # setup runs there so the step-jit's embedded constants fetch from host
    # memory — immune to tunnel device->host outages (observed 2026-08-17:
    # d2h hung while compute/h2d stayed healthy, stalling compiles inside
    # _array_mlir_constant_handler)
    if "JAX_PLATFORMS" in os.environ and \
            "cpu" not in os.environ["JAX_PLATFORMS"]:
        os.environ["JAX_PLATFORMS"] += ",cpu"

    n = int(os.environ.get("BENCH_N", "48"))
    order = int(os.environ.get("BENCH_ORDER", "2"))
    steps = int(os.environ.get("BENCH_STEPS", "5"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    tol = float(os.environ.get("BENCH_TOL", "1e-5"))

    import jax

    # enable x64 so mixed-precision CG can accumulate inner products in f64
    # (the convergence criterion (r,z) <= rel^2 (r0,z0) is unevaluable in
    # pure f32; arrays stay float32 — only the dot reductions widen)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from cardiac_ablation_ecm2_tpu.fem.cartesian import CartesianFESpace
    from cardiac_ablation_ecm2_tpu.linalg import ode
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
    from cardiac_ablation_ecm2_tpu.models import bioheat
    from cardiac_ablation_ecm2_tpu.utils.config import configure

    # quad_extra=0 → nq1d = p+1 Gauss: EXACT for the affine-hex constant-
    # coefficient operator (integrand degree ≤ 2p per direction; 3-pt Gauss
    # is order-5) and matches MFEM's own default 2p-order rule — while
    # carrying 27 instead of 64 qdata points per element (2.4× less HBM
    # traffic on the dominant stream).
    configure(dtype=dtype,
              matmul_precision=os.environ.get("BENCH_MATMUL", "high"),
              quad_extra=int(os.environ.get("BENCH_QUAD_EXTRA", "0")))

    # persistent XLA executable cache: re-runs of the same step skip the
    # multi-minute compile (BENCH_COMPILE_CACHE=0 opts out for cold timings)
    if os.environ.get("BENCH_COMPILE_CACHE", "1") == "1":
        from cardiac_ablation_ecm2_tpu.utils.config import \
            enable_compilation_cache

        enable_compilation_cache()

    L = 0.04
    # BENCH_MESH: "cartesian" (default), "cardiac-tet" (genuinely
    # unstructured Delaunay tets + electrode notch), "cardiac-hex"
    # (warped/jittered hexes + notch) — the BASELINE config-5 workload on a
    # real mesh (mesh/cardiac.py); identical files feed the MFEM CPU driver
    # (tools/mfem_bioheat_bench.cpp).
    mesh_kind = os.environ.get("BENCH_MESH", "cartesian")
    cardiac = mesh_kind.startswith("cardiac")
    unstructured = cardiac or os.environ.get("BENCH_UNSTRUCTURED", "0") == "1"
    def _cached_cardiac(maker):
        # the meshes are deterministic (seed=0); cache to skip the ~2-10 min
        # Delaunay/numbering rebuild between bench attempts at n=66
        import numpy as _np

        from cardiac_ablation_ecm2_tpu.mesh.mesh import Mesh

        path = f"/tmp/bench_mesh_{mesh_kind}_{n}.npz"
        if os.path.exists(path):
            z = _np.load(path)
            from cardiac_ablation_ecm2_tpu.fem.geometry import Geometry

            return Mesh(geom=Geometry(int(z["geom"])), vertices=z["vertices"],
                        elements=z["elements"], attributes=z["attributes"],
                        boundary=z["boundary"],
                        bdr_attributes=z["bdr_attributes"])
        m = maker(n, lengths=(L, L, L / 2), electrode_radius=0.004)
        _np.savez(path, geom=int(m.geom), vertices=m.vertices,
                  elements=m.elements, attributes=m.attributes,
                  boundary=m.boundary, bdr_attributes=m.bdr_attributes)
        return m

    # BENCH_STRUCTURED=1 + cardiac-hex: the masked-lattice fast path — the
    # carved hex problem on the FULL lattice's gather-free CartesianFESpace
    # with zeroed notch elements + pinned carved dofs.  Equivalent to the
    # carved mesh by construction (tests/test_masked_lattice.py: 1e-8).
    masked = (mesh_kind == "cardiac-hex"
              and os.environ.get("BENCH_STRUCTURED", "0") == "1")
    elem_mask = ess_extra = None
    ndof_active = None
    if masked:
        import numpy as _np

        from cardiac_ablation_ecm2_tpu.fem.masked_lattice import (
            masked_lattice_active_count,
            masked_lattice_essential,
        )
        from cardiac_ablation_ecm2_tpu.mesh.cardiac import (
            make_cardiac_hex_lattice,
        )

        mesh, keep, ns = make_cardiac_hex_lattice(
            n, lengths=(L, L, L / 2), electrode_radius=0.004)
        fes = CartesianFESpace(mesh, order, ns, (L, L, L / 2))
        elem_mask = keep.astype(_np.float32)
        ess_extra = masked_lattice_essential(ns, order, keep)
        ndof_active = masked_lattice_active_count(ns, order, keep)
        unstructured = False
    elif mesh_kind == "cardiac-tet":
        from cardiac_ablation_ecm2_tpu.mesh.cardiac import make_cardiac_tet_mesh

        mesh = _cached_cardiac(make_cardiac_tet_mesh)
    elif mesh_kind == "cardiac-hex":
        from cardiac_ablation_ecm2_tpu.mesh.cardiac import make_cardiac_hex_mesh

        mesh = _cached_cardiac(make_cardiac_hex_mesh)
    else:
        mesh = make_cartesian_3d(n, n, n, L, L, L)
    if masked:
        pass
    elif unstructured:
        # generic unstructured path: entity-key dof numbering + block-gather
        # restriction (the path a real cardiac mesh takes)
        from cardiac_ablation_ecm2_tpu.fem import FESpace

        fes = FESpace(mesh, order)
    else:
        # structured Cartesian space: gather-free restriction (fast path)
        fes = CartesianFESpace(mesh, order, (n, n, n), (L, L, L))

    if os.environ.get("BENCH_ELL", "0") == "1":
        # cache the assembled CSR pair between bench attempts (minutes of
        # host assembly at ~1M tets)
        os.environ.setdefault(
            "CAX_ELL_CACHE", f"/tmp/bench_ell_{mesh_kind}_{n}_{order}.npz")

    # lattice: broad metabolic-style Gaussian; cardiac: SAR source at the
    # electrode tip (mesh/cardiac.py)
    ctr = (L / 2, L / 2, L / 2)
    amp, width2 = ((2e7, 2 * 0.003**2) if cardiac
                   else (1e6, (L / 8) ** 2))

    def src(x):
        r2 = sum((x[..., i] - ctr[i]) ** 2 for i in range(3))
        return amp * jnp.exp(-r2 / width2)

    # BENCH_HOST_SETUP=1: build the operator on the CPU backend so the
    # step-jit's embedded constants need no TPU device->host fetch (a
    # mitigation for tunnel d2h outages).  Off by default: when d2h is
    # down, completion signals are also unreliable, so prefer a visible
    # timeout over a silently wrong measurement.
    import contextlib

    setup_ctx = contextlib.nullcontext()
    if os.environ.get("BENCH_HOST_SETUP", "0") == "1":
        try:
            setup_ctx = jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            pass
    with setup_ctx:
        op = bioheat.BioheatOperator(
            fes=fes, rho_c=3.6e6, k=0.54, w_cb=2e4, T_a=37.0, q_met=src,
            ess_bdr=None if masked else [1, 2, 3, 4, 5, 6],
            elem_mask=elem_mask, ess_dofs=ess_extra,
            rel_tol=tol, max_iter=300,
            dtype=dtype, fused_setup=True, theta_form=True,
            qdata_bf16=os.environ.get("BENCH_BF16_QDATA", "0") == "1",
            cg_variant=os.environ.get("BENCH_CG", "classic"),
            # BENCH_ELL=1: assembled multi-ELL apply (the simplex fast
            # path — 11× per-apply vs PA on o2 tets, BASELINE.md)
            assembled_apply=("ell" if os.environ.get("BENCH_ELL", "0")
                             == "1" else "off"),
            collapse_uniform_qdata=(
                not unstructured and not masked
                and os.environ.get("BENCH_NO_COLLAPSE", "0") != "1"),
        )
    solver = ode.select("sdirk33")

    # big operator arrays ride as jit ARGUMENTS (models/bioheat.big_arrays):
    # closed-over device arrays are inlined into the MLIR as constants, and
    # at 1M elements the multi-hundred-MB compile payload breaks the
    # tunneled remote compile (observed 50-min compiles → broken pipes)
    step = bioheat.make_stepper(op, solver)

    # theta form: state is the temperature rise (starts at 0)
    T = jnp.zeros(fes.ndof, dtype=jnp.dtype(dtype))
    t, dt = jnp.asarray(0.0, T.dtype), jnp.asarray(0.25, T.dtype)

    # BENCH_SYNC_STEPS=1: sync after every step instead of chaining the
    # whole timing loop.  The axon tunnel aborts on several queued ~100 ms
    # dispatches at the 1M-element scale (observed 2026-08-17 at n=66:
    # warmup fine, chained loop dies with "TPU device error"); per-step
    # sync is honest — it *includes* the sync overhead, so the recorded
    # time is an upper bound.
    sync_steps = os.environ.get("BENCH_SYNC_STEPS", "0") == "1"
    # BENCH_STEP_PAUSE=<seconds>: sleep between steps so the tunnel can
    # drain its queues (observed 2026-08-17 at n=66: back-to-back ~1 s
    # dispatches kill the session with "TPU device error" even with
    # per-step sync).  Implies per-step sync; per_step is then the mean of
    # individually timed dispatch→ready durations — still end-to-end.
    pause = float(os.environ.get("BENCH_STEP_PAUSE", "0"))
    if pause > 0:
        sync_steps = True

    # completion barrier: the tunnel's ready-events LIE under degraded d2h
    # (observed 2026-08-18: block_until_ready returns ~0 while an actual
    # value fetch takes the real compute time) — so sync via a 1-element
    # device->host readback, which cannot complete before the computation.
    first = jax.jit(lambda a: a[:1])

    def barrier(Tc):
        np.asarray(first(Tc))

    def timed_loop(nsteps, Tc, tc, sync):
        total = 0.0
        for _ in range(nsteps):
            t0 = time.perf_counter()
            Tc, tc = step(Tc, tc, dt)
            if sync:
                barrier(Tc)
            total += time.perf_counter() - t0
            if pause > 0:
                time.sleep(pause)
        t0 = time.perf_counter()
        barrier(Tc)
        total += time.perf_counter() - t0
        return total, Tc, tc

    # warmup / compile (step + the barrier gather)
    T1, t1 = step(T, t, dt)
    barrier(T1)
    if pause > 0:
        time.sleep(pause)

    def measure(sync):
        # slope estimate (wall2 − wall)/steps on two loop lengths: cancels
        # the constant end-of-chain readback roundtrip (multi-second on a
        # degraded tunnel), leaving the pure per-step device time.  In sync
        # mode each step carries its own roundtrip — honest upper bound.
        wall, Tc, tc = timed_loop(steps, T1, t1, sync)
        wall2, Tc, tc = timed_loop(2 * steps, Tc, tc, sync)
        scale_ok = 1.2 < wall2 / max(wall, 1e-12) < 3.3
        if sync:
            per = (wall + wall2) / (3 * steps)
        else:
            per = (wall2 - wall) / steps
        return per, scale_ok, Tc

    per_step, scale_ok, Tc = measure(sync_steps)

    def implausible(per):
        # < 2 ms/step at ~1M dofs exceeds the HBM roofline several-fold —
        # flags broken completion signals (e.g. tunnel outages)
        return per < 2e-3 and fes.ndof > 5e5

    if (implausible(per_step) or not scale_ok) and not sync_steps:
        # fall back to per-step sync WITHIN this attempt (VERDICT r3):
        # per-step readbacks are immune to queue-depth dispatch artifacts
        print("bench: slope self-check failed; falling back to per-step "
              "sync", file=sys.stderr)
        sync_steps = True
        per_step, scale_ok, Tc = measure(True)
    # masked-lattice path: report the CARVED problem's dof count (what the
    # MFEM baseline solves), not the full lattice's (which also numbers the
    # pinned notch interior)
    ndof_eff = ndof_active if ndof_active is not None else fes.ndof
    dofs_per_s = ndof_eff / per_step

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "bench_baseline.json")) as f:
            bj = json.load(f)
        if cardiac:
            rows = [r for r in bj.get("cardiac", []) if r.get("mesh") == mesh_kind]
        else:
            rows = [bj["config"] | {"seconds_per_step": bj["mfem_cpu_seconds_per_step"]}]
            rows += bj.get("also_measured", [])
        match = [r for r in rows if r.get("n") == n]
        if match:
            baseline = match[0]["seconds_per_step"]
        elif rows:
            # scale the headline row by dof count (throughput is ~flat on CPU)
            r0 = rows[0]
            baseline = r0["seconds_per_step"] * ndof_eff / r0.get("ndof", ndof_eff)
    except Exception:
        pass
    vs = (baseline / per_step) if baseline else 0.0

    suspect = implausible(per_step) or not scale_ok
    return {
        "metric": "bioheat_implicit_timestep_dofs_per_s_per_chip",
        "value": dofs_per_s,
        "unit": "DOF/s",
        "vs_baseline": 0.0 if suspect else vs,
        "suspect_timing": suspect,
        "extra": {
            "seconds_per_step": per_step,
            "ndof": ndof_eff,
            "ne": mesh.ne,
            "order": order,
            "dtype": dtype,
            "device": str(jax.devices()[0]),
            "solver": "sdirk33+pcg(jacobi)", "rel_tol": tol,
            "path": ("masked-structured" if masked else
                     "unstructured" if unstructured else "structured"),
            "mesh": mesh_kind,
        },
    }


if __name__ == "__main__":
    # the axon tunnel flaps between healthy, lying-completion-signal, and
    # hard-fault states (2026-08-17/18); retry so one bad window doesn't
    # record a broken measurement.  ONE json line is printed either way.
    import sys
    import traceback

    retries = int(os.environ.get("BENCH_RETRIES", "3"))
    wait = float(os.environ.get("BENCH_RETRY_WAIT", "120"))
    result = None
    for k in range(retries):
        try:
            result = main()
        except Exception:
            traceback.print_exc(file=sys.stderr)
            result = None
        if result is not None and not result["suspect_timing"]:
            break
        if k + 1 < retries:
            print(f"bench attempt {k + 1} unusable; retrying in {wait}s",
                  file=sys.stderr)
            time.sleep(wait)
    if result is None:
        result = {
            "metric": "bioheat_implicit_timestep_dofs_per_s_per_chip",
            "value": 0.0, "unit": "DOF/s", "vs_baseline": 0.0,
            "suspect_timing": True,
            "extra": {"error": "all attempts raised (device/tunnel fault)"},
        }
    print(json.dumps(result))
