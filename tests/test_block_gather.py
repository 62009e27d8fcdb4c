"""Block-gather restriction (ops/block_gather.py): correctness vs the
gather/segment-sum reference path, on CPU via Pallas interpret mode."""

import numpy as np
import jax.numpy as jnp

from cardiac_ablation_ecm2_tpu.fem import FESpace
from cardiac_ablation_ecm2_tpu.fem.restriction import (
    ElementRestriction,
    FastElementRestriction,
)
from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_2d, make_cartesian_3d
from cardiac_ablation_ecm2_tpu.ops import block_gather as bg


def test_block_gather_random():
    rng = np.random.default_rng(3)
    nsrc, nout = 731, 4097
    g = rng.integers(0, nsrc + 1, nout)       # includes nsrc = zero sentinel
    t = bg.build_tables(g, nsrc)
    src = jnp.asarray(rng.standard_normal(nsrc), jnp.float32)
    out = np.asarray(bg.apply(src, t, interpret=True))
    ref = np.where(g < nsrc, np.asarray(src)[np.minimum(g, nsrc - 1)], 0.0)
    assert np.array_equal(out, ref)


def _check_space(fes):
    gmap = np.asarray(fes.gather_map)
    base = ElementRestriction.from_map(gmap, fes.ndof_scalar)
    fast = FastElementRestriction.from_map(gmap, fes.ndof_scalar)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fes.ndof_scalar), jnp.float32)
    ue = jnp.asarray(rng.standard_normal(gmap.shape), jnp.float32)

    eg = np.asarray(bg.apply(u, fast.tg, interpret=True)).reshape(gmap.shape)
    assert np.array_equal(eg, np.asarray(base.mult(u)))

    flat = ue.reshape(-1)
    out = sum(np.asarray(bg.apply(flat, t, interpret=True)) for t in fast.ts)
    ref = np.asarray(base.mult_transpose(ue))
    assert np.allclose(out, ref, atol=1e-5 * max(1.0, np.abs(ref).max()))


def test_fast_restriction_2d():
    _check_space(FESpace(make_cartesian_2d(5, 4), 3))


def test_fast_restriction_3d():
    _check_space(FESpace(make_cartesian_3d(3, 4, 2), 2))


def test_fast_restriction_zero_multiplicity_dofs():
    """E→L scan-scatter path: dofs untouched by the gather map must get
    exactly 0, not a neighbor's segment sum (regression: sentinel head)."""
    import numpy as np
    import jax.numpy as jnp

    from cardiac_ablation_ecm2_tpu.fem.restriction import (
        ElementRestriction, FastElementRestriction)

    rng = np.random.default_rng(5)
    ndof = 200
    # only even dofs used; multiplicity ~16 forces the scan-scatter path
    gm = (2 * rng.integers(0, ndof // 2, size=(100, 16))).astype(np.int64)
    fr = FastElementRestriction.from_map(gm, ndof)
    assert fr.ts is None, "test requires the scan-scatter path"
    er = ElementRestriction.from_map(gm, ndof)
    u_e = jnp.asarray(rng.standard_normal(gm.shape))
    a = np.asarray(fr.mult_transpose(u_e))
    b = np.asarray(er.mult_transpose(u_e))
    assert np.allclose(a, b, atol=1e-12)
    assert np.all(a[1::2] == 0.0)
    # transposed-layout variant too
    aT = np.asarray(fr.mult_transpose_t(jnp.transpose(u_e)))
    assert np.allclose(aT, b, atol=1e-12)
