"""Compensated f32 reductions (linalg/accum.py): the TPU substitute for
f64-accumulated inner products (IterativeSolver::Dot, linalg/solvers.cpp:58).
Accuracy must be far below f32 tree-sum stagnation (~4e-7) so mixed-precision
CG keeps its MFEM-parity stopping behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from cardiac_ablation_ecm2_tpu.linalg import accum


def test_compensated_dot_accuracy_positive():
    # CG's dots are (r,z), (d,Ad): positive products, no cancellation.
    rng = np.random.default_rng(3)
    n = 500_000
    x = np.abs(rng.standard_normal(n)).astype(np.float32)
    y = np.abs(rng.standard_normal(n)).astype(np.float32)
    ref = np.dot(x.astype(np.float64), y.astype(np.float64))
    got = float(jax.jit(accum.compensated_dot)(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - ref) / abs(ref) < 1e-9
    # plain f32 would typically be ~1e-7; the scheme must beat it soundly
    plain = float(jnp.vdot(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - ref) <= abs(plain - ref) + abs(ref) * 1e-12


def test_compensated_dot_cancellation():
    rng = np.random.default_rng(4)
    n = 300_001  # non-multiple of LANES exercises padding
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    ref = np.dot(x.astype(np.float64), y.astype(np.float64))
    got = float(jax.jit(accum.compensated_dot)(jnp.asarray(x), jnp.asarray(y)))
    # absolute error relative to the uncancelled magnitude
    scale = np.dot(np.abs(x).astype(np.float64), np.abs(y).astype(np.float64))
    assert abs(got - ref) / scale < 1e-9


def test_compensated_sum_small_path():
    x = np.linspace(0.0, 1.0, 1000).astype(np.float32)
    got = float(accum.compensated_sum(jnp.asarray(x)))
    assert abs(got - np.sum(x.astype(np.float64))) < 1e-10


def test_default_dot_unchanged_on_cpu():
    # on CPU the native-f64 path must still be taken (bitwise legacy behavior)
    from cardiac_ablation_ecm2_tpu.linalg.solvers import default_dot

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    expect = jnp.vdot(
        x.astype(jnp.float64), y.astype(jnp.float64)
    ).astype(x.dtype)
    assert float(default_dot(x, y)) == float(expect)
