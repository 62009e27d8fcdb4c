"""Probe Mosaic 2D gather (take_along_axis) support + speed on TPU.

T1: pallas take_along_axis axis=0 (row index per lane), table (R,128)
T2: pallas take_along_axis axis=1 (lane index per row)
T3: XLA-level take_along_axis axis=0 same shapes
T4: XLA-level take_along_axis axis=1
Sizes mirror the real need: ~3M gathered elements.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, reps=50):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


R = 7136            # table rows (~913k/128)
B = 23328           # output rows (~3M/128)
C = 128

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((R, C)), jnp.float32)
idx0 = jnp.asarray(rng.integers(0, R, (B, C)), jnp.int32)    # axis=0 gather
idx1 = jnp.asarray(rng.integers(0, C, (B, C)), jnp.int32)    # axis=1 gather
mat = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)

# ---- T1: pallas axis=0 gather, grid over output blocks -------------------
BLK = 512
nblk = B // BLK + (B % BLK > 0)
Bp = nblk * BLK
idx0p = jnp.pad(idx0, ((0, Bp - B), (0, 0)))


def kern0(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)


@jax.jit
def t1(table, idx0p):
    return pl.pallas_call(
        kern0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, C), jnp.float32),
    )(table, idx0p)


try:
    t = timeit(t1, table, idx0p)
    ref = np.take_along_axis(
        np.asarray(table), np.asarray(idx0p) % R, axis=0)
    err = np.abs(np.asarray(t1(table, idx0p)) - ref).max()
    print(f"T1 pallas axis0 gather  {t*1e3:8.3f} ms  err={err:.1e}")
except Exception as e:
    print(f"T1 pallas axis0 gather  FAILED: {str(e)[:200]}")

# ---- T2: pallas axis=1 gather --------------------------------------------
matp = jnp.pad(mat, ((0, Bp - B), (0, 0)))
idx1p = jnp.pad(idx1, ((0, Bp - B), (0, 0)))


def kern1(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)


@jax.jit
def t2(matp, idx1p):
    return pl.pallas_call(
        kern1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, C), jnp.float32),
    )(matp, idx1p)


try:
    t = timeit(t2, matp, idx1p)
    ref = np.take_along_axis(np.asarray(matp), np.asarray(idx1p), axis=1)
    err = np.abs(np.asarray(t2(matp, idx1p)) - ref).max()
    print(f"T2 pallas axis1 gather  {t*1e3:8.3f} ms  err={err:.1e}")
except Exception as e:
    print(f"T2 pallas axis1 gather  FAILED: {str(e)[:200]}")

# ---- T3/T4: XLA-level ------------------------------------------------------
f3 = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0))
try:
    t = timeit(f3, table, idx0 % R)
    print(f"T3 xla axis0 gather     {t*1e3:8.3f} ms")
except Exception as e:
    print(f"T3 xla axis0 gather     FAILED: {str(e)[:160]}")

f4 = jax.jit(lambda m, i: jnp.take_along_axis(m, i, axis=1))
try:
    t = timeit(f4, mat, idx1)
    print(f"T4 xla axis1 gather     {t*1e3:8.3f} ms")
except Exception as e:
    print(f"T4 xla axis1 gather     FAILED: {str(e)[:160]}")
