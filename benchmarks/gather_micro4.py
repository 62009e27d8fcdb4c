"""Probe which gather-composition primitives Mosaic supports + speeds.

U1: pallas take_along_axis axis=0, full error message
U2: pallas lane gather with wider rows (W=256, 512, 1024)
U3: pallas uniform row gather jnp.take(table, rows, axis=0)
U4: XLA row gather with 128-wide rows (slice=row)
U5: pallas row gather via fori_loop of dynamic slices
U6: pltpu.roll dynamic lane rotate availability
"""

from __future__ import annotations

import sys
import time
import traceback

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


rng = np.random.default_rng(0)

# ---- U1: axis=0 gather, small, full error ------------------------------
table = jnp.asarray(rng.standard_normal((512, 128)), jnp.float32)
idxA = jnp.asarray(rng.integers(0, 512, (512, 128)), jnp.int32)


def kernA(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)


@jax.jit
def u1(table, idxA):
    return pl.pallas_call(
        kernA,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idxA)


try:
    r = u1(table, idxA)
    jax.block_until_ready(r)
    ref = np.take_along_axis(np.asarray(table), np.asarray(idxA), axis=0)
    print(f"U1 axis0 OK err={np.abs(np.asarray(r)-ref).max():.1e} "
          f"t={timeit(u1, table, idxA)*1e3:.3f} ms")
except Exception:
    tb = traceback.format_exc()
    print("U1 axis0 FAILED:", [l for l in tb.splitlines() if l][-1][:300])

# ---- U2: lane gather wider rows ----------------------------------------
for W in (256, 512, 1024):
    B = (3 * 10**6) // W
    mat = jnp.asarray(rng.standard_normal((B, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, (B, W // 8)), jnp.int32)
    # gather W//8 elements per row from a W-wide row

    def kernW(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            t_ref[:], i_ref[:], axis=1)

    BLK = max(8, 4096 // (W // 128))
    nblk = B // BLK

    @jax.jit
    def u2(mat, idx):
        return pl.pallas_call(
            kernW,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((BLK, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, W // 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, W // 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk * BLK, W // 8), jnp.float32),
        )(mat, idx)

    try:
        m2, i2 = mat[:nblk * BLK], idx[:nblk * BLK]
        r = u2(m2, i2)
        jax.block_until_ready(r)
        ref = np.take_along_axis(np.asarray(m2), np.asarray(i2), axis=1)
        err = np.abs(np.asarray(r) - ref).max()
        print(f"U2 lane gather W={W}: t={timeit(u2, m2, i2)*1e3:.3f} ms "
              f"err={err:.1e}")
    except Exception:
        tb = traceback.format_exc()
        print(f"U2 W={W} FAILED:",
              [l for l in tb.splitlines() if l][-1][:200])

# ---- U3: pallas uniform row gather (take axis=0 with 1D rows) ----------
R = 7136
table2 = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
rows = jnp.asarray(np.sort(rng.integers(0, R, 23328)), jnp.int32)
BLKR = 1944
nblkr = 23328 // BLKR


def kernR(t_ref, r_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], r_ref[:], axis=0)


@jax.jit
def u3(table2, rows):
    return pl.pallas_call(
        kernR,
        grid=(nblkr,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLKR,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLKR, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((23328, 128), jnp.float32),
    )(table2, rows)


try:
    r = u3(table2, rows)
    jax.block_until_ready(r)
    ref = np.asarray(table2)[np.asarray(rows)]
    err = np.abs(np.asarray(r) - ref).max()
    print(f"U3 pallas row take: t={timeit(u3, table2, rows)*1e3:.3f} ms "
          f"err={err:.1e}")
except Exception:
    tb = traceback.format_exc()
    print("U3 FAILED:", [l for l in tb.splitlines() if l][-1][:250])

# ---- U4: XLA row gather 128-wide rows -----------------------------------
f4 = jax.jit(lambda t, r: t[r])
t = timeit(f4, table2, rows)
print(f"U4 xla row gather (23328x128 from 7136x128): {t*1e3:.3f} ms")

# ---- U5: dynamic-slice loop row gather in pallas ------------------------
def kernD(t_ref, r_ref, o_ref):
    def body(i, _):
        o_ref[i, :] = t_ref[r_ref[i], :]
        return 0

    jax.lax.fori_loop(0, BLKR, body, 0)


@jax.jit
def u5(table2, rows):
    return pl.pallas_call(
        kernD,
        grid=(nblkr,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLKR,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLKR, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((23328, 128), jnp.float32),
    )(table2, rows)


try:
    r = u5(table2, rows)
    jax.block_until_ready(r)
    ref = np.asarray(table2)[np.asarray(rows)]
    err = np.abs(np.asarray(r) - ref).max()
    print(f"U5 pallas ds-loop row gather: t={timeit(u5, table2, rows)*1e3:.3f}"
          f" ms err={err:.1e}")
except Exception:
    tb = traceback.format_exc()
    print("U5 FAILED:", [l for l in tb.splitlines() if l][-1][:250])
