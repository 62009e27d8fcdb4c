"""Block-gather: arbitrary-index gather at memory speed on TPU.

The fundamental TPU obstacle: XLA lowers scalar gathers (``u[idx]`` with 3M
arbitrary indices) to ~7 cycles/element — 1500× off the HBM roofline
(measured 23 ms for 12 MB on v5e; ``benchmarks/gather_micro*.py``).  What IS
fast: (a) XLA gather of whole 128-lane rows (measured at full bandwidth) and
(b) Mosaic's in-register lane gather ``take_along_axis(x, idx, axis=-1)`` on
(rows, 128) tiles (measured 0.03 ms for 3M elements).

So we decompose any fixed gather ``out[i] = src[g[i]]`` into
  1. host setup: per output row b of 128 elements, the set of distinct
     128-aligned source blocks (≤ K after a locality-aware numbering);
     tables ``blk (B, K)`` and ``code (B, 128) = sel<<7 | lane``;
  2. apply: ``W = src2d[blk]`` — XLA row gather, (B, K, 128);
  3. a trivial Pallas kernel: ``out[b,l] = W[b, sel[b,l], lane[b,l]]`` as K
     unrolled lane-gathers + selects.

This is the TPU-native replacement for the reference's ElementRestriction
gather/scatter indices (``fem/restriction.hpp:50-52``); scatter-add (E→L) is
expressed as a sum of ≤max-multiplicity plane gathers, making it
deterministic by construction (the analog of the reference's atomic-free
transpose, ``fem/restriction.cpp``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# host-side table construction
# ----------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BlockGatherTables:
    """Device tables for one fixed gather; see module docstring."""

    nsrc: int                 # logical source length
    nout: int                 # logical output length
    nsrc_rows: int            # padded source rows (incl. trailing zero row)
    blk: jnp.ndarray          # (B, K) int32 source-row ids
    code: jnp.ndarray         # (B, 128) int32: sel << 7 | lane
    K: int


def build_tables(g: np.ndarray, nsrc: int) -> BlockGatherTables:
    """Host-side: build block/code tables for ``out[i] = src[g[i]]``.

    Padding positions (beyond len(g), or g == nsrc meaning "zero") read from
    a dedicated zero row so they contribute exact zeros.
    """
    g = np.asarray(g, dtype=np.int64).reshape(-1)
    nout = g.size
    B = (nout + 127) // 128
    nsrc_rows = (nsrc + 127) // 128 + 1          # + trailing zero row
    zero_pos = (nsrc_rows - 1) * 128             # first slot of the zero row
    gp = np.full(B * 128, zero_pos, dtype=np.int64)
    gp[:nout] = np.where(g < nsrc, g, zero_pos)
    rows = gp.reshape(B, 128)
    rblk = rows // 128
    lane = rows % 128

    # per-row distinct blocks (vectorized row-wise unique); K = global max
    srt = np.sort(rblk, axis=1)
    isnew = np.concatenate(
        [np.ones((B, 1), bool), srt[:, 1:] != srt[:, :-1]], axis=1
    )
    counts = isnew.sum(axis=1)
    K = int(counts.max())
    # pad with the zero row, which is the largest row id -> rows stay sorted
    blk = np.full((B, K), nsrc_rows - 1, dtype=np.int64)
    rowidx, colpos = np.nonzero(isnew)
    slot = (np.cumsum(isnew, axis=1) - 1)[rowidx, colpos]
    blk[rowidx, slot] = srt[rowidx, colpos]
    # vectorized per-row searchsorted via row-offset trick
    big = np.int64(nsrc_rows + 1)
    sel = (
        np.searchsorted(
            (blk + np.arange(B, dtype=np.int64)[:, None] * big).ravel(),
            (rblk + np.arange(B, dtype=np.int64)[:, None] * big).ravel(),
        ).reshape(B, 128)
        - np.arange(B, dtype=np.int64)[:, None] * K
    ).astype(np.int32)
    code = (sel << 7) | lane.astype(np.int32)
    blk = blk.astype(np.int32)
    return BlockGatherTables(
        nsrc=nsrc, nout=nout, nsrc_rows=nsrc_rows,
        blk=jnp.asarray(blk), code=jnp.asarray(code, jnp.int32), K=K,
    )


# ----------------------------------------------------------------------
# device apply
# ----------------------------------------------------------------------

def _kernel(w_ref, code_ref, out_ref, *, K):
    code = code_ref[...]
    lane = jnp.bitwise_and(code, 127)
    sel = jnp.right_shift(code, 7)
    acc = jnp.take_along_axis(w_ref[:, 0, :], lane, axis=1)
    for k in range(1, K):
        gk = jnp.take_along_axis(w_ref[:, k, :], lane, axis=1)
        acc = jnp.where(sel == k, gk, acc)
    out_ref[...] = acc


def _pad_src(src: jnp.ndarray, nsrc_rows: int) -> jnp.ndarray:
    pad = nsrc_rows * 128 - src.shape[0]
    return jnp.concatenate([src, jnp.zeros(pad, src.dtype)]).reshape(
        nsrc_rows, 128
    )


@functools.partial(jax.jit, static_argnames=("nsrc_rows", "K", "nout",
                                             "interpret", "row_block"))
def _apply(src, blk, code, *, nsrc_rows, K, nout, interpret=False,
           row_block=256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    src2 = _pad_src(src, nsrc_rows)
    B = code.shape[0]
    W = src2[blk]                                  # (B, K, 128) row gather
    RB = min(row_block, B)
    nblk = (B + RB - 1) // RB
    if B % RB:
        padb = nblk * RB - B
        W = jnp.concatenate(
            [W, jnp.zeros((padb,) + W.shape[1:], W.dtype)])
        code = jnp.concatenate(
            [code, jnp.zeros((padb, 128), code.dtype)])
    out = pl.pallas_call(
        functools.partial(_kernel, K=K),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((RB, K, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * RB, 128), src.dtype),
        interpret=interpret,
    )(W, code)
    return out.reshape(-1)[:nout]


def apply(src: jnp.ndarray, t: BlockGatherTables, *, interpret: bool = False,
          row_block: int = 256) -> jnp.ndarray:
    """out[i] = src[g[i]] for the fixed g captured in ``t`` (flat f32)."""
    return _apply(src, t.blk, t.code, nsrc_rows=t.nsrc_rows, K=t.K,
                  nout=t.nout, interpret=interpret, row_block=row_block)
