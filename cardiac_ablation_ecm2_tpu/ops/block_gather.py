"""Block-gather: arbitrary-index gather at near-memory speed on TPU.

The fundamental TPU obstacle: XLA lowers scalar gathers (``u[idx]`` with 3M
arbitrary indices) to ~7 cycles/element — 1500× off the HBM roofline
(measured 23 ms for 12 MB on v5e; ``benchmarks/gather_micro*.py``).  What IS
fast: (a) XLA gather of whole 128-lane rows (measured at full bandwidth) and
(b) Mosaic's in-register lane gather ``take_along_axis(x, idx, axis=-1)`` on
(rows, 128) tiles (measured 0.03 ms for 3M elements).

So we decompose any fixed gather ``out[i] = src[g[i]]`` into
  1. host setup: per output row b of 128 elements, the set of distinct
     128-aligned source blocks (≤ K after a locality-aware numbering);
     tables ``blk (K, B)`` and ``code (B, 128) = sel<<7 | lane``;
  2. apply: ``W = src2d[blk]`` — XLA row gather, (K, B, 128) plane-major so
     each k-plane is a contiguous (B, 128) tile in the kernel;
  3. a trivial Pallas kernel: ``out[b,l] = W[sel[b,l], b, lane[b,l]]`` as K
     unrolled lane-gathers + selects.

Scatter-add (E→L) runs through the same kernel with J multiplicity planes
(plane j reads the j-th E-slot of every dof) summed in-register over ONE
shared W whose blocks are the per-row UNION across planes — deterministic by
construction (the analog of the reference's atomic-free transpose,
``fem/restriction.cpp``; tables replace ``fem/restriction.hpp:50-52``).
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
    """Device tables for one fixed multi-plane gather (J=1 ⇒ plain gather).

    Logical contract: ``out[i] = Σ_j src[g_j[i]]`` where ``g_j == nsrc``
    means "contributes zero".

    Registered as a pytree (arrays = leaves) so tables can be passed as
    jit ARGUMENTS: closed-over device arrays are inlined into the MLIR as
    constants, which at 1M-element scale makes multi-hundred-MB compile
    payloads (observed broken-pipe remote compiles through the axon
    tunnel).
    """

    nsrc: int                 # logical source length
    nout: int                 # logical output length
    nsrc_rows: int            # padded source rows (incl. trailing zero row)
    blk: jnp.ndarray          # (K, B) int32 source-row ids (plane-major W)
    codes: jnp.ndarray        # (J, B, 128) int32: sel << 7 | lane
    K: int
    J: int


jax.tree_util.register_pytree_node(
    BlockGatherTables,
    lambda t: ((t.blk, t.codes),
               (t.nsrc, t.nout, t.nsrc_rows, t.K, t.J)),
    lambda aux, ch: BlockGatherTables(
        nsrc=aux[0], nout=aux[1], nsrc_rows=aux[2],
        blk=ch[0], codes=ch[1], K=aux[3], J=aux[4]),
)


def _row_union_blocks(rblk_planes: np.ndarray, pad_row: int):
    """rblk_planes (J, B, 128) → per-row sorted unions (B, K) + sel tables.

    Entries equal to ``pad_row`` (the zero row) are allowed and participate
    like any other block (they always resolve to zeros).
    """
    J, B, _ = rblk_planes.shape
    allb = rblk_planes.transpose(1, 0, 2).reshape(B, J * 128)
    srt = np.sort(allb, axis=1)
    isnew = np.concatenate(
        [np.ones((B, 1), bool), srt[:, 1:] != srt[:, :-1]], axis=1
    )
    counts = isnew.sum(axis=1)
    K = int(counts.max())
    blk = np.full((B, K), pad_row, dtype=np.int64)
    rowidx, colpos = np.nonzero(isnew)
    slot = (np.cumsum(isnew, axis=1) - 1)[rowidx, colpos]
    blk[rowidx, slot] = srt[rowidx, colpos]
    # per-row searchsorted via row-offset trick (blk rows are sorted and
    # padded with pad_row = the largest row id)
    big = np.int64(pad_row + 2)
    offs = np.arange(B, dtype=np.int64)[:, None] * big
    keys = (blk + offs).ravel()
    sels = np.empty((J, B, 128), dtype=np.int32)
    for j in range(J):
        q = (rblk_planes[j] + offs).ravel()
        sels[j] = (np.searchsorted(keys, q).reshape(B, 128)
                   - np.arange(B, dtype=np.int64)[:, None] * K)
    return blk, sels, K


def build_tables(g, nsrc: int) -> BlockGatherTables:
    """Host-side tables for ``out[i] = Σ_j src[g_j[i]]``.

    ``g``: one flat index array (plain gather) or a list of J arrays of the
    same length (multi-plane scatter-sum).  ``g == nsrc`` reads a zero.
    """
    if isinstance(g, (list, tuple)):
        planes = [np.asarray(a, dtype=np.int64).reshape(-1) for a in g]
    else:
        planes = [np.asarray(g, dtype=np.int64).reshape(-1)]
    J = len(planes)
    nout = planes[0].size
    B = (nout + 127) // 128
    nsrc_rows = (nsrc + 127) // 128 + 1          # + trailing zero row
    zero_pos = (nsrc_rows - 1) * 128
    rblk = np.empty((J, B, 128), dtype=np.int64)
    lane = np.empty((J, B, 128), dtype=np.int64)
    for j, gj in enumerate(planes):
        gp = np.full(B * 128, zero_pos, dtype=np.int64)
        gp[:nout] = np.where(gj < nsrc, gj, zero_pos)
        rows = gp.reshape(B, 128)
        rblk[j] = rows // 128
        lane[j] = rows % 128

    blk, sels, K = _row_union_blocks(rblk, nsrc_rows - 1)
    codes = (sels << 7) | lane.astype(np.int32)
    # sel<<7|lane < 128·(K+1): int16 halves index traffic whenever K < 255
    ctype = np.int16 if 128 * (K + 1) < 2 ** 15 else np.int32
    return BlockGatherTables(
        nsrc=nsrc, nout=nout, nsrc_rows=nsrc_rows,
        blk=jnp.asarray(blk.T.copy().astype(np.int32)),   # (K, B)
        codes=jnp.asarray(codes.astype(ctype)), K=K, J=J,
    )


# ----------------------------------------------------------------------
# device apply
# ----------------------------------------------------------------------

def _kernel(*refs, K, J):
    # refs = K weight planes (RB,128) f32, J code planes (RB,128) int, out
    w_refs = refs[:K]
    c_refs = refs[K:K + J]
    out_ref = refs[K + J]
    acc = None
    for j in range(J):
        code = c_refs[j][...].astype(jnp.int32)
        lane = jnp.bitwise_and(code, 127)
        sel = jnp.right_shift(code, 7)
        pj = jnp.take_along_axis(w_refs[0][...], lane, axis=1)
        for k in range(1, K):
            gk = jnp.take_along_axis(w_refs[k][...], lane, axis=1)
            pj = jnp.where(sel == k, gk, pj)
        acc = pj if acc is None else acc + pj
    out_ref[...] = acc


def _pad_src(src: jnp.ndarray, nsrc_rows: int) -> jnp.ndarray:
    pad = nsrc_rows * 128 - src.shape[0]
    return jnp.concatenate([src, jnp.zeros(pad, src.dtype)]).reshape(
        nsrc_rows, 128
    )


@functools.partial(jax.jit, static_argnames=("nsrc_rows", "K", "J", "nout",
                                             "interpret", "row_block"))
def _apply(src, blk, codes, *, nsrc_rows, K, J, nout, interpret=False,
           row_block=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    src2 = _pad_src(src, nsrc_rows)
    B = codes.shape[1]
    W = src2[blk]                            # (K, B, 128) plane-major
    if row_block is None:
        # keep (W + codes + out) blocks, double-buffered, within ~6 MB VMEM
        csz = codes.dtype.itemsize
        per_row = 2 * 128 * (K * src.dtype.itemsize + J * csz
                             + src.dtype.itemsize)
        # floor of 8 (f32 sublane tile), not 64: K here is ≤ K_MAX=40 so
        # 6 MB is safe, but honour tiny-B tables
        row_block = max(8, min(1024, (6 * 2 ** 20 // per_row) // 8 * 8))
    # RB must be a multiple of 8 (f32 sublane tile): Mosaic's gather
    # lowering rejects unaligned (RB,128) blocks ("Shape mismatch in input,
    # indices and output" at B < 8, e.g. tiny ELL buckets) — pad B up
    RB = min(row_block, ((B + 7) // 8) * 8)
    nblk = (B + RB - 1) // RB
    if B % RB:
        padb = nblk * RB - B
        W = jnp.concatenate(
            [W, jnp.zeros((K, padb, 128), W.dtype)], axis=1)
        codes = jnp.concatenate(
            [codes, jnp.zeros((J, padb, 128), codes.dtype)], axis=1)
    # per-plane 2D inputs: large 3D blocks trip Mosaic stack allocation
    planes = tuple(W[k] for k in range(K)) + tuple(codes[j] for j in range(J))
    spec2d = pl.BlockSpec((RB, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    # trace the kernel with x64 disabled: under jax_enable_x64 the
    # take_along_axis index normalization promotes to int64, which Mosaic
    # cannot lower
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, K=K, J=J),
            grid=(nblk,),
            in_specs=[spec2d] * (K + J),
            out_specs=spec2d,
            out_shape=jax.ShapeDtypeStruct((nblk * RB, 128), src.dtype),
            interpret=interpret,
        )(*planes)
    return out.reshape(-1)[:nout]


def apply(src: jnp.ndarray, t: BlockGatherTables, *, interpret: bool = None,
          row_block: int = None) -> jnp.ndarray:
    """out[i] = Σ_j src[g_j[i]] for the fixed maps captured in ``t``.

    ``interpret=None`` → Pallas interpret mode off TPU (slow but correct —
    lets the fast-restriction paths run under the CPU test harness)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _apply(src, t.blk, t.codes, nsrc_rows=t.nsrc_rows, K=t.K, J=t.J,
                  nout=t.nout, interpret=interpret, row_block=row_block)
