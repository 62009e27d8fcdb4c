"""ELL-format SpMV at block-gather speed — the p1-simplex fast path.

At order 1 on simplex meshes every dof is a vertex dof with multiplicity up
to ~25 (tets), so the matrix-free L→E→Q→E→L pipeline is scatter-bound:
measured 2.7 MDof/s BP1 vs ~70 at p2 (BASELINE.md BP table).  But a p1
operator is also a TINY sparse matrix (nnz/row ≈ 15 — the reference runs
its own LEGACY/FULL CSR path at p1, ``fem/bilinearform.cpp``), and an SpMV
in row-major ELL form

    y[i] = Σ_j vals[i, j] · x[cols[i, j]]          (j < J = max nnz/row)

has NO scatter at all: it is J fixed gathers + a weighted sum.  The gathers
run through the same 128-row-block + in-register lane-gather decomposition
as :mod:`.block_gather` (XLA scalar gathers are ~1500× off roofline; whole
128-lane rows + Mosaic ``take_along_axis`` run at memory speed), with one
extra weight plane per gather plane multiplied in-register.

Reference analog: ``SparseMatrix::Mult`` device path
(``linalg/sparsemat.cpp``) — rebuilt TPU-first as a dense-tiled weighted
gather instead of CSR row loops.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .block_gather import BlockGatherTables, _pad_src, build_tables
from .operators import LinearOperator


@dataclasses.dataclass(frozen=True)
class ELLOperator:
    """Square sparse operator in ELL layout, applied as weighted gathers.

    Registered as a pytree so it can ride as a jit ARGUMENT (closed-over
    device arrays become MLIR constants — hostile at scale)."""

    tables: BlockGatherTables
    wts: jnp.ndarray          # (J, B, 128) weight planes, codes-aligned
    diag: jnp.ndarray         # (n,)

    @property
    def shape(self):
        return (self.tables.nout, self.tables.nsrc)

    @staticmethod
    def from_csr(A, dtype="float32") -> "ELLOperator":
        """Build from a scipy CSR/CSC/COO matrix (host, setup time)."""
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n, m = A.shape
        nnz = np.diff(A.indptr)
        J = int(nnz.max()) if n else 0
        cols = np.full((J, n), m, dtype=np.int64)      # m == "reads zero"
        vals = np.zeros((J, n), dtype=np.float64)
        rows = np.repeat(np.arange(n), nnz)
        slot = np.arange(A.indptr[-1]) - np.repeat(A.indptr[:-1], nnz)
        cols[slot, rows] = A.indices
        vals[slot, rows] = A.data
        t = build_tables(list(cols), m)
        B = t.codes.shape[1]
        wpad = np.zeros((J, B * 128), dtype=np.dtype(dtype))
        wpad[:, :n] = vals
        return ELLOperator(
            tables=t, wts=jnp.asarray(wpad.reshape(J, B, 128)),
            diag=jnp.asarray(A.diagonal().astype(np.dtype(dtype))),
        )

    def mult(self, x: jnp.ndarray) -> jnp.ndarray:
        t = self.tables
        interpret = jax.default_backend() != "tpu"
        return _apply_w(x, t.blk, t.codes, self.wts, nsrc_rows=t.nsrc_rows,
                        K=t.K, J=t.J, nout=t.nout, interpret=interpret)

    def diagonal(self) -> jnp.ndarray:
        return self.diag

    def operator(self) -> LinearOperator:
        return LinearOperator(shape=self.shape, mult=self.mult,
                              diagonal_fn=self.diagonal)


jax.tree_util.register_pytree_node(
    ELLOperator,
    lambda t: ((t.tables, t.wts, t.diag), None),
    lambda aux, ch: ELLOperator(tables=ch[0], wts=ch[1], diag=ch[2]),
)


def _kernel_w(*refs, K, J):
    # refs = K source planes (RB,128), J code planes, J weight planes, out
    w_refs = refs[:K]
    c_refs = refs[K:K + J]
    v_refs = refs[K + J:K + 2 * J]
    out_ref = refs[-1]
    acc = None
    for j in range(J):
        code = c_refs[j][...].astype(jnp.int32)
        lane = jnp.bitwise_and(code, 127)
        sel = jnp.right_shift(code, 7)
        pj = jnp.take_along_axis(w_refs[0][...], lane, axis=1)
        for k in range(1, K):
            gk = jnp.take_along_axis(w_refs[k][...], lane, axis=1)
            pj = jnp.where(sel == k, gk, pj)
        pj = pj * v_refs[j][...]
        acc = pj if acc is None else acc + pj
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("nsrc_rows", "K", "J", "nout",
                                             "interpret", "row_block"))
def _apply_w(src, blk, codes, wts, *, nsrc_rows, K, J, nout,
             interpret=False, row_block=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    src2 = _pad_src(src, nsrc_rows)
    B = codes.shape[1]
    W = src2[blk]                            # (K, B, 128) plane-major
    if row_block is None:
        csz = codes.dtype.itemsize
        per_row = 2 * 128 * (K * src.dtype.itemsize + J * csz
                             + J * wts.dtype.itemsize + src.dtype.itemsize)
        # floor of 8 (f32 sublane tile), not 64: high-K calls (heavy-row
        # ELL buckets, K ~ 100+) blow the 16 MB scoped-VMEM stack at RB=64
        row_block = max(8, min(1024, (2 * 2 ** 20 // per_row) // 8 * 8))
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
        wts = jnp.concatenate(
            [wts, jnp.zeros((J, padb, 128), wts.dtype)], axis=1)
    planes = (tuple(W[k] for k in range(K))
              + tuple(codes[j] for j in range(J))
              + tuple(wts[j].astype(src.dtype) for j in range(J)))
    spec2d = pl.BlockSpec((RB, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel_w, K=K, J=J),
            grid=(nblk,),
            in_specs=[spec2d] * (K + 2 * J),
            out_specs=spec2d,
            out_shape=jax.ShapeDtypeStruct((nblk * RB, 128), src.dtype),
            interpret=interpret,
        )(*planes)
    return out.reshape(-1)[:nout]


# ----------------------------------------------------------------------
# bucketed multi-ELL: variable row widths without global-J padding
# ----------------------------------------------------------------------

def _build_buckets(indptr, indices, datas, n, dtype, chunk_j, bucket_edges):
    """Shared bucket builder: one sparsity pattern, ``len(datas)`` aligned
    value sets.  Returns (buckets, sizes, t_un) where each bucket is a tuple
    of (tables, [wts_per_data]) chunks and t_un unpermutes the concatenated
    bucket outputs to natural row order."""
    nnz = np.diff(indptr)
    edges = ([e for e in bucket_edges if e < int(nnz.max())]
             + [int(nnz.max())]) if n else []
    bidx = np.searchsorted(np.asarray(edges), nnz, side="left")
    perm = np.argsort(bidx, kind="stable")       # keeps first-touch order
    rank = np.empty(n, dtype=np.int64)
    rank[perm] = np.arange(n)

    buckets, sizes = [], []
    for b, edge in enumerate(edges):
        rows = perm[bidx[perm] == b]
        nb = len(rows)
        if nb == 0:
            continue
        J = int(edge)
        cols = np.full((J, nb), n, dtype=np.int64)   # n == "reads zero"
        valss = [np.zeros((J, nb), dtype=np.float64) for _ in datas]
        nnzr = nnz[rows]
        cum0 = np.concatenate([[0], np.cumsum(nnzr[:-1])])
        tot = int(nnzr.sum())
        rep = np.repeat(np.arange(nb), nnzr)
        slot = np.arange(tot) - np.repeat(cum0, nnzr)
        pos = np.repeat(indptr[rows], nnzr) + slot
        cols[slot, rep] = indices[pos]               # NATURAL columns
        for vals, data in zip(valss, datas):
            vals[slot, rep] = data[pos]
        chunks = []
        for j0 in range(0, J, chunk_j):
            cj = cols[j0:j0 + chunk_j]
            t = build_tables(list(cj), n)
            B = t.codes.shape[1]
            ws = []
            for vals in valss:
                wpad = np.zeros((len(cj), B * 128), dtype=np.dtype(dtype))
                wpad[:, :nb] = vals[j0:j0 + chunk_j]
                ws.append(jnp.asarray(wpad.reshape(len(cj), B, 128)))
            chunks.append((t, ws))
        buckets.append(tuple(chunks))
        sizes.append(nb)
    # natural[i] = concat(bucket outputs)[rank[i]]
    t_un = build_tables(rank, n)
    return tuple(buckets), tuple(sizes), t_un


@dataclasses.dataclass(frozen=True)
class MultiELLOperator:
    """Sparse operator as nnz-bucketed ELL slabs, NATURAL dof space.

    Higher-order simplex matrices have wildly variable row widths (o2 tets:
    mean 28, max 115 nnz/row) — one global-J ELL pads 4× and the J·K-unrolled
    kernel blows VMEM.  Here ROWS are grouped into same-width buckets (each a
    stack of ≤``chunk_j``-plane weighted-gather calls over its own output
    slice) while COLUMNS and the input vector stay in the NATURAL first-touch
    numbering — renumbering columns was measured to fragment source locality
    (per-row source-block unions K≈112 → Mosaic VMEM-stack OOM).  One final
    block-gather unpermutes the concatenated bucket outputs back to natural
    row order (2 extra n-sized streams per apply — noise next to the nnz
    traffic), so callers see a plain natural-space operator.
    """

    buckets: tuple            # of (tables, wts) chunk tuples per bucket
    sizes: tuple              # rows per bucket (sum = n)
    t_un: object              # block-gather table: permuted y -> natural y
    diag: jnp.ndarray         # (n,) natural

    @property
    def shape(self):
        n = int(sum(self.sizes))
        return (n, n)

    @staticmethod
    def from_csr(A, dtype="float32", chunk_j: int = 8,
                 bucket_edges=(8, 16, 24, 32, 48, 64, 96, 128, 192, 256),
                 ) -> "MultiELLOperator":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        buckets, sizes, t_un = _build_buckets(
            A.indptr, A.indices, [A.data], A.shape[0], dtype, chunk_j,
            bucket_edges)
        buckets = tuple(tuple((t, ws[0]) for t, ws in ch)
                        for ch in buckets)
        diag = jnp.asarray(A.diagonal().astype(np.dtype(dtype)))
        return MultiELLOperator(buckets=buckets, sizes=sizes,
                                t_un=t_un, diag=diag)

    def mult(self, x: jnp.ndarray) -> jnp.ndarray:
        from . import block_gather as bg

        interpret = jax.default_backend() != "tpu"
        outs = []
        for chunks in self.buckets:
            acc = None
            for t, wts in chunks:
                y = _apply_w(x, t.blk, t.codes, wts, nsrc_rows=t.nsrc_rows,
                             K=t.K, J=t.J, nout=t.nout, interpret=interpret)
                acc = y if acc is None else acc + y
            outs.append(acc)
        return bg.apply(jnp.concatenate(outs), self.t_un,
                        interpret=interpret)

    def diagonal(self) -> jnp.ndarray:
        return self.diag

    def operator(self) -> LinearOperator:
        return LinearOperator(shape=self.shape, mult=self.mult,
                              diagonal_fn=self.diagonal)


jax.tree_util.register_pytree_node(
    MultiELLOperator,
    lambda t: ((t.buckets, t.t_un, t.diag), (t.sizes,)),
    lambda aux, ch: MultiELLOperator(
        buckets=ch[0], t_un=ch[1], diag=ch[2], sizes=aux[0]),
)


@dataclasses.dataclass(frozen=True)
class MultiELLPair:
    """TWO matrices on one shared sparsity pattern, applied as
    ``y = (c0·W0 + c1·W1) x`` with the weight combination traced per SOLVE
    (one nnz-sized elementwise pass), not per iteration.

    The bioheat implicit stage operator (M_ρc + γ(K + M_ω)) is exactly this
    shape: M and A share the FE connectivity pattern, γ changes per solve.
    Reference analog: ``SparseMatrix::Add`` + ``Mult`` (linalg/sparsemat.cpp)
    without ever materializing the combined CSR.
    """

    buckets: tuple            # of (tables, (w0, w1)) chunk tuples per bucket
    sizes: tuple
    t_un: object
    diag0: jnp.ndarray        # (n,) natural diagonals of each matrix
    diag1: jnp.ndarray

    @property
    def shape(self):
        n = int(sum(self.sizes))
        return (n, n)

    @staticmethod
    def from_csr_pair(M0, M1, dtype="float32", chunk_j: int = 8,
                      bucket_edges=(8, 16, 24, 32, 48, 64, 96, 128, 192,
                                    256)) -> "MultiELLPair":
        import scipy.sparse as sp

        M0 = sp.csr_matrix(M0)
        M1 = sp.csr_matrix(M1)
        n = M0.shape[0]
        # union pattern with explicit zeros so both data arrays align
        P = (abs(M0) + abs(M1)).tocsr()
        P.sort_indices()

        def aligned(X):
            out = np.zeros(P.nnz, dtype=np.float64)
            X = X.tocsr()
            X.sort_indices()
            # vectorized alignment: for each entry of X find its slot in P
            reps = np.diff(X.indptr)
            rows = np.repeat(np.arange(n), reps)
            # P rows are sorted: searchsorted within each row via offsets
            big = np.int64(P.shape[1] + 1)
            pkeys = np.repeat(np.arange(n), np.diff(P.indptr)) * big \
                + P.indices
            xkeys = rows * big + X.indices
            slots = np.searchsorted(pkeys, xkeys)
            out[slots] = X.data
            return out

        d0, d1 = aligned(M0), aligned(M1)
        buckets, sizes, t_un = _build_buckets(
            P.indptr, P.indices, [d0, d1], n, dtype, chunk_j, bucket_edges)
        buckets = tuple(tuple((t, (ws[0], ws[1])) for t, ws in ch)
                        for ch in buckets)
        return MultiELLPair(
            buckets=buckets, sizes=sizes, t_un=t_un,
            diag0=jnp.asarray(M0.diagonal().astype(np.dtype(dtype))),
            diag1=jnp.asarray(M1.diagonal().astype(np.dtype(dtype))),
        )

    def mult_combined(self, x: jnp.ndarray, c0, c1) -> jnp.ndarray:
        """(c0·M0 + c1·M1) x — weights combined at trace time."""
        from . import block_gather as bg

        interpret = jax.default_backend() != "tpu"
        outs = []
        for chunks in self.buckets:
            acc = None
            for t, (w0, w1) in chunks:
                wc = c0 * w0 + c1 * w1
                y = _apply_w(x, t.blk, t.codes, wc, nsrc_rows=t.nsrc_rows,
                             K=t.K, J=t.J, nout=t.nout, interpret=interpret)
                acc = y if acc is None else acc + y
            outs.append(acc)
        return bg.apply(jnp.concatenate(outs), self.t_un,
                        interpret=interpret)

    def mult0(self, x):
        return self.mult_combined(x, 1.0, 0.0)

    def mult1(self, x):
        return self.mult_combined(x, 0.0, 1.0)


jax.tree_util.register_pytree_node(
    MultiELLPair,
    lambda t: ((t.buckets, t.t_un, t.diag0, t.diag1), (t.sizes,)),
    lambda aux, ch: MultiELLPair(
        buckets=ch[0], t_un=ch[1], diag0=ch[2], diag1=ch[3],
        sizes=aux[0]),
)
