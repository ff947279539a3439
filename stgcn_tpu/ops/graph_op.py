"""On-device graph-shift-operator application.

The reference applies its dense GSO with ``torch.einsum('hi,btij->bthj', ...)``
(``model/layers.py:154-161,198``). Here the GSO is a typed on-device operator
with interchangeable representations:

- :class:`DenseGraphOp` — a dense ``[V, V]`` matmul on the MXU; optimal for
  road-scale graphs (the shipped graphs are 207–325 vertices at 37–52%
  density, where dense *is* the fastest sparse format on a systolic array).
- :class:`BcsrGraphOp` — 128×128 block-compressed-sparse-row tiles driven by
  a Pallas SpMM kernel with scalar-prefetched block indices; for graphs far
  past the dense-viable size (100k–1M+ vertices).

Both are registered pytrees, so they flow through ``jit`` / ``grad`` /
``shard_map`` like any array.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from stgcn_tpu.graph.gso import GraphShiftOperator


def _fold_to_vn(x: jax.Array) -> tuple[jax.Array, tuple[int, ...]]:
    """[..., V, C] -> [V, prod(...)*C] with V leading, plus restore info."""
    *lead, v, c = x.shape
    perm = list(range(x.ndim))
    perm = [x.ndim - 2] + perm[: x.ndim - 2] + [x.ndim - 1]
    x_vn = jnp.transpose(x, perm).reshape(v, -1)
    return x_vn, tuple(lead) + (c,)


def _unfold_from_vn(y: jax.Array, lead_c: tuple[int, ...]) -> jax.Array:
    *lead, c = lead_c
    v = y.shape[0]
    y = y.reshape((v, *lead, c))
    perm = list(range(1, y.ndim - 1)) + [0, y.ndim - 1]
    return jnp.transpose(y, perm)


class DenseGraphOp(struct.PyTreeNode):
    """Dense GSO: ``y[..., u, c] = sum_v A[u, v] x[..., v, c]``.

    Also exposes the nv ``[N, V]`` surface (``apply_nv``/``cheb_pair_nv``
    — one ``[N, V] @ [V, V]ᵀ`` MXU matmul each) so the vertex-fused path
    (:func:`stgcn_tpu.nn.fused_sparse.fused_sparse_forward`) can pair its
    channel-before-vertex ST-block stages with a dense aggregation at
    road-graph sizes, where dense is the fastest format (module
    docstring)."""

    matrix: jax.Array  # [V, V]

    @property
    def n_vertex(self) -> int:
        return self.matrix.shape[0]

    @property
    def v_pad(self) -> int:
        """128-aligned vertex count for the nv surface (zero-padded)."""
        return -(-self.n_vertex // 128) * 128

    @property
    def has_nv(self) -> bool:
        return True

    def _mat_pad(self, scale: float | jax.Array) -> jax.Array:
        unit = isinstance(scale, float) and scale == 1.0
        mat = self.matrix if unit else self.matrix * scale
        p = self.v_pad - self.n_vertex
        return jnp.pad(mat, ((0, p), (0, p))) if p else mat

    def apply_nv(self, x_nv: jax.Array, *,
                 scale: float | jax.Array = 1.0) -> jax.Array:
        """``[N, W] → [N, W]`` for any ``W >= n_vertex``; vertex lanes past
        ``n_vertex`` are zero in/out (a caller whose kernel tile pad
        exceeds :attr:`v_pad` gets its width back unchanged, mirroring
        ``BandedGraphOp.apply_nv``)."""
        w = x_nv.shape[1]
        if w < self.n_vertex:
            raise ValueError(f"nv operand has {w} vertex lanes < n_vertex "
                             f"{self.n_vertex}")
        mat = self._mat_pad(scale).astype(x_nv.dtype)
        if w != self.v_pad:  # kernel tile pad != op pad: match the operand
            mat = jnp.pad(mat, ((0, w - self.v_pad),) * 2) \
                if w > self.v_pad else mat[:w, :w]
        return jax.lax.dot_general(x_nv, mat, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(x_nv.dtype)

    def cheb_pair_nv(self, x_nv: jax.Array) -> tuple[jax.Array, jax.Array]:
        """``(G·x, 2G(G·x) − x)`` on the nv operand (`model/layers.py:158-161`)."""
        t1 = self.apply_nv(x_nv)
        t2 = (2.0 * self.apply_nv(t1).astype(jnp.float32)
              - x_nv.astype(jnp.float32)).astype(x_nv.dtype)
        return t1, t2

    # ------------------------------------------------ cv (last-axis) surface
    # Same math as apply_nv on the UN-reshaped [..., V] cv tensor: the
    # [N, V] reshape around the nv dot is a logical view, but XLA may
    # assign the dot operand a different physical layout and materialize
    # a full copy each way (measured ~0.6 ms per crossing at PEMS-BAY
    # B=512). A rank-preserving dot_general needs no reshape at all.

    def apply_cv(self, x_cv: jax.Array, *,
                 scale: float | jax.Array = 1.0) -> jax.Array:
        """``[..., W] → [..., W]`` contraction over the last (vertex)
        axis, ``W >= n_vertex``; lanes past ``n_vertex`` zero in/out."""
        w = x_cv.shape[-1]
        if w < self.n_vertex:
            raise ValueError(f"cv operand has {w} vertex lanes < n_vertex "
                             f"{self.n_vertex}")
        mat = self._mat_pad(scale).astype(x_cv.dtype)
        if w != self.v_pad:
            mat = jnp.pad(mat, ((0, w - self.v_pad),) * 2) \
                if w > self.v_pad else mat[:w, :w]
        nd = x_cv.ndim
        return jax.lax.dot_general(x_cv, mat, (((nd - 1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(x_cv.dtype)

    def cheb_pair_cv(self, x_cv: jax.Array) -> tuple[jax.Array, jax.Array]:
        """``(G·x, 2G(G·x) − x)`` on the last-axis (cv) operand."""
        t1 = self.apply_cv(x_cv)
        t2 = (2.0 * self.apply_cv(t1).astype(jnp.float32)
              - x_cv.astype(jnp.float32)).astype(x_cv.dtype)
        return t1, t2

    def __call__(self, x: jax.Array, *, scale: float | jax.Array = 1.0) -> jax.Array:
        mat = self.matrix if isinstance(scale, float) and scale == 1.0 else self.matrix * scale
        return jnp.einsum("uv,...vc->...uc", mat, x)


class BcsrGraphOp(struct.PyTreeNode):
    """128×128 blocked-CSR GSO applied via Pallas SpMM.

    ``block_data``   — ``[n_block_rows, max_b, bs, bs]`` dense tiles.
    ``block_cols``   — ``[n_block_rows, max_b]`` block-column indices
                       (padding slots point at 0 with zero data).
    ``block_counts`` — ``[n_block_rows]`` live tiles per row.
    """

    block_data: jax.Array
    block_cols: jax.Array
    block_counts: jax.Array
    block_data_t: jax.Array
    block_cols_t: jax.Array
    block_counts_t: jax.Array
    n_vertex: int = struct.field(pytree_node=False)
    block_size: int = struct.field(pytree_node=False)
    use_pallas: bool = struct.field(pytree_node=False, default=True)

    @property
    def n_vertex_pad(self) -> int:
        return self.block_cols.shape[0] * self.block_size

    def apply_vn(self, x_vn: jax.Array, *,
                 scale: float | jax.Array = 1.0) -> jax.Array:
        """Apply to an already-folded ``[V, N]`` operand (V rows ≤ pad)."""
        from stgcn_tpu.kernels import spmm as spmm_mod

        v = x_vn.shape[0]
        pad = self.n_vertex_pad - v
        if pad:
            x_vn = jnp.pad(x_vn, ((0, pad), (0, 0)))
        unit = isinstance(scale, float) and scale == 1.0
        data = self.block_data if unit else self.block_data * scale
        data_t = self.block_data_t if unit else self.block_data_t * scale
        y = spmm_mod.bcsr_spmm_vjp(data, self.block_cols, self.block_counts,
                                   data_t, self.block_cols_t, self.block_counts_t,
                                   x_vn, self.block_size, self.use_pallas)
        if pad:
            y = y[:v]
        return y

    def __call__(self, x: jax.Array, *, scale: float | jax.Array = 1.0) -> jax.Array:
        x_vn, lead_c = _fold_to_vn(x)
        return _unfold_from_vn(self.apply_vn(x_vn, scale=scale), lead_c)


class BandedGraphOp(struct.PyTreeNode):
    """Banded-slab GSO for RCM-ordered road graphs: one dense ``[bs, W]``
    slab per 128-row block over its column window; applied by the banded
    Pallas kernel (one coalesced x-window DMA + one MXU matmul per block).
    Fastest representation when the post-RCM band is narrow (see
    :mod:`stgcn_tpu.kernels.banded_spmm`)."""

    slabs: jax.Array    # [nbr, bs, W] (f32/bf16, or int8 with scales)
    lo: jax.Array       # [nbr] int32, 128-aligned window starts
    slabs_t: jax.Array  # transpose pack (backward's Aᵀ)
    lo_t: jax.Array
    n_vertex: int = struct.field(pytree_node=False)
    v_pad: int = struct.field(pytree_node=False)
    use_pallas: bool = struct.field(pytree_node=False, default=True)
    # pack-time wavefront-safety verdict for the fused cheb-pair kernel
    # (`lo` is a tracer inside jit, so the check can't happen there)
    pair_safe: bool = struct.field(pytree_node=False, default=True)
    # pack-time verdict for the STREAMING pair kernel (block-aligned,
    # diagonal-containing windows — the int8 / beyond-resident-scale path)
    pair_stream: bool = struct.field(pytree_node=False, default=False)
    scales: jax.Array | None = None    # [nbr, bs] per-row dequant (int8)
    scales_t: jax.Array | None = None
    # pre-transposed packs [nbr, w, bs] for the nv-layout kernels
    # (kernels/banded_nv.py) — the fused sparse path's zero-transpose
    # aggregation; None unless banded_graph_op(nv=True)
    slabs_nv: jax.Array | None = None
    slabs_nv_t: jax.Array | None = None

    def apply_vn(self, x_vn: jax.Array, *,
                 scale: float | jax.Array = 1.0) -> jax.Array:
        """Apply to an already-folded ``[V, N]`` operand (V rows ≤ pad)."""
        from stgcn_tpu.kernels import banded_spmm as bk

        if self.slabs.shape[0] == 0 and self.has_nv:
            # nv_only pack (the vn slab family was dropped to fit HBM):
            # route through the nv kernels, paying the two transposes
            v = x_vn.shape[0]
            y = self.apply_nv(x_vn.T, scale=scale).T
            return y[:v]
        unit = isinstance(scale, float) and scale == 1.0
        if self.scales is not None:
            # int8 pack: fold the scalar into the dequant scales, never
            # into the quantized values
            slabs, slabs_t = self.slabs, self.slabs_t
            scl = self.scales if unit else self.scales * scale
            scl_t = self.scales_t if unit else self.scales_t * scale
        else:
            slabs = self.slabs if unit else self.slabs * scale
            slabs_t = self.slabs_t if unit else self.slabs_t * scale
            scl = scl_t = None
        v = x_vn.shape[0]
        pad = self.v_pad - v
        if pad:
            x_vn = jnp.pad(x_vn, ((0, pad), (0, 0)))
        y = bk.banded_spmm_vjp(slabs, self.lo, slabs_t, self.lo_t, x_vn,
                               scl, scl_t, 128, self.use_pallas)
        return y[:v]

    def __call__(self, x: jax.Array, *, scale: float | jax.Array = 1.0) -> jax.Array:
        x_vn, lead_c = _fold_to_vn(x)
        return _unfold_from_vn(self.apply_vn(x_vn, scale=scale), lead_c)

    def cheb_pair_vn(self, x_vn: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Folded-operand form of :meth:`cheb_pair` (``[V, N]`` in/out)."""
        from stgcn_tpu.kernels import banded_spmm as bk

        if self.slabs.shape[0] == 0 and self.has_nv:
            t1, t2 = self.cheb_pair_nv(x_vn.T)
            v = x_vn.shape[0]
            return t1.T[:v], t2.T[:v]
        v = x_vn.shape[0]
        # stream-safe packs always take the streaming pair: with the x
        # block ring it pays slabs + x + outputs — the bytes of ONE
        # resident application — for both recurrence applications, at any
        # width (no residency requirement)
        use_stream = self.pair_stream
        if not use_stream and (self.scales is not None or not self.pair_safe):
            # quantized pack without a stream-compatible layout, or a band
            # violating the wavefront schedule: two single applications
            # (apply_vn pads internally — no upfront pad here)
            t1 = self.apply_vn(x_vn)
            return t1, self.apply_vn(t1, scale=2.0) - x_vn
        pad = self.v_pad - v
        if pad:
            x_vn = jnp.pad(x_vn, ((0, pad), (0, 0)))
        if use_stream:
            # streaming pair: one slab pass, no x residency — the int8 /
            # beyond-resident-scale path (pack has block-aligned
            # diagonal-containing windows)
            t1, t2 = bk.banded_cheb_pair_stream_vjp(
                self.slabs, self.lo, self.slabs_t, self.lo_t, x_vn,
                self.scales, self.scales_t, self.use_pallas)
        else:
            t1, t2 = bk.banded_cheb_pair_vjp(self.slabs, self.lo,
                                             self.slabs_t, self.lo_t, x_vn,
                                             self.use_pallas)
        return t1[:v], t2[:v]

    def cheb_pair(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Fused ``(G x, 2 G (G x) − x)`` — the ks=3 Chebyshev recurrence
        with the operator streamed from HBM once (see
        :func:`stgcn_tpu.kernels.banded_spmm.banded_cheb_pair`)."""
        x_vn, lead_c = _fold_to_vn(x)
        t1, t2 = self.cheb_pair_vn(x_vn)
        return _unfold_from_vn(t1, lead_c), _unfold_from_vn(t2, lead_c)

    # ----------------------------------------------------- nv layout
    @property
    def has_nv(self) -> bool:
        return self.slabs_nv is not None

    def apply_nv(self, x_nv: jax.Array, *,
                 scale: float | jax.Array = 1.0) -> jax.Array:
        """Apply to an ``[N, V]`` operand (the cv-layout reshape view —
        no transpose; see :mod:`stgcn_tpu.kernels.banded_nv`)."""
        from stgcn_tpu.kernels import banded_nv as nvk

        unit = isinstance(scale, float) and scale == 1.0
        if self.scales is not None:
            scl = self.scales if unit else self.scales * scale
            scl_t = self.scales_t if unit else self.scales_t * scale
            slabs, slabs_t = self.slabs_nv, self.slabs_nv_t
        else:
            slabs = self.slabs_nv if unit else self.slabs_nv * scale
            slabs_t = self.slabs_nv_t if unit else self.slabs_nv_t * scale
            scl = scl_t = None
        pad = self.v_pad - x_nv.shape[1]
        if pad > 0:
            x_nv = jnp.pad(x_nv, ((0, 0), (0, pad)))
        y = nvk.banded_spmm_nv(slabs, self.lo, slabs_t, self.lo_t,
                               x_nv[:, :self.v_pad], scl, scl_t)
        return y

    def cheb_pair_nv(self, x_nv: jax.Array) -> tuple[jax.Array, jax.Array]:
        """ks=3 recurrence on an ``[N, V]`` operand, one slab + one x
        stream for both applications."""
        from stgcn_tpu.kernels import banded_nv as nvk

        pad = self.v_pad - x_nv.shape[1]
        if pad > 0:
            x_nv = jnp.pad(x_nv, ((0, 0), (0, pad)))
        return nvk.cheb_pair_nv(self.slabs_nv, self.lo, self.slabs_nv_t,
                                self.lo_t, x_nv[:, :self.v_pad],
                                self.scales, self.scales_t)


class EllGraphOp(struct.PyTreeNode):
    """Blocked-ELL GSO in nv orientation — the **O(nnz)** representation
    that fits 1M-vertex single-chip training (VERDICT r4 next #2; see
    :mod:`stgcn_tpu.kernels.ell_nv` for why every contiguous-window
    format scales ``V^1.5`` on road graphs). Tiles are stored
    pre-transposed for the ``[N, V]`` kernels; the vn/generic surfaces
    route through nv with explicit transposes (correctness paths — the
    fused production path is nv-native)."""

    data: jax.Array     # [nbr, max_b, bs, bs] pre-transposed tiles
    cols: jax.Array     # [nbr, max_b] int32
    counts: jax.Array   # [nbr] int32
    data_t: jax.Array   # transpose pack (same arrays when symmetric)
    cols_t: jax.Array
    counts_t: jax.Array
    scales: jax.Array | None    # [nbr, bs] int8 dequant (per A row)
    scales_t: jax.Array | None
    n_vertex: int = struct.field(pytree_node=False)
    block_size: int = struct.field(pytree_node=False)
    use_pallas: bool = struct.field(pytree_node=False, default=True)

    @property
    def v_pad(self) -> int:
        return self.cols.shape[0] * self.block_size

    @property
    def has_nv(self) -> bool:
        return True

    def _scaled(self, scale):
        """Fold a scalar into the pack: into the dequant scales for int8
        (never the quantized values), into the tiles otherwise."""
        unit = isinstance(scale, float) and scale == 1.0
        if self.scales is not None:
            scl = self.scales if unit else self.scales * scale
            scl_t = self.scales_t if unit else self.scales_t * scale
            return self.data, self.data_t, scl, scl_t
        data = self.data if unit else self.data * scale
        data_t = self.data_t if unit else self.data_t * scale
        return data, data_t, None, None

    def apply_nv(self, x_nv: jax.Array, *,
                 scale: float | jax.Array = 1.0) -> jax.Array:
        from stgcn_tpu.kernels import ell_nv as ek

        data, data_t, scl, scl_t = self._scaled(scale)
        pad = self.v_pad - x_nv.shape[1]
        if pad > 0:
            x_nv = jnp.pad(x_nv, ((0, 0), (0, pad)))
        return ek.ell_spmm_nv_vjp(data, self.cols, self.counts,
                                  data_t, self.cols_t, self.counts_t,
                                  x_nv, scl, scl_t, self.use_pallas)

    def cheb_pair_nv(self, x_nv: jax.Array) -> tuple[jax.Array, jax.Array]:
        from stgcn_tpu.kernels import ell_nv as ek

        pad = self.v_pad - x_nv.shape[1]
        if pad > 0:
            x_nv = jnp.pad(x_nv, ((0, 0), (0, pad)))
        return ek.ell_cheb_pair_nv(self.data, self.cols, self.counts,
                                   self.data_t, self.cols_t, self.counts_t,
                                   x_nv, self.scales, self.scales_t,
                                   self.use_pallas)

    def apply_vn(self, x_vn: jax.Array, *,
                 scale: float | jax.Array = 1.0) -> jax.Array:
        v = x_vn.shape[0]
        return self.apply_nv(x_vn.T, scale=scale).T[:v]

    def cheb_pair_vn(self, x_vn: jax.Array) -> tuple[jax.Array, jax.Array]:
        v = x_vn.shape[0]
        t1, t2 = self.cheb_pair_nv(x_vn.T)
        return t1.T[:v], t2.T[:v]

    def __call__(self, x: jax.Array, *, scale: float | jax.Array = 1.0) -> jax.Array:
        x_vn, lead_c = _fold_to_vn(x)
        return _unfold_from_vn(self.apply_vn(x_vn, scale=scale), lead_c)

    def cheb_pair(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        x_vn, lead_c = _fold_to_vn(x)
        t1, t2 = self.cheb_pair_vn(x_vn)
        return _unfold_from_vn(t1, lead_c), _unfold_from_vn(t2, lead_c)


GraphOp = Any  # structural: anything with .n_vertex and __call__(x, scale=...)


def dense_graph_op(gso: GraphShiftOperator | np.ndarray, dtype=jnp.float32) -> DenseGraphOp:
    mat = gso.to_dense() if isinstance(gso, GraphShiftOperator) else np.asarray(gso)
    return DenseGraphOp(matrix=jnp.asarray(mat, dtype=dtype))


def bcsr_graph_op(gso: GraphShiftOperator, *, block_size: int = 256,
                  dtype=jnp.float32, use_pallas: bool = True) -> BcsrGraphOp:
    # 256x256 tiles measured 1.35x faster than 128x128 on v5e (one dot's
    # M=256 spans two MXU pipes; fewer, bigger tile DMAs): 0.82 vs 1.10 ms
    # on the 100k RCM road graph at n=128 (67% vs 46% of HBM roofline)
    from stgcn_tpu.graph.packing import pack_bcsr

    import scipy.sparse as sp

    data, cols, counts = pack_bcsr(gso.matrix, block_size=block_size)
    data_t, cols_t, counts_t = pack_bcsr(sp.csr_matrix(gso.matrix).T.tocsr(),
                                         block_size=block_size)
    return BcsrGraphOp(block_data=jnp.asarray(data, dtype=dtype),
                       block_cols=jnp.asarray(cols),
                       block_counts=jnp.asarray(counts),
                       block_data_t=jnp.asarray(data_t, dtype=dtype),
                       block_cols_t=jnp.asarray(cols_t),
                       block_counts_t=jnp.asarray(counts_t),
                       n_vertex=gso.n_vertex, block_size=block_size,
                       use_pallas=use_pallas)


def banded_graph_op(gso: GraphShiftOperator, *, dtype=jnp.float32,
                    use_pallas: bool = True, quantize: bool = False,
                    block_size: int | None = None,
                    stream: bool = True, nv: bool = False,
                    nv_only: bool = False) -> BandedGraphOp:
    # measured on v5e (100k RCM road graph): 256-row slabs fastest at
    # eval widths (n=128, resident-x); 512-row slabs ~1.13x faster at
    # training widths (n~1280, streaming: wider slabs cut the window
    # refetch factor w/bs). Callers that know their width can pass
    # block_size; the default optimizes the resident/eval case.
    from stgcn_tpu.kernels.banded_spmm import cheb_pair_wavefront_safe

    bs = block_size or 256
    if stream or quantize:
        # Block-aligned diagonal-containing windows (col_align = bs) so
        # the STREAMING cheb-pair / chain kernels can run both recurrence
        # applications in one slab pass with each x block fetched once
        # (banded_cheb_pair_stream) — measured faster than two single
        # applications at every width despite the wider slabs. int8 adds
        # per-row output scales (the only representation that fits HBM at
        # 1M+ vertices). Slabs are scattered on device from COO.
        import scipy.sparse as sp

        from stgcn_tpu.kernels.banded_spmm import (_window_meta,
                                                   cheb_pair_stream_safe,
                                                   pack_banded_device)

        from stgcn_tpu.graph.gso import effectively_symmetric

        sdt = jnp.int8 if quantize else dtype
        csr = sp.csr_matrix(gso.matrix)
        csr_t = csr.T.tocsr()
        # symmetric-to-rounding-noise GSOs (every sym_* normalization)
        # reuse one pack for both directions: consumers cast to
        # f32/bf16/int8 where the ~1e-16 asymmetry vanishes
        symmetric = effectively_symmetric(csr)
        # asymmetric matrices can have different natural paddings; pack
        # both with the shared max so x/g buffers match
        _, _, _, vp_f = _window_meta(csr, bs, bs, contain_diag=True)
        v_pad = vp_f
        if not symmetric:
            _, _, _, vp_t = _window_meta(csr_t, bs, bs, contain_diag=True)
            v_pad = max(vp_f, vp_t)
        packed = pack_banded_device(
            csr, block_size=bs, col_align=bs, contain_diag=True,
            dtype=sdt, v_pad=v_pad)
        packed_t = packed if symmetric else pack_banded_device(
            csr_t, block_size=bs, col_align=bs, contain_diag=True,
            dtype=sdt, v_pad=v_pad)
        slabs, lo = packed[0], packed[1]
        slabs_t, lo_t = packed_t[0], packed_t[1]
        scales = packed[3] if quantize else None
        scales_t = packed_t[3] if quantize else None
        slabs_nv = slabs_nv_t = None
        if nv:
            # pre-transposed packs for the zero-transpose nv kernels
            slabs_nv = pack_banded_device(
                csr, block_size=bs, col_align=bs, contain_diag=True,
                dtype=sdt, v_pad=v_pad, transpose_slabs=True)[0]
            slabs_nv_t = slabs_nv if symmetric else pack_banded_device(
                csr_t, block_size=bs, col_align=bs, contain_diag=True,
                dtype=sdt, v_pad=v_pad, transpose_slabs=True)[0]
        w = slabs.shape[-1]
        if nv and nv_only:
            # carry ONLY the nv pack family: at 1M vertices one int8 pack
            # is ~5.4 GB, and the vn twins would double that for kernels
            # the fused nv path never calls (the vn surfaces raise via
            # zero-size slabs). Saves the difference between fitting and
            # OOM on a 16 GB chip (BENCH r4 train_1m).
            empty = jnp.zeros((0,) + tuple(slabs.shape[1:]), slabs.dtype)
            slabs = slabs_t = empty
        return BandedGraphOp(slabs=slabs, lo=jnp.asarray(lo),
                             slabs_t=slabs_t, lo_t=jnp.asarray(lo_t),
                             n_vertex=gso.n_vertex, v_pad=v_pad,
                             use_pallas=use_pallas,
                             pair_safe=cheb_pair_wavefront_safe(lo, bs),
                             pair_stream=(cheb_pair_stream_safe(lo, w, bs)
                                          and cheb_pair_stream_safe(
                                              lo_t, w, bs)),
                             scales=scales, scales_t=scales_t,
                             slabs_nv=slabs_nv, slabs_nv_t=slabs_nv_t)

    from stgcn_tpu.kernels.banded_spmm import pack_banded_with_transpose

    slabs, lo, slabs_t, lo_t, v_pad = pack_banded_with_transpose(
        gso.matrix, block_size=bs)
    return BandedGraphOp(slabs=jnp.asarray(slabs, dtype), lo=jnp.asarray(lo),
                         slabs_t=jnp.asarray(slabs_t, dtype),
                         lo_t=jnp.asarray(lo_t),
                         n_vertex=gso.n_vertex, v_pad=v_pad,
                         use_pallas=use_pallas,
                         pair_safe=cheb_pair_wavefront_safe(lo, bs))


def ell_graph_op(gso: GraphShiftOperator, *, block_size: int = 256,
                 dtype=jnp.float32, quantize: bool = False,
                 use_pallas: bool = True) -> EllGraphOp:
    """O(nnz) blocked-ELL operator (nv orientation). Symmetric GSOs
    (every ``sym_*`` normalization) reuse the forward pack for the
    transpose application — same device arrays, zero extra HBM."""
    import scipy.sparse as sp

    from stgcn_tpu.graph.gso import effectively_symmetric
    from stgcn_tpu.graph.packing import pack_ell_nv

    np_dt = np.float32  # host packs in f32; cast on device transfer
    csr = sp.csr_matrix(gso.matrix)
    data, cols, counts, scales = pack_ell_nv(
        csr, block_size=block_size, quantize=quantize, dtype=np_dt)
    data_j = jnp.asarray(data) if quantize else jnp.asarray(data, dtype)
    cols_j, counts_j = jnp.asarray(cols), jnp.asarray(counts)
    scales_j = None if scales is None else jnp.asarray(scales)
    del data
    if effectively_symmetric(csr):
        data_t, cols_t, counts_t, scales_t = data_j, cols_j, counts_j, scales_j
    else:
        dt_, ct_, cn_, st_ = pack_ell_nv(csr.T.tocsr(), block_size=block_size,
                                         quantize=quantize, dtype=np_dt)
        data_t = jnp.asarray(dt_) if quantize else jnp.asarray(dt_, dtype)
        cols_t, counts_t = jnp.asarray(ct_), jnp.asarray(cn_)
        scales_t = None if st_ is None else jnp.asarray(st_)
    return EllGraphOp(data=data_j, cols=cols_j, counts=counts_j,
                      data_t=data_t, cols_t=cols_t, counts_t=counts_t,
                      scales=scales_j, scales_t=scales_t,
                      n_vertex=gso.n_vertex, block_size=block_size,
                      use_pallas=use_pallas)


def make_graph_op(gso: GraphShiftOperator, kind: str = "auto",
                  banded_block_size: int | None = None, **kw) -> GraphOp:
    """Pick a representation: dense under ~4k vertices; above that the
    banded-slab kernel when the (assumed RCM-ordered) band is narrow,
    blocked-ELL otherwise. ``banded_block_size`` tunes the banded slab
    rows (see :func:`banded_graph_op`) and is ignored by other kinds."""
    if kind == "auto":
        if gso.n_vertex <= 4096:
            kind = "dense"
        else:
            from stgcn_tpu.kernels.banded_spmm import banded_viable

            kind = "banded" if banded_viable(gso.matrix) else "bcsr"
    if kind == "dense":
        return dense_graph_op(gso, **kw)
    if kind == "bcsr":
        return bcsr_graph_op(gso, **kw)
    if kind == "banded":
        return banded_graph_op(gso, block_size=banded_block_size, **kw)
    if kind == "banded_int8":
        return banded_graph_op(gso, quantize=True,
                               block_size=banded_block_size, **kw)
    if kind == "ell":
        return ell_graph_op(gso, block_size=banded_block_size or 256, **kw)
    if kind == "ell_int8":
        return ell_graph_op(gso, quantize=True,
                            block_size=banded_block_size or 256, **kw)
    raise ValueError(f"unknown graph-op kind {kind!r}")
