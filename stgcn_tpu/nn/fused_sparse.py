"""Vertex-fused forward for the sparse (large-V) path.

A functional apply over the same flax param pytree the unfused
:class:`~stgcn_tpu.nn.model.STGCN` trains — checkpoints are
interchangeable. Each ST-Conv block runs as TWO vertex-tiled Pallas
kernels around the existing sparse graph kernels
(:mod:`stgcn_tpu.kernels.vertex_fused`):

    head (prev-LN-normalize + dropout → tconv1 → gate → align)
      → graph aggregation (banded/ELL SpMM or fused Chebyshev pair)
      → tail (contraction → residual → ReLU → tconv2 → gate + LN partials)

so between ST blocks no full-size activation crosses HBM more than once
per direction — at 100k vertices the unfused step is dominated by
exactly that elementwise traffic (ROADMAP.md). The output head
(`model/layers.py:260-284`) stays in XLA, reusing
:func:`stgcn_tpu.nn.fused._output_block_apply`.

Inter-kernel activations travel in channel-before-vertex layout
``[B, T, C, V]`` and the graph kernels consume the folded ``[V, N]``
operand directly (``apply_vn`` / ``cheb_pair_vn``): Pallas custom-calls
pin row-major layouts, and a ``[..., V, C]`` boundary tensor with
C ∈ {8, 16} would be lane-padded 8–16× in HBM (see
:func:`stgcn_tpu.kernels.vertex_fused._cv2vc`).

The kernels tile ``(batch, vertices)``; the batch tile is auto-sized to
the kernels' scoped-VMEM budget (:func:`vertex_fused.pick_b_tile`) and
the batch is zero-padded to a tile multiple (padded rows carry zero
cotangents, so weight gradients are unaffected). With ``remat=True``
(default: ``model.remat``) each ST block is wrapped in
``jax.checkpoint`` — the per-block custom-VJP residuals otherwise sum
to many GB at 100k vertices, just like the unfused model's ``nn.remat``
blocks (`nn/model.py:65-90`).

Dropout inside the heads uses the on-core PRNG (block-seeded from the
step rng); trajectories therefore differ bitwise from the unfused path
(as any two mask sources do) while matching in distribution.
Deterministic-mode outputs match the unfused model to float tolerance
(tests/test_vertex_fused.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from stgcn_tpu.kernels.fused_stblock import _round_up
from stgcn_tpu.kernels.vertex_fused import (
    VertexBlockCfg,
    head_fused,
    pick_b_tile,
    pick_b_tile_fwd,
    tail_fused,
)
from stgcn_tpu.nn.fused import _output_block_apply_cv
from stgcn_tpu.nn.model import STGCN


def _vn(x_cv: jax.Array) -> jax.Array:
    """[B, T, C, V] → [V, B·T·C] — the vn graph kernels' operand (a real
    HBM transpose: ~2-3 ms each way at 100k training shapes; prefer the
    nv kernels below when the operator carries nv packs)."""
    return x_cv.reshape(-1, x_cv.shape[-1]).T


def _from_vn(y_vn: jax.Array, like: jax.Array) -> jax.Array:
    v_pad = like.shape[-1]
    if y_vn.shape[0] < v_pad:  # op pad < kernel-tile pad
        y_vn = jnp.pad(y_vn, ((0, v_pad - y_vn.shape[0]), (0, 0)))
    return y_vn.T.reshape(like.shape)


def _nv(x_cv: jax.Array) -> jax.Array:
    """[B, T, C, V] → [N = B·T·C, V] — a reshape VIEW of the cv layout
    (zero HBM traffic); the nv kernels' operand."""
    return x_cv.reshape(-1, x_cv.shape[-1])


def _from_nv(y_nv: jax.Array, like: jax.Array) -> jax.Array:
    v_pad = like.shape[-1]
    if y_nv.shape[1] < v_pad:  # op pad < kernel-tile pad
        y_nv = jnp.pad(y_nv, ((0, 0), (0, v_pad - y_nv.shape[1])))
    return y_nv[:, :v_pad].reshape(like.shape)


def _graph_terms(cfg: VertexBlockCfg, gop: Any, xg: jax.Array):
    """The graph outputs entering the tail contraction, in cv layout."""
    if cfg.ks == 1 and cfg.graph_conv_type == "cheb_graph_conv":
        return xg, xg  # contraction uses T_0 only
    gv = getattr(gop, "v_pad", None) or getattr(gop, "n_vertex_pad", None)
    if hasattr(gop, "cheb_pair_cv") and hasattr(gop, "apply_cv"):
        # rank-preserving last-axis contraction (dense ops): no [N, V]
        # reshape, so XLA cannot interpose a layout copy on the operand
        if cfg.graph_conv_type == "graph_conv" or cfg.ks == 2:
            t = gop.apply_cv(xg)
            return t, t
        return gop.cheb_pair_cv(xg)
    if getattr(gop, "has_nv", False):
        # zero-transpose path: the cv layout reshape-views to [N, V]
        x_nv = _nv(xg)
        if cfg.graph_conv_type == "graph_conv" or cfg.ks == 2:
            t = _from_nv(gop.apply_nv(x_nv), xg)
            return t, t
        t1, t2 = gop.cheb_pair_nv(x_nv)
        return _from_nv(t1, xg), _from_nv(t2, xg)
    if hasattr(gop, "apply_vn"):
        x_vn = _vn(xg)
        if gv is not None and gv < x_vn.shape[0]:
            x_vn = x_vn[:gv]  # rows past the op's pad are zero padding
        if cfg.graph_conv_type == "graph_conv" or cfg.ks == 2:
            t = _from_vn(gop.apply_vn(x_vn), xg)
            return t, t
        if hasattr(gop, "cheb_pair_vn"):
            t1, t2 = gop.cheb_pair_vn(x_vn)
        else:
            t1 = gop.apply_vn(x_vn)
            t2 = gop.apply_vn(t1, scale=2.0) - x_vn
        return _from_vn(t1, xg), _from_vn(t2, xg)
    # generic operator: go through [..., V, C]
    xg_vc = jnp.swapaxes(xg, -1, -2)
    if cfg.graph_conv_type == "graph_conv" or cfg.ks == 2:
        t = jnp.swapaxes(gop(xg_vc), -1, -2)
        return t, t
    if hasattr(gop, "cheb_pair"):
        t1, t2 = gop.cheb_pair(xg_vc)
        return jnp.swapaxes(t1, -1, -2), jnp.swapaxes(t2, -1, -2)
    t1 = gop(xg_vc)
    t2 = gop(t1, scale=2.0) - xg_vc
    return jnp.swapaxes(t1, -1, -2), jnp.swapaxes(t2, -1, -2)


def _st_block(cfg: VertexBlockCfg, gop: Any, seed, vtrue, head_in, mu,
              rstd, lng_p, lnb_p, w):
    """One ST block: head kernel → graph aggregation → tail kernel.
    A standalone function (cfg static, everything else pytree args) so it
    can be wrapped in ``jax.checkpoint``. All activations cv-layout.

    ``xg`` and the graph terms carry checkpoint names: under the
    save-names remat policy (:data:`_REMAT_POLICY`) the backward replay
    skips the head kernel and the whole graph aggregation — the pair is
    ~10 ms at 100k training widths (measured, scripts/probe_100k_breakdown)
    and recomputing it bought nothing but time (the saved tensors are
    ~0.75 GB/block at B=8 bf16 against 16 GB HBM)."""
    from jax.ad_checkpoint import checkpoint_name

    c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b = w
    if cfg.backend == "xla":
        # whole-array cv-layout jnp cores (vertex_fused.*_reference):
        # same math, XLA fusion + autodiff backward instead of Mosaic.
        from stgcn_tpu.kernels.vertex_fused import (head_reference,
                                                    tail_reference)

        mask = None
        if cfg.training and cfg.droprate > 0.0 and cfg.apply_ln:
            key = jax.random.PRNGKey(seed)
            keep = jax.random.bernoulli(key, 1.0 - cfg.droprate,
                                        head_in.shape)
            mask = (keep.astype(jnp.float32)
                    / (1.0 - cfg.droprate)).astype(head_in.dtype)
        xg = head_reference(cfg, head_in, (mu, rstd, lng_p, lnb_p),
                            (c1k, c1b, gaw, gab), mask)
        xg = checkpoint_name(xg, "stgcn_xg")
        t_a, t_b = _graph_terms(cfg, gop, xg)
        t_a = checkpoint_name(t_a, "stgcn_graph_term")
        t_b = checkpoint_name(t_b, "stgcn_graph_term")
        return tail_reference(cfg, xg, [t_a, t_b][: cfg.n_terms],
                              (gcw, gcb, c2k, c2b))
    xg = head_fused(cfg, seed, head_in, mu, rstd, lng_p, lnb_p,
                    c1k, c1b, gaw, gab)
    xg = checkpoint_name(xg, "stgcn_xg")
    t_a, t_b = _graph_terms(cfg, gop, xg)
    t_a = checkpoint_name(t_a, "stgcn_graph_term")
    t_b = checkpoint_name(t_b, "stgcn_graph_term")
    return tail_fused(cfg, vtrue, xg, t_a, t_b, gcw, gcb, c2k, c2b)


def _st_block_sharded(cfg: VertexBlockCfg, gop: Any, seed, vtrue_g,
                      head_in, mu, rstd, lng_p, lnb_p, w):
    """Sharded ST block: head/tail kernels run per vertex shard inside one
    ``shard_map`` over ``(data, graph)``, the aggregation is the per-shard
    boundary-halo SpMM (:func:`stgcn_tpu.dist.halo.halo_spmm_local`), and
    the LayerNorm partial sums ``psum`` over the graph axis. ``cfg.v_pad``
    is the PER-SHARD vertex count; ``vtrue_g`` the global one (each
    shard's true-row count is derived from its axis index — partitions
    are equal-size with padding only on the global tail,
    `graph/partition.py:60-73`)."""
    from jax.sharding import PartitionSpec as P

    from stgcn_tpu.dist.halo import halo_spmm_local, shard_map

    mesh, ax = gop.mesh, gop.axis
    hcfg = gop._cfg
    s_local = cfg.v_pad
    quant = gop.scales is not None

    def body(seed_, vtrue_g_, head_in_, mu_, rstd_, lng_, lnb_,
             slabs, lo, slabs_t, lo_t, scales, scales_t, *w_):
        slabs, lo = slabs[0], lo[0]
        slabs_t, lo_t = slabs_t[0], lo_t[0]
        scales = None if scales is None else scales[0]
        scales_t = None if scales_t is None else scales_t[0]
        gi = lax.axis_index(ax)
        vtrue = jnp.clip(vtrue_g_ - gi * s_local, 0, s_local)
        seed_loc = seed_ + gi.astype(jnp.int32) * jnp.int32(7919)
        if "data" in mesh.shape:
            seed_loc = seed_loc + lax.axis_index("data").astype(
                jnp.int32) * jnp.int32(104729)
        c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b = w_

        # pad the local batch to the tile multiple (see module docstring)
        b_loc = head_in_.shape[0]
        bt = cfg.b_tile or b_loc
        b_pad = -(-b_loc // bt) * bt
        if b_pad != b_loc:
            pb = ((0, b_pad - b_loc),)
            head_in_ = jnp.pad(head_in_, pb + ((0, 0),) * 3)
            mu_ = jnp.pad(mu_, pb + ((0, 0),) * 3)
            rstd_ = jnp.pad(rstd_, pb + ((0, 0),) * 3)

        xg = head_fused(cfg, seed_loc, head_in_, mu_, rstd_, lng_, lnb_,
                        c1k, c1b, gaw, gab)

        def gapply(x_cv, scale=None):
            x_vn = _vn(x_cv)
            if scale is None:
                y = halo_spmm_local(hcfg, slabs, lo, slabs_t, lo_t, x_vn,
                                    scales, scales_t)
            elif quant:  # fold the scalar into the dequant scales
                y = halo_spmm_local(hcfg, slabs, lo, slabs_t, lo_t, x_vn,
                                    scales * scale, scales_t * scale)
            else:
                y = halo_spmm_local(hcfg, slabs * scale, lo,
                                    slabs_t * scale, lo_t, x_vn,
                                    None, None)
            return _from_vn(y, x_cv)

        from jax.ad_checkpoint import checkpoint_name

        xg = checkpoint_name(xg, "stgcn_xg")
        if cfg.ks == 1 and cfg.graph_conv_type == "cheb_graph_conv":
            t_a = t_b = xg
        elif cfg.graph_conv_type == "graph_conv" or cfg.ks == 2:
            t_a = t_b = checkpoint_name(gapply(xg), "stgcn_graph_term")
        else:  # ks == 3: T2's aggregation needs T1's halo — two passes
            t_a = checkpoint_name(gapply(xg), "stgcn_graph_term")
            t_b = checkpoint_name(gapply(t_a, 2.0) - xg, "stgcn_graph_term")

        a2, ps, pss = tail_fused(cfg, vtrue, xg, t_a, t_b,
                                 gcw, gcb, c2k, c2b)
        ps = lax.psum(ps, ax)
        pss = lax.psum(pss, ax)
        return a2[:b_loc], ps[:b_loc], pss[:b_loc]

    d = "data" if "data" in mesh.shape else None
    act = P(d, None, None, ax)
    stat = P(d, None, None, None)
    in_specs = (P(), P(), act, stat, stat, P(None, ax), P(None, ax),
                P(ax), P(ax), P(ax), P(ax),
                P(ax) if quant else P(), P(ax) if quant else P(),
                *([P()] * 8))
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=(act, stat, stat))
    return fn(seed, vtrue_g, head_in, mu, rstd, lng_p, lnb_p,
              gop.slabs, gop.lo, gop.slabs_t, gop.lo_t,
              gop.scales, gop.scales_t, *w)


def _block_weights(blk: dict, graph_conv_type: str):
    c1k = jnp.squeeze(blk["tmp_conv1"]["causal_conv"]["kernel"], axis=1)
    c1b = blk["tmp_conv1"]["causal_conv"]["bias"]
    gaw = blk["graph_conv"]["align"]["align_conv"]["kernel"]
    gab = blk["graph_conv"]["align"]["align_conv"]["bias"]
    if graph_conv_type == "cheb_graph_conv":
        gcw = blk["graph_conv"]["cheb_graph_conv"]["weight"]
        gcb = blk["graph_conv"]["cheb_graph_conv"]["bias"]
    else:
        gcw = blk["graph_conv"]["graph_conv"]["weight"][None]
        gcb = blk["graph_conv"]["graph_conv"]["bias"]
    c2k = jnp.squeeze(blk["tmp_conv2"]["causal_conv"]["kernel"], axis=1)
    c2b = blk["tmp_conv2"]["causal_conv"]["bias"]
    lng = blk["ln"]["scale"]
    lnb = blk["ln"]["bias"]
    return c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb


def fused_sparse_forward(params: dict, x: jax.Array, gop: Any, model: STGCN,
                         *, deterministic: bool = True,
                         rng: jax.Array | None = None,
                         tile_v: int = 128,
                         b_tile: int | None = None,
                         remat: bool | None = None,
                         remat_policy: str = "graph-terms",
                         precision: str = "auto",
                         use_pallas: bool | str | None = None,
                         interpret: bool = False) -> jax.Array:
    """Forward pass with vertex-fused ST-block kernels.

    ``x``: ``[B, T, V, C]`` (the model's public layout). ``gop`` must
    expose ``v_pad`` (banded) or ``n_vertex_pad`` (BCSR/dense) — a
    128-aligned padded vertex count. :class:`~stgcn_tpu.ops.DenseGraphOp`
    qualifies via its nv surface (``apply_nv``/``cheb_pair_nv``), so
    dense road-scale operators route through here in production;
    :func:`stgcn_tpu.nn.fused.fused_forward` remains as an alternative
    whole-block dense kernel. Supports the CLI surface: ``Ks ∈ {1, 2, 3}``
    (cheb) and 1st-order graph_conv; for cheb ``Ks > 3`` the call
    transparently falls back to the unfused model apply (same math, XLA
    fusion) rather than raising.

    ``use_pallas``: ``True``/``False`` pick the Mosaic kernels / the
    unfused oracle; the string ``"xla"`` selects the whole-array
    cv-layout jnp blocks (channels-before-vertex layout with XLA fusion
    — the production default at small V). On the ``"xla"`` backend there
    is no kernel batch tiling, so a caller-supplied ``b_tile`` is
    rejected rather than silently ignored.
    """
    blocks, ko = model._plan()
    n_st = len(blocks) - 3
    v_true = x.shape[2]
    b_in = x.shape[0]
    gv = getattr(gop, "v_pad", None) or getattr(gop, "n_vertex_pad", None)
    if gv is None:
        raise ValueError(
            "fused_sparse_forward needs a graph operator exposing a padded "
            "vertex count (banded/bcsr v_pad/n_vertex_pad, or DenseGraphOp's "
            "nv surface); nn.fused.fused_forward is the whole-block dense "
            "alternative")
    if model.graph_conv_type == "cheb_graph_conv" and model.ks > 3:
        # the vertex-tiled kernels carry at most the ks=3 recurrence's two
        # graph terms; higher orders run the unfused model (same math,
        # XLA fusion + autodiff) instead of raising (VERDICT r3 #8)
        rngs = None if (deterministic or rng is None) else {"dropout": rng}
        return model.apply({"params": params}, x, gop,
                           deterministic=deterministic, rngs=rngs)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" or bool(interpret)
    backend = "pallas"
    if use_pallas == "xla":
        # whole-array cv-layout jnp blocks — same channel-before-vertex
        # layout (kills the 2x lane padding of [.., V, 64] tensors at
        # small V) with XLA fusion instead of Mosaic kernels
        backend = "xla"
    elif not use_pallas:
        # CPU / oracle path: the unfused model is the exact same math
        rngs = None if (deterministic or rng is None) else {"dropout": rng}
        return model.apply({"params": params}, x, gop,
                           deterministic=deterministic, rngs=rngs)
    sharded = hasattr(gop, "mesh") and hasattr(gop, "halo")
    if sharded and backend == "xla":
        raise NotImplementedError("use_pallas='xla' is single-device; the "
                                  "sharded path runs the Pallas kernels")
    if sharded:
        v_pad = gv  # per-shard sizes are fixed by the partition
        n_graph = gop.mesh.shape[gop.axis]
        s_local = v_pad // n_graph
        if s_local % tile_v:
            raise ValueError(f"per-shard vertices {s_local} not a multiple "
                             f"of tile_v {tile_v}")
        b_eff = b_in // gop.mesh.shape.get("data", 1)  # per-shard batch
    else:
        v_pad = _round_up(gv, tile_v)
        s_local = v_pad
        b_eff = b_in
    if precision == "auto":
        precision = "bfloat16" if model.dtype == jnp.bfloat16 else "default"
    cdt = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    if remat is None:
        remat = model.remat
    # LN affine arrays threaded between blocks (and their grad partials)
    # are [C, V_pad] — at 1M vertices the f32 copies and transposes cost
    # gigabytes of HBM temps; bf16 mode stores them in bf16 (the in-
    # kernel statistics math stays f32)
    ln_dt = cdt if precision == "bfloat16" else jnp.float32

    training = (not deterministic) and model.droprate > 0.0
    if training:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        seeds = jax.random.randint(rng, (n_st,), 0,
                                   jnp.iinfo(jnp.int32).max)
        out_rng = jax.random.fold_in(rng, 0x0FF5E7)
        drop_rng = jax.random.fold_in(rng, 0xD409)
    else:
        seeds = jnp.zeros((n_st,), jnp.int32)
        out_rng = drop_rng = None

    x = x.astype(cdt)
    if x.shape[3] == 1:
        # C == 1: the cv transpose is a pure reshape — doing it as a
        # transpose materializes a pathological T(2,128)-layout copy
        # (measured 0.6 ms at B=512) that a reshape avoids; pad vertex
        # lanes afterwards in the last axis
        x = x.reshape(x.shape[0], x.shape[1], 1, x.shape[2])
        if x.shape[3] != v_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                            (0, v_pad - x.shape[3])))
    else:
        if x.shape[2] != v_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, v_pad - x.shape[2]),
                            (0, 0)))
        x = jnp.transpose(x, (0, 1, 3, 2))  # → cv layout [B, T, C, V]

    # prepass: static per-block configs, then one shared batch tile
    # (Mosaic can't lower the backward's N=1 matmul → c_in floors at 8)
    cfgs = []
    cur_t = model.n_his
    c_in = max(x.shape[2], 8)
    for l in range(n_st):
        c0, c1, c2 = blocks[l + 1]
        cfgs.append(VertexBlockCfg(
            kt=model.kt, ks=model.ks, act_func=model.act_func,
            graph_conv_type=model.graph_conv_type, droprate=model.droprate,
            v_true=min(v_true, s_local), v_pad=s_local, t_in=cur_t,
            c_in=c_in, c0=c0, c1=c1, c2=c2, tile_v=tile_v,
            apply_ln=(l > 0), training=training,
            interpret=interpret, precision=precision, backend=backend))
        cur_t = cfgs[-1].t2
        c_in = max(c2, 8)
    if backend == "xla":
        if b_tile is not None:
            raise ValueError("b_tile has no effect on the 'xla' backend "
                             "(whole-array blocks, no kernel batch tiling); "
                             "omit it or use the Pallas backend")
        b_tile = b_eff  # whole-array: no kernel tiling, no batch padding
    if b_tile is None:
        b_tile = min(pick_b_tile(c, b_eff) for c in cfgs)
    elif backend == "pallas":
        # explicit (tile_v, b_tile) choices that blow the kernels' scoped
        # VMEM fail deep inside XLA with a stack-OOM dump; pre-check with
        # pick_b_tile's estimate (caught live by the round-5 CLI verify at
        # --fused_b_tile 32 / tile_v 256). The estimate is ~3-4x
        # conservative vs XLA's measured stack usage, so only a gross
        # excess is a hard error; the in-between zone warns and proceeds.
        import os as _os
        import warnings as _warnings

        from stgcn_tpu.kernels.vertex_fused import bwd_bytes_per_sample

        limit = int(_os.environ.get("STGCN_VMEM_LIMIT_MB", "100")) * 2**20
        per = max(bwd_bytes_per_sample(c) for c in cfgs)
        worst = per * b_tile
        hint = (f"largest b_tile within the conservative estimate: "
                f"{max(1, limit // per)}; STGCN_VMEM_LIMIT_MB widens the "
                f"scoped budget")
        if worst > 3 * limit:
            raise ValueError(
                f"b_tile={b_tile} at tile_v={tile_v} needs ~{worst/2**20:.0f}"
                f" MB of scoped VMEM per grid step by the pick_b_tile "
                f"estimate (scoped limit {limit/2**20:.0f} MB even after "
                f"the estimate's ~3x conservatism) — the backward kernel "
                f"cannot compile; {hint}")
        if worst > limit:
            _warnings.warn(
                f"b_tile={b_tile} at tile_v={tile_v}: estimated "
                f"{worst/2**20:.0f} MB scoped VMEM per grid step exceeds "
                f"the {limit/2**20:.0f} MB limit (estimate is ~3x "
                f"conservative — may still compile); {hint}")
    b = b_in
    if not sharded:  # sharded blocks pad their local batch internally
        b = -(-b_in // b_tile) * b_tile
        if b != b_in:
            x = jnp.pad(x, ((0, b - b_in), (0, 0), (0, 0), (0, 0)))
    # forward-only kernels run with a larger batch tile (per-grid-step
    # overhead dominates at small V); the sharded path pads its local
    # batch to b_tile only, so the fwd tile stays off there
    b_tile_fwd = 0 if (sharded or backend == "xla") else \
        min(pick_b_tile_fwd(c, b, b_tile) for c in cfgs)
    cfgs = [dataclasses.replace(c, b_tile=b_tile, b_tile_fwd=b_tile_fwd)
            for c in cfgs]

    blk_fn = _st_block_sharded if sharded else _st_block
    if remat:
        if remat_policy == "minimal":
            # save NOTHING per block (full recompute in the backward):
            # trades ~2 pair re-applications per block for ~0.6-1 GB of
            # saved graph terms per block — what makes the 1M-vertex
            # single-chip step fit in 16 GB HBM
            policy = None
        else:
            policy = jax.checkpoint_policies.save_only_these_names(
                "stgcn_xg", "stgcn_graph_term")
        blk_fn = jax.checkpoint(blk_fn, static_argnums=(0,), policy=policy)

    state = None  # (a2, mu, rstd, lng_pad, lnb_pad) awaiting normalize
    for l in range(n_st):
        cfg = cfgs[l]
        c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb = _block_weights(
            params[f"st_block_{l}"], model.graph_conv_type)

        if l == 0:
            # stats stay 4D keepdims end-to-end (Mosaic layout constraint,
            # see kernels/vertex_fused._ln_drop_fwd)
            mu = jnp.zeros((b, cfg.t_in, 1, 1), jnp.float32)
            rstd = jnp.ones((b, cfg.t_in, 1, 1), jnp.float32)
            lng_p = jnp.ones((cfg.c_in, v_pad), ln_dt)
            lnb_p = jnp.zeros((cfg.c_in, v_pad), ln_dt)
            head_in = x
        else:
            a2_prev, mu, rstd, lng_p, lnb_p = state
            head_in = a2_prev

        if head_in.shape[2] < cfg.c_in:  # channel floor (see prepass)
            pad_c = cfg.c_in - head_in.shape[2]
            head_in = jnp.pad(
                head_in, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
            c1k = jnp.pad(c1k, ((0, 0), (0, pad_c), (0, 0)))
            lng_p = jnp.pad(lng_p, ((0, pad_c), (0, 0)))
            lnb_p = jnp.pad(lnb_p, ((0, pad_c), (0, 0)))

        w = (c1k.astype(cdt), c1b.astype(jnp.float32),
             gaw.astype(cdt), gab.astype(jnp.float32),
             gcw.astype(cdt), gcb.astype(jnp.float32),
             c2k.astype(cdt), c2b.astype(jnp.float32))
        a2, ps, pss = blk_fn(cfg, gop, seeds[l], jnp.int32(v_true),
                             head_in, mu, rstd, lng_p, lnb_p, w)

        denom = float(v_true * cfg.c2)
        mu = ps / denom                                      # [B, T2, 1, 1]
        var = pss / denom - mu * mu
        rstd = lax.rsqrt(jnp.maximum(var, 0.0) + 1e-12)
        pad_v = ((0, v_pad - v_true), (0, 0))
        state = (a2, mu, rstd,
                 jnp.pad(lng.astype(ln_dt), pad_v).T,
                 jnp.pad(lnb.astype(ln_dt), pad_v).T)

    # final block's LayerNorm + dropout and the output head, staying in
    # cv layout end-to-end. On the Pallas backend (single device) the
    # whole head runs as two Mosaic kernels (kernels/output_head.py) —
    # the XLA lowering of this short chain measured 41 ms of the 140 ms
    # step at 100k vertices (every pass crosses the full [B, ·, ·, V]
    # activation in HBM, fwd and bwd). The cv→vc exit is a pure reshape
    # once the channel count is 1.
    a2, mu, rstd, lng_p, lnb_p = state
    if backend == "pallas" and not sharded and ko > 1:
        from stgcn_tpu.kernels.output_head import output_head_fused

        if training:
            imax = jnp.iinfo(jnp.int32).max
            seed_a = jax.random.randint(drop_rng, (), 0, imax)
            seed_b = jax.random.randint(out_rng, (), 0, imax)
        else:
            seed_a = seed_b = jnp.int32(0)
        out = output_head_fused(
            params["output"], a2, mu, rstd, lng_p, lnb_p,
            v_true=v_true, act_func=model.act_func,
            droprate=model.droprate, training=training,
            seed_a=seed_a, seed_b=seed_b, tile_v=tile_v,
            precision=precision, interpret=interpret)
        return out[:b_in, :, :v_true, :].astype(jnp.float32)
    y = ((a2.astype(jnp.float32) - mu) * rstd * lng_p + lnb_p).astype(cdt)
    if training:
        keep = jax.random.bernoulli(drop_rng, 1.0 - model.droprate, y.shape)
        y = jnp.where(keep, y / (1.0 - model.droprate),
                      jnp.zeros((), cdt))
    y = y[:b_in]

    if ko > 1:
        prec = (lax.Precision.HIGHEST if precision == "highest" else None)
        out = _output_block_apply_cv(params["output"], y, v_true,
                                     act_func=model.act_func,
                                     droprate=model.droprate,
                                     deterministic=deterministic,
                                     rng=out_rng, prec=prec,
                                     dtype=cdt if cdt != jnp.float32
                                     else None)
    else:  # ko == 0 — inline fc head (`models.py:38-42,48-51`), cv layout
        yv = y[..., :v_true]
        a = jnp.einsum("btcv,cd->btdv", yv, params["fc1"]["kernel"]) \
            + params["fc1"]["bias"][:, None]
        a = jax.nn.relu(a)
        a = jnp.einsum("btcv,cd->btdv", a, params["fc2"]["kernel"]) \
            + params["fc2"]["bias"][:, None]
        out = jnp.swapaxes(a, -1, -2)  # end channel is 1: a reshape
    return out.astype(jnp.float32)
