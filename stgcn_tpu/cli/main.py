"""CLI driver: flag-compatible with the reference (`main.py:39-94`) plus
TPU-native extensions (platform/mesh/kernel selection, resume, synthetic
data).

Pipeline: adjacency → GSO → on-device graph operator; CSV → chronological
split → z-score (train-fit) → device series; model + optimizer + early
stopping; train → test — the same four phases as `main.py:205-218`, with
every stage an explicit object instead of a mutated argparse namespace.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

from stgcn_tpu.data import datasets as D
from stgcn_tpu.data import synthetic as S
from stgcn_tpu.graph import build_gso
from stgcn_tpu.train.loop import TrainConfig, Trainer


def _str2bool(v: str) -> bool:
    # the reference uses `type=bool`, an argparse footgun that is always
    # True for any non-empty string (`main.py:41,53`); we parse properly
    # but keep the same flag names and defaults
    return str(v).lower() not in ("false", "0", "no", "")


def get_parameters(argv=None):
    parser = argparse.ArgumentParser(description="STGCN-TPU")
    # --- reference-parity flags (`main.py:40-63`) ---
    parser.add_argument("--enable_cuda", type=_str2bool, default=True,
                        help="kept for flag parity; device selection is JAX-native")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--dataset", type=str, default="metr-la",
                        help="metr-la | pems-bay | pemsd7-m (the reference's "
                             "choices, `main.py:43`) or any directory under "
                             "--data_root holding adj.npz (+ vel.csv)")
    parser.add_argument("--n_his", type=int, default=12)
    parser.add_argument("--n_pred", type=int, default=3)
    parser.add_argument("--time_intvl", type=int, default=5)  # unused downstream, as in reference
    parser.add_argument("--Kt", type=int, default=3)
    parser.add_argument("--stblock_num", type=int, default=2)
    parser.add_argument("--act_func", type=str, default="glu",
                        choices=["glu", "gtu", "relu", "silu"])  # reference CLI offers glu/gtu; relu/silu exist in its layers (`layers.py:111-115`)
    parser.add_argument("--Ks", type=int, default=3, choices=[3, 2])
    parser.add_argument("--graph_conv_type", type=str, default="cheb_graph_conv",
                        choices=["cheb_graph_conv", "graph_conv"])
    parser.add_argument("--gso_type", type=str, default="sym_norm_lap",
                        choices=["sym_norm_lap", "rw_norm_lap",
                                 "sym_renorm_adj", "rw_renorm_adj",
                                 # extensions: the other 4 types the
                                 # reference implements but hides (`utility.py:20-55` vs `main.py:52`)
                                 "sym_norm_adj", "rw_norm_adj",
                                 "sym_renorm_lap", "rw_renorm_lap"])
    parser.add_argument("--enable_bias", type=_str2bool, default=True)
    parser.add_argument("--droprate", type=float, default=0.5)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--weight_decay_rate", type=float, default=0.001)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--opt", type=str, default="adamw",
                        choices=["adamw", "nadamw", "lion", "tiger", "tiger_fixed"])
    parser.add_argument("--step_size", type=int, default=10)
    parser.add_argument("--gamma", type=float, default=0.95)
    parser.add_argument("--patience", type=int, default=10)
    # --- TPU-native extensions ---
    parser.add_argument("--data_root", type=str, default="data")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a JAX platform (cpu/tpu); default: auto")
    parser.add_argument("--matmul_precision", type=str, default="default",
                        choices=["default", "high", "highest"],
                        help="'highest' for parity runs; 'default' (bf16 MXU) for speed")
    parser.add_argument("--graph_op", type=str, default="auto",
                        choices=["auto", "dense", "bcsr", "banded",
                                 "banded_int8", "ell", "ell_int8"],
                        help="GSO representation: dense MXU matmul or Pallas "
                             "block-sparse (banded = windowed slabs; ell = "
                             "O(nnz) blocked-ELL, the 1M-vertex form)")
    parser.add_argument("--shuffle", type=_str2bool, default=False,
                        help="shuffle training windows (reference keeps False)")
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--synthetic_ok", type=_str2bool, default=True,
                        help="generate a deterministic synthetic vel.csv when missing")
    parser.add_argument("--log_path", type=str, default=None)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler device trace here")
    parser.add_argument("--debug_nans", type=_str2bool, default=False,
                        help="enable jax NaN checking (slow; debugging aid)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = mixed-precision training (f32 params/LN)")
    parser.add_argument("--fused", type=_str2bool, default=False,
                        help="vertex-fused ST-block Pallas kernels (sparse "
                             "ops aggregate via banded/ELL SpMM, dense ops "
                             "via the nv dense matmul)")
    parser.add_argument("--remat", type=_str2bool, default=False,
                        help="checkpoint/rematerialize ST blocks (100k+ vertices)")
    parser.add_argument("--fused_tile_v", type=int, default=None,
                        help="vertex-tile width of the fused kernels (default "
                             "128; 256 with --fused_b_tile = batch measured "
                             "95.3 -> 88.2 ms/step at 100k, BASELINE.md r5)")
    parser.add_argument("--fused_b_tile", type=int, default=None,
                        help="batch tile of the fused kernels (default: "
                             "VMEM-budgeted)")
    # --- multi-chip (SURVEY §2.9-2.10) ---
    parser.add_argument("--mesh_data", type=int, default=1,
                        help="data-parallel mesh axis size (batch shards here; "
                             "XLA psums the gradients over ICI)")
    parser.add_argument("--mesh_graph", type=int, default=1,
                        help="graph-partition mesh axis size (vertices shard "
                             "here; boundary halo exchange over ICI/DCN)")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="channel tensor-parallel mesh axis size")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host bootstrap: jax.distributed.initialize() "
                             "before building the mesh (coordinator/process "
                             "settings via the standard JAX env vars)")
    return parser.parse_args(argv)


def set_env(seed: int) -> None:
    """Determinism knobs (`main.py:23-37`): JAX is deterministic by
    construction; only the host-side RNGs need seeding."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def config_from_args(args) -> TrainConfig:
    return TrainConfig(
        n_his=args.n_his, n_pred=args.n_pred, kt=args.Kt, ks=args.Ks,
        stblock_num=args.stblock_num, act_func=args.act_func,
        graph_conv_type=args.graph_conv_type, enable_bias=args.enable_bias,
        droprate=args.droprate, lr=args.lr, weight_decay=args.weight_decay_rate,
        batch_size=args.batch_size, epochs=args.epochs, opt=args.opt,
        step_size=args.step_size, gamma=args.gamma, patience=args.patience,
        seed=args.seed, shuffle=args.shuffle,
        compute_dtype=None if args.compute_dtype == "float32" else args.compute_dtype,
        fused=args.fused, remat=args.remat,
        fused_tile_v=args.fused_tile_v, fused_b_tile=args.fused_b_tile,
        ckpt_dir=args.ckpt_dir or f"checkpoints/STGCN_{args.dataset}",
        log_path=args.log_path, dataset_name=args.dataset,
    )


def build_trainer(cfg: TrainConfig, *, dataset: str, data_root: str = "data",
                  gso_type: str = "sym_norm_lap", graph_op_kind: str = "auto",
                  synthetic_ok: bool = True, mesh=None,
                  banded_block_size: int = 256) -> Trainer:
    """Data + graph + model assembly (reference `data_preparate` +
    `prepare_model`, `main.py:96-158`).

    With ``mesh``: the GSO becomes a vertex-partitioned operator on the
    ``graph`` axis — a sparse :class:`~stgcn_tpu.dist.BandedShardedGraphOp`
    (per-shard banded packs + boundary halo exchange; the path that scales
    to 100k/1M vertices) for large graphs or when ``graph_op_kind`` names a
    banded kind, else the dense ring :class:`~stgcn_tpu.dist.ShardedGraphOp`.
    The series' sensor columns are permuted into partition order and the
    series shards over ``graph``. All metrics are permutation-invariant,
    so results match the single-device run.
    """
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.nn.model import STGCN
    from stgcn_tpu.ops.graph_op import make_graph_op

    adj, n_vertex = D.load_adj(dataset, data_root)
    art = build_gso(adj, gso_type,
                    cheb=(cfg.graph_conv_type == "cheb_graph_conv"))

    perm = None
    if mesh is not None:
        from stgcn_tpu.dist import banded_sharded_graph_op, sharded_graph_op

        banded = graph_op_kind in ("banded", "banded_int8") or (
            graph_op_kind == "auto" and art.n_vertex > 4096)
        if banded:
            gop, partition = banded_sharded_graph_op(
                art, mesh, block_size=banded_block_size,
                quantize=(graph_op_kind == "banded_int8"))
        else:
            gop, partition = sharded_graph_op(art, mesh)
        perm = partition.perm
    else:
        if graph_op_kind in ("banded", "banded_int8", "ell", "ell_int8") \
                or (graph_op_kind == "auto" and art.n_vertex > 4096):
            # sparse kernels want the narrow RCM band (ELL: clustered
            # column blocks); reorder the graph and, below, the matching
            # sensor columns of the series
            from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering

            perm = rcm_ordering(art.matrix)
            art = type(art)(matrix=permute_matrix(art.matrix, perm),
                            gso_type=art.gso_type,
                            cheb_rescaled=art.cheb_rescaled,
                            lam_max=art.lam_max)
        # 256-row slabs measured best for the contain_diag stream packs at
        # both eval and training widths (round 3: pair 7.66 vs 9.89 ms at
        # N=1280/100k — narrower windows cut the MXU band padding); the
        # fused path additionally packs nv slabs for the zero-transpose
        # kernels (kernels/banded_nv.py)
        kw = {}
        if cfg.fused and graph_op_kind in ("banded", "banded_int8") or (
                cfg.fused and graph_op_kind == "auto"
                and art.n_vertex > 4096):
            kw["nv"] = True
        gop = make_graph_op(art, kind=graph_op_kind,
                            banded_block_size=banded_block_size, **kw)

    vel_path = os.path.join(data_root, dataset, "vel.csv")
    if not os.path.exists(vel_path):
        if not synthetic_ok:
            raise FileNotFoundError(
                f"{vel_path} missing (stripped from the snapshot); pass "
                "synthetic_ok=True to generate a deterministic synthetic series")
        S.ensure_vel(dataset, data_root)
    vel = D.load_vel(dataset, data_root)
    if perm is not None:
        vel = vel[:, perm]

    train, val, test = D.chrono_split(vel)
    scaler = D.ZScoreScaler()
    train = scaler.fit_transform(train)
    val = scaler.transform(val)
    test = scaler.transform(test)

    series_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        series_sharding = NamedSharding(mesh, P(None, "graph"))

    def mk(arr):
        series = jnp.asarray(arr, jnp.float32)
        if series_sharding is not None:
            series = jax.device_put(series, series_sharding)
        return D.ForecastDataset(series=series, n_his=cfg.n_his, n_pred=cfg.n_pred)

    model = STGCN(n_his=cfg.n_his, kt=cfg.kt, ks=cfg.ks,
                  stblock_num=cfg.stblock_num, act_func=cfg.act_func,
                  graph_conv_type=cfg.graph_conv_type, use_bias=cfg.enable_bias,
                  droprate=cfg.droprate, remat=cfg.remat,
                  dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)
    return Trainer(cfg, model, gop, mk(train), mk(val), mk(test), scaler,
                   mesh=mesh)


def main(argv=None):
    import jax

    args = get_parameters(argv)
    print(f"Training configs: {args}")
    set_env(args.seed)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.distributed:
        # multi-host: all processes run this same command; JAX discovers the
        # coordinator from the standard env (or TPU metadata) and
        # jax.devices() then spans every host's chips
        jax.distributed.initialize()

    mesh = None
    if args.mesh_data * args.mesh_graph * args.mesh_model > 1:
        from stgcn_tpu.dist.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, graph=args.mesh_graph,
                         model=args.mesh_model)
        print(f"Mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")

    cfg = config_from_args(args)
    trainer = build_trainer(cfg, dataset=args.dataset, data_root=args.data_root,
                            gso_type=args.gso_type, graph_op_kind=args.graph_op,
                            synthetic_ok=args.synthetic_ok, mesh=mesh)
    if args.resume and trainer.resume():
        print(f"Resumed from epoch {trainer.epoch}")
    trainer.fit(profile_dir=args.profile_dir)
    trainer.test()


if __name__ == "__main__":
    main()
