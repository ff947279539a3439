"""Train/val/test loops.

Functional-core redesign of the reference driver (`main.py:160-203`): the
train step is one pure jitted function over (params, opt_state, batch
indices); the series and GSO live on device across the whole run; there is
no per-batch host sync (the reference calls ``l.item()`` every step,
`main.py:170` — here batch losses stay on device and are reduced once per
epoch).

Semantics preserved exactly: per-batch mean MSE loss on ``[B, V]``
predictions, batch-size-weighted epoch loss, StepLR stepped per epoch,
early stopping on val MSE with ties counting as no improvement, test
metrics from the *best* checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stgcn_tpu.data.datasets import ForecastDataset, ZScoreScaler, gather_windows
from stgcn_tpu.train import metrics as M
from stgcn_tpu.train.checkpoint import CheckpointManager
from stgcn_tpu.train.earlystop import EarlyStopping
from stgcn_tpu.train.optim import make_optimizer, make_step_lr


@dataclasses.dataclass
class TrainConfig:
    # model (`main.py:44-54` defaults)
    n_his: int = 12
    n_pred: int = 3
    kt: int = 3
    ks: int = 3
    stblock_num: int = 2
    act_func: str = "glu"
    graph_conv_type: str = "cheb_graph_conv"
    enable_bias: bool = True
    droprate: float = 0.5
    # optimization (`main.py:55-62` defaults)
    lr: float = 1e-3
    weight_decay: float = 1e-3
    batch_size: int = 32
    epochs: int = 1000
    opt: str = "adamw"
    step_size: int = 10
    gamma: float = 0.95
    patience: int = 10
    seed: int = 42
    shuffle: bool = False  # reference quirk: no shuffling even in training
    compute_dtype: str | None = None  # 'bfloat16' for mixed-precision training
    remat: bool = False  # jax.checkpoint per ST block (needed at 100k+ vertices)
    fused: bool = False  # route the forward through the fused ST-block
                         # Pallas kernels (dense GSO only); dropout masks come
                         # from the on-core PRNG, so training trajectories
                         # differ bitwise from the unfused path
    # vertex/batch tiling of the fused kernels (None = kernel defaults:
    # tile_v 128, VMEM-budgeted b_tile). At 100k vertices tile_v=256 with
    # b_tile = whole batch halves the grid-step count and measured
    # 95.3 → 88.2 ms/step (BASELINE.md r5); larger tiles spill VMEM.
    fused_tile_v: int | None = None
    fused_b_tile: int | None = None
    # io
    ckpt_dir: str = "checkpoints/run"
    log_path: str | None = None
    dataset_name: str = "dataset"


class Trainer:
    """Single- or multi-device trainer.

    With ``mesh`` set, the batch axis shards over the ``data`` mesh axis and
    the series' vertex axis over ``graph`` (matching a
    :class:`~stgcn_tpu.dist.ShardedGraphOp`); params/opt-state are
    replicated and XLA inserts the gradient ``psum`` — no explicit
    collectives in this file.
    """

    def __init__(self, config: TrainConfig, model, gop, train_ds: ForecastDataset,
                 val_ds: ForecastDataset, test_ds: ForecastDataset,
                 scaler: ZScoreScaler, *, mesh=None):
        self.cfg = config
        self.model = model
        self.gop = gop
        self.mesh = mesh
        self.train_ds, self.val_ds, self.test_ds = train_ds, val_ds, test_ds
        for name, ds in (("train", train_ds), ("val", val_ds), ("test", test_ds)):
            if ds.num_windows < 1:
                raise ValueError(
                    f"{name} split has {int(ds.series.shape[0])} steps — too few "
                    f"for n_his={config.n_his} + n_pred={config.n_pred} windows")
        self.scaler = scaler
        self.ckpt = CheckpointManager(config.ckpt_dir)

        steps_per_epoch = max(
            -(-train_ds.num_windows // config.batch_size), 1)
        self.steps_per_epoch = steps_per_epoch
        self.lr_schedule = make_step_lr(config.lr, config.step_size,
                                        config.gamma, steps_per_epoch)
        self.tx = make_optimizer(config.opt, lr=self.lr_schedule,
                                 weight_decay=config.weight_decay)

        self.rng = jax.random.PRNGKey(config.seed)
        init_rng, self.dropout_base = jax.random.split(self.rng)
        x0 = jnp.zeros((1, config.n_his, train_ds.n_vertex, 1))
        variables = model.init({"params": init_rng}, x0, gop, deterministic=True)
        self.params = variables["params"]
        self.opt_state = self.tx.init(self.params)
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if "model" in mesh.shape and mesh.shape["model"] > 1:
                # optional channel tensor-parallelism (SURVEY §2.9):
                # wide kernels shard c_out over 'model'; GSPMD inserts
                # the collectives
                from stgcn_tpu.dist.mesh import tp_param_specs

                specs = tp_param_specs(self.params, mesh)
                self.params = jax.tree.map(jax.device_put, self.params, specs)
            else:
                rep = NamedSharding(mesh, P())
                self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(
                self.opt_state, NamedSharding(mesh, P()))
            self._data_sharding = NamedSharding(mesh, P("data"))
        self.epoch = 0
        self.es = EarlyStopping(patience=config.patience, delta=0.0,
                                on_improvement=lambda _vl: self.ckpt.save_best(self.params))
        self._plan_cache: dict = {}
        self._build_steps()

    # ------------------------------------------------------------------ jit
    def _build_steps(self):
        cfg, model, gop = self.cfg, self.model, self.gop

        if cfg.fused:
            # mixed-precision training maps to the kernels' bf16 internals
            # (bf16 storage/MXU operands, f32 accumulation + LN statistics)
            fused_prec = ("bfloat16" if cfg.compute_dtype == "bfloat16"
                          else "default")
            # every operator kind routes through the vertex-tiled fused
            # blocks (LN/gates fused around the aggregation): sparse ops
            # use the banded/ELL SpMM kernels, dense ops the nv [N,V]@[V,V]
            # matmul (DenseGraphOp.apply_nv) — measured faster than both
            # the unfused XLA path and the whole-block dense Mosaic kernel
            # at PEMS-BAY B=512 (scripts/probe_configs2_vf.py; the dense
            # whole-block kernel nn.fused.fused_forward stays available at
            # the library surface).
            from stgcn_tpu.nn.fused_sparse import fused_sparse_forward

            def apply_fn(g, params, x, *, deterministic, rng=None):
                if deterministic and hasattr(g, "matrix"):
                    # dense-op eval: the unfused forward is faster (8.1 vs
                    # 11.3 ms at PEMS-BAY B=512 — the fused win is in the
                    # recompute backward, which eval never runs); at sparse
                    # scale the fused forward wins outright, keep it there
                    return model.apply({"params": params}, x, g,
                                       deterministic=True)
                kw = {}
                if cfg.fused_tile_v is not None:
                    kw["tile_v"] = cfg.fused_tile_v
                if cfg.fused_b_tile is not None:
                    kw["b_tile"] = cfg.fused_b_tile
                return fused_sparse_forward(
                    params, x, g, model, deterministic=deterministic,
                    rng=rng, precision=fused_prec, **kw)
        else:
            def apply_fn(g, params, x, *, deterministic, rng=None):
                rngs = None if rng is None else {"dropout": rng}
                return model.apply({"params": params}, x, g,
                                   deterministic=deterministic, rngs=rngs)
        self._apply_fn = apply_fn

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, g, series, starts, n_valid, rng):
            x, y = gather_windows(series, starts, cfg.n_his, cfg.n_pred)

            def loss_fn(p):
                pred = apply_fn(g, p, x, deterministic=False, rng=rng)
                pred = pred.reshape(pred.shape[0], -1)
                return M.masked_mse(pred, y, n_valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def eval_loss_step(params, g, series, starts, n_valid):
            x, y = gather_windows(series, starts, cfg.n_his, cfg.n_pred)
            pred = apply_fn(g, params, x, deterministic=True)
            pred = pred.reshape(pred.shape[0], -1)
            return M.masked_mse(pred, y, n_valid)

        @jax.jit
        def predict_step(params, g, series, starts):
            x, y = gather_windows(series, starts, cfg.n_his, cfg.n_pred)
            pred = apply_fn(g, params, x, deterministic=True)
            return pred.reshape(pred.shape[0], -1), y

        dropout_base = self.dropout_base

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_epoch_scanned(params, opt_state, g, series, starts_mat,
                                n_valid_vec, idx_vec):
            """One full epoch as a single compiled lax.scan — one dispatch
            per epoch instead of one per batch (dispatch latency through
            the runtime dominates small-graph steps)."""

            def step(carry, inp):
                params, opt_state = carry
                starts, n_valid, idx = inp
                rng = jax.random.fold_in(dropout_base, idx)
                x, y = gather_windows(series, starts, cfg.n_his, cfg.n_pred)

                def loss_fn(p):
                    pred = apply_fn(g, p, x, deterministic=False, rng=rng)
                    pred = pred.reshape(pred.shape[0], -1)
                    return M.masked_mse(pred, y, n_valid)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state2 = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state2), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (starts_mat, n_valid_vec, idx_vec))
            return params, opt_state, losses

        starts_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            starts_sharding = NamedSharding(self.mesh, P(None, "data"))

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_epoch_shuffled(params, opt_state, g, series, all_starts,
                                 n_valid_vec, idx_vec, key):
            """Shuffle-mode epoch with the permutation drawn *on device*
            (zero host traffic per epoch; the reference has no shuffling at
            all, `main.py:127`, so this is a TPU-native extension). The tail
            batch is padded with already-used windows and masked by
            ``n_valid`` exactly like the host plan. Under a mesh the batch
            axis of each step's starts shards over ``data`` — the same
            permutation sequence as the single-device run, so trajectories
            match."""
            steps = n_valid_vec.shape[0]
            b = cfg.batch_size
            perm = jax.random.permutation(key, all_starts)
            pad = steps * b - all_starts.shape[0]
            starts_mat = jnp.concatenate([perm, perm[:pad]]).reshape(steps, b)
            if starts_sharding is not None:
                starts_mat = jax.lax.with_sharding_constraint(
                    starts_mat, starts_sharding)

            def step(carry, inp):
                params, opt_state = carry
                starts, n_valid, idx = inp
                rng = jax.random.fold_in(dropout_base, idx)
                x, y = gather_windows(series, starts, cfg.n_his, cfg.n_pred)

                def loss_fn(p):
                    pred = apply_fn(g, p, x, deterministic=False, rng=rng)
                    pred = pred.reshape(pred.shape[0], -1)
                    return M.masked_mse(pred, y, n_valid)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state2 = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state2), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (starts_mat, n_valid_vec, idx_vec))
            return params, opt_state, losses

        @jax.jit
        def eval_scanned(params, g, series, starts_mat, n_valid_vec):
            def step(_, inp):
                starts, n_valid = inp
                x, y = gather_windows(series, starts, cfg.n_his, cfg.n_pred)
                pred = apply_fn(g, params, x, deterministic=True)
                pred = pred.reshape(pred.shape[0], -1)
                return None, M.masked_mse(pred, y, n_valid)

            _, losses = jax.lax.scan(step, None, (starts_mat, n_valid_vec))
            return losses

        @jax.jit
        def metrics_scanned(params, g, series, starts_mat, n_valid_vec, mean, scale):
            def step(acc, inp):
                starts, n_valid = inp
                x, y = gather_windows(series, starts, cfg.n_his, cfg.n_pred)
                pred = apply_fn(g, params, x, deterministic=True)
                pred = pred.reshape(pred.shape[0], -1)
                pred = pred * scale + mean
                y = y * scale + mean
                stats = M.batch_abs_stats(pred, y, n_valid)
                return tuple(a + s for a, s in zip(acc, stats)), None

            zero = jnp.zeros((), jnp.float32)
            acc, _ = jax.lax.scan(step, (zero,) * 5, (starts_mat, n_valid_vec))
            return acc

        self._train_step = train_step
        self._train_epoch_shuffled = train_epoch_shuffled
        self._eval_loss_step = eval_loss_step
        self._predict_step = predict_step
        self._train_epoch_scanned = train_epoch_scanned
        self._eval_scanned = eval_scanned
        self._metrics_scanned = metrics_scanned

    # ------------------------------------------------------------ batch plans
    def _epoch_plan(self, ds: ForecastDataset) -> tuple[jax.Array, jax.Array]:
        """Stack a split's batches into [n_steps, B] starts + [n_steps] valid.

        Sequential order only — shuffled epochs draw their permutation on
        device in ``_train_epoch_shuffled`` and never come through here.
        """
        # cache entries hold the dataset object itself, so an id() can never
        # be recycled by a garbage-collected dataset and serve a stale plan
        key = id(ds)
        cached = self._plan_cache.get(key)
        if cached is not None and cached[0] is ds:
            return cached[1]
        starts_l, valid_l = [], []
        for starts, n_valid in ds.batches(self.cfg.batch_size):
            starts_l.append(np.asarray(starts))
            valid_l.append(n_valid)
        starts_mat = jnp.asarray(np.stack(starts_l))
        n_valid_vec = jnp.asarray(np.asarray(valid_l, np.int32))
        if self._data_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            starts_mat = jax.device_put(
                starts_mat, NamedSharding(self.mesh, P(None, "data")))
        self._plan_cache[key] = (ds, (starts_mat, n_valid_vec))
        return starts_mat, n_valid_vec

    def _all_starts_plan(self, ds: ForecastDataset):
        """Device-resident window starts + per-batch valid counts (cached)."""
        key = ("all", id(ds))
        cached = self._plan_cache.get(key)
        if cached is None or cached[0] is not ds:
            from stgcn_tpu.data.datasets import window_starts

            starts = window_starts(int(ds.series.shape[0]), self.cfg.n_his,
                                   self.cfg.n_pred)
            b = self.cfg.batch_size
            steps = -(-len(starts) // b)
            n_valid = np.full(steps, b, np.int32)
            n_valid[-1] = len(starts) - (steps - 1) * b
            cached = (ds, (jnp.asarray(starts), jnp.asarray(n_valid)))
            self._plan_cache[key] = cached
        return cached[1]

    # ----------------------------------------------------------------- loops
    def train_epoch(self) -> float:
        cfg = self.cfg
        step0 = self.epoch * self.steps_per_epoch
        if cfg.shuffle:
            # permutation drawn on device — nothing uploaded per epoch
            all_starts, n_valid_vec = self._all_starts_plan(self.train_ds)
            idx_vec = jnp.arange(step0, step0 + n_valid_vec.shape[0])
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), self.epoch)
            self.params, self.opt_state, losses = self._train_epoch_shuffled(
                self.params, self.opt_state, self.gop, self.train_ds.series,
                all_starts, n_valid_vec, idx_vec, key)
            losses = np.asarray(jax.device_get(losses))
            weights = np.asarray(jax.device_get(n_valid_vec), dtype=np.float64)
            return float((losses * weights).sum() / weights.sum())
        starts_mat, n_valid_vec = self._epoch_plan(self.train_ds)
        idx_vec = jnp.arange(step0, step0 + starts_mat.shape[0])
        self.params, self.opt_state, losses = self._train_epoch_scanned(
            self.params, self.opt_state, self.gop, self.train_ds.series,
            starts_mat, n_valid_vec, idx_vec)
        losses = np.asarray(jax.device_get(losses))
        weights = np.asarray(jax.device_get(n_valid_vec), dtype=np.float64)
        return float((losses * weights).sum() / weights.sum())

    def validate(self) -> float:
        starts_mat, n_valid_vec = self._epoch_plan(self.val_ds)
        losses = np.asarray(jax.device_get(
            self._eval_scanned(self.params, self.gop, self.val_ds.series,
                               starts_mat, n_valid_vec)))
        weights = np.asarray(jax.device_get(n_valid_vec), dtype=np.float64)
        return float((losses * weights).sum() / weights.sum())

    def current_lr(self) -> float:
        return float(self.lr_schedule(self.epoch * self.steps_per_epoch))

    def fit(self, epochs: int | None = None, *, log: bool = True,
            profile_dir: str | None = None) -> dict:
        from stgcn_tpu.utils.profiling import profile

        cfg = self.cfg
        n_epochs = cfg.epochs if epochs is None else epochs
        history = []
        log_f = open(cfg.log_path, "a") if cfg.log_path else None
        try:
          with profile(profile_dir):
            while self.epoch < n_epochs:
                t0 = time.time()
                train_loss = self.train_epoch()
                val_loss = self.validate()
                dt = time.time() - t0
                lr = self.current_lr()
                self.epoch += 1
                rec = {"epoch": self.epoch, "lr": lr, "train_loss": train_loss,
                       "val_loss": val_loss, "epoch_time_s": dt,
                       "steps_per_s": self.steps_per_epoch / dt}
                history.append(rec)
                if log:
                    print(f"Epoch: {self.epoch:03d} | Lr: {lr:.20f} "
                          f"|Train loss: {train_loss:.6f} | Val loss: {val_loss:.6f} "
                          f"| {dt:.2f}s ({rec['steps_per_s']:.1f} steps/s)")
                if log_f:
                    log_f.write(json.dumps(rec) + "\n")
                    log_f.flush()
                self.es(val_loss)
                self._save_resume_state()
                if self.es.early_stop:
                    if log:
                        print("Early stopping")
                    break
        finally:
            if log_f:
                log_f.close()
        return {"history": history, "stopped_epoch": self.epoch}

    def test(self, *, use_best: bool = True, log: bool = True) -> dict:
        params = self.ckpt.restore_best(self.params) \
            if use_best and self.ckpt.has_best() else self.params
        starts_mat, n_valid_vec = self._epoch_plan(self.test_ds)
        losses = np.asarray(jax.device_get(
            self._eval_scanned(params, self.gop, self.test_ds.series,
                               starts_mat, n_valid_vec)))
        weights = np.asarray(jax.device_get(n_valid_vec), dtype=np.float64)
        mse = float((losses * weights).sum() / weights.sum())

        sums = self._metrics_scanned(
            params, self.gop, self.test_ds.series, starts_mat, n_valid_vec,
            jnp.asarray(self.scaler.mean_, jnp.float32),
            jnp.asarray(self.scaler.scale_, jnp.float32))
        s_abs, s_sq, s_ape, s_y, count = [float(s) for s in sums]
        mets = {"MAE": s_abs / count, "RMSE": (s_sq / count) ** 0.5,
                "WMAPE": s_abs / s_y, "MAPE": s_ape / count}
        if log:
            print(f"Dataset {self.cfg.dataset_name:s} | Test loss {mse:.6f} "
                  f"| MAE {mets['MAE']:.6f} | RMSE {mets['RMSE']:.6f} "
                  f"| WMAPE {mets['WMAPE']:.8f}")
        return {"test_mse": mse, **mets}

    # ----------------------------------------------------------- resume
    def _pytree_state(self) -> dict:
        return {"params": self.params, "opt_state": self.opt_state}

    def _save_resume_state(self) -> None:
        host = {"epoch": self.epoch, "es": self.es.state_dict(),
                "scaler_mean": np.asarray(self.scaler.mean_).tolist(),
                "scaler_scale": np.asarray(self.scaler.scale_).tolist()}
        self.ckpt.save_state(self._pytree_state(), host)

    def resume(self) -> bool:
        """Restore the latest full state; returns True if resumed."""
        if not self.ckpt.has_state():
            return False
        state, host = self.ckpt.restore_state(self._pytree_state())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.epoch = int(host["epoch"])
        self.es.load_state_dict(host["es"])
        self.es.on_improvement = lambda _vl: self.ckpt.save_best(self.params)
        return True
