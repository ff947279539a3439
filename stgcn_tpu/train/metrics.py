"""Loss and evaluation metrics.

Semantics mirror the reference exactly:

- training loss: per-batch mean MSE over ``[batch, V]`` predictions
  (`main.py:166-167`), with epoch aggregation weighted by batch size
  (`main.py:170-171`); padded tail-batch entries are masked out so the
  single-compile padded batching is bit-equivalent to the reference's
  ragged final batch.
- test metrics (`script/utility.py:103-121`): per-element accumulation over
  the whole split of MAE, RMSE, WMAPE (and MAPE, which the reference
  computes but comments out of the return — we return it too, per
  BASELINE.json's "MAE/RMSE/MAPE parity").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mse(pred: jax.Array, target: jax.Array, n_valid: jax.Array) -> jax.Array:
    """Mean squared error over the first ``n_valid`` rows of a padded batch.

    Equals ``nn.MSELoss()`` on the unpadded batch.
    """
    b = pred.shape[0]
    mask = (jnp.arange(b) < n_valid)[:, None].astype(pred.dtype)
    se = (pred - target) ** 2 * mask
    return se.sum() / (n_valid * pred.shape[1])


def batch_abs_stats(pred: jax.Array, target: jax.Array, n_valid: jax.Array):
    """Per-batch sums for metric accumulation (de-normalized inputs):
    (Σ|d|, Σd², Σ(|d|/y), Σy, count).

    DOCUMENTED DEVIATION (MAPE only): the reference divides by the raw
    target (`utility.py:113`), so a zero target yields inf/nan in its MAPE
    sum — but it also never *returns* MAPE (`utility.py:120-121` comments it
    out), so there is no observable reference behavior to match. We guard
    ``y == 0`` with 1.0 so the returned MAPE stays finite on synthetic or
    zero-speed data. MAE/RMSE/WMAPE — the declared parity triple — are
    unaffected.
    """
    b = pred.shape[0]
    mask = (jnp.arange(b) < n_valid)[:, None].astype(pred.dtype)
    d = jnp.abs(target - pred) * mask
    return (d.sum(), (d ** 2).sum(), (d / jnp.where(target == 0, 1.0, target) * mask).sum(),
            (target * mask).sum(), n_valid * pred.shape[1])


def evaluate_mse(apply_fn, dataset, batch_size: int) -> float:
    """Batch-size-weighted mean MSE over a split (`utility.py:90-101`)."""
    l_sum, n = 0.0, 0
    for starts, n_valid in dataset.batches(batch_size):
        l = apply_fn(starts, n_valid)
        l_sum += float(l) * n_valid
        n += n_valid
    return l_sum / n


def evaluate_metrics(predict_fn, dataset, scaler, batch_size: int) -> dict:
    """De-normalized MAE / RMSE / WMAPE / MAPE over a split
    (`utility.py:103-121`)."""
    mean = jnp.asarray(scaler.mean_)
    scale = jnp.asarray(scaler.scale_)
    s_abs = s_sq = s_ape = s_y = 0.0
    count = 0
    for starts, n_valid in dataset.batches(batch_size):
        pred, target = predict_fn(starts)
        pred = pred * scale + mean
        target = target * scale + mean
        a, sq, ape, ysum, cnt = batch_abs_stats(pred, target, jnp.asarray(n_valid))
        s_abs += float(a); s_sq += float(sq); s_ape += float(ape)
        s_y += float(ysum); count += int(cnt)
    return {
        "MAE": s_abs / count,
        "RMSE": (s_sq / count) ** 0.5,
        "WMAPE": s_abs / s_y,
        "MAPE": s_ape / count,
    }
