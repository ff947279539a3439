"""Native optimizers and LR schedules.

Hand-rolled optax-style transformations whose update rules are *exactly*
the reference's (same order of decay/update, same bias corrections), so a
fixed-seed training trajectory is comparable step-for-step:

- ``adamw``  — torch ``optim.AdamW`` semantics (`main.py:148`)
- ``nadamw`` — torch ``optim.NAdam(decoupled_weight_decay=True)``
  (`main.py:150`), including torch's ``momentum_decay`` μ-product schedule
- ``lion``   — the reference's custom Lion (`script/opt.py:10-76`)
- ``tiger``  — the reference's Tiger (`script/opt.py:79-145`). The reference
  version never writes the momentum buffer back (a latent bug: ``exp_avg``
  stays zero, reducing it to sign-SGD); ``tiger_fixed`` implements the
  intended rule. ``tiger`` reproduces the buggy reference semantics for
  completeness and is documented as such.
- ``make_step_lr`` — ``StepLR(step_size, gamma)`` stepped once per epoch
  (`main.py:156,172`)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Params
    nu: optax.Params


def adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-3):
    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdamState(jnp.zeros([], jnp.int32), zeros,
                                jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate

        def delta(m, v, p):
            step = (m / c1) / (jnp.sqrt(v / c2) + eps)
            return -lr * (step + weight_decay * p)

        return jax.tree.map(delta, mu, nu, params), ScaleByAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class ScaleByNAdamState(NamedTuple):
    count: jax.Array
    mu_prod: jax.Array
    mu: optax.Params
    nu: optax.Params


def nadamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-3,
           momentum_decay=4e-3):
    """torch NAdam with decoupled weight decay, μ-product schedule included."""

    def init(params):
        return ScaleByNAdamState(jnp.zeros([], jnp.int32), jnp.ones([], jnp.float32),
                                 jax.tree.map(jnp.zeros_like, params),
                                 jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu_t = b1 * (1 - 0.5 * 0.96 ** (t * momentum_decay))
        mu_next = b1 * (1 - 0.5 * 0.96 ** ((t + 1) * momentum_decay))
        mu_prod = state.mu_prod * mu_t
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        c2 = 1 - b2 ** t
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate

        def delta(g, m, v, p):
            denom = jnp.sqrt(v / c2) + eps
            step = ((1 - mu_t) / (1 - mu_prod)) * g / denom \
                 + (mu_next / (1 - mu_prod * mu_next)) * m / denom
            return -lr * (step + weight_decay * p)

        return (jax.tree.map(delta, grads, mu, nu, params),
                ScaleByNAdamState(count, mu_prod, mu, nu))

    return optax.GradientTransformation(init, update)


class ScaleByLionState(NamedTuple):
    count: jax.Array
    mu: optax.Params


def lion(learning_rate, b1=0.9, b2=0.99, weight_decay=1e-3,
         mu_dtype=None):
    """Sign-momentum Lion, reference order: decay → sign step → momentum
    update (`opt.py:56,69-74`). ``mu_dtype`` stores the momentum in a
    narrower dtype (bf16 halves optimizer state — the sign nonlinearity
    makes Lion famously tolerant of low-precision momentum; used by the
    1M-vertex single-chip config where f32 momentum alone is 2 GB)."""

    def init(params):
        return ScaleByLionState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(lambda p: jnp.zeros_like(
                p, dtype=mu_dtype or p.dtype), params))

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate

        def delta(g, m, p):
            return -lr * (jnp.sign(b1 * m.astype(g.dtype) + (1 - b1) * g)
                          + weight_decay * p)

        mu = jax.tree.map(
            lambda m, g: (b2 * m.astype(g.dtype)
                          + (1 - b2) * g).astype(m.dtype),
            state.mu, grads)
        return jax.tree.map(delta, grads, state.mu, params), ScaleByLionState(count, mu)

    return optax.GradientTransformation(init, update)


def tiger(learning_rate, beta=0.965, weight_decay=1e-3, *, fixed=False):
    """Tiger (`opt.py:79-145`). The reference never updates ``exp_avg``
    (momentum stays zero ⇒ sign-SGD); ``fixed=True`` applies the intended
    EMA update."""

    def init(params):
        return ScaleByLionState(jnp.zeros([], jnp.int32),
                                jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate

        def delta(g, m, p):
            return -lr * (jnp.sign(beta * m + (1 - beta) * g) + weight_decay * p)

        if fixed:
            mu = jax.tree.map(lambda m, g: beta * m + (1 - beta) * g, state.mu, grads)
        else:
            mu = state.mu  # reference bug preserved: exp_avg never written back
        return jax.tree.map(delta, grads, state.mu, params), ScaleByLionState(count, mu)

    return optax.GradientTransformation(init, update)


def tiger_fixed(learning_rate, beta=0.965, weight_decay=1e-3):
    return tiger(learning_rate, beta, weight_decay, fixed=True)


OPTIMIZERS = {"adamw": adamw, "nadamw": nadamw, "lion": lion, "tiger": tiger,
              "tiger_fixed": tiger_fixed}


def make_step_lr(base_lr: float, step_size: int, gamma: float, steps_per_epoch: int):
    """StepLR stepped per epoch, expressed as a per-step schedule."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * gamma ** jnp.asarray(epoch // step_size, jnp.float32)

    return schedule


def make_optimizer(name: str, *, lr, weight_decay: float) -> optax.GradientTransformation:
    """Optimizer factory with the reference's dispatch table
    (`main.py:147-154`, extended with tiger/tiger_fixed)."""
    try:
        factory = OPTIMIZERS[name]
    except KeyError:
        raise ValueError(f"the {name!r} optimizer is undefined; "
                         f"expected one of {sorted(OPTIMIZERS)}") from None
    return factory(lr, weight_decay=weight_decay)
