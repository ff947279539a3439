"""Optimizer trajectory parity vs the reference torch optimizers.

Each test runs N steps of the torch optimizer and of ours on identical
parameters/gradients and requires the parameter trajectories to match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stgcn_tpu.train import optim as opt_mod

torch = pytest.importorskip("torch")

SHAPES = [(5, 3), (7,), (2, 3, 4)]
N_STEPS = 12
LR, WD = 1e-2, 1e-3


def run_torch(opt_factory, grads_per_step, params0):
    ps = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params0]
    optimizer = opt_factory(ps)
    traj = []
    for grads in grads_per_step:
        optimizer.zero_grad()
        for p, g in zip(ps, grads):
            p.grad = torch.from_numpy(g.copy())
        optimizer.step()
        traj.append([p.detach().numpy().copy() for p in ps])
    return traj


def run_ours(tx, grads_per_step, params0):
    params = [jnp.asarray(p) for p in params0]
    state = tx.init(params)
    traj = []
    for grads in grads_per_step:
        updates, state = tx.update([jnp.asarray(g) for g in grads], state, params)
        params = optax.apply_updates(params, updates)
        traj.append([np.asarray(p) for p in params])
    return traj


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    params0 = [rng.standard_normal(s).astype(np.float32) for s in SHAPES]
    grads = [[rng.standard_normal(s).astype(np.float32) for s in SHAPES]
             for _ in range(N_STEPS)]
    return params0, grads


def assert_traj_close(ours, theirs, atol=1e-6):
    for step, (a, b) in enumerate(zip(ours, theirs)):
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=atol, rtol=1e-5,
                                       err_msg=f"step {step}")


def test_adamw_matches_torch(problem):
    params0, grads = problem
    theirs = run_torch(lambda ps: torch.optim.AdamW(ps, lr=LR, weight_decay=WD),
                       grads, params0)
    ours = run_ours(opt_mod.adamw(LR, weight_decay=WD), grads, params0)
    assert_traj_close(ours, theirs)


def test_nadamw_matches_torch(problem):
    params0, grads = problem
    theirs = run_torch(
        lambda ps: torch.optim.NAdam(ps, lr=LR, weight_decay=WD,
                                     decoupled_weight_decay=True),
        grads, params0)
    ours = run_ours(opt_mod.nadamw(LR, weight_decay=WD), grads, params0)
    assert_traj_close(ours, theirs)


def test_lion_matches_reference(problem, reference_modules):
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from script.opt import Lion  # type: ignore
    finally:
        sys.path.pop(0)
    params0, grads = problem
    theirs = run_torch(lambda ps: Lion(ps, lr=LR, weight_decay=WD), grads, params0)
    ours = run_ours(opt_mod.lion(LR, weight_decay=WD), grads, params0)
    assert_traj_close(ours, theirs)


def test_tiger_matches_reference_bug(problem, reference_modules):
    """The reference Tiger never persists momentum; ours reproduces that."""
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from script.opt import Tiger  # type: ignore
    finally:
        sys.path.pop(0)
    params0, grads = problem
    theirs = run_torch(lambda ps: Tiger(ps, lr=LR, weight_decay=WD), grads, params0)
    ours = run_ours(opt_mod.tiger(LR, weight_decay=WD), grads, params0)
    assert_traj_close(ours, theirs)


def test_tiger_fixed_differs_from_buggy(problem):
    params0, grads = problem
    buggy = run_ours(opt_mod.tiger(LR, weight_decay=WD), grads, params0)
    fixed = run_ours(opt_mod.tiger_fixed(LR, weight_decay=WD), grads, params0)
    assert not np.allclose(buggy[-1][0], fixed[-1][0])


def test_step_lr_schedule():
    """StepLR(step_size=10, gamma=0.95) stepped per epoch (`main.py:156`)."""
    sched = opt_mod.make_step_lr(1e-3, step_size=10, gamma=0.95, steps_per_epoch=7)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(9 * 7 + 6)) == pytest.approx(1e-3)       # epoch 9
    assert float(sched(10 * 7)) == pytest.approx(1e-3 * 0.95)   # epoch 10
    assert float(sched(25 * 7)) == pytest.approx(1e-3 * 0.95 ** 2)


def test_make_optimizer_dispatch():
    for name in ["adamw", "nadamw", "lion", "tiger", "tiger_fixed"]:
        tx = opt_mod.make_optimizer(name, lr=1e-3, weight_decay=1e-3)
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
        assert jnp.isfinite(updates["w"]).all()
    with pytest.raises(ValueError):
        opt_mod.make_optimizer("sgd", lr=1e-3, weight_decay=0.0)
