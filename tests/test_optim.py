"""Optimizer parity with torch.optim (Adam betas(0.9,0.99); SGD momentum
0.99 wd 5e-4 — the reference's generator/discriminator optimizers)."""

import numpy as np
import torch

from uda_clr_tpu.train import optim as optim_lib


def _run_jax(tx, params, grads_seq, lr):
    state = tx.init(params)
    p = params
    for g in grads_seq:
        updates, state = tx.update(g, state, p)
        p = optim_lib.apply_updates(p, updates, lr)
    return p


def test_adam_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=1e-3, betas=(0.9, 0.99))
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = optim_lib.adam_direction(0.9, 0.99)
    got = _run_jax(tx, {"w": w0}, [{"w": g} for g in grads], 1e-3)
    np.testing.assert_allclose(np.asarray(got["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_sgd_momentum_wd_matches_torch():
    rng = np.random.default_rng(1)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=2.5e-5, momentum=0.99, weight_decay=5e-4)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = optim_lib.sgd_direction(0.99, 5e-4)
    got = _run_jax(tx, {"w": w0}, [{"w": g} for g in grads], 2.5e-5)
    np.testing.assert_allclose(np.asarray(got["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_gen_lr_schedule():
    assert optim_lib.gen_lr_schedule(0, 1e-3) == 1e-3
    assert optim_lib.gen_lr_schedule(99, 1e-3) == 1e-3
    # the reference re-assigns 0.2*lr0 at every 100-epoch boundary (no
    # compounding — Trainer_prototype_full.py:637-640)
    assert optim_lib.gen_lr_schedule(100, 1e-3) == 0.2 * 1e-3
    assert optim_lib.gen_lr_schedule(450, 1e-3) == 0.2 * 1e-3
