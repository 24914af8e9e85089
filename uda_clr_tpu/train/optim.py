"""Optimizers with torch-parity semantics.

The reference uses Adam(lr 1e-3, betas (0.9, 0.99)) for the generator and
SGD(lr 2.5e-5, momentum 0.99, weight_decay 5e-4) for both discriminators
(train_use_fix_initial.py:210-226). We build the *direction* transforms
(no learning-rate scaling) and apply ``p -= lr * update`` in the train
step, so the reference's re-assignable LR schedule (``lr = 0.2 * lr0``
from epoch 100 on, Trainer_prototype_full.py:637-640) is a plain scalar
input to the jitted step — no retrace, no optax hyperparameter surgery.

torch parity notes:
  * Adam: update = m_hat / (sqrt(v_hat) + eps) — optax.scale_by_adam with
    eps outside the sqrt (eps_root=0) matches;
  * SGD(momentum, wd): g += wd * p, buf = mu * buf + g, update = buf —
    optax add_decayed_weights + trace(decay=mu) matches (dampening 0,
    no Nesterov).
"""

from __future__ import annotations

import jax
import optax


def adam_direction(b1: float = 0.9, b2: float = 0.99, eps: float = 1e-8):
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0)


def sgd_direction(momentum: float = 0.99, weight_decay: float = 5e-4):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
    )


def apply_updates(params, updates, lr):
    """p <- p - lr * update (lr may be a traced scalar)."""
    return jax.tree.map(lambda p, u: p - lr * u, params, updates)


def weight_ema(teacher_params, student_params, alpha: float):
    """Mean-teacher shadow update ``t = alpha*t + (1-alpha)*s``
    (reference WeightEMA, utils/Utils.py:335-348)."""
    import jax

    return jax.tree.map(lambda t, s: alpha * t + (1.0 - alpha) * s,
                        teacher_params, student_params)


def gen_lr_schedule(epoch: int, lr0: float, step_epochs: int = 100, rate: float = 0.2) -> float:
    """The reference's quirky non-compounding decay: the LR is re-assigned
    to ``rate * lr0`` at every 100-epoch boundary — i.e. constant ``lr0``
    before epoch 100 and constant ``rate*lr0`` after
    (Trainer_prototype_full.py:637-640). Host-side python (epoch is a
    python int between epochs)."""
    return lr0 if epoch < step_epochs else rate * lr0
