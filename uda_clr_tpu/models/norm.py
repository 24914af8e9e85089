"""Domain-aware batch normalization for TPU data-parallel training.

Re-implements the two normalization behaviours of the reference:

* ``mode='bn'`` — plain BatchNorm2d (reference wires this when
  ``sync_bn=True``: networks/deeplabv3.py:17-20). With ``domains=2`` the
  batch is treated as a source‖target concat and each half is normalized
  with its own batch statistics, reproducing the reference's *separate*
  per-domain forwards (train_process/Trainer_prototype_full.py:287-288)
  in one fused pass; running stats are updated target-then-source to match
  the reference call order.

* ``mode='tn'`` — TransNorm ("Transferable Normalization", reference
  networks/sync_batchnorm/batchnorm.py:390-521): per-domain running
  statistics with shared gamma/beta, plus a detached channel
  transferability residual ``z * (1 + alpha)`` where
  ``alpha = C * p / sum(p)``, ``p = 1/(1 + |mu_s/sigma_s - mu_t/sigma_t|)``.
  Training always splits the batch in half (source first); eval normalizes
  with the *target* running stats and computes alpha from running stats.

Cross-replica ("sync") BN is not a separate implementation: batches are
sharded over the ``data`` axis of a `jax.sharding.Mesh`, so the batch-mean /
batch-variance reductions below become global cross-chip reductions — XLA
inserts the ``all-reduce`` over ICI automatically under jit/GSPMD. This
subsumes the reference's dormant thread-pipe SyncMaster scaffolding
(networks/sync_batchnorm/comm.py) with zero code.

Parity notes (torch semantics reproduced exactly, in fp32):
  * normalization uses **biased** batch variance; running-var updates use the
    **unbiased** estimate (factor n/(n-1)), momentum 0.1:
    ``r_new = (1-m) * r + m * stat``;
  * TransNorm's alpha distance uses the **unbiased** variance
    (``torch.var`` default — batchnorm.py:473-482);
  * alpha is stop-gradiented (``alpha.detach()`` — batchnorm.py:493).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _batch_moments(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """Mean and biased variance over all axes except the trailing channel.

    (A matmul-form reduction over a flattened [M, C] view was tried and
    measured SLOWER end-to-end: the reshape from XLA's chosen activation
    layouts forces materialized transposes that outweigh the reduce-fusion
    inefficiency. The straightforward convert-reduce fuses with the
    producer and wins. A Pallas streaming-moments kernel was also built
    and A/B'd on real v5e hardware — 110.0 vs 109.5 ms/step, a wash — and
    retired in round 3; see PARITY.md "Kernel-backend A/B".)"""
    reduce_axes = tuple(range(x.ndim - 1))
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=reduce_axes)
    # E[x^2] - E[x]^2 cancels catastrophically for near-constant channels
    # (flat image regions) and can go slightly NEGATIVE in fp32, which
    # would NaN the rsqrt; clamp at 0 (torch's two-pass var is >= 0 by
    # construction).
    var = jnp.maximum(jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(mean), 0.0)
    return mean, var, n


def _normalize(x, mean, var, scale, bias, eps):
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * (inv * scale).astype(x.dtype) + bias.astype(x.dtype)


class DomainNorm2d(nn.Module):
    """BatchNorm2d / TransNorm with optional source‖target domain split.

    Input layout: ``[..., H, W, C]`` with the batch as the leading axis.
    ``domains=2`` interprets the batch as ``[source; target]`` halves.
    ``domains=0`` (train only) is the MC-degenerate mode: the batch stands
    for an identical-halves ``[T;T]`` repeat, for which TransNorm reduces
    exactly to batch-moment normalization times 2 (see the tn branch); for
    ``bn`` it is identical to ``domains=1``.
    Running statistics live in the ``batch_stats`` collection and are only
    written when that collection is mutable (so MC-dropout forwards can run
    in train-mode normalization without perturbing the stats — a deliberate
    deviation from the reference, which lets its no-grad rectification
    forwards drift the running stats: Trainer_prototype_full.py:358-368).
    """

    features: int
    mode: str = "bn"  # 'bn' | 'tn'
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, domains: int = 1) -> jnp.ndarray:
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)

        if self.mode == "tn":
            mean_s = self.variable("batch_stats", "mean_source", jnp.zeros, (f,), jnp.float32)
            var_s = self.variable("batch_stats", "var_source", jnp.ones, (f,), jnp.float32)
            mean_t = self.variable("batch_stats", "mean_target", jnp.zeros, (f,), jnp.float32)
            var_t = self.variable("batch_stats", "var_target", jnp.ones, (f,), jnp.float32)
        else:
            mean_r = self.variable("batch_stats", "mean", jnp.zeros, (f,), jnp.float32)
            var_r = self.variable("batch_stats", "var", jnp.ones, (f,), jnp.float32)

        writable = self.is_mutable_collection("batch_stats") and not self.is_initializing()
        m = self.momentum

        def ema(old, new):
            return (1.0 - m) * old + m * new

        if self.mode == "tn":
            if train and domains == 0:
                # MC-degenerate mode (identical-halves repeated batch):
                # the reference's rectification forwards feed TransNorm a
                # [T;T] 2x-repeated target batch
                # (Trainer_prototype_full.py:358-368), so both halves are
                # bitwise identical up to the first dropout site — the
                # per-half moments coincide, dis == 0 exactly, prob == 1,
                # alpha == C * (1/C) == 1, and the layer reduces EXACTLY to
                # "normalize with own batch moments, times 2". Computing
                # that directly at batch B lets the MC fast path share one
                # deterministic prefix instead of re-running the repeated
                # 2B batch per sample (steps._mc_dropout_forward). Never
                # writes running stats (the MC pass is stat-isolated).
                mu, v, _ = _batch_moments(x)
                return _normalize(x, mu, v, scale * 2.0, bias * 2.0, self.eps)
            if train and x.shape[0] % 2:
                # Odd batch (API edge; every shipped train flow feeds even
                # [S;T]/[T;T] batches): the reference's b//2 split is
                # UNEVEN — x[:b] source, x[b:] target (batchnorm.py:439-442)
                # — so reproduce it with the slice form and per-half
                # unbiased factors. Perf is irrelevant off the hot path.
                b = x.shape[0] // 2
                mu_sb, v_sb, n_s = _batch_moments(x[:b])
                mu_tb, v_tb, n_t = _batch_moments(x[b:])
                ub_s = n_s / max(n_s - 1, 1)
                ub_t = n_t / max(n_t - 1, 1)
                if writable:
                    mean_s.value = ema(mean_s.value, mu_sb)
                    var_s.value = ema(var_s.value, v_sb * ub_s)
                    mean_t.value = ema(mean_t.value, mu_tb)
                    var_t.value = ema(var_t.value, v_tb * ub_t)
                dis = jnp.abs(
                    mu_sb * jax.lax.rsqrt(v_sb * ub_s + self.eps)
                    - mu_tb * jax.lax.rsqrt(v_tb * ub_t + self.eps)
                )
                prob = 1.0 / (1.0 + dis)
                a1 = jax.lax.stop_gradient(1.0 + f * prob / jnp.sum(prob))
                return jnp.concatenate(
                    [
                        _normalize(x[:b], mu_sb, v_sb, scale * a1, bias * a1, self.eps),
                        _normalize(x[b:], mu_tb, v_tb, scale * a1, bias * a1, self.eps),
                    ],
                    axis=0,
                )
            if train:
                # TransNorm always splits the batch in half, source first
                # (batchnorm.py:439-442), regardless of `domains`.
                # Formulated as a [2, b, ...] reshape + broadcast (like the
                # bn domains=2 branch below) so XLA keeps whole-tensor op
                # granularity: one fused moment reduction and one fused
                # affine instead of slice/normalize/concat per layer.
                b = x.shape[0] // 2
                x2 = x.reshape(2, b, *x.shape[1:])
                x32 = x2.astype(jnp.float32)
                reduce_axes = tuple(range(1, x2.ndim - 1))
                n = b
                for a in x.shape[1:-1]:
                    n *= a
                mu2 = jnp.mean(x32, axis=reduce_axes)  # [2, C]
                v2 = jnp.maximum(
                    jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(mu2), 0.0
                )
                unbias = n / max(n - 1, 1)
                if writable:
                    mean_s.value = ema(mean_s.value, mu2[0])
                    var_s.value = ema(var_s.value, v2[0] * unbias)
                    mean_t.value = ema(mean_t.value, mu2[1])
                    var_t.value = ema(var_t.value, v2[1] * unbias)
                # alpha from *unbiased* batch variance (torch.var default).
                invu = jax.lax.rsqrt(v2 * unbias + self.eps)
                dis = jnp.abs(mu2[0] * invu[0] - mu2[1] * invu[1])
                prob = 1.0 / (1.0 + dis)
                # z * (1 + alpha) with (1 + alpha) FOLDED into the affine:
                # (x-mu)*inv*scale*(1+a) + bias*(1+a) — alpha is detached
                # (batchnorm.py:493) so gradients are unchanged, and the
                # fold removes a full-tensor multiply per layer.
                a1 = jax.lax.stop_gradient(1.0 + f * prob / jnp.sum(prob))  # [C]
                bshape = (2,) + (1,) * (x2.ndim - 2) + (f,)
                inv2 = jax.lax.rsqrt(v2 + self.eps)
                z = (
                    x2 - mu2.reshape(bshape).astype(x.dtype)
                ) * (inv2 * (scale * a1)).reshape(bshape).astype(x.dtype) \
                    + (bias * a1).astype(x.dtype)
                return z.reshape(x.shape)
            dis = jnp.abs(
                mean_s.value * jax.lax.rsqrt(var_s.value + self.eps)
                - mean_t.value * jax.lax.rsqrt(var_t.value + self.eps)
            )
            prob = 1.0 / (1.0 + dis)
            a1 = jax.lax.stop_gradient(1.0 + f * prob / jnp.sum(prob))
            return _normalize(x, mean_t.value, var_t.value, scale * a1, bias * a1,
                              self.eps)

        # --- plain BN ---
        if not train:
            return _normalize(x, mean_r.value, var_r.value, scale, bias, self.eps)

        if domains <= 1:
            mu, v, n = _batch_moments(x)
            z = _normalize(x, mu, v, scale, bias, self.eps)
            if writable:
                unbias = n / max(n - 1, 1)
                mean_r.value = ema(mean_r.value, mu)
                var_r.value = ema(var_r.value, v * unbias)
            return z

        # domains == 2: per-half batch stats (separate-forward semantics),
        # running stats updated target-then-source like the reference's
        # sequential T-forward, S-forward call order. Formulated as a
        # [2, b, ...] reshape + broadcast instead of slice/normalize/concat
        # so XLA keeps whole-tensor op granularity across the ~60 norm
        # layers (the halves share every fusion instead of splitting it).
        b = x.shape[0] // 2
        x2 = x.reshape(2, b, *x.shape[1:])
        x32 = x2.astype(jnp.float32)
        reduce_axes = tuple(range(1, x2.ndim - 1))
        n = b
        for a in x.shape[1:-1]:
            n *= a
        mu2 = jnp.mean(x32, axis=reduce_axes)  # [2, C]
        v2 = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(mu2), 0.0
        )
        bshape = (2,) + (1,) * (x2.ndim - 2) + (x2.shape[-1],)
        inv2 = jax.lax.rsqrt(v2 + self.eps)
        z = (
            x2 - mu2.reshape(bshape).astype(x.dtype)
        ) * (inv2 * scale).reshape(bshape).astype(x.dtype) + bias.astype(x.dtype)
        if writable:
            unbias = n / max(n - 1, 1)
            mean_r.value = ema(ema(mean_r.value, mu2[1]), mu2[0])
            var_r.value = ema(ema(var_r.value, v2[1] * unbias), v2[0] * unbias)
        return z.reshape(x.shape)
