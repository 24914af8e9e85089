"""DomainNorm2d parity against torch BatchNorm2d and a NumPy TransNorm oracle."""

import numpy as np
import torch

from uda_clr_tpu.models.norm import DomainNorm2d


def _init_and_apply(mode, x, train, domains=1, stats=None, mutable=True):
    import jax

    m = DomainNorm2d(features=x.shape[-1], mode=mode)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    if stats is not None:
        variables = {**variables, "batch_stats": stats}
    if mutable:
        y, updated = m.apply(variables, x, train=train, domains=domains, mutable=["batch_stats"])
        return np.asarray(y), jax.tree.map(np.asarray, updated["batch_stats"])
    y = m.apply(variables, x, train=train, domains=domains)
    return np.asarray(y), None


def test_bn_train_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 6, 5, 3), dtype=np.float32)
    got, stats = _init_and_apply("bn", x, train=True)

    bn = torch.nn.BatchNorm2d(3)
    bn.train()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["mean"], bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["var"], bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_bn_eval_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 5), dtype=np.float32)
    mean = rng.standard_normal(5).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 5).astype(np.float32)
    got, _ = _init_and_apply("bn", x, train=False, stats={"mean": mean, "var": var}, mutable=False)

    bn = torch.nn.BatchNorm2d(5)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    want = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bn_dual_domain_matches_separate_torch_forwards():
    """domains=2 == two torch forwards (target then source running update)."""
    rng = np.random.default_rng(2)
    xs = rng.standard_normal((3, 4, 4, 2), dtype=np.float32)
    xt = 2.0 + 0.5 * rng.standard_normal((3, 4, 4, 2)).astype(np.float32)
    x = np.concatenate([xs, xt], 0)
    got, stats = _init_and_apply("bn", x, train=True, domains=2)

    bn = torch.nn.BatchNorm2d(2)
    bn.train()
    yt = bn(torch.from_numpy(xt.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    ys = bn(torch.from_numpy(xs.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got[:3], ys, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[3:], yt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["mean"], bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["var"], bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def _numpy_transnorm_train(x, eps=1e-5):
    """Oracle for reference batchnorm.py:439-493 (biased norm, unbiased alpha)."""
    b = x.shape[0] // 2
    out = np.empty_like(x)
    stats = {}
    for name, sl in (("s", slice(0, b)), ("t", slice(b, None))):
        xi = x[sl]
        flat = xi.reshape(-1, xi.shape[-1])
        mu = flat.mean(0)
        var_b = flat.var(0)
        var_u = flat.var(0, ddof=1)
        out[sl] = (xi - mu) / np.sqrt(var_b + eps)
        stats[name] = (mu, var_u)
    mu_s, vu_s = stats["s"]
    mu_t, vu_t = stats["t"]
    dis = np.abs(mu_s / np.sqrt(vu_s + eps) - mu_t / np.sqrt(vu_t + eps))
    prob = 1.0 / (1.0 + dis)
    alpha = x.shape[-1] * prob / prob.sum()
    return out * (1.0 + alpha), stats


def test_transnorm_train_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    x = np.concatenate(
        [rng.standard_normal((2, 3, 3, 4)), 1.5 + rng.standard_normal((2, 3, 3, 4))], 0
    ).astype(np.float32)
    got, stats = _init_and_apply("tn", x, train=True)
    want, oracle_stats = _numpy_transnorm_train(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    mu_s, vu_s = oracle_stats["s"]
    np.testing.assert_allclose(stats["mean_source"], 0.1 * mu_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["var_source"], 0.9 + 0.1 * vu_s, rtol=1e-4, atol=1e-5)


def test_transnorm_train_odd_batch_uneven_halves():
    """Odd train batch: the reference's b//2 split is uneven (x[:b] source,
    x[b:] target — batchnorm.py:439-442); the NumPy oracle slices the same
    way, so it pins the fallback path exactly."""
    rng = np.random.default_rng(9)
    x = np.concatenate(
        [rng.standard_normal((2, 3, 3, 4)), 1.5 + rng.standard_normal((3, 3, 3, 4))], 0
    ).astype(np.float32)
    got, stats = _init_and_apply("tn", x, train=True)
    want, oracle_stats = _numpy_transnorm_train(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    mu_s, vu_s = oracle_stats["s"]
    mu_t, vu_t = oracle_stats["t"]
    np.testing.assert_allclose(stats["mean_source"], 0.1 * mu_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["var_source"], 0.9 + 0.1 * vu_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["mean_target"], 0.1 * mu_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["var_target"], 0.9 + 0.1 * vu_t, rtol=1e-4, atol=1e-5)


def test_transnorm_eval_uses_target_stats():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 3, 4)).astype(np.float32)
    st = {
        "mean_source": rng.standard_normal(4).astype(np.float32),
        "var_source": rng.uniform(0.5, 2, 4).astype(np.float32),
        "mean_target": rng.standard_normal(4).astype(np.float32),
        "var_target": rng.uniform(0.5, 2, 4).astype(np.float32),
    }
    got, _ = _init_and_apply("tn", x, train=False, stats=st, mutable=False)
    eps = 1e-5
    z = (x - st["mean_target"]) / np.sqrt(st["var_target"] + eps)
    dis = np.abs(
        st["mean_source"] / np.sqrt(st["var_source"] + eps)
        - st["mean_target"] / np.sqrt(st["var_target"] + eps)
    )
    prob = 1.0 / (1.0 + dis)
    alpha = 4 * prob / prob.sum()
    np.testing.assert_allclose(got, z * (1 + alpha), rtol=1e-4, atol=1e-4)


def test_stats_frozen_when_not_mutable():
    """Train-mode normalization without stat writes (MC-dropout passes)."""
    import jax

    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 3, 3, 2)).astype(np.float32)
    m = DomainNorm2d(features=2, mode="bn")
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=True)  # no mutable -> no writes, no error
    flat = x.reshape(-1, 2)
    want = (x - flat.mean(0)) / np.sqrt(flat.var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)
