"""uint8 wire format (data/wire.py): bit-exactness vs the fp32 contract.

The wire format ships uint8 batches host->device and decodes on device;
these tests pin that the decode is EXACTLY the fp32 pipeline — transforms,
steps, and a full trainer epoch produce bit-identical numbers either way.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from uda_clr_tpu.config import Config
from uda_clr_tpu.data import wire
from uda_clr_tpu.data.synthetic import SyntheticFundus
from uda_clr_tpu.data.transforms import eval_transforms, train_transforms

KEYS = ("image", "map", "boundary")


def _sample(transform, seed=3):
    ds = SyntheticFundus(1, 92, seed=7, transform=transform)
    return ds.get(0, np.random.default_rng(seed))


@pytest.mark.parametrize("builder", [train_transforms, eval_transforms])
def test_transform_wire_bit_exact(builder):
    s_f32 = _sample(builder(64, wire="f32"))
    s_u8 = _sample(builder(64, wire="u8"))
    for k in KEYS:
        assert s_u8[k].dtype == np.uint8, k
        np.testing.assert_array_equal(
            wire.decode_array(k, s_u8[k]), s_f32[k], err_msg=k
        )
        assert wire.decode_array(k, s_u8[k]).dtype == np.float32


def test_encode_decode_roundtrip():
    s_f32 = _sample(train_transforms(64, wire="f32"))
    for k in KEYS:
        enc = wire.encode_array(k, s_f32[k])
        assert enc.dtype == np.uint8
        np.testing.assert_array_equal(wire.decode_array(k, enc), s_f32[k])


def test_decode_batch_passthrough():
    """fp32 arrays and non-batch keys cross decode_batch untouched."""
    import jax.numpy as jnp

    x = jnp.ones((2, 4, 4, 3), jnp.float32)
    out = wire.decode_batch({"image_s": x, "consistency_weight": 0.5})
    assert out["image_s"] is x
    assert out["consistency_weight"] == 0.5


def _wire_batch(batch, to_u8: bool):
    if not to_u8:
        return batch
    return {k: wire.encode_array(k, v) for k, v in batch.items()}


def _host_batch(n=2, size=48, seed=0):
    ds_s = SyntheticFundus(n, size + 24, seed=1, transform=train_transforms(size))
    ds_t = SyntheticFundus(n, size + 24, seed=2, transform=train_transforms(size))
    rngs = [np.random.default_rng((seed, j)) for j in range(n)]
    bs = [ds_s.get(i, rngs[i]) for i in range(n)]
    bt = [ds_t.get(i, rngs[i]) for i in range(n)]
    return {
        "image_s": np.stack([s["image"] for s in bs]),
        "map_s": np.stack([s["map"] for s in bs]),
        "boundary_s": np.stack([s["boundary"] for s in bs]),
        "image_t": np.stack([s["image"] for s in bt]),
    }


def test_train_step_wire_equivalence():
    """One fused train step on a u8-encoded batch == the same step on the
    fp32 batch, bit-for-bit (metrics and updated params)."""
    import jax

    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step

    cfg = Config()
    cfg.method.method = "baseline"
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    batch = _host_batch()
    state0 = create_train_state(model, jax.random.PRNGKey(0), (2, 48, 48, 3))
    step = make_train_step(model, cfg, "baseline")

    outs = {}
    for tag, to_u8 in (("f32", False), ("u8", True)):
        st, metrics = step(dict_state(state0), _wire_batch(batch, to_u8),
                           1e-3, 2.5e-5, 1)
        viz = metrics.pop("_viz", None)
        outs[tag] = (st, {k: float(v) for k, v in metrics.items()}, viz)

    assert outs["f32"][1] == outs["u8"][1]
    if outs["f32"][2] is not None:
        for a, b in zip(jax.tree_util.tree_leaves(outs["f32"][2]),
                        jax.tree_util.tree_leaves(outs["u8"][2])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    leaves_f = jax.tree_util.tree_leaves(outs["f32"][0].gen_params)
    leaves_u = jax.tree_util.tree_leaves(outs["u8"][0].gen_params)
    for a, b in zip(leaves_f, leaves_u):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def dict_state(state):
    """Fresh copy so donated buffers from a previous call can't alias."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.copy, state)


def test_eval_step_wire_equivalence():
    import jax

    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_eval_step

    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    state = create_train_state(model, jax.random.PRNGKey(0), (2, 48, 48, 3))
    variables = {"params": state.gen_params, "batch_stats": state.gen_stats}
    batch = _host_batch()
    step = make_eval_step(model)

    logits_f, _, loss_f = step(variables, batch["image_s"], batch["map_s"])
    logits_u, _, loss_u = step(
        variables,
        wire.encode_array("image", batch["image_s"]),
        wire.encode_array("map", batch["map_s"]),
    )
    np.testing.assert_array_equal(np.asarray(logits_f), np.asarray(logits_u))
    np.testing.assert_array_equal(np.asarray(loss_f), np.asarray(loss_u))


def test_trainer_epoch_wire_trajectory_exact(tmp_path):
    """A full trainer epoch + validation with cfg.data.wire='u8' is
    trajectory-exact with the fp32 run (same seeds, same synthetic data):
    identical train metrics and identical validation Dice."""
    from uda_clr_tpu.train.trainer import Trainer

    results = {}
    for w in ("f32", "u8"):
        cfg = Config()
        cfg.model.output_stride = 16
        cfg.data.synthetic = True
        cfg.data.synthetic_size = 4
        cfg.data.image_size = 64
        cfg.data.batch_size = 4
        cfg.data.num_workers = 1
        cfg.data.wire = w
        cfg.method.method = "baseline"
        cfg.run.out_dir = str(tmp_path / f"wire_{w}")
        cfg.run.max_epoch = 1
        cfg.run.interval_validate = 1
        cfg.run.seed = 0
        tr = Trainer(cfg)
        m = tr.train_epoch()
        val = tr.validate()
        results[w] = (m, val)

    m_f, val_f = results["f32"]
    m_u, val_u = results["u8"]
    assert m_f == m_u
    assert val_f == val_u


def test_unknown_uint8_key_raises():
    """uint8 under an unknown key must fail loudly (decode would otherwise
    silently pass 0..255 values into a loss); the known-key table covers
    the full _s/_t families."""
    from uda_clr_tpu.data import wire

    with pytest.raises(KeyError, match="weird_key"):
        wire.decode_array("weird_key", np.zeros((2, 2), np.uint8))
    with pytest.raises(KeyError, match="weird_key"):
        wire.decode_batch({"weird_key": jnp.zeros((2, 2), jnp.uint8)})
    # ...and boundary_t is a known key, symmetric with map_t
    out = wire.decode_array("boundary_t", np.array([255, 0], np.uint8))
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, [1.0, 0.0])
