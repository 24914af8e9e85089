"""Serving-artifact export/reload round-trips (uda_clr_tpu.tools.export).

The artifact must be callable WITHOUT the model object — only the
deserialized ``jax.export.Exported`` — and must reproduce the live eval
forward bit-for-bit (fp32, CPU), including the uint8 wire decode and a
symbolic (polymorphic) batch dimension.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.tools import export as export_lib

SIZE = 48


def _tiny_model(norm="bn"):
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm=norm)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    return model, variables


@pytest.fixture(scope="module")
def tiny_bn():
    return _tiny_model("bn")


def test_export_reload_bit_exact_and_batch_polymorphic(tiny_bn, tmp_path):
    model, variables = tiny_bn
    exported = export_lib.export_serving(model, variables, SIZE,
                                         wire="f32", platforms=("cpu",))
    path = str(tmp_path / "m.uda.stablehlo")
    nbytes = export_lib.save_artifact(exported, path, {"wire": "f32"})
    assert nbytes > 1000

    meta, exp2 = export_lib.load_artifact(path)
    assert meta == {"wire": "f32"}

    rng = np.random.default_rng(0)
    live = jax.jit(export_lib.make_serving_fn(model, variables, wire="f32"))
    # one artifact, two batch sizes: the batch dim is symbolic
    for b in (1, 3):
        x = rng.uniform(-1, 1, (b, SIZE, SIZE, 3)).astype(np.float32)
        got = exp2.call(x)
        want = live(x)
        assert set(got) == {"mask_probs", "boundary_probs"}
        assert got["mask_probs"].shape == (b, SIZE, SIZE, 2)
        assert got["boundary_probs"].shape == (b, SIZE, SIZE, 1)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]))
        # probabilities, not logits
        assert float(jnp.min(got["mask_probs"])) >= 0.0
        assert float(jnp.max(got["mask_probs"])) <= 1.0


def test_export_u8_wire_matches_f32_path(tiny_bn, tmp_path):
    """uint8-input artifact == f32 artifact fed the decoded image (the
    device decode is bit-exact; data/wire.py contract)."""
    from uda_clr_tpu.data import wire as wire_lib

    model, variables = tiny_bn
    exp_u8 = export_lib.export_serving(model, variables, SIZE,
                                       wire="u8", platforms=("cpu",))
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8)
    got = exp_u8.call(raw)

    live = jax.jit(export_lib.make_serving_fn(model, variables, wire="f32"))
    want = live(wire_lib.decode_array("image", raw))
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def test_export_tn_uses_target_stats(tmp_path):
    """TransNorm eval normalizes with TARGET running stats + running-stat
    alpha (batchnorm.py:494-521); the artifact must capture that branch."""
    model, variables = _tiny_model("tn")
    # make source/target stats visibly different so a wrong branch shows
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])

    def bump(d):
        for k, v in d.items():
            if isinstance(v, dict):
                bump(v)
            elif k.startswith("mean_source"):
                d[k] = v + 3.0
        return d

    variables = {"params": variables["params"],
                 "batch_stats": bump(jax.tree.map(np.asarray, stats))}
    exported = export_lib.export_serving(model, variables, SIZE,
                                         wire="f32", platforms=("cpu",))
    x = np.random.default_rng(2).uniform(-1, 1, (1, SIZE, SIZE, 3)).astype(np.float32)
    got = exported.call(x)
    want = jax.jit(export_lib.make_serving_fn(model, variables, wire="f32"))(x)
    np.testing.assert_array_equal(np.asarray(got["mask_probs"]),
                                  np.asarray(want["mask_probs"]))


def test_export_cli_selftest(tmp_path, capsys):
    out = str(tmp_path / "cli.uda.stablehlo")
    export_lib.main(["--out", out, "--image-size", str(SIZE),
                     "--platforms", "cpu", "--selftest"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["out"] == out
    assert rec["input"]["dtype"] == "float32"
    meta, exp = export_lib.load_artifact(out)
    assert meta["platforms"] == ["cpu"]
    y = exp.call(np.zeros((1, SIZE, SIZE, 3), np.float32))
    assert y["mask_probs"].shape == (1, SIZE, SIZE, 2)


def test_load_artifact_rejects_garbage(tmp_path):
    pth = tmp_path / "junk.bin"
    pth.write_bytes(b"NOPE" + b"\0" * 16)
    with pytest.raises(ValueError, match="not a UDA serving artifact"):
        export_lib.load_artifact(str(pth))
