"""CLI surface tests (uda_clr_tpu/cli.py, mirrored by the repo-root
train.py shim). Guards the reference flag mapping
(train_use_fix_initial.py:24-127) and the package entry point."""

import glob
import os

import pytest

from uda_clr_tpu.cli import build_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_match_reference_surface():
    cfg = build_config([])
    assert cfg.method.method == "prototype_full"
    assert cfg.data.batch_size == 8
    assert cfg.data.image_size == 512
    assert cfg.optim.lr_gen == 1e-3
    assert cfg.optim.lr_dis == 2.5e-5
    assert cfg.optim.sgd_momentum == 0.99
    assert cfg.method.warmup_epoch == 25
    assert cfg.method.use_pid and cfg.method.retrify_pseudo
    # reference run-dir naming convention (train_use_fix_initial.py:131-137)
    assert cfg.run.out_dir.startswith("runs/Drishti-GS/prototype_full/")


def test_flag_overrides_and_negations():
    cfg = build_config([
        "--method", "baseline", "--no-pid", "--no-retrify", "--use_TN",
        "--bf16", "--image-size", "64", "--out", "/tmp/x",
    ])
    assert cfg.method.method == "baseline"
    assert not cfg.method.use_pid and not cfg.method.retrify_pseudo
    assert cfg.model.norm == "tn"
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.data.image_size == 64
    assert cfg.run.out_dir == "/tmp/x"


def test_train_py_shim_reexports():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_shim", os.path.join(REPO, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import uda_clr_tpu.cli as cli

    assert mod.main is cli.main and mod.build_config is cli.build_config


def test_packaged_extension_loads_via_ctypes():
    """The setuptools-built extension (setup.py, `build_ext --inplace`)
    must be ctypes-loadable through the UDA_CLR_NATIVE_LIB override —
    the installed-mode path of data/native.py:_candidate_paths."""
    sos = glob.glob(os.path.join(REPO, "uda_clr_tpu", "data", "_fundus_aug*.so"))
    if not sos:
        pytest.skip("extension not built (python setup.py build_ext --inplace)")
    import ctypes

    lib = ctypes.CDLL(sos[0])
    assert hasattr(lib, "fundus_elastic")
