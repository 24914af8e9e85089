"""Shared harness for the long-horizon training-dynamics tools
(tools/longrun_parity*.py and tools/longrun_chaos_control.py).

Both tools must train THE SAME setup — identical torch-initialized
converted weights (incl. the logit-spread trick on the mask head, see
tests/test_step_parity.py:87-94), identical synthetic data streams
(seeds 1/2/3, loader seeds 0/1), identical config — or the chaos
control stops being a control for the parity run. Centralizing the
construction keeps that alignment true by construction.
"""

from __future__ import annotations

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_ref import TorchDeepLab
from tests.torch_step_ref import TorchPatchDiscriminator
from uda_clr_tpu.config import Config
from uda_clr_tpu.convert.torch_import import (
    convert_deeplab_state_dict,
    convert_discriminator_state_dict,
)
from uda_clr_tpu.data.pipeline import BatchLoader
from uda_clr_tpu.data.synthetic import SyntheticFundus
from uda_clr_tpu.data.transforms import eval_transforms, train_transforms
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.utils.metrics import dice_coeff_2label


def zero_torch_dropout(model) -> None:
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def to_nchw(x) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def build_torch_side(zero_dropout: bool = True):
    """Seeded torch generator + discriminators with the logit-spread init
    (pseudo-labels straddle the 0.75 threshold from iteration 0; the
    reference warm-starts from a BEAL checkpoint with the same property)."""
    torch.manual_seed(0)
    tm = TorchDeepLab(num_classes=2, output_stride=16)
    tm.train()
    if zero_dropout:
        zero_torch_dropout(tm)
    with torch.no_grad():
        tm.decoder.last_conv[3].weight.mul_(10.0)
        tm.decoder.last_conv[3].bias.mul_(10.0)
    tdis, tdis2 = TorchPatchDiscriminator(1), TorchPatchDiscriminator(2)
    tdis.train(), tdis2.train()
    return tm, tdis, tdis2


def convert_to_jax(tm, tdis, tdis2):
    """Converted-weight pytrees: (gen_params, gen_stats, dis_params, dis2_params)."""
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    gen_params, gen_stats = convert_deeplab_state_dict(sd, output_stride=16)
    dis_params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in tdis.state_dict().items()})
    dis2_params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in tdis2.state_dict().items()})
    return gen_params, gen_stats, dis_params, dis2_params


def build_config(mc_samples: int, mc_fast: bool = True) -> Config:
    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = mc_samples
    cfg.method.mc_fast = mc_fast
    cfg.method.rng_impl = "threefry2x32"
    return cfg


def build_model() -> DeepLab:
    return DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")


def train_streams(size: int, batch: int, n_data: int = 24):
    """Fresh source loader + forever-target iterator (fixed seeds — call
    once per training run so shuffle state starts identically)."""
    ds_s = SyntheticFundus(n_data, size + 28, seed=1, transform=train_transforms(size))
    ds_t = SyntheticFundus(n_data, size + 28, seed=2, transform=train_transforms(size))
    loader_s = BatchLoader(ds_s, batch, shuffle=True, seed=0, num_workers=1)
    it_t = BatchLoader(ds_t, batch, shuffle=False, seed=1, num_workers=1).forever()
    return loader_s, it_t


def val_set(size: int) -> SyntheticFundus:
    return SyntheticFundus(8, size + 28, seed=3, transform=eval_transforms(size))


def device_batch(batch_s, batch_t):
    return {
        "image_s": jnp.asarray(batch_s["image"]),
        "map_s": jnp.asarray(batch_s["map"]),
        "boundary_s": jnp.asarray(batch_s["boundary"]),
        "image_t": jnp.asarray(batch_t["image"]),
    }


def torch_val_dice(m, ds_val) -> np.ndarray:
    """Held-out (cup, disc) Dice of a torch model through its eval path
    (restores the model's previous train/eval mode)."""
    was_training = m.training
    m.eval()
    td = []
    with torch.no_grad():
        for batch in BatchLoader(ds_val, 4, shuffle=False, drop_last=False,
                                 num_workers=1).epoch(0):
            to = m(to_nchw(batch["image"]))[0].numpy().transpose(0, 2, 3, 1)
            td.append(dice_coeff_2label(to, batch["map"]))
    if was_training:
        m.train()
    return np.mean(np.array(td), axis=0)


def write_rows_csv(path: str, rows: list[dict]) -> None:
    if not rows:
        raise ValueError(
            f"write_rows_csv({path!r}): no rows were produced — check the "
            f"--iters / --epochs arguments of the run that got here"
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


def series(rows: list[dict], k: str, fw: str) -> np.ndarray:
    return np.array([r[f"{fw}_{k}"] for r in rows])


def smooth(x: np.ndarray, w: int = 10) -> np.ndarray:
    return np.convolve(x, np.ones(w) / w, mode="valid") if len(x) >= w else x


def print_rel_diff_summary(rows: list[dict], keys, width: int = 12) -> None:
    """Per-key smoothed JAX-vs-torch relative divergence — the number every
    PARITY.md chaos-band comparison quotes; one implementation so the
    family's parity reports stay comparable."""
    for k in keys:
        a, b = series(rows, k, "jax"), series(rows, k, "torch")
        if np.all(np.isnan(a)):
            continue
        sa, sb = smooth(a), smooth(b)
        rel = np.abs(sa - sb) / np.maximum(np.abs(sb), 1e-3)
        print(
            f"{k:{width}s} smoothed rel diff: mean {np.mean(rel):.4f} "
            f"max {np.max(rel):.4f}   "
            f"range jax [{a.min():.4f},{a.max():.4f}] "
            f"torch [{b.min():.4f},{b.max():.4f}]"
        )


def jax_val_dice(eval_step, state, ds_val) -> np.ndarray:
    """Held-out (cup, disc) Dice of the JAX model through its eval path."""
    variables = {"params": state.gen_params, "batch_stats": state.gen_stats}
    ds = []
    for batch in BatchLoader(ds_val, 4, shuffle=False, drop_last=False,
                             num_workers=1).epoch(0):
        logits, _, _ = eval_step(variables, batch["image"], batch["map"])
        ds.append(dice_coeff_2label(np.asarray(logits), batch["map"]))
    return np.mean(np.array(ds), axis=0)
