"""Chaos-sensitivity control for the long-horizon parity run
(docs/longrun_parity.csv): re-run the SAME JAX training twice — once
unperturbed, once with a 1e-6 relative perturbation on one backbone
kernel — and report the final val-Dice spread.

If a 1e-6 perturbation moves the 300-iteration outcome by as much as the
JAX-vs-torch gap, the gap is chaotic trajectory divergence (fp32 noise
amplified through Adam sign-like steps and hard pseudo-label
thresholds), not a systematic framework difference.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
jax.config.update("jax_default_matmul_precision", "highest")

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
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_eval_step, make_train_step
from uda_clr_tpu.utils.metrics import dice_coeff_2label


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args(argv)

    layers_lib.set_dropout_impl("off")
    torch.manual_seed(0)
    B, SIZE = args.batch, args.size

    tm = TorchDeepLab(num_classes=2, output_stride=16)
    with torch.no_grad():
        tm.decoder.last_conv[3].weight.mul_(10.0)
        tm.decoder.last_conv[3].bias.mul_(10.0)
    tdis, tdis2 = TorchPatchDiscriminator(1), TorchPatchDiscriminator(2)
    sd = {k: v.numpy() for k, v in tm.state_dict().items() if "num_batches_tracked" not in k}
    gen_params, gen_stats = convert_deeplab_state_dict(sd, output_stride=16)
    dis_params = convert_discriminator_state_dict({k: v.numpy() for k, v in tdis.state_dict().items()})
    dis2_params = convert_discriminator_state_dict({k: v.numpy() for k, v in tdis2.state_dict().items()})

    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 4
    cfg.method.rng_impl = "threefry2x32"
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)
    eval_step = make_eval_step(model)

    ds_val = SyntheticFundus(8, SIZE + 28, seed=3, transform=eval_transforms(SIZE))

    def run(perturb: float):
        state = create_train_state(model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3))
        gp = jax.tree.map(jnp.asarray, gen_params)
        if perturb:
            k = gp["backbone"]["stem"]["conv"]["kernel"]
            gp["backbone"]["stem"]["conv"]["kernel"] = k * (1.0 + perturb)
        state = state.replace(
            gen_params=gp,
            gen_stats=jax.tree.map(jnp.asarray, gen_stats),
            dis_params=jax.tree.map(jnp.asarray, dis_params),
            dis2_params=jax.tree.map(jnp.asarray, dis2_params),
        )
        ds_s = SyntheticFundus(24, SIZE + 28, seed=1, transform=train_transforms(SIZE))
        ds_t = SyntheticFundus(24, SIZE + 28, seed=2, transform=train_transforms(SIZE))
        loader_s = BatchLoader(ds_s, B, shuffle=True, seed=0, num_workers=1)
        it_t = BatchLoader(ds_t, B, shuffle=False, seed=1, num_workers=1).forever()
        done, epoch = 0, 0
        while done < args.iters:
            for batch_s in loader_s.epoch(epoch):
                if done >= args.iters:
                    break
                batch_t = next(it_t)
                batch = {
                    "image_s": jnp.asarray(batch_s["image"]),
                    "map_s": jnp.asarray(batch_s["map"]),
                    "boundary_s": jnp.asarray(batch_s["boundary"]),
                    "image_t": jnp.asarray(batch_t["image"]),
                }
                state, metrics = step(state, batch, 1e-3, 2.5e-5, 30)
                done += 1
            epoch += 1
        variables = {"params": state.gen_params, "batch_stats": state.gen_stats}
        ds = []
        for batch in BatchLoader(ds_val, 4, shuffle=False, drop_last=False, num_workers=1).epoch(0):
            logits, _, _ = eval_step(variables, batch["image"], batch["map"])
            ds.append(dice_coeff_2label(np.asarray(logits), batch["map"]))
        return np.mean(np.array(ds), axis=0), float(metrics["loss_all"])

    t0 = time.time()
    d0, l0 = run(0.0)
    d1, l1 = run(1e-6)
    print(f"unperturbed: val dice (cup, disc) = ({d0[0]:.4f}, {d0[1]:.4f}), last loss {l0:.4f}")
    print(f"1e-6 perturbed: val dice (cup, disc) = ({d1[0]:.4f}, {d1[1]:.4f}), last loss {l1:.4f}")
    print(f"dice spread from 1e-6 perturbation: cup {abs(d0[0]-d1[0]):.4f} disc {abs(d0[1]-d1[1]):.4f}")
    print(f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
