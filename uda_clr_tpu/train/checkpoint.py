"""Checkpoint / resume.

Replaces the reference's flat torch.save dict (epoch, 3 model state_dicts,
3 optimizer state_dicts, LRs, best metric — Trainer_prototype_full.py:176-207)
with a single orbax save of the TrainState pytree + a small JSON metadata
sidecar. Resume restores everything in one call
(train_use_fix_initial.py:228-256 equivalent, without the filtered-merge
dance — the pytree structure IS the contract).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(
    ckpt_dir: str, state, epoch: int, best_mean_dice: float, tag: str, iteration: int = 0
) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    ckptr = ocp.StandardCheckpointer()
    # multi-process: EVERY process must make this call (orbax save runs a
    # cross-process sync internally; trainer.py:validate) — orbax itself
    # keeps the write single-writer. The meta sidecar is ours: main only.
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, f"{tag}.meta.json"), "w") as f:
            json.dump(
                {"epoch": epoch, "best_mean_dice": best_mean_dice, "iteration": iteration}, f
            )
    return path


def restore_checkpoint(ckpt_dir: str, tag: str, state_template) -> tuple[Any, dict]:
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(state_template))
    state = ckptr.restore(path, abstract)
    meta_path = os.path.join(ckpt_dir, f"{tag}.meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    tags = [
        d for d in os.listdir(ckpt_dir)
        if os.path.isdir(os.path.join(ckpt_dir, d)) and d.startswith("checkpoint_")
    ]
    if not tags:
        return None
    return max(tags, key=lambda t: int(t.rsplit("_", 1)[-1]))
