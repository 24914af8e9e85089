"""The single-pytree TrainState.

Everything the reference scatters across three nn.Modules, three optimizers,
trainer-instance attributes (EMA prototype bank + "First" flags,
Trainer_prototype_full.py:32-33,336-398) and the torch checkpoint dict
(:176-190) lives in one flax struct, so one jitted function steps the whole
system and one orbax call checkpoints it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.models.gan import BoundaryDiscriminator, UncertaintyDiscriminator
from uda_clr_tpu.train import optim as optim_lib

FEATURE_DIM = 305  # decoder x_feature channels


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 global step
    rng: jax.Array

    gen_params: Any
    gen_stats: Any  # batch_stats collection (BN / TransNorm)
    dis_params: Any  # boundary discriminator
    dis2_params: Any  # uncertainty discriminator

    gen_opt: Any
    dis_opt: Any
    dis2_opt: Any

    # EMA prototype bank: stacked [4, C] = (cup_obj, disc_obj, cup_bck, disc_bck)
    proto_src: jnp.ndarray
    proto_trg: jnp.ndarray
    proto_src_init: jnp.ndarray  # bool: bank seeded yet? ("First_src" flag)
    proto_trg_init: jnp.ndarray

    # mean-teacher shadow params (prototype_mt / Trainer_MT); zeros-like
    # placeholder when unused so the pytree structure is method-independent
    teacher_params: Any = None
    teacher_stats: Any = None

    # disk-initialized prototype bank for the Trainer_prototype variant:
    # {'bu': [304], 'cup': [305], 'disc': [305]} (cal_prototype output,
    # EMA-updated with momentum 0.001 — Trainer_prototype.py:62-64,117-123)
    proto_bank: Any = None

    # second classifier for the bi-classifier bcdm method (bytecode-only
    # Trainer_bcdm: model_fea + model_cls_1/model_cls_2 with separate
    # optimizers; reconstruction evidence in train/steps.py). cls2 holds
    # the {aspp, decoder} params/stats of classifier 2 (classifier 1 lives
    # inside gen_params/gen_stats); bcdm_opt holds the three Adam states
    # {fea, cls1, cls2} with independent step counts, matching torch's
    # per-optimizer moments.
    cls2_params: Any = None
    cls2_stats: Any = None
    bcdm_opt: Any = None

    # frozen initial-pseudolabel model (Trainer_prototype_woTN bytecode
    # :309-311/:373-377: a separate DeepLab loaded from --initial_resume
    # whose 'before' heads supply the target pseudo-labels when
    # use_fix_initial is on). Populated by the trainer as a snapshot of
    # gen params/stats right after the initial-resume merge; never updated.
    initial_params: Any = None
    initial_stats: Any = None


def create_train_state(
    model: DeepLab,
    rng: jax.Array,
    input_shape: tuple,
    optim_cfg=None,
    with_teacher: bool = False,
    with_proto_bank: bool = False,
    with_cls2: bool = False,
    dis_input_hw: Optional[tuple] = None,
) -> TrainState:
    """Initialize all params/opt-states on one host call.

    ``input_shape`` = (B, H, W, 3) for the generator; discriminators are
    shaped by the generator's full-res outputs.
    """
    from uda_clr_tpu.config import OptimConfig

    optim_cfg = optim_cfg or OptimConfig()
    k_gen, k_dis, k_dis2, k_state = jax.random.split(rng, 4)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(k_gen, x, train=False)
    gen_params = variables["params"]
    gen_stats = variables.get("batch_stats", {})

    hw = dis_input_hw or (input_shape[1], input_shape[2])
    dis = BoundaryDiscriminator()
    dis2 = UncertaintyDiscriminator()
    dis_params = dis.init(k_dis, jnp.zeros((1, *hw, 1)))["params"]
    dis2_params = dis2.init(k_dis2, jnp.zeros((1, *hw, 2)))["params"]

    gen_tx = optim_lib.adam_direction(optim_cfg.adam_b1, optim_cfg.adam_b2)
    dis_tx = optim_lib.sgd_direction(optim_cfg.sgd_momentum, optim_cfg.weight_decay)

    cls2_params = cls2_stats = bcdm_opt = None
    if with_cls2:
        k_cls2 = jax.random.fold_in(k_gen, 1)
        v2 = model.init(k_cls2, x, train=False)
        cls2_params = {k: v2["params"][k] for k in ("aspp", "decoder")}
        cls2_stats = {k: v2.get("batch_stats", {}).get(k, {}) for k in ("aspp", "decoder")}
        fea_p = {"backbone": gen_params["backbone"]}
        cls1_p = {k: gen_params[k] for k in ("aspp", "decoder")}
        bcdm_opt = {
            "fea": gen_tx.init(fea_p),
            "cls1": gen_tx.init(cls1_p),
            "cls2": gen_tx.init(cls2_params),
        }

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
        gen_params=gen_params,
        gen_stats=gen_stats,
        dis_params=dis_params,
        dis2_params=dis2_params,
        gen_opt=gen_tx.init(gen_params),
        dis_opt=dis_tx.init(dis_params),
        dis2_opt=dis_tx.init(dis2_params),
        proto_src=jnp.zeros((4, FEATURE_DIM), jnp.float32),
        proto_trg=jnp.zeros((4, FEATURE_DIM), jnp.float32),
        proto_src_init=jnp.zeros((), bool),
        proto_trg_init=jnp.zeros((), bool),
        teacher_params=jax.tree.map(jnp.copy, gen_params) if with_teacher else None,
        teacher_stats=jax.tree.map(jnp.copy, gen_stats) if with_teacher else None,
        proto_bank=(
            {
                "bu": jnp.zeros((FEATURE_DIM - 1,), jnp.float32),
                "cup": jnp.zeros((FEATURE_DIM,), jnp.float32),
                "disc": jnp.zeros((FEATURE_DIM,), jnp.float32),
            }
            if with_proto_bank
            else None
        ),
        cls2_params=cls2_params,
        cls2_stats=cls2_stats,
        bcdm_opt=bcdm_opt,
    )
    return state
