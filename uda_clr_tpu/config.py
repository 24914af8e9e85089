"""Single dataclass config surface (replaces the reference's 24 argparse
flags + hidden hard-coded paths — train_use_fix_initial.py:24-140).

Serializable to/from YAML; the trainer dumps the resolved config into the
run directory like the reference writes ``config.yaml``
(train_use_fix_initial.py:139-140).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import yaml


@dataclass
class ModelConfig:
    num_classes: int = 2
    backbone: str = "mobilenet"  # mobilenet | resnet | xception | drn
    output_stride: int = 16
    norm: str = "bn"  # 'bn' (plain / cross-replica) | 'tn' (TransNorm, --use_TN)
    compute_dtype: str = "float32"  # 'bfloat16' for TPU speed
    # rematerialize backbone blocks (jax.checkpoint): trades ~1 extra
    # backbone forward of FLOPs for HBM, admitting larger per-chip batches
    # (B32 at 512^2 OOMs without it — PARITY.md "Batch-size scaling")
    remat: bool = False


@dataclass
class DataConfig:
    data_dir: str = ""  # {data_dir}/{dataset}/{split}/ROIs/image
    dataset_source: str = "refuge"
    dataset_target: str = "Drishti-GS"  # refuge | Drishti-GS | RIM-ONE_r3
    image_size: int = 512
    batch_size: int = 8
    num_workers: int = 2
    # loader worker model: "thread" (zero-IPC, partial GIL scaling) or
    # "process" (fork workers, full per-core scaling — the reference's
    # DataLoader(num_workers=6) model; data/pipeline.py docstring)
    loader_backend: str = "thread"
    # host->device wire format: "u8" (uint8 batches + on-device decode —
    # bit-exact vs f32 per tests/test_wire.py, 4x less transfer; the
    # production default) or "f32" (the reference's contract, kept as the
    # opt-in parity mode; data/wire.py)
    wire: str = "u8"
    synthetic: bool = False  # tests/benchmarks without the real datasets
    synthetic_size: int = 16


@dataclass
class OptimConfig:
    lr_gen: float = 1e-3
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    lr_dis: float = 2.5e-5
    sgd_momentum: float = 0.99
    weight_decay: float = 5e-4
    lr_decrease_rate: float = 0.2  # lr_gen multiplier from epoch 100 on
    lr_step_epochs: int = 100


@dataclass
class MethodConfig:
    """Algorithm switches mirroring the reference trainers' surface."""

    method: str = "prototype_full"  # baseline | adversarial | posal | prototype | prototype_full | prototype_mt | mean_teacher | bcdm
    warmup_epoch: int = 25
    adv_weight: float = 0.01
    # -- ablation switches for the bytecode-only trainer variants --
    # (evidence quoted in train/steps.py:make_train_step and PARITY.md §2.2)
    use_adv: bool = True  # False: drop the whole adversarial branch (Trainer_MT_wo_ad)
    use_boundary_d: bool = True  # boundary PatchGAN model_dis
    use_entropy_d: bool = True  # entropy PatchGAN model_dis2; method='posal' forces False
    use_boundary_loss: bool = True  # False: drop the MSE boundary seg term (Trainer_baseline_wob)
    bank_use_bu: bool = True  # False: drop the bu prototype-distance term (Trainer_prototype_delete_en)
    # prototype stack (Trainer_prototype_full)
    use_pid: bool = True
    use_global: bool = True
    retrify_pseudo: bool = True
    pro_weight: float = 0.1
    global_pro_weight: float = 0.9
    mc_samples: int = 8  # T
    mc_fast: bool = True  # share one backbone pass across MC samples (bn: inlined
    # into the S||T forward; tn: via the identical-halves degenerate prefix)
    std_threshold: float = 0.04
    pseudo_threshold: float = 0.75
    rng_impl: str = "unsafe_rbg"  # dropout-bit PRNG: threefry2x32 | rbg | unsafe_rbg
    mask_head_impl: str = "auto"  # MC fused mask-head: auto | xla | pallas
    # Trainer_prototype (disk-bank variant)
    bank_ema: float = 0.001
    bank_loss_weight: float = 0.05
    prototype_bank_path: str = ""  # cal_prototype .npz output
    # paper-complete CLR losses (Trainer_prototype_mt)
    use_trg_cons: bool = True
    aug_weight: float = 0.1
    # The compiled reference computes and LOGS loss_aug but never backwards
    # it (bytecode has only loss_all + two D backwards). False reproduces
    # that; True opts into the paper's stated semantics (add to the G loss).
    aug_backward: bool = False
    # Trainer_prototype_woTN (bytecode): multiply the target soft maps by
    # the min-max-normalized L2-distance weights to the bank vectors before
    # thresholding (:381-382/:399/:423 — commented out in the checked-in
    # Trainer_prototype.py:396/413/437), and source the pseudo-labels from
    # the frozen initial-resume model's 'before' heads (:309-311/:373-377).
    use_weight_rectify: bool = False
    pseudo_from_initial: bool = False
    src_reg: bool = True
    src_reg_weight: float = 0.01
    # mean teacher
    ema_decay: float = 0.99
    consistency: float = 1.0
    consistency_rampup: float = 40.0
    teacher_noise: float = 0.1  # sigma of the gaussian noise on the teacher's input


@dataclass
class RunConfig:
    out_dir: str = "runs/default"
    max_epoch: int = 500
    stop_epoch: Optional[int] = None
    interval_validate: int = 10
    checkpoint_every: int = 50
    seed: int = 1337
    resume: Optional[str] = None
    initial_resume: Optional[str] = None  # BEAL warm-start checkpoint
    mesh_shape: Optional[tuple] = None  # e.g. (8,) data-parallel; None = all devices
    # multi-process data parallelism (parallel/distributed.py): set
    # dist_coordinator ("host:port" of process 0) to enable; each process
    # then loads 1/dist_num_processes of every global batch and the jitted
    # step runs over the global mesh (grad/BN reductions ride ICI/DCN)
    dist_coordinator: Optional[str] = None
    dist_num_processes: int = 1
    dist_process_id: int = 0
    profile: bool = False
    save_val_images: bool = False  # joint [img|gt|cup|disc] strips per validation
    viz_every: int = 30  # train-time TB image grids every N iterations (0 = off)


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    method: MethodConfig = field(default_factory=MethodConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        def build(tp, sub):
            fields = {f.name: f for f in dataclasses.fields(tp)}
            kwargs = {}
            for k, v in (sub or {}).items():
                if k not in fields:
                    raise KeyError(f"unknown config key {tp.__name__}.{k}")
                kwargs[k] = tuple(v) if k == "mesh_shape" and v is not None else v
            return tp(**kwargs)

        return cls(
            model=build(ModelConfig, d.get("model")),
            data=build(DataConfig, d.get("data")),
            optim=build(OptimConfig, d.get("optim")),
            method=build(MethodConfig, d.get("method")),
            run=build(RunConfig, d.get("run")),
        )

    @classmethod
    def from_yaml(cls, text: str) -> "Config":
        return cls.from_dict(yaml.safe_load(text) or {})
