"""Golden-value pins for the bytecode-reconstructed methods
(VERDICT r2 item 9).

bcdm / mean_teacher / prototype_mt have no runnable reference source
(.pyc-only trainers), so their loss formulas were reconstructed from
bytecode evidence (quoted in train/steps.py docstrings). These tests pin
the reconstructed semantics with stored expected values on fixed tiny
inputs: a refactor that silently changes a discrepancy phase, the
consistency term, the aug-consistency masking rule, or the source
discriminative regularizer fails loudly here, instead of drifting.

Golden values were produced by this very harness (CPU, fp32,
jax_default_matmul_precision=highest, dropout off, seed-0 init, seed-11
batch) and are platform-stable to ~1e-5; tolerances allow BLAS
reassociation noise only.

Formula citations:
  * bcdm: instruction-verified (tools/pyc_disasm.py over
    Trainer_bcdm.cpython-38.pyc): discrepancy =
    mean|sigmoid(v1)-sigmoid(v2)| on MASK logits only (:308,:324);
    phase A segs with temperature 1.8 on the mask logits (:235-243);
    phase B = 0.01*cdd_before minimized by the CLASSIFIERS (positive
    sign, :314-316); phase C = 4 inner iterations of 0.01*cdd_after on
    the feature extractor (:318-330).
  * mean_teacher: instruction-verified (tools/pyc_disasm.py over
    Trainer_MT.cpython-38.pyc :239,:339): consistency =
    nn.MSELoss()(sig(oT_student), sig(oT_teacher)) on the MASK head only,
    rampup-weighted; EMA alpha = min(1-1/(step+1), 0.99) (:30-34).
  * prototype_mt: instruction-verified against the disassembled bytecode
    (tools/pyc_disasm.py over Trainer_prototype_mt.cpython-38.pyc).
    loss_aug = MC-std-confidence-masked BCE between the strong-aug forward
    and pseudo-labels at the ramped threshold
    (0.85+0.25*sigmoid_rampup(epoch,200))*ln2, aug_weight folded into the
    logged value, NOT added to the G loss (the bytecode never backwards
    it; train_epoch :498-568). loss_src_reg = Euclidean margin hinge
    mean(pred_i * relu(d_own - d_other + 0.01)) over 4 region terms with
    channel-mean squared distances (train_epoch :438-476).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uda_clr_tpu.config import Config
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_train_step

B, SIZE = 2, 32


@pytest.fixture()
def dropout_off():
    prev = layers_lib._DROPOUT_IMPL
    layers_lib.set_dropout_impl("off")
    yield
    layers_lib.set_dropout_impl(prev)


def _fixed_batch():
    rng = np.random.default_rng(11)
    return {
        "image_s": rng.standard_normal((B, SIZE, SIZE, 3)).astype(np.float32),
        "map_s": (rng.uniform(0, 1, (B, SIZE, SIZE, 2)) > 0.5).astype(np.float32),
        "boundary_s": rng.uniform(0, 1, (B, SIZE, SIZE, 1)).astype(np.float32),
        "image_t": rng.standard_normal((B, SIZE, SIZE, 3)).astype(np.float32),
    }


def _run_one_step(method: str, proto_phase: bool = False, **overrides):
    cfg = Config()
    cfg.model.output_stride = 16
    cfg.model.compute_dtype = "float32"
    cfg.method.method = method
    cfg.method.mc_samples = 2
    for k, v in overrides.items():
        setattr(cfg.method, k, v)
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    state = create_train_state(
        model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), cfg.optim,
        with_teacher=(method == "mean_teacher"),
        with_proto_bank=(method == "prototype"),
        with_cls2=(method == "bcdm"),
    )
    step = make_train_step(model, cfg, method, proto_phase=proto_phase)
    batch = {k: jnp.asarray(v) for k, v in _fixed_batch().items()}
    _, metrics = step(state, batch, 1e-3, 2.5e-5, 26)
    metrics.pop("_viz", None)
    return {k: float(v) for k, v in jax.device_get(metrics).items()}


# Stored goldens (see module docstring for provenance).
GOLDEN = {
    "bcdm": {
        "loss_seg": 1.6876500845,
        "loss_cdd_before": 0.2262520790,
        "loss_cdd_after": 0.1964544803,
        "loss_all": 1.6918771267,
    },
    "mean_teacher": {
        "loss_seg": 0.9207851887,
        "loss_consistency": 0.0523788743,
        "loss_adv": 0.0138508985,
        "loss_all": 0.9870150089,
    },
    "prototype_mt": {
        "loss_seg": 0.9207851887,
        # regenerated after the albumentations-exact strong_augment rewrite
        # (HSV 180-unit circle, brightness_by_max, cv2 binomial blur,
        # uint8-grid snaps) — only the augmented image, and hence this one
        # logged-only metric, changed; every other golden is untouched
        "loss_aug": 0.0466767699,
        "loss_src_reg": 0.0207180083,
        "loss_intra": 0.2640155256,
        "loss_inter": 0.0123099387,
        "loss_all": 0.9612448812,
    },
}


def _check(method, metrics):
    for k, want in GOLDEN[method].items():
        got = metrics[k]
        assert abs(got - want) < max(2e-4 * abs(want), 2e-6), (
            f"{method}.{k}: got {got:.10f}, golden {want:.10f}"
        )


def test_bcdm_golden(dropout_off):
    m = _run_one_step("bcdm")
    _check("bcdm", m)


def test_mean_teacher_golden(dropout_off):
    # teacher_noise=0 so the consistency term is a pure function of the
    # (identically initialized) student/teacher weights
    m = _run_one_step("mean_teacher", teacher_noise=0.0)
    _check("mean_teacher", m)


def test_prototype_mt_golden(dropout_off):
    m = _run_one_step("prototype_mt", proto_phase=True)
    _check("prototype_mt", m)


def test_aug_consistency_masking_rule(dropout_off):
    """Bytecode-verified loss_aug weighting (train_epoch :509-561): the
    per-pixel weight is the MC-std confidence mask from
    gen_prototype_retrify (mask_i = 2*(std<0.04), the {0,2} scaling
    cancels in the normalized sum), the pseudo-label threshold ramps as
    (0.85 + 0.25*sigmoid_rampup(epoch, 200)) * ln2, and aug_weight is
    folded into the logged value. Pinned on a hand-checkable input."""
    from uda_clr_tpu.ops import losses as L

    epoch = 26.0
    ramp = np.exp(-5.0 * (1.0 - np.clip(epoch, 0, 200) / 200.0) ** 2)
    thr = (0.85 + 0.25 * ramp) * np.log(2.0)
    assert abs(thr - 0.5931) < 2e-4  # hand-computed for epoch 26

    p_plain = np.array([0.9, 0.5, 0.1, 0.76, 0.24])
    pseudo = (p_plain > thr).astype(np.float32)
    np.testing.assert_array_equal(pseudo, [1, 0, 0, 1, 0])
    std = np.array([0.01, 0.05, 0.02, 0.03, 0.08], np.float32)
    mask_ref = 2.0 * (std < 0.04).astype(np.float32)  # reference's {0,2} mask
    conf = (std < 0.04).astype(np.float32)  # ours
    o_aug = np.array([2.0, 0.0, -3.0, 1.0, -1.0], np.float32)
    per_px = np.asarray(
        L.bce_sigmoid_stable_elementwise(jnp.asarray(o_aug), jnp.asarray(pseudo))
    )
    aug_weight = 0.1
    got = aug_weight * (per_px * conf).sum() / conf.sum()
    # independent numpy transcription: torch bceloss_aug on sigmoid +
    # reference's sum(mask*l)/sum(mask) with the {0,2} mask
    ref = np.maximum(o_aug, 0) - o_aug * pseudo + np.log1p(np.exp(-np.abs(o_aug)))
    want = aug_weight * (ref * mask_ref).sum() / mask_ref.sum()
    assert abs(got - want) < 1e-6


def test_source_discriminative_loss_numpy_oracle():
    """Independent numpy transcription of the bytecode's loss_src_reg
    (Trainer_prototype_mt train_epoch offsets 1886-2244 / source
    :454-474): channel-mean squared Euclidean distances, margin-0.01
    hinge, soft-region-weighted PLAIN mean (no mask normalization, no
    feature/centroid normalization)."""
    from uda_clr_tpu.ops import prototypes as P

    rng = np.random.default_rng(3)
    feat = rng.standard_normal((2, 4, 4, 6)).astype(np.float32)
    pred = rng.uniform(0, 1, (2, 4, 4, 2)).astype(np.float32)
    bank = P.Prototypes(
        *(rng.standard_normal(6).astype(np.float32) for _ in range(4))
    )
    got = float(P.source_discriminative_loss(
        jnp.asarray(feat), jnp.asarray(pred), bank
    ))

    def d(c):
        return ((feat - c) ** 2).mean(axis=-1)  # [B,h,w]

    cup, disc = pred[..., 0], pred[..., 1]
    want = (
        (cup * np.maximum(d(bank.cup_obj) - d(bank.cup_bck) + 0.01, 0)).mean()
        + ((1 - cup) * np.maximum(d(bank.cup_bck) - d(bank.cup_obj) + 0.01, 0)).mean()
        + (disc * np.maximum(d(bank.disc_obj) - d(bank.disc_bck) + 0.01, 0)).mean()
        + ((1 - disc) * np.maximum(d(bank.disc_bck) - d(bank.disc_obj) + 0.01, 0)).mean()
    )
    assert abs(got - want) < 1e-5


def test_loss_aug_not_in_objective_by_default(dropout_off):
    """The compiled reference never backwards loss_aug (the bytecode's
    only backwards are loss_all and the two D updates), so with the
    default aug_backward=False the G objective must not contain it —
    and flipping use_trg_cons must not change loss_all."""
    m_on = _run_one_step("prototype_mt", proto_phase=True)
    m_off = _run_one_step("prototype_mt", proto_phase=True, use_trg_cons=False)
    assert "loss_aug" in m_on and "loss_aug" not in m_off
    assert abs(m_on["loss_all"] - m_off["loss_all"]) < 1e-7

    m_bw = _run_one_step("prototype_mt", proto_phase=True, aug_backward=True)
    assert abs(m_bw["loss_all"] - (m_on["loss_all"] + m_on["loss_aug"])) < 1e-5
