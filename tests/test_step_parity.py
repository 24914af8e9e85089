"""Step-LEVEL numerical parity: two full fused JAX train iterations vs a
faithful torch transcription of the reference's per-iteration choreography
(Trainer_prototype_full.py:248-517) from identical converted weights.

This is the keystone on top of the model/grad parity tests: it proves the
aggressive fusion in train/steps.py (one S||T generator forward, shared
forward across the three grad computations, doubled-batch D passes, flat
T*B MC path, prototype EMA inside the step) reproduces the reference's
losses AND its parameter/statistics updates (Adam + 2x SGD + EMA banks +
BN running stats) — the second iteration's losses only match if every
piece of state the first iteration wrote matched.

Dropout is disabled on both sides (torch p=0, set_dropout_impl('off')):
the two frameworks' RNGs cannot be made to coincide, and with dropout off
every remaining quantity is deterministic. BN stays in train mode, so the
batch-stats path (the actual parity risk) is fully exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_ref import TorchDeepLab
from tests.torch_step_ref import (
    TorchBank,
    TorchPatchDiscriminator,
    prototype_full_iteration,
)
from uda_clr_tpu.config import Config
from uda_clr_tpu.convert.torch_import import (
    convert_deeplab_state_dict,
    convert_discriminator_state_dict,
)
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_train_step

B, SIZE = 2, 64


def _zero_torch_dropout(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _make_batch(rng):
    img_s = rng.standard_normal((B, SIZE, SIZE, 3)).astype(np.float32)
    map_s = (rng.uniform(0, 1, (B, SIZE, SIZE, 2)) > 0.5).astype(np.float32)
    bnd_s = rng.uniform(0, 1, (B, SIZE, SIZE, 1)).astype(np.float32)
    img_t = rng.standard_normal((B, SIZE, SIZE, 3)).astype(np.float32)
    return img_s, map_s, bnd_s, img_t


def _to_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


@pytest.fixture()
def dropout_off():
    prev = layers_lib._DROPOUT_IMPL
    layers_lib.set_dropout_impl("off")
    yield
    layers_lib.set_dropout_impl(prev)


@pytest.mark.parametrize(
    "method,retrify,mc_fast,backbone",
    [
        ("prototype_full", True, True, "mobilenet"),
        ("prototype_full", True, False, "mobilenet"),
        ("prototype_full", False, True, "mobilenet"),
        ("adversarial", False, True, "mobilenet"),
        # One non-mobilenet case: the fused step's math is backbone-agnostic,
        # but this pins grads/Adam/BN-stat round-trips through the deepest
        # backbone family too (reference backbone/resnet.py multi-grid stage).
        # retrify=False: the MC-rectified bank pools through HARD 0.75 /
        # std<0.04 thresholds, where resnet's O(2e-3) cross-framework fp32
        # logit noise flips near-threshold pixels outright and the comparison
        # degenerates into flip-chaos; the soft-mask path stays deterministic.
        ("prototype_full", False, True, "resnet"),
        # The bytecode-only Trainer_prototype_mt reconstruction: everything
        # prototype_full does PLUS loss_src_reg in the G objective (the
        # grad-carrying hinge on the EMA centroids). use_trg_cons stays off
        # here: loss_aug is log-only in the compiled reference (never
        # backwarded) and its augmented forward is RNG-driven — the
        # trajectory-relevant semantics are exactly what this parametrization
        # pins. loss_aug itself is covered by golden + numpy-oracle tests.
        ("prototype_mt", True, True, "mobilenet"),
    ],
)
def test_train_step_parity(dropout_off, method, retrify, mc_fast, backbone):
    torch.manual_seed(0)
    T = 4

    # ---- torch side: models + reference optimizers ----
    tm = TorchDeepLab(num_classes=2, output_stride=16, backbone=backbone)
    tm.train()
    _zero_torch_dropout(tm)
    # Spread the mask logits so sigmoid(o_before) straddles the 0.75
    # pseudo-label threshold (the reference's unguarded centroid divisions
    # need non-empty object AND background pseudo-masks; random-init logits
    # sit at ~0.5 where pseudo-labels would be empty). Keeps |logits| < ~10
    # so torch's BCELoss backward eps-clamp never engages.
    with torch.no_grad():
        tm.decoder.last_conv[3].weight.mul_(10.0)
        tm.decoder.last_conv[3].bias.mul_(10.0)
    tdis = TorchPatchDiscriminator(1)
    tdis2 = TorchPatchDiscriminator(2)
    tdis.train(), tdis2.train()

    # lr_gen is a traced scalar on the JAX side and does not change the
    # step's semantics; 1e-4 (vs the reference's 1e-3) keeps Adam's
    # sign-like first step from amplifying the inherent cross-framework
    # fp32 gradient noise (near-zero-gradient params get a full +-lr update
    # whose SIGN is noise) into the iteration-2 loss comparison.
    # (one more decade down for resnet101: ~7x the params and O(2e-3)
    # forward noise make the +-lr sign-noise floor proportionally larger)
    lr_gen = 1e-4 if backbone == "mobilenet" else 1e-5
    opt_gen = torch.optim.Adam(tm.parameters(), lr=lr_gen, betas=(0.9, 0.99))
    opt_dis = torch.optim.SGD(tdis.parameters(), lr=2.5e-5, momentum=0.99, weight_decay=5e-4)
    opt_dis2 = torch.optim.SGD(tdis2.parameters(), lr=2.5e-5, momentum=0.99, weight_decay=5e-4)

    # ---- convert weights into the JAX state ----
    sd = {k: v.numpy() for k, v in tm.state_dict().items() if "num_batches_tracked" not in k}
    gen_params, gen_stats = convert_deeplab_state_dict(sd, output_stride=16)
    dis_params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in tdis.state_dict().items()}
    )
    dis2_params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in tdis2.state_dict().items()}
    )

    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.method.method = method
    cfg.method.retrify_pseudo = retrify
    cfg.method.mc_samples = T
    cfg.method.mc_fast = mc_fast
    cfg.method.rng_impl = "threefry2x32"  # rbg keys unsupported on CPU tests
    proto = method in ("prototype_full", "prototype_mt")
    if method == "prototype_mt":
        cfg.method.use_trg_cons = False  # see the parametrize comment

    model = DeepLab(num_classes=2, backbone=backbone, output_stride=16, norm="bn")
    state = create_train_state(model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3))
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gen_params),
        gen_stats=jax.tree.map(jnp.asarray, gen_stats),
        dis_params=jax.tree.map(jnp.asarray, dis_params),
        dis2_params=jax.tree.map(jnp.asarray, dis2_params),
    )

    step = make_train_step(model, cfg, method, proto_phase=proto)
    bank = TorchBank()
    rng = np.random.default_rng(7)

    for it in range(2):
        img_s, map_s, bnd_s, img_t = _make_batch(rng)
        batch = {
            "image_s": jnp.asarray(img_s),
            "map_s": jnp.asarray(map_s),
            "boundary_s": jnp.asarray(bnd_s),
            "image_t": jnp.asarray(img_t),
        }
        state, metrics = step(state, batch, lr_gen, 2.5e-5, 30)

        want = prototype_full_iteration(
            tm, tdis, tdis2, opt_gen, opt_dis, opt_dis2, bank,
            _to_nchw(img_s), _to_nchw(map_s), _to_nchw(bnd_s), _to_nchw(img_t),
            use_pid=proto, retrify=retrify, T=T,
            src_reg_weight=(cfg.method.src_reg_weight if method == "prototype_mt" else None),
        )

        # fp32 accumulation across ~60 BN layers drifts the deep losses by
        # O(1e-4) relative on iteration 1 and a few e-4 after the optimizer
        # round-trips; anything structurally wrong shows up orders of
        # magnitude above these tolerances. resnet101 is ~2x deeper with
        # 2048-ch reductions — its cross-framework fp32 forward noise is
        # O(2e-3) already at the logits (test_convert.py tolerance), so its
        # loss tolerances scale accordingly.
        tol = 5e-4 if it == 0 else 5e-3
        if backbone != "mobilenet":
            tol *= 8
        for key in ("loss_seg", "loss_adv", "loss_all", "loss_D", "loss_D2"):
            if key in want:
                np.testing.assert_allclose(
                    float(metrics[key]), want[key], rtol=tol,
                    err_msg=f"iter {it}: {key}",
                )
        if proto:
            np.testing.assert_allclose(
                float(metrics["loss_intra"]), want["loss_intra"],
                rtol=tol * 20, atol=1e-5, err_msg=f"iter {it}: loss_intra",
            )
            np.testing.assert_allclose(
                float(metrics["loss_inter"]), want["loss_inter"],
                rtol=tol * 20, atol=1e-5, err_msg=f"iter {it}: loss_inter",
            )
            if "loss_src_reg" in want:
                np.testing.assert_allclose(
                    float(metrics["loss_src_reg"]), want["loss_src_reg"],
                    rtol=tol * 20, atol=1e-5, err_msg=f"iter {it}: loss_src_reg",
                )
            # the EMA prototype banks (written back into TrainState);
            # iter 1's bank pools features of the once-updated params, so
            # it inherits the Adam-noise floor like the iter-1 losses
            brtol, batol = (5e-3, 5e-3) if it == 0 else (5e-2, 2e-2)
            if backbone != "mobilenet":
                # the trg bank pools through HARD pseudo-label/confidence
                # thresholds (0.75 / std<0.04): resnet's O(2e-3) logit
                # noise flips a handful of near-threshold pixels outright,
                # moving centroids O(1e-2) — discrete flip noise, not drift
                brtol, batol = brtol * 8, batol * 8
            got_src = np.asarray(state.proto_src)
            want_src = np.stack([b.numpy() for b in bank.src])
            np.testing.assert_allclose(
                got_src, want_src, rtol=brtol, atol=batol,
                err_msg=f"iter {it}: proto_src bank",
            )
            got_trg = np.asarray(state.proto_trg)
            want_trg = np.stack([b.numpy() for b in bank.trg])
            np.testing.assert_allclose(
                got_trg, want_trg, rtol=brtol, atol=batol,
                err_msg=f"iter {it}: proto_trg bank",
            )

    # ---- post-update state: discriminator params (SGD+momentum+wd x2) ----
    got_w = np.asarray(state.dis_params["conv1"]["conv"]["kernel"])
    want_w = tdis.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got_w, want_w, rtol=1e-4, atol=1e-7)

    # ---- post-update BN running stats (T-then-S update order x2 iters) ----
    if backbone == "mobilenet":
        jax_bn, t_bn = "stem_bn", "backbone.features.0.1"
        jax_stem, t_stem = "stem", "backbone.features.0.0.weight"
    else:  # resnet101 stem naming (convert/torch_import.py:93-94)
        jax_bn, t_bn = "bn1", "backbone.bn1"
        jax_stem, t_stem = "conv1", "backbone.conv1.weight"
    stem_stats = state.gen_stats["backbone"][jax_bn]
    t_sd = tm.state_dict()
    np.testing.assert_allclose(
        np.asarray(stem_stats["mean"]),
        t_sd[f"{t_bn}.running_mean"].numpy(),
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stem_stats["var"]),
        t_sd[f"{t_bn}.running_var"].numpy(),
        rtol=1e-3, atol=1e-5,
    )

    # ---- post-update generator params (Adam x2 iters) ----
    got_stem = np.asarray(state.gen_params["backbone"][jax_stem]["conv"]["kernel"])
    want_stem = t_sd[t_stem].numpy().transpose(2, 3, 1, 0)
    scale = max(np.abs(want_stem).max(), 1e-6)
    np.testing.assert_allclose(got_stem / scale, want_stem / scale, atol=5e-3)


def test_mean_teacher_step_parity(dropout_off):
    """Two fused mean_teacher iterations vs the torch transcription of the
    bytecode-only Trainer_MT (tests/torch_step_ref.py:mean_teacher_iteration;
    instruction-verified semantics). Covers: teacher eval forward feeding
    the mask-head-only consistency term, the full adversarial branch, the
    G/D update order, and the ramped-alpha parameter EMA + tracked stats."""
    import copy

    from tests.torch_step_ref import mean_teacher_iteration

    torch.manual_seed(0)
    tm = TorchDeepLab(num_classes=2, output_stride=16, backbone="mobilenet")
    tm.train()
    _zero_torch_dropout(tm)
    tteacher = copy.deepcopy(tm)
    tdis = TorchPatchDiscriminator(1)
    tdis2 = TorchPatchDiscriminator(2)
    tdis.train(), tdis2.train()

    lr_gen = 1e-4  # same Adam sign-noise rationale as the main parity test
    opt_gen = torch.optim.Adam(tm.parameters(), lr=lr_gen, betas=(0.9, 0.99))
    opt_dis = torch.optim.SGD(tdis.parameters(), lr=2.5e-5, momentum=0.99, weight_decay=5e-4)
    opt_dis2 = torch.optim.SGD(tdis2.parameters(), lr=2.5e-5, momentum=0.99, weight_decay=5e-4)

    sd = {k: v.numpy() for k, v in tm.state_dict().items() if "num_batches_tracked" not in k}
    gen_params, gen_stats = convert_deeplab_state_dict(sd, output_stride=16)
    dis_params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in tdis.state_dict().items()}
    )
    dis2_params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in tdis2.state_dict().items()}
    )

    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.method.method = "mean_teacher"
    cfg.method.teacher_noise = 0.0  # deterministic teacher input
    cfg.method.rng_impl = "threefry2x32"
    w_cons = cfg.method.consistency

    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    state = create_train_state(
        model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), with_teacher=True
    )
    gp = jax.tree.map(jnp.asarray, gen_params)
    gs = jax.tree.map(jnp.asarray, gen_stats)
    state = state.replace(
        gen_params=gp, gen_stats=gs,
        teacher_params=jax.tree.map(jnp.copy, gp),
        teacher_stats=jax.tree.map(jnp.copy, gs),
        dis_params=jax.tree.map(jnp.asarray, dis_params),
        dis2_params=jax.tree.map(jnp.asarray, dis2_params),
    )

    step = make_train_step(model, cfg, "mean_teacher", proto_phase=False)
    rng = np.random.default_rng(7)

    for it in range(2):
        img_s, map_s, bnd_s, img_t = _make_batch(rng)
        batch = {
            "image_s": jnp.asarray(img_s),
            "map_s": jnp.asarray(map_s),
            "boundary_s": jnp.asarray(bnd_s),
            "image_t": jnp.asarray(img_t),
            "consistency_weight": jnp.float32(w_cons),
        }
        state, metrics = step(state, batch, lr_gen, 2.5e-5, 30)
        want = mean_teacher_iteration(
            tm, tteacher, tdis, tdis2, opt_gen, opt_dis, opt_dis2,
            _to_nchw(img_s), _to_nchw(map_s), _to_nchw(bnd_s), _to_nchw(img_t),
            global_step=it, consistency_weight=w_cons,
            ema_decay=cfg.method.ema_decay,
        )
        tol = 5e-4 if it == 0 else 5e-3
        for key in ("loss_seg", "loss_adv", "loss_all", "loss_D", "loss_D2"):
            np.testing.assert_allclose(
                float(metrics[key]), want[key], rtol=tol,
                err_msg=f"iter {it}: {key}",
            )
        # the consistency term is tiny on iteration 0 (teacher == student
        # at init, both forwards still differ by train-vs-eval BN) — an
        # absolute floor keeps fp32 noise from dominating the rel check
        np.testing.assert_allclose(
            float(metrics["loss_consistency"]), want["loss_consistency"],
            rtol=tol * 4, atol=1e-6, err_msg=f"iter {it}: loss_consistency",
        )

    # ---- post-update teacher params: alpha ramp min(1-1/(t+1), 0.99)
    # means teacher(0)=student(0), teacher(1)=0.5*(student(0)+student(1)) ----
    t_sd = tteacher.state_dict()
    got = np.asarray(state.teacher_params["backbone"]["stem"]["conv"]["kernel"])
    want_w = t_sd["backbone.features.0.0.weight"].numpy().transpose(2, 3, 1, 0)
    scale = max(np.abs(want_w).max(), 1e-6)
    np.testing.assert_allclose(got / scale, want_w / scale, atol=5e-3)
    # teacher stats track the student's (the framework's documented choice)
    np.testing.assert_allclose(
        np.asarray(state.teacher_stats["backbone"]["stem_bn"]["mean"]),
        t_sd["backbone.features.0.1.running_mean"].numpy(),
        rtol=1e-3, atol=1e-5,
    )


def test_prototype_bank_step_parity(dropout_off):
    """Two fused disk-bank (method='prototype') iterations vs the torch
    transcription of the checked-in Trainer_prototype
    (tests/torch_step_ref.py:prototype_bank_iteration). Covers: the
    +1-smoothed per-image pooling of GT-masked source features, the
    adaptation_factor-thresholded target pseudo-masks, the x0.05
    prototype-distance losses in the G objective, the D updates, and the
    0.001 bank EMA with the zero-vector guard."""
    from tests.torch_step_ref import prototype_bank_iteration

    torch.manual_seed(0)
    tm = TorchDeepLab(num_classes=2, output_stride=16, backbone="mobilenet")
    tm.train()
    _zero_torch_dropout(tm)
    # spread BOTH heads' logits so sigmoid straddles the epoch-30
    # adaptation threshold (~0.70) — random-init sigmoid sits at ~0.5
    # where every rectified mask would be empty (see the main test's
    # spread-trick comment)
    with torch.no_grad():
        tm.decoder.last_conv[3].weight.mul_(10.0)
        tm.decoder.last_conv[3].bias.mul_(10.0)
        tm.decoder.last_conv_boundary[8].weight.mul_(10.0)
        tm.decoder.last_conv_boundary[8].bias.mul_(10.0)
    tdis = TorchPatchDiscriminator(1)
    tdis2 = TorchPatchDiscriminator(2)
    tdis.train(), tdis2.train()

    lr_gen = 1e-4
    opt_gen = torch.optim.Adam(tm.parameters(), lr=lr_gen, betas=(0.9, 0.99))
    opt_dis = torch.optim.SGD(tdis.parameters(), lr=2.5e-5, momentum=0.99, weight_decay=5e-4)
    opt_dis2 = torch.optim.SGD(tdis2.parameters(), lr=2.5e-5, momentum=0.99, weight_decay=5e-4)

    sd = {k: v.numpy() for k, v in tm.state_dict().items() if "num_batches_tracked" not in k}
    gen_params, gen_stats = convert_deeplab_state_dict(sd, output_stride=16)
    dis_params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in tdis.state_dict().items()}
    )
    dis2_params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in tdis2.state_dict().items()}
    )

    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.method.method = "prototype"
    cfg.method.rng_impl = "threefry2x32"

    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    state = create_train_state(
        model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), with_proto_bank=True
    )
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gen_params),
        gen_stats=jax.tree.map(jnp.asarray, gen_stats),
        dis_params=jax.tree.map(jnp.asarray, dis_params),
        dis2_params=jax.tree.map(jnp.asarray, dis2_params),
    )

    step = make_train_step(model, cfg, "prototype", proto_phase=True)
    bank = {
        "bu": torch.zeros(304),
        "cup": torch.zeros(305),
        "disc": torch.zeros(305),
    }
    rng = np.random.default_rng(7)

    for it in range(2):
        img_s, map_s, bnd_s, img_t = _make_batch(rng)
        batch = {
            "image_s": jnp.asarray(img_s),
            "map_s": jnp.asarray(map_s),
            "boundary_s": jnp.asarray(bnd_s),
            "image_t": jnp.asarray(img_t),
        }
        state, metrics = step(state, batch, lr_gen, 2.5e-5, 30)
        want = prototype_bank_iteration(
            tm, tdis, tdis2, opt_gen, opt_dis, opt_dis2, bank,
            _to_nchw(img_s), _to_nchw(map_s), _to_nchw(bnd_s), _to_nchw(img_t),
            epoch=30,
        )
        tol = 5e-4 if it == 0 else 5e-3
        for key in ("loss_seg", "loss_adv", "loss_all", "loss_D", "loss_D2"):
            np.testing.assert_allclose(
                float(metrics[key]), want[key], rtol=tol,
                err_msg=f"iter {it}: {key}",
            )
        # the prototype-distance scalars pool through HARD thresholds
        # (sigmoid > adaptation_factor): near-threshold pixels can flip
        # under fp32 noise, moving the masked means discretely (same
        # reasoning as the main test's loss_intra tolerance)
        for key in ("loss_bu", "loss_cup", "loss_disc"):
            np.testing.assert_allclose(
                float(metrics[key]), want[key], rtol=tol * 20, atol=1e-5,
                err_msg=f"iter {it}: {key}",
            )
        # the EMA'd disk bank (zero-guarded, momentum 0.001)
        for key in ("bu", "cup", "disc"):
            np.testing.assert_allclose(
                np.asarray(state.proto_bank[key]), bank[key].numpy(),
                rtol=5e-2, atol=1e-4, err_msg=f"iter {it}: bank[{key}]",
            )


def test_bcdm_step_parity(dropout_off):
    """Two fused bcdm iterations vs the torch transcription of the
    bytecode-only Trainer_bcdm (tests/torch_step_ref.py:bcdm_iteration).
    Covers the 3-phase choreography: tempered phase-A seg on both
    classifiers (one backward, both Adam steps), the phase-B dead source
    forward's BN side effects + classifier-only 0.01*cdd_before step, and
    phase C's 4 inner feature-extractor iterations — plus the resulting
    Adam/BN-stat state on all three param groups."""
    from tests.torch_step_ref import bcdm_iteration

    torch.manual_seed(0)
    tm1 = TorchDeepLab(num_classes=2, output_stride=16, backbone="mobilenet")
    tm2 = TorchDeepLab(num_classes=2, output_stride=16, backbone="mobilenet")
    tm1.train(), tm2.train()
    _zero_torch_dropout(tm1), _zero_torch_dropout(tm2)

    # One decade below the other mobilenet parity cases: unlike them, bcdm's
    # iter-0 cdd scalars are computed AFTER a same-iteration Adam step
    # (phase A), so even iteration 0 sits on the post-update sign-noise
    # floor; the smaller lr shrinks that floor back under the tolerances.
    lr_gen = 1e-5
    opt_fea = torch.optim.Adam(tm1.backbone.parameters(), lr=lr_gen, betas=(0.9, 0.99))
    opt_cls = torch.optim.Adam(
        list(tm1.aspp.parameters()) + list(tm1.decoder.parameters())
        + list(tm2.aspp.parameters()) + list(tm2.decoder.parameters()),
        lr=lr_gen, betas=(0.9, 0.99),
    )

    sd1 = {k: v.numpy() for k, v in tm1.state_dict().items() if "num_batches_tracked" not in k}
    gen_params, gen_stats = convert_deeplab_state_dict(sd1, output_stride=16)
    sd2 = {k: v.numpy() for k, v in tm2.state_dict().items() if "num_batches_tracked" not in k}
    p2, s2 = convert_deeplab_state_dict(sd2, output_stride=16)

    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.method.method = "bcdm"
    cfg.method.rng_impl = "threefry2x32"

    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    state = create_train_state(
        model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), with_cls2=True
    )
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gen_params),
        gen_stats=jax.tree.map(jnp.asarray, gen_stats),
        cls2_params={k: jax.tree.map(jnp.asarray, p2[k]) for k in ("aspp", "decoder")},
        cls2_stats={k: jax.tree.map(jnp.asarray, s2[k]) for k in ("aspp", "decoder")},
    )

    step = make_train_step(model, cfg, "bcdm", proto_phase=False)
    rng = np.random.default_rng(7)

    for it in range(2):
        img_s, map_s, bnd_s, img_t = _make_batch(rng)
        batch = {
            "image_s": jnp.asarray(img_s),
            "map_s": jnp.asarray(map_s),
            "boundary_s": jnp.asarray(bnd_s),
            "image_t": jnp.asarray(img_t),
        }
        state, metrics = step(state, batch, lr_gen, 2.5e-5, 30)
        want = bcdm_iteration(
            tm1, tm2, opt_fea, opt_cls,
            _to_nchw(img_s), _to_nchw(map_s), _to_nchw(bnd_s), _to_nchw(img_t),
        )
        # loss_seg is the only pre-update scalar; cdd_before sits after the
        # phase-A Adam step and cdd_after after SIX same-iteration updates
        # plus an 8-forward chain, so their iter-0 noise floor is the
        # post-update one (measured 0.18% at lr=1e-5), not the pre-update
        # 5e-4 the other methods enjoy.
        # (iter 1's cdd floor is higher still: cdd subtracts two SIBLING
        # classifier outputs, so it carries both classifiers' accumulated
        # drift after 12 cumulative optimizer updates — measured 1.9%.
        # Structural errors (missing temperature, wrong sign, wrong phase
        # order) move these scalars 10-100x further.)
        tol_seg = 1e-3 if it == 0 else 8e-3
        tol_cdd = 4e-3 if it == 0 else 3e-2
        for key, tol in (
            ("loss_seg", tol_seg),
            ("loss_cdd_before", tol_cdd),
            ("loss_cdd_after", tol_cdd),
        ):
            np.testing.assert_allclose(
                float(metrics[key]), want[key], rtol=tol,
                err_msg=f"iter {it}: {key}",
            )

    # ---- post-update params: F (Adam x10: 2x(A + 4xC)), C2 (Adam x4) ----
    t_sd1, t_sd2 = tm1.state_dict(), tm2.state_dict()
    got_stem = np.asarray(state.gen_params["backbone"]["stem"]["conv"]["kernel"])
    want_stem = t_sd1["backbone.features.0.0.weight"].numpy().transpose(2, 3, 1, 0)
    scale = max(np.abs(want_stem).max(), 1e-6)
    np.testing.assert_allclose(got_stem / scale, want_stem / scale, atol=5e-3)

    got_c2 = np.asarray(state.cls2_params["aspp"]["aspp1"]["atrous_conv"]["conv"]["kernel"])
    want_c2 = t_sd2["aspp.aspp1.atrous_conv.weight"].numpy().transpose(2, 3, 1, 0)
    scale = max(np.abs(want_c2).max(), 1e-6)
    np.testing.assert_allclose(got_c2 / scale, want_c2 / scale, atol=5e-3)

    # ---- BN running stats saw every phase's forwards (incl. the dead
    # phase-B source forward) in the same order ----
    np.testing.assert_allclose(
        np.asarray(state.gen_stats["backbone"]["stem_bn"]["mean"]),
        t_sd1["backbone.features.0.1.running_mean"].numpy(),
        rtol=1e-3, atol=1e-5,
    )
    # low_bn's input is a zero-mean random conv output, so its running MEAN
    # is ~1e-5 noise on both sides — the running VAR is the meaningful pin
    np.testing.assert_allclose(
        np.asarray(state.cls2_stats["decoder"]["low_bn"]["var"]),
        t_sd2["decoder.bn1.running_var"].numpy(),
        rtol=1e-3, atol=1e-6,
    )
