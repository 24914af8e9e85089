"""Test-only torch transcription of ONE Trainer_prototype_full training
iteration (reference train_process/Trainer_prototype_full.py:248-517),
used as the step-level numerical-parity oracle for the fused JAX train
step (uda_clr_tpu/train/steps.py).

Like tests/torch_ref.py, this deliberately restates the reference's
choreography (G forward x2, MC-dropout no-grad forwards, prototype EMA +
"First" seeding, G backward + Adam step, D same/diff backwards + SGD
steps) so the aggressively fused JAX step can be validated against the
reference's sequential semantics. Never ships in the package.

One deliberate deviation, matching the framework (models/norm.py:96-100):
BN running statistics are snapshotted before the no-grad MC forwards and
restored after — the reference lets those forwards drift its running
stats (Trainer_prototype_full.py:358-368); the JAX step does not, so the
oracle reproduces the framework's (documented) choice to keep every other
quantity comparable.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchPatchDiscriminator(nn.Module):
    """Reference GAN.py PatchGAN ladder: 5x conv(k4,s2,p2,no bias) with
    LeakyReLU(0.2) between (GAN.py:92-107)."""

    def __init__(self, in_channels: int):
        super().__init__()
        chans = [in_channels, 64, 128, 256, 512, 1]
        for i in range(5):
            self.add_module(
                f"conv{i + 1}", nn.Conv2d(chans[i], chans[i + 1], 4, 2, 2, bias=False)
            )

    def forward(self, x):
        for i in range(5):
            x = getattr(self, f"conv{i + 1}")(x)
            if i < 4:
                x = F.leaky_relu(x, 0.2)
        return x


def torch_gen_prototype(pred, feat):
    """Utils.py:108-131 (NCHW). Returns [cup_obj, disc_obj, cup_bck,
    disc_bck] 1-D tensors (grad-carrying)."""
    cup, disc = pred[:, 0:1], pred[:, 1:]
    out = []
    for m in (cup, disc, 1.0 - cup, 1.0 - disc):
        num = torch.sum(feat * m, dim=[0, 2, 3])
        den = torch.sum(m, dim=[0, 2, 3])
        out.append(num / den)
    return out


def torch_gen_prototype_retrify(o_before, xt_feature, preds_trg, T):
    """Utils.py:159-225 (NCHW): MC-rectified target centroids.

    ``preds_trg``: [T*B, 2, H, W] stacked no-grad MC mask logits (full
    res). The reference also passes (and averages) MC features, but never
    uses the mean feature — omitted here like in the JAX port."""
    B = preds_trg.shape[0] // T
    preds = preds_trg.reshape(T, B, 2, preds_trg.shape[2], preds_trg.shape[3])
    preds1 = torch.sigmoid(preds)
    soft = torch.sigmoid(preds / 2.0)
    std_map = torch.std(soft, dim=0)
    prediction = torch.mean(preds1, dim=0)
    h, w = xt_feature.shape[2], xt_feature.shape[3]
    prediction_small = F.interpolate(prediction, size=(h, w), mode="bilinear", align_corners=True)
    std_small = F.interpolate(std_map, size=(h, w), mode="bilinear", align_corners=True)

    pseudo = torch.sigmoid(o_before).clone()
    pseudo[pseudo > 0.75] = 1.0
    pseudo[pseudo <= 0.75] = 0.0
    t_masks = (pseudo[:, 0:1], pseudo[:, 1:], 1.0 - pseudo[:, 0:1], 1.0 - pseudo[:, 1:])
    conf = ((std_small[:, 0:1] < 0.04).float(), (std_small[:, 1:] < 0.04).float())
    confs = (conf[0], conf[1], conf[0], conf[1])
    pw = prediction_small
    weights = (pw[:, 0:1], pw[:, 1:], 1.0 - pw[:, 0:1], 1.0 - pw[:, 1:])

    out = []
    for m, c, wgt in zip(t_masks, confs, weights):
        num = torch.sum(xt_feature * m * c * wgt, dim=[0, 2, 3])
        den = torch.sum(m * c * wgt, dim=[0, 2, 3])
        out.append(num / den)
    return out


class TorchBank:
    """The trainer-instance EMA prototype state (Trainer_prototype_full.py
    :32-33: First/First_src flags + 8 detached centroid attributes)."""

    def __init__(self):
        self.first_src = True
        self.first_trg = True
        self.src = None  # list of 4 detached tensors
        self.trg = None


def prototype_full_iteration(
    gen: nn.Module,
    dis: nn.Module,
    dis2: nn.Module,
    opt_gen,
    opt_dis,
    opt_dis2,
    bank: TorchBank,
    image_s,
    map_s,
    boundary_s,
    image_t,
    *,
    use_pid: bool = True,
    retrify: bool = True,
    T: int = 4,
    pro_weight: float = 0.1,
    global_pro_weight: float = 0.9,
    adv_weight: float = 0.01,
    src_reg_weight: float | None = None,
    use_entropy_d: bool = True,
):
    """One reference iteration past warmup (epoch > warmup_epoch). Returns
    the scalar losses the JAX step reports in its metrics dict.

    ``use_entropy_d=False`` is the Trainer_posal configuration
    (instruction-verified, PARITY.md §2.2): a SINGLE boundary
    discriminator — the uncertainty/entropy D (``dis2`` here) never
    forwards, never updates, and contributes no adversarial term.
    """
    bceloss = nn.BCELoss()
    mseloss = nn.MSELoss()
    smooth = 1e-7

    gen.train(), dis.train(), dis2.train()
    opt_gen.zero_grad(), opt_dis.zero_grad(), opt_dis2.zero_grad()
    for p in dis.parameters():
        p.requires_grad = False
    for p in dis2.parameters():
        p.requires_grad = False
    for p in gen.parameters():
        p.requires_grad = True

    # target forward FIRST, then source (reference :287-288) — the running
    # BN stats see T's moments before S's.
    oT, boundaryT, _, _, xt_feature, oT_before, _ = gen(image_t)
    oS, boundaryS, _, _, xs_feature, oS_before, _ = gen(image_s)

    loss_seg = bceloss(torch.sigmoid(oS), map_s) + mseloss(torch.sigmoid(boundaryS), boundary_s)

    out = {"loss_seg": loss_seg.item()}
    intra_loss = None
    if use_pid:
        pred_oS = F.interpolate(map_s.clone(), size=oS_before.shape[2:], mode="nearest")
        cur_src = torch_gen_prototype(pred_oS, xs_feature)
        if bank.first_src:
            src = cur_src
            bank.first_src = False
        else:
            d = global_pro_weight
            src = [(1 - d) * b + d * c for b, c in zip(bank.src, cur_src)]
        bank.src = [s.detach() for s in src]

        # MC-dropout no-grad forwards of the 2x-repeated target batch
        # (reference :358-368), WITHOUT drifting running stats (see module
        # docstring). track_running_stats=False makes nn.BatchNorm2d pass
        # None buffers to F.batch_norm in train mode: batch-stats
        # normalization, zero buffer writes — any in-place buffer update
        # here would trip autograd's version check on the main graph
        # (native batch_norm saves the buffers; the reference's custom
        # SyncBN updates stats outside autograd tracking, which is why the
        # reference gets away with drifting them).
        bns = [m for m in gen.modules() if isinstance(m, nn.BatchNorm2d)]
        for m in bns:
            m.track_running_stats = False
        x_rep = image_t.repeat(2, 1, 1, 1)
        chunks = []
        with torch.no_grad():
            for _ in range(T // 2):
                p, *_ = gen(x_rep)
                chunks.append(p)
        for m in bns:
            m.track_running_stats = True
        preds_trg = torch.cat(chunks, dim=0)  # [T*B, 2, H, W]

        if retrify:
            cur_trg = torch_gen_prototype_retrify(oT_before, xt_feature, preds_trg, T)
        else:
            cur_trg = torch_gen_prototype(torch.sigmoid(oT_before), xt_feature)
        if bank.first_trg:
            trg = cur_trg
            bank.first_trg = False
        else:
            d = global_pro_weight
            trg = [(1 - d) * b + d * c for b, c in zip(bank.trg, cur_trg)]
        bank.trg = [t.detach() for t in trg]

        intra_loss = sum(mseloss(s, t) for s, t in zip(src, trg))
        inter_loss = mseloss(src[1], src[3]) + mseloss(src[0], src[2])
        out["loss_intra"] = intra_loss.item()
        out["loss_inter"] = inter_loss.item()

        if src_reg_weight is not None:
            # Trainer_prototype_mt loss_src_reg (instruction-verified,
            # pyc_disasm train_epoch :438-476): channel-mean squared
            # Euclidean distances to the GRAD-CARRYING EMA centroids,
            # margin-0.01 hinge, soft-GT-weighted plain mean. src order:
            # [cup_obj, disc_obj, cup_bck, disc_bck].
            def chan_dist(c):
                return ((xs_feature - c.reshape(1, -1, 1, 1)) ** 2).mean(dim=1)

            cup, disc = pred_oS[:, 0], pred_oS[:, 1]
            src_reg = (
                (cup * F.relu(chan_dist(src[0]) - chan_dist(src[2]) + 0.01)).mean()
                + ((1 - cup) * F.relu(chan_dist(src[2]) - chan_dist(src[0]) + 0.01)).mean()
                + (disc * F.relu(chan_dist(src[1]) - chan_dist(src[3]) + 0.01)).mean()
                + ((1 - disc) * F.relu(chan_dist(src[3]) - chan_dist(src[1]) + 0.01)).mean()
            )
            out["loss_src_reg"] = src_reg.item()

    # adversarial generator term (reference :452-458)
    D_out2 = dis(torch.sigmoid(boundaryT))
    adv_t = F.binary_cross_entropy_with_logits(D_out2, torch.ones_like(D_out2))
    if use_entropy_d:
        unc_T = -1.0 * torch.sigmoid(oT) * torch.log(torch.sigmoid(oT) + smooth)
        D_out1 = dis2(unc_T)
        adv_t = F.binary_cross_entropy_with_logits(
            D_out1, torch.ones_like(D_out1)) + adv_t
    loss_adv = adv_weight * adv_t
    out["loss_adv"] = loss_adv.item()

    loss_all = loss_seg + loss_adv
    if use_pid:
        loss_all = loss_all + pro_weight * intra_loss
        if src_reg_weight is not None:
            loss_all = loss_all + src_reg_weight * src_reg
    out["loss_all"] = loss_all.item()
    loss_all.backward()
    opt_gen.step()

    # discriminators on the detached pre-update generator outputs
    # (reference :471-517)
    for p in dis.parameters():
        p.requires_grad = True
    for p in dis2.parameters():
        p.requires_grad = True
    for p in gen.parameters():
        p.requires_grad = False

    boundaryS_d, oS_d = boundaryS.detach(), oS.detach()
    D_out2 = dis(torch.sigmoid(boundaryS_d))
    loss_D_same2 = F.binary_cross_entropy_with_logits(D_out2, torch.ones_like(D_out2))
    if use_entropy_d:
        unc_S = -1.0 * torch.sigmoid(oS_d) * torch.log(torch.sigmoid(oS_d) + smooth)
        D_out1 = dis2(unc_S)
        loss_D_same1 = F.binary_cross_entropy_with_logits(D_out1, torch.ones_like(D_out1))
        (loss_D_same1 + loss_D_same2).backward()
    else:
        loss_D_same2.backward()

    boundaryT_d, oT_d = boundaryT.detach(), oT.detach()
    D_out2 = dis(torch.sigmoid(boundaryT_d))
    loss_D_diff2 = F.binary_cross_entropy_with_logits(D_out2, torch.zeros_like(D_out2))
    if use_entropy_d:
        unc_T2 = -1.0 * torch.sigmoid(oT_d) * torch.log(torch.sigmoid(oT_d) + smooth)
        D_out1 = dis2(unc_T2)
        loss_D_diff1 = F.binary_cross_entropy_with_logits(D_out1, torch.zeros_like(D_out1))
        (loss_D_diff1 + loss_D_diff2).backward()
    else:
        loss_D_diff2.backward()

    opt_dis.step()
    if use_entropy_d:
        opt_dis2.step()
    for p in gen.parameters():
        p.requires_grad = True

    # the JAX step reports each D's combined same+diff loss
    out["loss_D"] = (loss_D_same2 + loss_D_diff2).item()
    if use_entropy_d:
        out["loss_D2"] = (loss_D_same1 + loss_D_diff1).item()
    return out


def _discriminator_updates(dis, dis2, opt_dis, opt_dis2, oS, boundaryS, oT, boundaryT):
    """The reference's post-G discriminator choreography (shared by every
    adversarial trainer, e.g. Trainer_prototype_full.py:471-517 and the
    instruction-identical blocks in the Trainer_MT bytecode): D on detached
    SOURCE outputs toward label 1, then on detached TARGET outputs toward
    label 0, then both SGD steps. Returns (loss_D, loss_D2) as the JAX step
    reports them (each D's combined same+diff loss)."""
    smooth = 1e-7
    for p in dis.parameters():
        p.requires_grad = True
    for p in dis2.parameters():
        p.requires_grad = True

    boundaryS_d, oS_d = boundaryS.detach(), oS.detach()
    unc_S = -1.0 * torch.sigmoid(oS_d) * torch.log(torch.sigmoid(oS_d) + smooth)
    D_out2 = dis(torch.sigmoid(boundaryS_d))
    D_out1 = dis2(unc_S)
    loss_D_same1 = F.binary_cross_entropy_with_logits(D_out1, torch.ones_like(D_out1))
    loss_D_same2 = F.binary_cross_entropy_with_logits(D_out2, torch.ones_like(D_out2))
    (loss_D_same1 + loss_D_same2).backward()

    boundaryT_d, oT_d = boundaryT.detach(), oT.detach()
    unc_T = -1.0 * torch.sigmoid(oT_d) * torch.log(torch.sigmoid(oT_d) + smooth)
    D_out2 = dis(torch.sigmoid(boundaryT_d))
    D_out1 = dis2(unc_T)
    loss_D_diff1 = F.binary_cross_entropy_with_logits(D_out1, torch.zeros_like(D_out1))
    loss_D_diff2 = F.binary_cross_entropy_with_logits(D_out2, torch.zeros_like(D_out2))
    (loss_D_diff1 + loss_D_diff2).backward()

    opt_dis.step()
    opt_dis2.step()
    return (loss_D_same2 + loss_D_diff2).item(), (loss_D_same1 + loss_D_diff1).item()


def prototype_bank_iteration(
    gen: nn.Module,
    dis: nn.Module,
    dis2: nn.Module,
    opt_gen,
    opt_dis,
    opt_dis2,
    bank: dict,
    image_s,
    map_s,
    boundary_s,
    image_t,
    *,
    epoch: int = 30,
    adv_weight: float = 0.01,
    bank_loss_weight: float = 0.05,
    bank_ema: float = 0.001,
    use_weight_rectify: bool = False,
    pseudo_model: nn.Module | None = None,
):
    """One Trainer_prototype (disk-bank) iteration past warmup
    (train_process/Trainer_prototype.py:240-533, source checked in):
    per-image +1-smoothed bmm pooling of GT-masked source features and
    adaptation_factor-thresholded target pseudo-masks (:360-455; the
    weight-rectified variants are commented out in the source — plain
    sigmoid thresholding, like the framework's default
    use_weight_rectify=False), MSE prototype-distance losses x0.05
    (:475-476), adversarial G term, single backward + Adam step, the
    standard D same/diff updates, then bank EMA 0.001 with the
    zero-vector guard (:529-533, :117-123). ``bank`` is a dict of
    {'bu','cup','disc'} tensors mutated in place.

    The reference concat-forwards S||T in ONE batch (:306) to feed
    TransNorm's half-batch split; this plain-BN oracle runs the
    equivalent separate T-then-S forwards (the woTN bytecode's form,
    and what the framework's domains=2 per-half BN computes).

    woTN switches (Trainer_prototype_woTN, instruction-verified via
    tools/pyc_disasm.py — PARITY.md §2.2):
      * ``use_weight_rectify``: target soft maps are scaled by the
        min-max-normalized per-pixel L2 distance to the corresponding
        BANK vector before thresholding (woTN :381-382/:399/:423;
        prototype_weight/feat_prototype_distance, Trainer_prototype.py:98-116);
      * ``pseudo_model``: a FROZEN generator whose detached 'before'
        heads supply the target pseudo-labels (woTN :309-311/:373-377);
        run in eval mode so its running stats cannot drift (matching the
        framework's documented deviation, steps.py).
    """
    bceloss = nn.BCELoss()
    mseloss = nn.MSELoss()
    smooth = 1e-7
    import math

    thr = 1.0 / (1.0 + math.exp(-0.8 * (epoch + 1))) - 0.3

    gen.train(), dis.train(), dis2.train()
    opt_gen.zero_grad(), opt_dis.zero_grad(), opt_dis2.zero_grad()
    for p in dis.parameters():
        p.requires_grad = False
    for p in dis2.parameters():
        p.requires_grad = False
    for p in gen.parameters():
        p.requires_grad = True

    oT, boundaryT, _, xt_bu_feature, xt_feature, oT_before, bT_before = gen(image_t)
    oS, boundaryS, _, xs_bu_feature, xs_feature, oS_before, _ = gen(image_s)

    loss_seg = bceloss(torch.sigmoid(oS), map_s) + mseloss(
        torch.sigmoid(boundaryS), boundary_s
    )

    def pool(feat, mask):
        # bmm pooling := per-image sum(feat*mask)/(sum(mask)+1), batch mean
        num = torch.sum(feat * mask, dim=[2, 3])  # [B, C]
        den = torch.sum(mask, dim=[2, 3]) + 1.0  # [B, 1]
        return torch.mean(num / den, dim=0)  # [C]

    feat_hw = oS_before.shape[2:]
    pred_oS = F.interpolate(map_s.clone(), size=feat_hw, mode="bilinear", align_corners=True)
    bu_s = F.interpolate(boundary_s.clone(), size=feat_hw, mode="bilinear", align_corners=True)
    proto_x_bu = pool(xs_bu_feature, bu_s)
    proto_x_cup = pool(xs_feature, pred_oS[:, 0:1])
    proto_x_disc = pool(xs_feature, pred_oS[:, 1:2])

    if pseudo_model is not None:
        pseudo_model.eval()
        with torch.no_grad():
            _, _, _, _, _, oT_pseudo, bT_pseudo = pseudo_model(image_t)
        pred_oT = torch.sigmoid(oT_pseudo)
        bu_soft = torch.sigmoid(bT_pseudo)
    else:
        pred_oT = torch.sigmoid(oT_before)
        bu_soft = torch.sigmoid(bT_before)
    cup_soft, disc_soft = pred_oT[:, 0:1], pred_oT[:, 1:]

    def rectify_weight(feat, proto):
        # per-pixel L2 distance to the bank vector, min-max normalized
        # (Trainer_prototype.py:98-116; eps matches ops/prototypes._EPS)
        d = torch.linalg.norm(feat - proto[None, :, None, None], dim=1, keepdim=True)
        return (d - d.min()) / (d.max() - d.min() + 1e-12)

    if use_weight_rectify:
        cup_soft = cup_soft * rectify_weight(xt_feature, bank["cup"])
        disc_soft = disc_soft * rectify_weight(xt_feature, bank["disc"])
        bu_soft = bu_soft * rectify_weight(xt_bu_feature, bank["bu"])

    bu_rect = bu_soft.clone()
    bu_rect[bu_rect > thr] = 1.0
    bu_rect[bu_rect <= thr] = 0.0
    cup_rect = cup_soft.clone()
    cup_rect[cup_rect > thr] = 1.0
    cup_rect[cup_rect <= thr] = 0.0
    disc_rect = disc_soft.clone()
    disc_rect[disc_rect > thr] = 1.0
    disc_rect[disc_rect <= thr] = 0.0
    proto_y_bu = pool(xt_bu_feature, bu_rect)
    proto_y_cup = pool(xt_feature, cup_rect)
    proto_y_disc = pool(xt_feature, disc_rect)

    dis_bu = torch.mean(torch.pow(proto_x_bu - proto_y_bu, 2))
    dis_cup = torch.mean(torch.pow(proto_x_cup - proto_y_cup, 2))
    dis_disc = torch.mean(torch.pow(proto_x_disc - proto_y_disc, 2))

    unc_T = -1.0 * torch.sigmoid(oT) * torch.log(torch.sigmoid(oT) + smooth)
    D_out2 = dis(torch.sigmoid(boundaryT))
    D_out1 = dis2(unc_T)
    loss_adv = adv_weight * (
        F.binary_cross_entropy_with_logits(D_out1, torch.ones_like(D_out1))
        + F.binary_cross_entropy_with_logits(D_out2, torch.ones_like(D_out2))
    )

    loss_all = loss_seg + loss_adv + bank_loss_weight * (dis_disc + dis_cup + dis_bu)
    out = {
        "loss_seg": loss_seg.item(),
        "loss_adv": loss_adv.item(),
        "loss_bu": dis_bu.item(),
        "loss_cup": dis_cup.item(),
        "loss_disc": dis_disc.item(),
        "loss_all": loss_all.item(),
    }
    loss_all.backward()
    opt_gen.step()

    for p in gen.parameters():
        p.requires_grad = False
    out["loss_D"], out["loss_D2"] = _discriminator_updates(
        dis, dis2, opt_dis, opt_dis2, oS, boundaryS, oT, boundaryT
    )
    for p in gen.parameters():
        p.requires_grad = True

    # bank EMA with the zero-vector guard (update_objective_SingleVector)
    with torch.no_grad():
        for key, y in (("bu", proto_y_bu), ("cup", proto_y_cup), ("disc", proto_y_disc)):
            if float(y.sum()) != 0.0:
                bank[key] = bank[key] * (1.0 - bank_ema) + bank_ema * y.detach()
    return out


def mean_teacher_iteration(
    gen: nn.Module,
    teacher: nn.Module,
    dis: nn.Module,
    dis2: nn.Module,
    opt_gen,
    opt_dis,
    opt_dis2,
    image_s,
    map_s,
    boundary_s,
    image_t,
    *,
    global_step: int,
    consistency_weight: float,
    ema_decay: float = 0.99,
    adv_weight: float = 0.01,
    teacher_noise: float = 0.0,
):
    """One Trainer_MT iteration (bytecode-only; instruction-verified via
    tools/pyc_disasm.py — objective at :356, consistency at :239/:339, EMA
    at :30-34). Teacher noise defaults OFF (the framework's
    teacher_noise=0 configuration) so the step is deterministic;
    ``teacher_noise`` > 0 adds the bytecode's ``randn``-scaled noise to the
    teacher's input (torch RNG — not alignable with the JAX side; used by
    tools/ab_mt_noise_sigma.py to bound the unextractable sigma constant).

    Reproduces the framework's ONE documented deviation: the teacher's BN
    buffers are copied from the student after each step (the reference EMAs
    ``.parameters()`` only, freezing its teacher buffers at init —
    steps.py:983-1001 documents why we deviate); everything else follows
    the bytecode: student T-then-S forwards, loss_seg + 0.01*(adv1+adv2) +
    w*MSE(sig(oT_student), sig(oT_teacher)) [mask head only], G Adam step,
    then the standard D same/diff updates, then
    alpha = min(1 - 1/(global_step+1), ema_decay) parameter EMA."""
    bceloss = nn.BCELoss()
    mseloss = nn.MSELoss()
    smooth = 1e-7

    gen.train(), dis.train(), dis2.train()
    opt_gen.zero_grad(), opt_dis.zero_grad(), opt_dis2.zero_grad()
    for p in dis.parameters():
        p.requires_grad = False
    for p in dis2.parameters():
        p.requires_grad = False
    for p in gen.parameters():
        p.requires_grad = True

    teacher.eval()
    with torch.no_grad():
        t_in = image_t
        if teacher_noise > 0.0:
            t_in = image_t + teacher_noise * torch.randn_like(image_t)
        oT_teacher, *_ = teacher(t_in)

    # student: target first, then source (the fused domains=2 forward's
    # per-half BN == the reference's separate forwards, T-then-S stats)
    oT, boundaryT, *_ = gen(image_t)
    oS, boundaryS, *_ = gen(image_s)

    loss_seg = bceloss(torch.sigmoid(oS), map_s) + mseloss(
        torch.sigmoid(boundaryS), boundary_s
    )
    unc_T = -1.0 * torch.sigmoid(oT) * torch.log(torch.sigmoid(oT) + smooth)
    D_out1 = dis2(unc_T)
    D_out2 = dis(torch.sigmoid(boundaryT))
    loss_adv = adv_weight * (
        F.binary_cross_entropy_with_logits(D_out1, torch.ones_like(D_out1))
        + F.binary_cross_entropy_with_logits(D_out2, torch.ones_like(D_out2))
    )
    cons = mseloss(torch.sigmoid(oT), torch.sigmoid(oT_teacher))
    loss_all = loss_seg + loss_adv + consistency_weight * cons
    out = {
        "loss_seg": loss_seg.item(),
        "loss_adv": loss_adv.item(),
        "loss_consistency": cons.item(),
        "loss_all": loss_all.item(),
    }
    loss_all.backward()
    opt_gen.step()

    for p in gen.parameters():
        p.requires_grad = False
    out["loss_D"], out["loss_D2"] = _discriminator_updates(
        dis, dis2, opt_dis, opt_dis2, oS, boundaryS, oT, boundaryT
    )
    for p in gen.parameters():
        p.requires_grad = True

    # teacher EMA of the UPDATED student params (steps.py:994-1000)
    alpha = min(1.0 - 1.0 / (global_step + 1.0), ema_decay)
    with torch.no_grad():
        for tp, sp in zip(teacher.parameters(), gen.parameters()):
            tp.mul_(alpha).add_(sp, alpha=1.0 - alpha)
        # framework deviation: teacher tracks the student's running stats
        for tb, sb in zip(teacher.buffers(), gen.buffers()):
            tb.copy_(sb)
    return out


def bcdm_iteration(
    tm1: nn.Module,
    tm2: nn.Module,
    opt_fea,
    opt_cls,
    image_s,
    map_s,
    boundary_s,
    image_t,
    *,
    temperature: float = 1.8,
    cdd_weight: float = 0.01,
    inner_fea_steps: int = 4,
):
    """One Trainer_bcdm iteration (bytecode-only; instruction-verified via
    tools/pyc_disasm.py, train_epoch :202-372). F = tm1.backbone;
    C1 = tm1.aspp+decoder; C2 = tm2.aspp+decoder (tm2.backbone unused —
    exclude it from the optimizers). opt_fea over F, opt_cls over C1+C2
    jointly, mirroring the bytecode's two Adams.

      A (:224-287): source forward through F and both classifiers; mask
        logits tempered by 1.8 (boundary MSE untempered); one backward;
        BOTH optimizer steps.
      B (:290-316): fresh source forward whose loss is dead (kept for its
        train-mode BN running-stat updates); target forward;
        0.01*discrepancy(mask logits) backward; opt_cls.step() ONLY
        (positive sign — as compiled, B *minimizes* the discrepancy).
      C (:318-330): 4 x {fresh target forward; 0.01*discrepancy backward;
        opt_fea.step()}.
    """
    bceloss = nn.BCELoss()
    mseloss = nn.MSELoss()
    out_hw = image_s.shape[2:]

    def cls_fwd(m, high, low):
        feat = m.aspp(high)
        x1, boundary, _, _ = m.decoder(feat, low)
        up = lambda t: F.interpolate(t, size=out_hw, mode="bilinear", align_corners=True)
        return up(x1), up(boundary)

    def discrepancy(v1, v2):
        return torch.mean(torch.abs(torch.sigmoid(v1) - torch.sigmoid(v2)))

    tm1.train(), tm2.train()

    # ---- A ----
    opt_fea.zero_grad(), opt_cls.zero_grad()
    high, low = tm1.backbone(image_s)
    o1, b1 = cls_fwd(tm1, high, low)
    o2, b2 = cls_fwd(tm2, high, low)
    loss_seg = (
        bceloss(torch.sigmoid(o1 / temperature), map_s)
        + mseloss(torch.sigmoid(b1), boundary_s)
        + bceloss(torch.sigmoid(o2 / temperature), map_s)
        + mseloss(torch.sigmoid(b2), boundary_s)
    )
    loss_seg.backward()
    opt_fea.step()
    opt_cls.step()

    # ---- B ----
    opt_fea.zero_grad(), opt_cls.zero_grad()
    high, low = tm1.backbone(image_s)  # dead forward: BN-stat side effects only
    cls_fwd(tm1, high, low)
    cls_fwd(tm2, high, low)
    high, low = tm1.backbone(image_t)
    o1t, _ = cls_fwd(tm1, high, low)
    o2t, _ = cls_fwd(tm2, high, low)
    cdd_before = discrepancy(o1t, o2t)
    (cdd_weight * cdd_before).backward()
    opt_cls.step()

    # ---- C ----
    for _ in range(inner_fea_steps):
        opt_fea.zero_grad(), opt_cls.zero_grad()
        high, low = tm1.backbone(image_t)
        o1t, _ = cls_fwd(tm1, high, low)
        o2t, _ = cls_fwd(tm2, high, low)
        cdd_after = discrepancy(o1t, o2t)
        (cdd_weight * cdd_after).backward()
        opt_fea.step()

    return {
        "loss_seg": loss_seg.item(),
        "loss_cdd_before": cdd_before.item(),
        "loss_cdd_after": cdd_after.item(),
    }
