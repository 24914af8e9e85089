"""Fused jitted train/eval steps — the reference's per-iteration
choreography (zero_grad x3, param freeze/unfreeze, 10 forwards, 3
backwards, dozens of .item() syncs — Trainer_prototype_full.py:248-592)
collapsed into ONE XLA program per method.

Design:
  * one generator forward on the source‖target concat feeds the G loss,
    both D losses (via stop_gradient, replacing .detach()), and the
    prototype pooling;
  * three gradient computations share that forward; G grads flow through
    the frozen discriminators (their params are simply not differentiated,
    replacing requires_grad toggling);
  * MC-dropout pseudo-label rectification is a vmap over T/2 dropout keys
    of the 2x-repeated target batch (reference loops 4 sequential CUDA
    forwards, :358-368) — one batched XLA computation, stop-gradiented;
  * update order G -> D preserved: D gradients are computed from the
    pre-update generator outputs (identical values, since detached);
  * all scalars are returned as a metrics dict, fetched asynchronously by
    the trainer — no host syncs inside the step.

Static method switches (proto phase, retrify, ...) select between a small
number of compiled programs; everything per-step (lr, epoch scalars) is a
traced input, so no retraces during training.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

from uda_clr_tpu.config import Config
from uda_clr_tpu.data.wire import decode_batch
from uda_clr_tpu.models.deeplab import DeepLab, DeepLabOutputs
from uda_clr_tpu.models.gan import BoundaryDiscriminator, UncertaintyDiscriminator
from uda_clr_tpu.ops import losses as L
from uda_clr_tpu.ops import prototypes as P
from uda_clr_tpu.ops.augment import strong_augment
from uda_clr_tpu.ops.resize import resize_nearest
from uda_clr_tpu.train import optim as optim_lib
from uda_clr_tpu.train.state import TrainState


@functools.lru_cache(maxsize=4)
def _discriminators(dtype_name: str):
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    return BoundaryDiscriminator(dtype=dtype), UncertaintyDiscriminator(dtype=dtype)


def _split(outs: DeepLabOutputs, b: int):
    """Split a concat [S;T] forward into per-domain output tuples."""
    src = DeepLabOutputs(*(o[:b] for o in outs))
    trg = DeepLabOutputs(*(o[b:] for o in outs))
    return src, trg


def _gen_apply(model, params, stats, x, rng, train, domains, mutable):
    variables = {"params": params, "batch_stats": stats}
    if mutable:
        return model.apply(
            variables, x, train=train, domains=domains,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
    out = model.apply(variables, x, train=train, domains=domains, rngs={"dropout": rng})
    return out, {"batch_stats": stats}


def _dropout_key(k, impl: str):
    """Re-wrap a threefry key as a TPU-native RBG key: dropout's random-bit
    generation is a measurable slice of train-mode forwards (the big
    128x128x256..305 masks), and the hardware RNG cuts it."""
    if impl in ("rbg", "unsafe_rbg"):
        kd = jax.random.key_data(k)
        return jax.random.wrap_key_data(jnp.concatenate([kd, kd]), impl=impl)
    return k


def _deep_merge(base, upd):
    """Merge a partial mutated batch_stats tree over the full one (flax
    returns only the modules visited by a split apply)."""
    out = dict(base)
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _moments_f32(t):
    """Batch moments over (N,H,W), exactly models/norm.py:_batch_moments."""
    t32 = t.astype(jnp.float32)
    mean = jnp.mean(t32, axis=(0, 1, 2))
    var = jnp.maximum(
        jnp.mean(jnp.square(t32), axis=(0, 1, 2)) - jnp.square(mean), 0.0
    )
    return mean, var


def _bn_apply(x, mean, var, scale, bias, eps=1e-5):
    """Train-mode BN normalize in x.dtype, exactly models/norm.py:_normalize."""
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * (inv * scale).astype(x.dtype) \
        + bias.astype(x.dtype)


def _mc_drop(key, x, rate: float):
    """TpuDropout's semantics under the ambient global backend (identity
    when the parity harness sets 'off'; 16-bit words under the default
    'xla16'; uint32 bernoulli otherwise)."""
    from uda_clr_tpu.models import layers as layers_lib

    impl = layers_lib._DROPOUT_IMPL
    if impl == "off" or rate == 0.0:
        return x
    keep = 1.0 - rate
    if impl == "xla16":
        bits = jax.random.bits(key, x.shape, jnp.uint16)
        mask = bits < jnp.uint16(min(int(round(keep * 65536.0)), 65535))
    else:
        mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0).astype(x.dtype)


def _conv(x, kernel, padding):
    """NHWC conv matching models/layers.Conv2d's nn.Conv in x.dtype."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _mc_suffix(model, params, stats, feat_predrop, ll, hw, b, t_samples: int,
               rng, rng_impl: str, mask_head_impl: str,
               tn_degenerate: bool = False):
    """T dropout-sampled mask-head passes from a (deterministic) prefix.

    This is the hand-scheduled twin of Decoder.suffix_bound + the mask
    head, specialized to the no-grad flat-T*B MC pass (same math, kept in
    lockstep — the dropout-off step-parity harness pins it to the torch
    oracle exactly):

      * replicate at the first dropout site; one flat T*B batch
        (elementwise dropout under one key = i.i.d. masks per copy; BN
        moments over identical copies = per-forward moments);
      * bound_conv1 is computed as conv(x_up, W[:256]) + conv(ll, W[256:])
        — exact by linearity — so the [T*B,128,128,304] concat (and the
        two full-tensor layout copies XLA emitted for it) never exists;
      * BN normalizes with batch moments computed like _batch_moments (no
        running-stat writes, deliberately — see DomainNorm2d docstring);
      * the mask head runs as the three-input fused Pallas epilogue
        (ops/pallas/mask_head.py:fused_mask_head_split), so the
        [T*B,.,305] concat never exists either.

    ``tn_degenerate=True`` applies the TransNorm identical-halves
    degenerate semantics (see DomainNorm2d's ``domains=0``): each norm
    site multiplies by (1+alpha)==2 exactly, folded into the affine as
    scale*2 / bias*2. Post-dropout the reference's per-half alpha deviates
    from 1 only by dropout noise on the half-moments — the same order of
    approximation as the flat-T*B moment mixing already documented above
    (dropout-off, the two paths are bit-equal; pinned by
    tests/test_mc_twin.py's norm='tn' parametrization).

    Returns stop-gradiented [T, B, H, W, 2] mask logits (callers must
    also pass stop-gradiented params/inputs when tracing under a grad).
    """
    from uda_clr_tpu.models import layers as layers_lib
    from uda_clr_tpu.ops.pallas.mask_head import fused_mask_head_split
    from uda_clr_tpu.ops.resize import resize_bilinear_align_corners

    H, W = hw
    dec = params["decoder"]
    s2 = 2.0 if tn_degenerate else 1.0
    k_aspp, k_d1, k_d2, k_mask = jax.random.split(rng, 4)
    # hardware RBG keys for the big mask draws (same as TpuDropout's path);
    # k_mask included so the XLA fallback inside fused_mask_head_split draws
    # its big bernoulli from the same key family as the other three sites
    # (seed_from_key folds either key type for the Pallas path).
    k_aspp = _dropout_key(k_aspp, rng_impl)
    k_d1 = _dropout_key(k_d1, rng_impl)
    k_d2 = _dropout_key(k_d2, rng_impl)
    k_mask = _dropout_key(k_mask, rng_impl)

    feat_rep = jnp.concatenate([feat_predrop] * t_samples, axis=0)
    ll_rep = jnp.concatenate([ll] * t_samples, axis=0)

    # ASPP Dropout(0.5) per sample at feature res, then upsample to 1/4
    x = _mc_drop(k_aspp, feat_rep, 0.5)
    x_up = resize_bilinear_align_corners(x, (ll.shape[1], ll.shape[2]))

    # boundary head (Decoder.suffix_bound's math), conv1 split over the
    # virtual concat
    # (A commuted conv1-of-resize — channel mix at the 32x32 pre-resize
    # grid, 1.24 -> 0.18 TFLOP — was A/B'd on real v5e and RETIRED: the
    # step's analytic FLOPs drop 6.66 -> 5.6 T but time is a wash/loss
    # because XLA un-fuses the downstream dropout chain; see PARITY.md
    # round-3 kernel table.)
    w1 = dec["bound_conv1"]["conv"]["kernel"]  # [3,3,304,256]
    y = _conv(x_up, w1[:, :, :256, :], [(1, 1), (1, 1)]) + \
        _conv(ll_rep, w1[:, :, 256:, :], [(1, 1), (1, 1)])
    mu1, var1 = _moments_f32(y)
    y = jax.nn.relu(_bn_apply(y, mu1, var1, dec["bound_bn1"]["scale"] * s2,
                              dec["bound_bn1"]["bias"] * s2))
    y = _mc_drop(k_d1, y, 0.5)
    y = _conv(y, dec["bound_conv2"]["conv"]["kernel"], [(1, 1), (1, 1)])
    mu2, var2 = _moments_f32(y)
    y = jax.nn.relu(_bn_apply(y, mu2, var2, dec["bound_bn2"]["scale"] * s2,
                              dec["bound_bn2"]["bias"] * s2))
    y = _mc_drop(k_d2, y, 0.1)
    boundary = _conv(y, dec["bound_out"]["conv"]["kernel"], [(0, 0), (0, 0)]) \
        + dec["bound_out"]["conv"]["bias"].astype(y.dtype)

    # mask head: moments of the virtual 305-concat decompose per channel
    mu_x, var_x = _moments_f32(x_up)
    mu_l, var_l = _moments_f32(ll_rep)
    mu_b, var_b = _moments_f32(boundary)
    drop_rate = 0.0 if layers_lib._DROPOUT_IMPL == "off" else 0.1
    x1 = fused_mask_head_split(
        x_up, ll_rep, boundary,
        jnp.concatenate([mu_x, mu_l, mu_b]),
        jnp.concatenate([var_x, var_l, var_b]),
        dec["mask_bn"]["scale"] * s2, dec["mask_bn"]["bias"] * s2,
        dec["mask_out"]["conv"]["kernel"], dec["mask_out"]["conv"]["bias"],
        k_mask, rate=drop_rate,
        impl="xla" if drop_rate == 0.0 else mask_head_impl,
    )
    mc = resize_bilinear_align_corners(x1, (H, W)).reshape(t_samples, b, H, W, -1)
    return jax.lax.stop_gradient(mc)


def _mc_dropout_forward(model, params, stats, imageT, rng, t_samples: int,
                        fast: bool, rng_impl: str, mask_head_impl: str = "auto"):
    """T MC-dropout mask-logit samples of the target batch, [T, B, H, W, 2].

    Reference behaviour (Trainer_prototype_full.py:358-368): T/2 train-mode
    full forwards of the 2x-repeated batch — elementwise dropout gives 2
    independent samples per forward; BN normalizes with the repeated-batch
    statistics, which equal the plain batch statistics.

    ``fast`` (default): no backbone in any of the four backbones contains
    dropout, so the T samples share ONE deterministic backbone pass; only
    ASPP+decoder+upsample run per-sample, as a single flat T*B batch under
    one dropout key (i.i.d. masks per repeated sample) at a fraction of
    the FLOPs. One documented approximation: for norm layers *downstream
    of a dropout layer*, train-mode batch stats mix all T dropout samples
    (the reference's 2x-repeated forwards mix 2; stats are over B*H*W
    pixels either way, so the difference is noise on the std-map).

    Under TransNorm the fast path is also valid: the reference's MC
    forward feeds TN a [T;T] identical-halves repeat, for which TN
    reduces EXACTLY to batch-moment normalization times 2 up to the first
    dropout site (dis==0 -> alpha==1; DomainNorm2d ``domains=0``), so the
    shared deterministic prefix is bit-equal to the repeated form;
    downstream of dropout, alpha==1 is an approximation of the same order
    as the moment mixing above (the reference's per-half alpha deviates
    from 1 only by dropout noise). ``fast=False`` reproduces the
    reference's repeated-batch structure exactly for either norm.

    Outputs are stop-gradiented (reference runs under no_grad); running
    stats are NOT drifted (deliberate fix — the reference lets these
    forwards perturb its running stats).
    """
    b, H, W = imageT.shape[0], imageT.shape[1], imageT.shape[2]
    variables = {"params": params, "batch_stats": stats}
    if fast:
        tn = model.norm == "tn"
        dm = 0 if tn else 1  # TN identical-halves degenerate mode
        high, low = model.apply(variables, imageT, True, dm, method="features")
        # The deterministic pre-dropout prefix (full ASPP minus its final
        # dropout + the decoder low-level projection) runs ONCE at batch B:
        # replicating T times first would feed every BN T identical copies
        # (identical moments) and every conv identical inputs — pure waste
        # (measured ~9 ms/step at the flagship shapes). Replication happens
        # at the first dropout site instead; bit-identical numerics.
        # (The flagship step avoids even this batch-B pass by reusing the
        # main S||T forward's target half — see make_train_step's inline
        # MC path; this standalone entry remains for the slow/TN paths and
        # direct callers.)
        feat_predrop, ll = model.apply(
            variables, high, low, True, dm, method="heads_prefix"
        )
        return _mc_suffix(model, params, stats, feat_predrop, ll, (H, W), b,
                          t_samples, rng, rng_impl, mask_head_impl,
                          tn_degenerate=tn)

    lanes = max(t_samples // 2, 1)
    x_rep = jnp.concatenate([imageT, imageT], axis=0)
    keys = jax.random.split(rng, lanes)

    def one(k):
        outs, _ = _gen_apply(
            model, params, stats, x_rep, _dropout_key(k, rng_impl), True, 1, mutable=False
        )
        return outs.mask_logits  # [2B, H, W, 2]

    mc = jax.vmap(one)(keys)  # [lanes, 2B, H, W, 2]
    mc = mc.reshape(lanes * 2, b, *mc.shape[2:])
    return jax.lax.stop_gradient(mc[:t_samples])


def make_bcdm_step(model: DeepLab, cfg: Config):
    """Bi-classifier discrepancy step (bytecode-only ``Trainer_bcdm``).

    Round 3: **instruction-verified** against the full ``tools/pyc_disasm.py``
    disassembly of ``Trainer_bcdm.cpython-38.pyc`` (train_epoch, source
    lines 202-372). The compiled choreography per iteration — which
    deviates from the MCD paper in ways round 2's symbol-level
    reconstruction guessed wrong — is:

      A. (:224-287) zero grads; source forward through ``model_fea`` +
         both classifiers; mask logits divided by **temperature 1.8**
         (:235-237); ``loss_seg = BCE(sig(oS_1/1.8)) + BCE(sig(oS_2/1.8))
         + MSE(sig(bS_1)) + MSE(sig(bS_2))``; backward; BOTH
         ``optim_fea.step()`` and ``optim_cls.step()``.
      B. (:290-316) zero grads; a fresh source forward recomputes an
         un-tempered ``loss_seg`` that is NEVER backwarded or logged
         (dead except its train-mode BN running-stat updates — we keep
         the forward for the stat side-effects and let XLA drop the dead
         value); target forward; ``loss_cdd_before =
         discrepancy(oT_1, oT_2)`` — **mask logits only**, no boundary
         term (:308); ``loss_all = 0.01 * loss_cdd_before``; backward;
         ``optim_cls.step()`` ONLY. Note the POSITIVE sign: as compiled,
         phase B *minimizes* the discrepancy w.r.t. the classifiers (the
         MCD paper maximizes it and keeps a seg term; the reference does
         neither).
      C. (:318-330) ``for k in range(4)``: zero grads; target forward;
         ``loss_cdd_after = discrepancy(oT_1, oT_2)``; ``total_loss =
         0.01 * loss_cdd_after``; backward; ``optim_fea.step()``.

    ``discrepancy_calc`` (:26-37) = ``mean(|sigmoid(v1) - sigmoid(v2)|)``.

    The split here is F = backbone, C_i = ASPP+decoder+upsample (the
    model's existing features/heads seam). Three Adam optimizers with
    independent step counts (``state.bcdm_opt``) stand in for the
    bytecode's two (``optim_fea``/``optim_cls`` with C1+C2 joint) —
    numerically equivalent for per-parameter Adam, which has no
    cross-parameter coupling. Both use ``lr_gen`` (the bytecode creates
    both LRs from the same 1e-3 const). Classifier 1 doubles as the eval
    model (``gen_params``); classifier 2 lives in
    ``state.cls2_params/stats``. Each phase runs its forwards in train
    mode with mutable running stats, chained A -> B -> C like the
    reference's sequential optimizer steps. ``loss_all`` in the metrics
    is OUR monitoring aggregate of the three backwarded objectives (the
    reference logs no such scalar).
    """
    tx = optim_lib.adam_direction(cfg.optim.adam_b1, cfg.optim.adam_b2)
    compute_dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    CLS_KEYS = ("aspp", "decoder")
    TEMPERATURE = 1.8  # Trainer_bcdm.py:235 (LOAD_CONST 1.8)
    CDD_WEIGHT = 0.01  # :314 / :326
    INNER_FEA_STEPS = 4  # :318 (range(4))

    def discrepancy(v1, v2):
        return jnp.mean(jnp.abs(jax.nn.sigmoid(v1) - jax.nn.sigmoid(v2)))

    def seg_loss(outs, map_s, boundary_s, temp=1.0):
        o = outs.mask_logits.astype(jnp.float32) / temp
        bd = outs.boundary_logits.astype(jnp.float32)
        return L.bce_sigmoid_stable(o, map_s) + L.mse(jax.nn.sigmoid(bd), boundary_s)

    def step(state: TrainState, batch: dict, lr_gen, lr_dis, epoch):
        batch = decode_batch(batch)  # uint8 wire batches -> canonical fp32
        rng, *ks = jax.random.split(state.rng, 16)
        image_s = batch["image_s"].astype(compute_dtype)
        map_s, boundary_s = batch["map_s"], batch["boundary_s"]
        image_t = batch["image_t"].astype(compute_dtype)
        out_hw = (image_s.shape[1], image_s.shape[2])

        fea = {"backbone": state.gen_params["backbone"]}
        cls1 = {k: state.gen_params[k] for k in CLS_KEYS}
        cls2 = state.cls2_params
        bb_stats = {"backbone": state.gen_stats["backbone"]}
        cls1_stats = {k: state.gen_stats[k] for k in CLS_KEYS}
        cls2_stats = state.cls2_stats
        opt = dict(state.bcdm_opt)

        def features(fea_p, stats, x, domains):
            (high, low), upd = model.apply(
                {"params": fea_p, "batch_stats": stats}, x, True, domains,
                method="features", mutable=["batch_stats"],
            )
            return high, low, upd["batch_stats"]

        def heads(cls_p, stats, high, low, domains, k):
            outs, upd = model.apply(
                {"params": cls_p, "batch_stats": stats}, high, low, out_hw,
                True, domains, method="heads", mutable=["batch_stats"],
                rngs={"dropout": k},
            )
            return outs, upd["batch_stats"]

        # ---- A: supervised source step for F, C1, C2 (mask logits
        # tempered by 1.8, boundary MSE untempered — :235-243) ----
        def loss_a(fea_p, cls1_p, cls2_p):
            high, low, new_bb = features(fea_p, bb_stats, image_s, 1)
            o1, new_c1 = heads(cls1_p, cls1_stats, high, low, 1, ks[0])
            o2, new_c2 = heads(cls2_p, cls2_stats, high, low, 1, ks[1])
            loss = (
                seg_loss(o1, map_s, boundary_s, TEMPERATURE)
                + seg_loss(o2, map_s, boundary_s, TEMPERATURE)
            )
            viz = {
                "pred_s": jax.nn.sigmoid(o1.mask_logits.astype(jnp.float32)[0]),
                "pred_b_s": jax.nn.sigmoid(o1.boundary_logits.astype(jnp.float32)[0]),
            }
            return loss, (new_bb, new_c1, new_c2, viz)

        (l_a, (bb_stats, cls1_stats, cls2_stats, viz)), grads_a = jax.value_and_grad(
            loss_a, argnums=(0, 1, 2), has_aux=True
        )(fea, cls1, cls2)
        for name, params, g in (("fea", fea, grads_a[0]), ("cls1", cls1, grads_a[1]),
                                ("cls2", cls2, grads_a[2])):
            upd, opt[name] = tx.update(g, opt[name], params)
            new_p = optim_lib.apply_updates(params, upd, lr_gen)
            if name == "fea":
                fea = new_p
            elif name == "cls1":
                cls1 = new_p
            else:
                cls2 = new_p

        # ---- B (:290-316): the dead source forward (loss never
        # backwarded/logged) runs only for its train-mode BN running-stat
        # updates; then 0.01*discrepancy(target mask logits) steps the
        # CLASSIFIERS (positive sign — see docstring) ----
        high_s, low_s, bb_stats = features(fea, bb_stats, image_s, 1)
        _, cls1_stats = heads(cls1, cls1_stats, high_s, low_s, 1, ks[2])
        _, cls2_stats = heads(cls2, cls2_stats, high_s, low_s, 1, ks[3])

        def loss_b(cls1_p, cls2_p):
            high, low, new_bb = features(fea, bb_stats, image_t, 1)
            o1, new_c1 = heads(cls1_p, cls1_stats, high, low, 1, ks[4])
            o2, new_c2 = heads(cls2_p, cls2_stats, high, low, 1, ks[5])
            cdd = discrepancy(
                o1.mask_logits.astype(jnp.float32), o2.mask_logits.astype(jnp.float32)
            )
            return CDD_WEIGHT * cdd, (cdd, new_bb, new_c1, new_c2)

        (l_b, (cdd_before, bb_stats, cls1_stats, cls2_stats)), grads_b = (
            jax.value_and_grad(loss_b, argnums=(0, 1), has_aux=True)(cls1, cls2)
        )
        upd1, opt["cls1"] = tx.update(grads_b[0], opt["cls1"], cls1)
        cls1 = optim_lib.apply_updates(cls1, upd1, lr_gen)
        upd2, opt["cls2"] = tx.update(grads_b[1], opt["cls2"], cls2)
        cls2 = optim_lib.apply_updates(cls2, upd2, lr_gen)

        # ---- C (:318-330): 4 inner iterations, each a fresh target
        # forward; 0.01*discrepancy steps the FEATURE EXTRACTOR ----
        def loss_c(fea_p, c1_stats, c2_stats, bbs, k1, k2):
            high, low, new_bb = features(fea_p, bbs, image_t, 1)
            o1, new_c1 = heads(cls1, c1_stats, high, low, 1, k1)
            o2, new_c2 = heads(cls2, c2_stats, high, low, 1, k2)
            cdd = discrepancy(
                o1.mask_logits.astype(jnp.float32), o2.mask_logits.astype(jnp.float32)
            )
            return CDD_WEIGHT * cdd, (cdd, new_bb, new_c1, new_c2)

        cdd_after = 0.0
        for k in range(INNER_FEA_STEPS):
            (_, (cdd_after, bb_stats, cls1_stats, cls2_stats)), grad_c = (
                jax.value_and_grad(loss_c, has_aux=True)(
                    fea, cls1_stats, cls2_stats, bb_stats,
                    ks[6 + 2 * k], ks[7 + 2 * k],
                )
            )
            upd_f, opt["fea"] = tx.update(grad_c, opt["fea"], fea)
            fea = optim_lib.apply_updates(fea, upd_f, lr_gen)

        metrics = {
            "loss_seg": l_a,
            "loss_cdd_before": cdd_before,
            "loss_cdd_after": cdd_after,
            "loss_all": l_a + CDD_WEIGHT * (cdd_before + cdd_after),
            "_viz": viz,
        }
        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            gen_params={**fea, **cls1},
            gen_stats={**bb_stats, **cls1_stats},
            cls2_params=cls2,
            cls2_stats=cls2_stats,
            bcdm_opt=opt,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=0)


def make_train_step(model: DeepLab, cfg: Config, method: str, proto_phase: bool = False):
    """Build the jitted train step for a method.

    batch keys: image_s, map_s, boundary_s, image_t (all NHWC fp32).
    Scalar inputs: lr_gen, lr_dis, epoch (traced — no retraces across
    epochs).

    Ablation switches (the bytecode-only reference trainers, evidence =
    ``strings`` over ``train_process/__pycache__/*.cpython-38.pyc``):

    * ``method='posal'`` — Trainer_posal: adversarial UDA with a SINGLE
      boundary discriminator. Bytecode shows ``model_dis``/``optim_dis``
      only (no ``model_dis2``), and only the boundary-D locals of
      Trainer.py survive (``D_out2``/``loss_adv_diff2``/``loss_D_same2``/
      ``loss_D_diff2``; zero uncertainty/entropy symbols). Implemented as
      'adversarial' with ``use_entropy_d`` forced off.
    * ``use_adv=False`` — Trainer_MT_wo_ad: mean teacher WITHOUT the
      adversarial branch (bytecode: ``model_gen_student/teacher`` +
      consistency symbols, no discriminator symbols at all).
    * ``use_boundary_loss=False`` — Trainer_baseline_wob: supervised
      baseline without the boundary MSE term (bytecode train_epoch locals
      have ``loss_seg1`` but no ``loss_seg2``).
    * ``bank_use_bu=False`` — Trainer_prototype_delete_en: the bu
      prototype-distance term dropped from the bank method's loss
      (bytecode logs ``train_pro/loss_cup``/``loss_disc`` but NO
      ``train_pro/loss_bu``, unlike Trainer_prototype), cup/disc pools
      smoothed with +1e-16 instead of +1, and no target bu pooling/EMA
      (instruction-verified round 3). Its ``get_prototype_weight_souce``
      output feeds only a TB image, never a loss — verified, see PARITY.md.
    * ``use_weight_rectify=True`` (+ ``pseudo_from_initial=True`` with
      ``--initial-resume``) — Trainer_prototype_woTN (instruction-verified
      round 3): the bank method with plain BN (``norm='bn'``; the separate
      S/T forwards its bytecode shows ARE our ``domains=2`` per-half
      semantics), target soft maps multiplied by the min-max L2-distance
      weights to the bank vectors before thresholding, and pseudo-labels
      from the frozen initial-resume model's 'before' heads.
    """
    if method == "bcdm":
        return make_bcdm_step(model, cfg)
    mcfg = cfg.method
    tx_gen = optim_lib.adam_direction(cfg.optim.adam_b1, cfg.optim.adam_b2)
    tx_dis = optim_lib.sgd_direction(cfg.optim.sgd_momentum, cfg.optim.weight_decay)
    compute_dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    DIS, DIS2 = _discriminators(cfg.model.compute_dtype)

    use_boundary_d = mcfg.use_boundary_d
    use_entropy_d = mcfg.use_entropy_d and method != "posal"
    if method == "posal":
        method = "adversarial"
    # 'use_target' = the step consumes a target batch (S||T concat
    # forward); 'use_adv' = the discriminator game actually runs.
    use_target = method != "baseline"
    use_adv = use_target and mcfg.use_adv and (use_boundary_d or use_entropy_d)
    use_proto_full = method in ("prototype_full", "prototype_mt") and proto_phase
    use_proto_bank = method == "prototype" and proto_phase
    use_mt_losses = method == "prototype_mt" and proto_phase
    if use_mt_losses and mcfg.use_trg_cons and not mcfg.retrify_pseudo:
        raise ValueError(
            "use_trg_cons requires retrify_pseudo=True: the reference "
            "weights loss_aug by gen_prototype_retrify's MC-std confidence "
            "masks (Trainer_prototype_mt bytecode raises NameError on "
            "mask_0/mask_1 without the retrify branch)"
        )
    use_teacher = method == "mean_teacher"

    def step(state: TrainState, batch: dict, lr_gen, lr_dis, epoch):
        batch = decode_batch(batch)  # uint8 wire batches -> canonical fp32
        rng, k_fwd, k_mc, k_aug, k_augfwd, k_teacher = jax.random.split(state.rng, 6)
        k_fwd = _dropout_key(k_fwd, mcfg.rng_impl)
        k_augfwd = _dropout_key(k_augfwd, mcfg.rng_impl)
        image_s = batch["image_s"].astype(compute_dtype)
        map_s = batch["map_s"]
        boundary_s = batch["boundary_s"]
        b = image_s.shape[0]
        metrics = {}

        if use_target:
            image_t = batch["image_t"].astype(compute_dtype)
            x_all = jnp.concatenate([image_s, image_t], axis=0)
        else:
            x_all = image_s

        # ---- MC-dropout rectification (no-grad), done once per step ----
        # Fast path: inlined into gen_loss_fn below — the main S||T forward
        # with domains=2 normalizes the target half with target-only batch
        # moments, so its (aspp-predrop, low-level) target slices are
        # BIT-IDENTICAL to a standalone batch-B backbone+prefix pass on
        # image_t; reusing them (stop-gradiented) eliminates the entire MC
        # backbone recompute. Slow/TN path keeps the standalone forwards.
        mc_inline = (
            use_proto_full and mcfg.retrify_pseudo and use_target
            and mcfg.mc_fast and model.norm == "bn"
        )
        mc_logits = None
        if use_proto_full and mcfg.retrify_pseudo and not mc_inline:
            # TN takes this path with fast=True via the identical-halves
            # degenerate prefix (see _mc_dropout_forward); only bn can go
            # further and inline the sampling into the main S||T forward.
            mc_logits = _mc_dropout_forward(
                model, state.gen_params, state.gen_stats, image_t, k_mc,
                mcfg.mc_samples, fast=mcfg.mc_fast,
                rng_impl=mcfg.rng_impl,
                mask_head_impl=getattr(mcfg, "mask_head_impl", "auto"),
            ).astype(jnp.float32)

        # ---- teacher forward (mean teacher) ----
        # Trainer_MT / Trainer_MT_wo_ad bytecode feeds the teacher a NOISED
        # target view (``imageT_teacher`` built with ``randn``); the sigma
        # is not extractable from the bytecode consts — 0.1 follows the
        # canonical mean-teacher recipe and is configurable.
        teacher_out = None
        if use_teacher:
            t_in = image_t
            if mcfg.teacher_noise > 0.0:
                t_in = image_t + (
                    mcfg.teacher_noise
                    * jax.random.normal(k_teacher, image_t.shape, jnp.float32)
                ).astype(compute_dtype)
            t_outs, _ = _gen_apply(
                model, state.teacher_params, state.teacher_stats, t_in,
                k_teacher, False, 1, mutable=False,
            )
            teacher_out = jax.lax.stop_gradient(t_outs)

        # ---- generator loss (one fused forward) ----
        def gen_loss_fn(gen_params):
            if mc_inline:
                # split apply (features -> prefix -> suffix) so the target
                # halves of the prefix can seed the MC sampling
                variables = {"params": gen_params, "batch_stats": state.gen_stats}
                (high, low), u1 = model.apply(
                    variables, x_all, True, 2, method="features",
                    mutable=["batch_stats"],
                )
                (fp_all, ll_all), u2 = model.apply(
                    variables, high, low, True, 2, method="heads_prefix",
                    mutable=["batch_stats"],
                )
                outs, u3 = model.apply(
                    variables, fp_all, ll_all,
                    (x_all.shape[1], x_all.shape[2]), True, 2,
                    method="heads_suffix", mutable=["batch_stats"],
                    rngs={"dropout": k_fwd},
                )
                # each apply saw the ORIGINAL stats and returns the full
                # collection with only its own modules updated — pick every
                # subtree from the apply that ran it (backbone from the
                # features pass; ASPP + decoder.low_bn from the prefix;
                # the decoder head BNs from the suffix)
                new_stats = dict(state.gen_stats)
                new_stats["backbone"] = u1["batch_stats"]["backbone"]
                new_stats["aspp"] = u2["batch_stats"]["aspp"]
                new_stats["decoder"] = _deep_merge(
                    u3["batch_stats"]["decoder"],
                    {"low_bn": u2["batch_stats"]["decoder"]["low_bn"]},
                )
                upd = {"batch_stats": new_stats}
                mc_local = _mc_suffix(
                    model, jax.tree.map(jax.lax.stop_gradient, gen_params),
                    state.gen_stats,
                    jax.lax.stop_gradient(fp_all[b:]),
                    jax.lax.stop_gradient(ll_all[b:]),
                    (x_all.shape[1], x_all.shape[2]), b, mcfg.mc_samples,
                    k_mc, mcfg.rng_impl, getattr(mcfg, "mask_head_impl", "auto"),
                ).astype(jnp.float32)
            else:
                outs, upd = _gen_apply(
                    model, gen_params, state.gen_stats, x_all, k_fwd, True,
                    2 if use_target else 1, mutable=True,
                )
                mc_local = mc_logits
            aux = {"stats": upd["batch_stats"]}
            if use_target:
                out_s, out_t = _split(outs, b)
            else:
                out_s, out_t = outs, None

            o_s = out_s.mask_logits.astype(jnp.float32)
            b_s = out_s.boundary_logits.astype(jnp.float32)
            # first-image probability maps for the reference's every-30-iter
            # tensorboard grids (Trainer_prototype_full.py:307-325,519-575);
            # sliced ON DEVICE so the trainer only fetches a few [H,W,2]
            # tiles for the iterations it actually logs.
            viz = {
                "pred_s": jax.nn.sigmoid(o_s[0]),
                "pred_b_s": jax.nn.sigmoid(b_s[0]),
            }
            # BCELoss-on-sigmoid value (reference :292) with the bounded
            # logits-space gradient — see losses.bce_sigmoid_stable.
            # use_boundary_loss=False drops the MSE boundary term
            # (Trainer_baseline_wob: no loss_seg2 local in bytecode).
            loss_seg = L.bce_sigmoid_stable(o_s, map_s)
            if mcfg.use_boundary_loss:
                loss_seg = loss_seg + L.mse(jax.nn.sigmoid(b_s), boundary_s)
            loss = loss_seg
            m = {"loss_seg": loss_seg}

            if use_target:
                o_t = out_t.mask_logits.astype(jnp.float32)
                bd_t = out_t.boundary_logits.astype(jnp.float32)
                aux["out_t"] = jax.tree.map(jax.lax.stop_gradient, out_t)
                viz["pred_t"] = jax.nn.sigmoid(o_t[0])
                viz["bnd_t_raw"] = bd_t[0]  # logged unsigmoided (:534-535)
            if use_adv:
                # reference term order: uncertainty-D first, boundary-D
                # second (Trainer_prototype_full.py:452-458)
                adv = 0.0
                if use_entropy_d:
                    d_u = DIS2.apply(
                        {"params": state.dis2_params},
                        L.entropy_map(o_t).astype(compute_dtype),
                    ).astype(jnp.float32)
                    adv = adv + L.bce_with_logits(d_u, jnp.ones_like(d_u))
                if use_boundary_d:
                    d_b = DIS.apply(
                        {"params": state.dis_params},
                        jax.nn.sigmoid(bd_t).astype(compute_dtype),
                    ).astype(jnp.float32)
                    adv = adv + L.bce_with_logits(d_b, jnp.ones_like(d_b))
                loss_adv = mcfg.adv_weight * adv
                loss = loss + loss_adv
                m["loss_adv"] = loss_adv

            if use_proto_full:
                feat_hw = (out_s.x_feature.shape[1], out_s.x_feature.shape[2])
                pred_s = resize_nearest(map_s, feat_hw)
                cur_src = P.gen_prototype(pred_s, out_s.x_feature.astype(jnp.float32))
                if mcfg.use_global:
                    bank_src = P.Prototypes.unstack(state.proto_src)
                    d = mcfg.global_pro_weight
                    src = jax.tree.map(
                        lambda bk, cu: jnp.where(
                            state.proto_src_init, (1 - d) * bk + d * cu, cu
                        ),
                        bank_src, cur_src,
                    )
                else:
                    src = cur_src

                if mcfg.retrify_pseudo:
                    rect = P.gen_prototype_retrify(
                        out_t.mask_before.astype(jnp.float32),
                        out_t.x_feature.astype(jnp.float32),
                        mc_local,
                        mcfg.pseudo_threshold,
                        mcfg.std_threshold,
                    )
                    cur_trg = rect.prototypes
                    viz["std_t"] = rect.std_map[0]
                    viz["conf_t"] = rect.conf_mask[0]
                else:
                    cur_trg = P.gen_prototype(
                        jax.nn.sigmoid(out_t.mask_before.astype(jnp.float32)),
                        out_t.x_feature.astype(jnp.float32),
                    )
                if mcfg.use_global:
                    bank_trg = P.Prototypes.unstack(state.proto_trg)
                    d = mcfg.global_pro_weight
                    trg = jax.tree.map(
                        lambda bk, cu: jnp.where(
                            state.proto_trg_init, (1 - d) * bk + d * cu, cu
                        ),
                        bank_trg, cur_trg,
                    )
                else:
                    trg = cur_trg

                intra = P.intra_domain_loss(src, trg)
                inter = P.inter_domain_loss(src)  # logged only (reference :443-465)
                loss = loss + mcfg.pro_weight * intra
                m["loss_intra"] = intra
                m["loss_inter"] = inter
                aux["new_src"] = jax.lax.stop_gradient(src.stack())
                aux["new_trg"] = jax.lax.stop_gradient(trg.stack())

                if use_mt_losses and mcfg.src_reg:
                    # grad-carrying EMA centroids, per the bytecode (the
                    # detach() copies only seed the NEXT iteration); the
                    # reference NameErrors here when use_pid is off — ours
                    # couples src_reg to the prototype block by nesting.
                    src_reg = P.source_discriminative_loss(
                        out_s.x_feature.astype(jnp.float32), pred_s, src
                    )
                    loss = loss + mcfg.src_reg_weight * src_reg
                    m["loss_src_reg"] = src_reg

            if use_proto_bank:
                # Trainer_prototype variant: batch prototypes via per-image
                # +1-smoothed pooling, epoch-ramped pseudo-label thresholds,
                # MSE prototype-distance losses weighted 0.05
                # (Trainer_prototype.py:355-476).
                feat_hw = (out_s.x_feature.shape[1], out_s.x_feature.shape[2])
                from uda_clr_tpu.ops.resize import resize_bilinear_align_corners

                # Trainer_prototype.py:360-383 smooths every pool with +1;
                # the delete_en bytecode keeps +1 for bu but uses +1e-16
                # for cup/disc on both domains (pyc_disasm, :388/:395 and
                # the y-side pools) — gated here on the same switch that
                # selects the delete_en ablation.
                fg_eps = 1.0 if mcfg.bank_use_bu else 1e-16
                pred_s = resize_bilinear_align_corners(map_s, feat_hw)
                bu_s = resize_bilinear_align_corners(boundary_s, feat_hw)
                xs_bu = out_s.x_bu_feature.astype(jnp.float32)
                xs_f = out_s.x_feature.astype(jnp.float32)
                proto_x_bu = P.masked_pool_mean(xs_bu, bu_s)
                proto_x_cup = P.masked_pool_mean(xs_f, pred_s[..., 0:1], fg_eps)
                proto_x_disc = P.masked_pool_mean(xs_f, pred_s[..., 1:2], fg_eps)

                thr = P.adaptation_factor(epoch)
                if mcfg.pseudo_from_initial:
                    # Trainer_prototype_woTN :309-311/:373-377: target
                    # pseudo-labels from the FROZEN initial-resume model's
                    # 'before' heads, detached. We run it in eval mode so
                    # the frozen model's running stats cannot drift
                    # (deliberate; the bytecode leaves the torch module in
                    # whatever mode it was last set).
                    init_outs, _ = _gen_apply(
                        model, state.initial_params, state.initial_stats,
                        image_t, k_fwd, False, 1, mutable=False,
                    )
                    pred_t = jax.nn.sigmoid(
                        jax.lax.stop_gradient(init_outs.mask_before.astype(jnp.float32))
                    )
                    bu_soft = jax.nn.sigmoid(
                        jax.lax.stop_gradient(init_outs.boundary_before.astype(jnp.float32))
                    )
                else:
                    pred_t = jax.nn.sigmoid(out_t.mask_before.astype(jnp.float32))
                    bu_soft = jax.nn.sigmoid(out_t.boundary_before.astype(jnp.float32))
                xt_f = out_t.x_feature.astype(jnp.float32)
                cup_soft, disc_soft = pred_t[..., 0:1], pred_t[..., 1:2]
                if mcfg.use_weight_rectify:
                    # woTN :381-382/:399/:423: soft maps scaled by the
                    # min-max-normalized L2 distance to the BANK vector
                    # before thresholding.
                    cup_soft = cup_soft * P.minmax_prototype_weight(
                        P.feat_prototype_distance(xt_f, state.proto_bank["cup"])
                    )
                    disc_soft = disc_soft * P.minmax_prototype_weight(
                        P.feat_prototype_distance(xt_f, state.proto_bank["disc"])
                    )
                cup_rect = (cup_soft > thr).astype(jnp.float32)
                disc_rect = (disc_soft > thr).astype(jnp.float32)
                proto_y_cup = P.masked_pool_mean(xt_f, cup_rect, fg_eps)
                proto_y_disc = P.masked_pool_mean(xt_f, disc_rect, fg_eps)
                if mcfg.bank_use_bu:
                    xt_bu = out_t.x_bu_feature.astype(jnp.float32)
                    if mcfg.use_weight_rectify:
                        bu_soft = bu_soft * P.minmax_prototype_weight(
                            P.feat_prototype_distance(xt_bu, state.proto_bank["bu"])
                        )
                    bu_rect = (bu_soft > thr).astype(jnp.float32)
                    proto_y_bu = P.masked_pool_mean(xt_bu, bu_rect)
                else:
                    # delete_en never pools a target bu prototype (no
                    # proj_*_y_bu locals in its bytecode), so its bu bank
                    # vector never EMAs.
                    proto_y_bu = None

                dis_cup = jnp.mean(jnp.square(proto_x_cup - proto_y_cup))
                dis_disc = jnp.mean(jnp.square(proto_x_disc - proto_y_disc))
                bank_loss = dis_cup + dis_disc
                # bank_use_bu=False: Trainer_prototype_delete_en logs only
                # train_pro/loss_cup + loss_disc (no loss_bu in bytecode)
                if mcfg.bank_use_bu:
                    dis_bu = jnp.mean(jnp.square(proto_x_bu - proto_y_bu))
                    bank_loss = bank_loss + dis_bu
                    m["loss_bu"] = dis_bu
                loss = loss + mcfg.bank_loss_weight * bank_loss
                m["loss_cup"] = dis_cup
                m["loss_disc"] = dis_disc

                # EMA the disk bank toward current target prototypes
                # (update_objective_SingleVector, momentum 0.001; skipped
                # for all-zero vectors like the reference's guard)
                mom = mcfg.bank_ema
                new_bank = {}
                for key, cur in (
                    ("bu", proto_y_bu), ("cup", proto_y_cup), ("disc", proto_y_disc)
                ):
                    bank_v = state.proto_bank[key]
                    if cur is None:
                        new_bank[key] = bank_v
                        continue
                    upd = (1.0 - mom) * bank_v + mom * jax.lax.stop_gradient(cur)
                    new_bank[key] = jnp.where(jnp.sum(cur) != 0.0, upd, bank_v)
                aux["new_bank"] = new_bank

            if use_mt_losses and mcfg.use_trg_cons:
                # Augmented-consistency on target. Instruction-verified
                # against Trainer_prototype_mt.cpython-38.pyc train_epoch
                # offsets 2556-2966 (source :498-568, tools/pyc_disasm.py):
                #  - pseudo-labels: sigmoid(oT).detach() binarized at the
                #    RAMPED threshold (0.85 + 0.25*sigmoid_rampup(epoch,200))
                #    * ln(2)  [both target_name branches compute the same
                #    formula — the Drishti-GS if/else is dead];
                #  - per-pixel weights: the MC-dropout std<0.04 confidence
                #    masks mask_0/mask_1 returned by gen_prototype_retrify,
                #    nearest-upsampled to the loss res (their {0,2} scaling
                #    cancels in the normalized sum below) — so use_trg_cons
                #    REQUIRES retrify (the reference NameErrors otherwise;
                #    we raise at build time, see make_train_step);
                #  - the logged value includes aug_weight (:561);
                #  - the labels ride through the augmenter, but the aug
                #    family is color-only, so they come back unchanged —
                #    our on-device strong_augment transforms the image only.
                # THE COMPILED REFERENCE NEVER BACKWARDS THIS LOSS: the
                # bytecode's only backwards are loss_all and the two D
                # losses; loss_aug is computed after loss_all.backward()
                # and before optim_gen.step(), logged, and discarded.
                # aug_backward=True opts into the paper's stated semantics
                # (add aug_weight*loss_aug to the G objective).
                ramp = jnp.exp(
                    -5.0 * jnp.square(1.0 - jnp.clip(epoch, 0.0, 200.0) / 200.0)
                )
                thr = (0.85 + 0.25 * ramp) * math.log(2.0)
                p_plain = jax.nn.sigmoid(jax.lax.stop_gradient(out_t.mask_logits.astype(jnp.float32)))
                pseudo = (p_plain > thr).astype(jnp.float32)
                conf = resize_nearest(
                    jax.lax.stop_gradient(rect.conf_mask),
                    (image_t.shape[1], image_t.shape[2]),
                )
                x_aug = strong_augment(k_aug, image_t.astype(jnp.float32)).astype(compute_dtype)
                outs_aug, _ = _gen_apply(
                    model, gen_params, state.gen_stats, x_aug, k_augfwd, True, 1, mutable=False
                )
                o_aug = outs_aug.mask_logits.astype(jnp.float32)
                if not mcfg.aug_backward:
                    o_aug = jax.lax.stop_gradient(o_aug)
                per_px = L.bce_sigmoid_stable_elementwise(o_aug, pseudo)
                loss_aug = mcfg.aug_weight * jnp.sum(per_px * conf) / jnp.sum(conf)
                if mcfg.aug_backward:
                    loss = loss + loss_aug
                m["loss_aug"] = loss_aug

            if use_teacher:
                # Instruction-verified (Trainer_MT.cpython-38.pyc :339 via
                # tools/pyc_disasm.py): consistency = nn.MSELoss()(
                # sig(oT_student), sig(oT_teacher)) — MASK head only, no
                # boundary term (aug_loss built at :239).
                w = batch.get("consistency_weight", jnp.asarray(mcfg.consistency))
                cons = L.mse(
                    jax.nn.sigmoid(out_t.mask_logits.astype(jnp.float32)),
                    jax.nn.sigmoid(teacher_out.mask_logits.astype(jnp.float32)),
                )
                loss = loss + w * cons
                m["loss_consistency"] = cons

            aux["metrics"] = m
            aux["out_s"] = jax.tree.map(jax.lax.stop_gradient, out_s)
            aux["viz"] = jax.tree.map(jax.lax.stop_gradient, viz)
            return loss, aux

        (loss_all, aux), gen_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params
        )
        metrics.update(aux["metrics"])
        metrics["loss_all"] = loss_all
        metrics["_viz"] = aux["viz"]  # popped by the trainer before scalar fetch

        # ---- generator update (Adam, torch semantics) ----
        gen_updates, gen_opt = tx_gen.update(gen_grads, state.gen_opt, state.gen_params)
        gen_params = optim_lib.apply_updates(state.gen_params, gen_updates, lr_gen)

        dis_params, dis2_params = state.dis_params, state.dis2_params
        dis_opt, dis2_opt = state.dis_opt, state.dis2_opt
        if use_adv:
            out_s, out_t = aux["out_s"], aux["out_t"]

            # Separate S and T discriminator passes, matching the
            # reference's structure (Trainer_prototype_full.py:479-513):
            # BCE(S,1) + BCE(T,0), identical value to the previously-used
            # 2*BCE(concat,[1;0]) fusion. Separate passes are FASTER here:
            # stop_gradient is identity in HLO, so the T pass below is the
            # SAME subgraph as the generator loss's D(T) forward above and
            # XLA CSE computes it once — the 2x-batch concat pass could
            # never share it (different shapes).
            if use_boundary_d:
                sig_bs = jax.nn.sigmoid(out_s.boundary_logits.astype(jnp.float32)).astype(compute_dtype)
                sig_bt = jax.nn.sigmoid(out_t.boundary_logits.astype(jnp.float32)).astype(compute_dtype)

                def dis_loss_fn(p):
                    out_s = DIS.apply({"params": p}, sig_bs).astype(jnp.float32)
                    out_t = DIS.apply({"params": p}, sig_bt).astype(jnp.float32)
                    return L.bce_with_logits(out_s, jnp.ones_like(out_s)) + \
                        L.bce_with_logits(out_t, jnp.zeros_like(out_t))

                loss_d, dis_grads = jax.value_and_grad(dis_loss_fn)(state.dis_params)
                dis_updates, dis_opt = tx_dis.update(dis_grads, state.dis_opt, state.dis_params)
                dis_params = optim_lib.apply_updates(state.dis_params, dis_updates, lr_dis)
                metrics["loss_D"] = loss_d

            if use_entropy_d:
                ent_s = L.entropy_map(out_s.mask_logits.astype(jnp.float32)).astype(compute_dtype)
                ent_t = L.entropy_map(out_t.mask_logits.astype(jnp.float32)).astype(compute_dtype)

                def dis2_loss_fn(p):
                    out_s = DIS2.apply({"params": p}, ent_s).astype(jnp.float32)
                    out_t = DIS2.apply({"params": p}, ent_t).astype(jnp.float32)
                    return L.bce_with_logits(out_s, jnp.ones_like(out_s)) + \
                        L.bce_with_logits(out_t, jnp.zeros_like(out_t))

                loss_d2, dis2_grads = jax.value_and_grad(dis2_loss_fn)(state.dis2_params)
                dis2_updates, dis2_opt = tx_dis.update(dis2_grads, state.dis2_opt, state.dis2_params)
                dis2_params = optim_lib.apply_updates(state.dis2_params, dis2_updates, lr_dis)
                metrics["loss_D2"] = loss_d2

        # ---- prototype bank EMA commit ----
        proto_src, proto_trg = state.proto_src, state.proto_trg
        proto_src_init, proto_trg_init = state.proto_src_init, state.proto_trg_init
        if use_proto_full:
            proto_src = aux["new_src"]
            proto_trg = aux["new_trg"]
            proto_src_init = jnp.ones((), bool)
            proto_trg_init = jnp.ones((), bool)
        proto_bank = aux["new_bank"] if use_proto_bank else state.proto_bank

        # ---- teacher EMA (after student step, Trainer_MT semantics) ----
        teacher_params, teacher_stats = state.teacher_params, state.teacher_stats
        if use_teacher:
            # update_ema_variables (Trainer_MT.py:30-34, instruction-
            # verified): alpha = min(1 - 1/(global_step+1), 0.99) — the
            # early-training ramp makes the teacher track the student
            # closely at first. The reference EMAs .parameters() only, so
            # its teacher's BN buffers stay frozen at their init values; we
            # deliberately track the student's running stats instead (the
            # canonical mean-teacher recipe — the teacher forward here runs
            # in eval mode and would otherwise normalize with stale stats).
            alpha = jnp.minimum(
                1.0 - 1.0 / (state.step.astype(jnp.float32) + 1.0),
                mcfg.ema_decay,
            )
            teacher_params = optim_lib.weight_ema(
                state.teacher_params, gen_params, alpha
            )
            teacher_stats = aux["stats"]

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            gen_params=gen_params,
            gen_stats=aux["stats"],
            dis_params=dis_params,
            dis2_params=dis2_params,
            gen_opt=gen_opt,
            dis_opt=dis_opt,
            dis2_opt=dis2_opt,
            proto_src=proto_src,
            proto_trg=proto_trg,
            proto_src_init=proto_src_init,
            proto_trg_init=proto_trg_init,
            teacher_params=teacher_params,
            teacher_stats=teacher_stats,
            proto_bank=proto_bank,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=0)


def make_eval_step(model: DeepLab, compute_dtype=jnp.float32):
    """Eval forward + on-device BCE-with-logits val loss
    (Trainer_prototype_full.py:133-135); metric binarization stays
    host-side for bit-parity with the reference's numpy pipeline.

    The loss is returned PER IMAGE ([B]) so the trainer can pad the final
    partial validation batch up to the full batch size (one compiled shape,
    no re-jit per validation) and average only over the real images —
    identical value to the reference's per-batch mean since every image has
    the same pixel count."""

    def step(variables, image, map_t):
        decoded = decode_batch({"image": image, "map": map_t})
        image, map_t = decoded["image"], decoded["map"]
        outs = model.apply(variables, image.astype(compute_dtype), train=False)
        logits = outs.mask_logits.astype(jnp.float32)
        per_image = jnp.mean(
            L.bce_with_logits_elementwise(logits, map_t), axis=(1, 2, 3)
        )
        return logits, outs.boundary_logits.astype(jnp.float32), per_image

    return jax.jit(step)
