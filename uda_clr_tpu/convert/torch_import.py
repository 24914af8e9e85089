"""PyTorch -> JAX weight conversion for reference checkpoints.

Supports the two interop flows the reference depends on:
  * the ImageNet-pretrained MobileNetV2 state_dict
    (networks/backbone/mobilenet.py:124-133, hard-coded path there);
  * full training checkpoints (``model_state_dict`` /
    ``model_dis_state_dict`` / ``model_dis2_state_dict``) for the BEAL
    warm-start (``--initial_resume``, train_use_fix_initial.py:183-199)
    and for accuracy-parity testing against reference runs.

Layout translation: torch OIHW conv weights -> HWIO (depthwise [C,1,k,k]
-> [k,k,1,C] falls out of the same transpose); BN ``weight/bias`` ->
``scale/bias`` params; ``running_mean/var`` -> ``batch_stats`` ``mean/var``
(plain BN) or the four per-domain TransNorm buffers
(``running_{mean,var}_{source,target}`` — sync_batchnorm/batchnorm.py:313-317).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from uda_clr_tpu.models.mobilenet import mobilenet_block_plan


def _conv_w(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _put(tree: dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value, dtype=np.float32)


def _bn_entries(sd: dict, torch_prefix: str, params: dict, stats: dict, path: tuple) -> None:
    if f"{torch_prefix}.weight" in sd:
        _put(params, path + ("scale",), sd[f"{torch_prefix}.weight"])
        _put(params, path + ("bias",), sd[f"{torch_prefix}.bias"])
    if f"{torch_prefix}.running_mean" in sd:  # plain BN
        _put(stats, path + ("mean",), sd[f"{torch_prefix}.running_mean"])
        _put(stats, path + ("var",), sd[f"{torch_prefix}.running_var"])
    elif f"{torch_prefix}.running_mean_source" in sd:  # TransNorm
        for k in ("mean_source", "var_source", "mean_target", "var_target"):
            _put(stats, path + (k,), sd[f"{torch_prefix}.running_{k}"])


def _conv_entry(sd: dict, torch_prefix: str, params: dict, path: tuple) -> None:
    if f"{torch_prefix}.weight" in sd:
        _put(params, path + ("conv", "kernel"), _conv_w(sd[f"{torch_prefix}.weight"]))
    if f"{torch_prefix}.bias" in sd:
        _put(params, path + ("conv", "bias"), sd[f"{torch_prefix}.bias"])


def _convert_mobilenet_backbone(sd, params, stats, output_stride):
    """torch features.0 stem + features.1..17 inverted residuals
    (backbone/mobilenet.py:77-110)."""
    _conv_entry(sd, "backbone.features.0.0", params, ("backbone", "stem"))
    _bn_entries(sd, "backbone.features.0.1", params, stats, ("backbone", "stem_bn"))
    for idx, (cin, cout, stride, dil, t) in enumerate(mobilenet_block_plan(output_stride)):
        tp = f"backbone.features.{idx + 1}.conv"
        bp = ("backbone", f"block_{idx}")
        if t == 1:
            layers = [("0", "depthwise"), ("1", "depthwise_bn"), ("3", "project"), ("4", "project_bn")]
        else:
            layers = [
                ("0", "expand"), ("1", "expand_bn"), ("3", "depthwise"),
                ("4", "depthwise_bn"), ("6", "project"), ("7", "project_bn"),
            ]
        for ti, name in layers:
            if name.endswith("_bn"):
                _bn_entries(sd, f"{tp}.{ti}", params, stats, bp + (name,))
            else:
                _conv_entry(sd, f"{tp}.{ti}", params, bp + (name,))


def _convert_bottleneck(sd, tp, params, stats, bp):
    """One torchvision-layout Bottleneck (backbone/resnet.py:6-43 /
    drn.py Bottleneck): conv1-3/bn1-3 + optional downsample.{0,1}."""
    for k in (1, 2, 3):
        _conv_entry(sd, f"{tp}.conv{k}", params, bp + (f"conv{k}",))
        _bn_entries(sd, f"{tp}.bn{k}", params, stats, bp + (f"bn{k}",))
    if f"{tp}.downsample.0.weight" in sd:
        _conv_entry(sd, f"{tp}.downsample.0", params, bp + ("down_conv",))
        _bn_entries(sd, f"{tp}.downsample.1", params, stats, bp + ("down_bn",))


def _convert_resnet_backbone(sd, params, stats):
    """ResNet101 [3,4,23,3] + multi-grid layer4 (backbone/resnet.py:45-121,
    torchvision state_dict layout, also the ImageNet resnet101 zoo file)."""
    _conv_entry(sd, "backbone.conv1", params, ("backbone", "conv1"))
    _bn_entries(sd, "backbone.bn1", params, stats, ("backbone", "bn1"))
    for L, blocks in zip((1, 2, 3, 4), (3, 4, 23, 3)):
        for i in range(blocks):
            _convert_bottleneck(
                sd, f"backbone.layer{L}.{i}", params, stats,
                ("backbone", f"layer{L}_{i}"),
            )


def _xception_rep_indices(reps, stride, start_with_relu, grow_first, is_last):
    """Replay Block.__init__'s rep-list construction (backbone/xception.py
    :34-80) to map JAX sep{k} -> torch rep.{i} Sequential indices."""
    idx, pos = [], 0
    n_units = (1 if grow_first else 0) + (reps - 1) + (0 if grow_first else 1)
    n_units += (1 if stride != 1 else 0) + (1 if stride == 1 and is_last else 0)
    for _ in range(n_units):
        pos += 1  # the ReLU
        idx.append(pos)  # SeparableConv2d at pos, outer BN at pos+1
        pos += 2
    if not start_with_relu:
        idx = [i - 1 for i in idx]
    return idx


def _convert_sep_conv(sd, tp, params, stats, bp):
    """SeparableConv2d: conv1 (depthwise) + bn + pointwise
    (backbone/xception.py:17-31)."""
    _conv_entry(sd, f"{tp}.conv1", params, bp + ("depthwise",))
    _bn_entries(sd, f"{tp}.bn", params, stats, bp + ("bn",))
    _conv_entry(sd, f"{tp}.pointwise", params, bp + ("pointwise",))


def _convert_xception_backbone(sd, params, stats, output_stride):
    """AlignedXception (backbone/xception.py:96-232)."""
    entry3_stride = 2 if output_stride == 16 else 1
    _conv_entry(sd, "backbone.conv1", params, ("backbone", "conv1"))
    _bn_entries(sd, "backbone.bn1", params, stats, ("backbone", "bn1"))
    _conv_entry(sd, "backbone.conv2", params, ("backbone", "conv2"))
    _bn_entries(sd, "backbone.bn2", params, stats, ("backbone", "bn2"))

    # (reps, stride, start_with_relu, grow_first, is_last) per block
    cfgs = {1: (2, 2, False, True, False), 2: (2, 2, False, True, False),
            3: (2, entry3_stride, True, True, True)}
    for i in range(4, 20):
        cfgs[i] = (3, 1, True, True, False)
    cfgs[20] = (2, 1, True, False, True)
    for bnum, cfg in cfgs.items():
        tp = f"backbone.block{bnum}"
        bp = ("backbone", f"block{bnum}")
        for k, rep_i in enumerate(_xception_rep_indices(*cfg)):
            _convert_sep_conv(sd, f"{tp}.rep.{rep_i}", params, stats, bp + (f"sep{k}",))
            _bn_entries(sd, f"{tp}.rep.{rep_i + 1}", params, stats, bp + (f"sep{k}_bn",))
        if f"{tp}.skip.weight" in sd:
            _conv_entry(sd, f"{tp}.skip", params, bp + ("skip",))
            _bn_entries(sd, f"{tp}.skipbn", params, stats, bp + ("skip_bn",))

    for k in (3, 4, 5):
        _convert_sep_conv(sd, f"backbone.conv{k}", params, stats, ("backbone", f"conv{k}"))
        _bn_entries(sd, f"backbone.bn{k}", params, stats, ("backbone", f"bn{k}"))


def _convert_drn_backbone(sd, params, stats):
    """DRN-D-54 (backbone/drn.py:102-230): layer0 stem Sequential,
    conv layers 1/2/7/8, Bottleneck layers 3-6."""
    _conv_entry(sd, "backbone.layer0.0", params, ("backbone", "layer0_conv"))
    _bn_entries(sd, "backbone.layer0.1", params, stats, ("backbone", "layer0_bn"))
    for L, convs in ((1, 1), (2, 1), (7, 1), (8, 1)):
        for i in range(convs):
            _conv_entry(sd, f"backbone.layer{L}.{3 * i}", params,
                        ("backbone", f"layer{L}_conv{i}"))
            _bn_entries(sd, f"backbone.layer{L}.{3 * i + 1}", params, stats,
                        ("backbone", f"layer{L}_bn{i}"))
    for L, blocks in zip((3, 4, 5, 6), (3, 4, 6, 3)):
        for i in range(blocks):
            _convert_bottleneck(
                sd, f"backbone.layer{L}.{i}", params, stats,
                ("backbone", f"layer{L}_{i}"),
            )


def convert_deeplab_state_dict(sd: dict, output_stride: int = 16) -> tuple[dict, dict]:
    """Reference DeepLab state_dict -> (params, batch_stats) trees matching
    uda_clr_tpu.models.deeplab.DeepLab. The backbone family is detected
    from the state_dict's own key layout (all four reference backbones are
    supported, enabling ImageNet/pretrained and checkpoint import for
    each — reference backbone/{mobilenet,resnet,xception,drn}.py)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # RAW backbone files (the ImageNet zoo checkpoints the reference
    # hard-codes: backbone/mobilenet.py:124-133 'features....' keys,
    # resnet.py:141 torchvision 'conv1/layer1....' keys) come without the
    # 'backbone.' prefix a full-model state_dict has — normalize so both
    # import through the same layouts.
    if not any(k.startswith(("backbone.", "aspp.", "decoder.")) for k in sd):
        sd = {f"backbone.{k}": v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    # ---- backbone (prefix-based so partial dicts — e.g. TN buffer-only
    # checkpoints — still convert; unmatched entries are simply skipped by
    # the per-layer emitters) ----
    if any(k.startswith("backbone.block") for k in sd):
        _convert_xception_backbone(sd, params, stats, output_stride)
    elif any(k.startswith("backbone.layer0.") for k in sd):
        _convert_drn_backbone(sd, params, stats)
    elif any(k.startswith("backbone.layer1.0.conv1") for k in sd):
        _convert_resnet_backbone(sd, params, stats)
    else:
        _convert_mobilenet_backbone(sd, params, stats, output_stride)

    # ---- ASPP ----
    for k in range(1, 5):
        _conv_entry(sd, f"aspp.aspp{k}.atrous_conv", params, ("aspp", f"aspp{k}", "atrous_conv"))
        _bn_entries(sd, f"aspp.aspp{k}.bn", params, stats, ("aspp", f"aspp{k}", "bn"))
    _conv_entry(sd, "aspp.global_avg_pool.1", params, ("aspp", "gap_conv"))
    _bn_entries(sd, "aspp.global_avg_pool.2", params, stats, ("aspp", "gap_bn"))
    _conv_entry(sd, "aspp.conv1", params, ("aspp", "proj_conv"))
    _bn_entries(sd, "aspp.bn1", params, stats, ("aspp", "proj_bn"))

    # ---- decoder ----
    _conv_entry(sd, "decoder.conv1", params, ("decoder", "low_conv"))
    _bn_entries(sd, "decoder.bn1", params, stats, ("decoder", "low_bn"))
    _bn_entries(sd, "decoder.last_conv.0", params, stats, ("decoder", "mask_bn"))
    _conv_entry(sd, "decoder.last_conv.3", params, ("decoder", "mask_out"))
    _conv_entry(sd, "decoder.last_conv_boundary.0", params, ("decoder", "bound_conv1"))
    _bn_entries(sd, "decoder.last_conv_boundary.1", params, stats, ("decoder", "bound_bn1"))
    _conv_entry(sd, "decoder.last_conv_boundary.4", params, ("decoder", "bound_conv2"))
    _bn_entries(sd, "decoder.last_conv_boundary.5", params, stats, ("decoder", "bound_bn2"))
    _conv_entry(sd, "decoder.last_conv_boundary.8", params, ("decoder", "bound_out"))
    return params, stats


def convert_discriminator_state_dict(sd: dict) -> dict:
    """Reference PatchGAN state_dict (conv1..conv5) -> params tree."""
    params: dict = {}
    for i in range(1, 6):
        _conv_entry({k: np.asarray(v) for k, v in sd.items()}, f"conv{i}", params, (f"conv{i}",))
    return params


def merge_pretrained(target: dict, source: dict) -> tuple[dict, int]:
    """Filtered state-dict merge (the reference's resume pattern,
    train_use_fix_initial.py:233-238): copy leaves whose path+shape match;
    return (merged, n_copied)."""
    import copy

    import jax

    n = 0

    def walk(dst, src):
        nonlocal n
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                walk(dst[k], v)
            elif not isinstance(v, dict):
                if getattr(dst[k], "shape", None) == getattr(v, "shape", None):
                    dst[k] = v
                    n += 1

    out = copy.deepcopy(jax.device_get(target))
    walk(out, source)
    return out, n


def load_reference_checkpoint(path: str, output_stride: int = 16) -> dict:
    """torch.load a reference checkpoint file and convert all three models.

    Returns {'gen': (params, stats), 'dis': params, 'dis2': params,
             'epoch': int, ...} — the BEAL ``--initial_resume`` bootstrap.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out: dict[str, Any] = {}
    if "model_state_dict" in ckpt:
        out["gen"] = convert_deeplab_state_dict(
            {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}, output_stride
        )
    if "model_dis_state_dict" in ckpt:
        out["dis"] = convert_discriminator_state_dict(
            {k: v.numpy() for k, v in ckpt["model_dis_state_dict"].items()}
        )
    if "model_dis2_state_dict" in ckpt:
        out["dis2"] = convert_discriminator_state_dict(
            {k: v.numpy() for k, v in ckpt["model_dis2_state_dict"].items()}
        )
    for k in ("epoch", "iteration", "best_mean_dice"):
        if k in ckpt:
            out[k] = ckpt[k]
    return out
