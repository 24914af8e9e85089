"""TransNorm-checkpoint conversion: the four per-domain running buffers
(running_{mean,var}_{source,target} — reference batchnorm.py:313-317)
must land in the TN batch_stats collection."""

import jax
import numpy as np

from uda_clr_tpu.convert.torch_import import convert_deeplab_state_dict
from uda_clr_tpu.models.deeplab import DeepLab


def test_tn_stats_convert_and_apply():
    rng = np.random.default_rng(0)
    model = DeepLab(num_classes=2, backbone="mobilenet", norm="tn")
    ref = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False)

    # synthesize a torch-style TN state_dict from the model's own shapes
    sd = {}

    def emit(tprefix, params, stats):
        sd[f"{tprefix}.weight"] = rng.standard_normal(params["scale"].shape).astype(np.float32)
        sd[f"{tprefix}.bias"] = rng.standard_normal(params["bias"].shape).astype(np.float32)
        for k in ("mean_source", "var_source", "mean_target", "var_target"):
            v = rng.uniform(0.5, 1.5, stats[k].shape).astype(np.float32)
            sd[f"{tprefix}.running_{k}"] = v

    # cover one BN at each depth: stem, a block, aspp, decoder mask head
    emit("backbone.features.0.1", ref["params"]["backbone"]["stem_bn"],
         ref["batch_stats"]["backbone"]["stem_bn"])
    emit("aspp.bn1", ref["params"]["aspp"]["proj_bn"], ref["batch_stats"]["aspp"]["proj_bn"])
    emit("decoder.last_conv.0", ref["params"]["decoder"]["mask_bn"],
         ref["batch_stats"]["decoder"]["mask_bn"])

    params, stats = convert_deeplab_state_dict(sd, output_stride=16)
    np.testing.assert_array_equal(
        stats["backbone"]["stem_bn"]["mean_source"],
        sd["backbone.features.0.1.running_mean_source"],
    )
    np.testing.assert_array_equal(
        stats["decoder"]["mask_bn"]["var_target"],
        sd["decoder.last_conv.0.running_var_target"],
    )
    np.testing.assert_array_equal(
        params["aspp"]["proj_bn"]["scale"], sd["aspp.bn1.weight"]
    )

    # merged into a full variables tree, the TN model must run eval forward
    from uda_clr_tpu.convert.torch_import import merge_pretrained

    merged_params, n1 = merge_pretrained(ref["params"], params)
    merged_stats, n2 = merge_pretrained(ref["batch_stats"], stats)
    assert n1 >= 6 and n2 >= 12
    out = model.apply(
        {"params": merged_params, "batch_stats": merged_stats},
        np.zeros((1, 64, 64, 3), np.float32), train=False,
    )
    assert np.all(np.isfinite(np.asarray(out.mask_logits)))
