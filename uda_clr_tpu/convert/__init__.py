from uda_clr_tpu.convert.torch_import import (
    convert_deeplab_state_dict,
    convert_discriminator_state_dict,
    load_reference_checkpoint,
    merge_pretrained,
)
