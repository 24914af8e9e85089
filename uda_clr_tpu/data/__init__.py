from uda_clr_tpu.data.fundus import FundusSegmentation
from uda_clr_tpu.data.synthetic import SyntheticFundus
from uda_clr_tpu.data.transforms import (
    Compose,
    Normalize_tf,
    RandomCrop,
    RandomFlip,
    RandomRotate,
    RandomScaleCrop,
    add_salt_pepper_noise,
    adjust_light,
    elastic_transform,
    eraser,
    to_multilabel,
    train_transforms,
    eval_transforms,
)
from uda_clr_tpu.data.pipeline import BatchLoader
