from vqattack_tpu.data.transforms import (  # noqa: F401
    test_transform,
    train_transform,
    inception_normalize,
    keys_to_transforms,
    min_max_resize,
    pixelbert_transform,
    pixelbert_transform_randaug,
    square_transform,
    square_transform_randaug,
)
from vqattack_tpu.data.vqa import VQADataset, pre_question  # noqa: F401
from vqattack_tpu.data.side_tables import SideTables  # noqa: F401
