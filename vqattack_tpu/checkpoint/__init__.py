from vqattack_tpu.checkpoint.convert import (  # noqa: F401
    convert_albef_pretrain,
    convert_albef_vqa,
    convert_fusion_bert,
    convert_vit,
    load_torch_checkpoint,
)
from vqattack_tpu.checkpoint.interpolate import (  # noqa: F401
    interpolate_pos_embed,
    interpolate_rel_pos_bias,
)
