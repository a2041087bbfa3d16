from vqattack_tpu.attacks.norms import clip_eta, optimize_linear  # noqa: F401
from vqattack_tpu.attacks.pgd import (  # noqa: F401
    pgd_feature,
    pgd_alternating,
    pgd_vl_step,
    rand_init_eta,
)
