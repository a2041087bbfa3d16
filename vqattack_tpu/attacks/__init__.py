from vqattack_tpu.attacks.norms import clip_eta, optimize_linear  # noqa: F401
from vqattack_tpu.attacks.pgd import (  # noqa: F401
    pgd_feature,
    pgd_alternating,
    pgd_multi_restart,
    pgd_vl_step,
    rand_init_eta,
)
from vqattack_tpu.attacks.extra import (  # noqa: F401
    carlini_wagner_l2,
    fgm_classifier,
    momentum_iterative_method,
    noise,
    pgd_classifier,
    semantic,
    spsa,
)
