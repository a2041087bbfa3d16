from vqattack_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params,
)
from vqattack_tpu.parallel.sweep import batched_attack_step, make_sweep_runner  # noqa: F401
