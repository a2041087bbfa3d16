from vqattack_tpu.utils.meters import MetricLogger, SmoothedValue  # noqa: F401
from vqattack_tpu.utils.profiling import StepTimer, trace  # noqa: F401
