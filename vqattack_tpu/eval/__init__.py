from vqattack_tpu.eval.vqa_eval import VQAEval, vqa_soft_accuracy  # noqa: F401
from vqattack_tpu.eval.metrics import AttackAccuracy, Scalar, VQAScore  # noqa: F401
