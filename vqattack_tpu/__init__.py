"""tpu-vqattack: a TPU-native JAX framework for transferable adversarial
attacks on Visual Question Answering (the capabilities of VQAttack, AAAI 2024).

Subpackages
-----------
- ``models``    : pure-functional ALBEF / VLMo / BERT model families (flax.linen)
- ``attacks``   : PGD / FGM attack kernels as fused ``lax.scan`` programs
- ``ops``       : Pallas TPU kernels for the attack hot path
- ``text``      : WordPiece tokenizer, word-substitution machinery, similarity gates
- ``data``      : VQAv2 datasets (JSON+JPEG and pyarrow), transforms, side tables
- ``parallel``  : device-mesh sharding and the data-parallel attack sweep
- ``checkpoint``: PyTorch-checkpoint conversion (key surgery, pos-embed resize)
- ``eval``      : official VQA soft accuracy + attack-success-rate metrics

Top-level modules: ``named_configs`` (the reference's sacred named-config
surface as data), ``config`` (typed config tree), ``run`` (attack CLI),
``predict`` / ``transfer_eval`` (serving + offline transfer eval),
``defenses`` (input-resampling defenses).
"""

from vqattack_tpu.version import __version__  # noqa: F401
