from vqattack_tpu.models import vit, bert, albef  # noqa: F401
