from vqattack_tpu.ops.pgd_update import pgd_linf_update  # noqa: F401
