"""warm_cache: abstract lowering covers the sweep's program lattice."""

import dataclasses

import jax

from vqattack_tpu.config import tiny_test_config

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "warm_cache",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "warm_cache.py"),
)
warm_cache = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(warm_cache)


def test_distinct_blocks_cover_schedules():
    from vqattack_tpu.attacks.text_attack import compute_iter_schedule

    blocks = warm_cache._distinct_blocks(8, 40)
    lens = {n for n, _ in blocks}
    assert (40, True) in blocks
    for k in range(1, 9):
        sched = compute_iter_schedule(k, 40)
        assert all(n in lens for n in sched), (k, sched)
        assert (sched[0], True) in blocks


def test_warm_albef_compiles_tiny():
    cfg = tiny_test_config()
    n = warm_cache.warm_albef((1,), 1, 4, 32, False, cfg=cfg)
    # k in {0,1}: blocks {(4,True),(2,True),(2,False)} -> 3 feature + 12
    # alternating (2D/3D labels x plain/mixed) + 2 vl widths (max_k=1 ->
    # pow2 widths {1,2}) = 17 programs
    assert n == 17


def test_warm_vlmo_compiles_tiny():
    cfg = tiny_test_config()
    n = warm_cache.warm_vlmo((1,), 1, 4, 32, False, cfg=cfg)
    assert n == 17


def test_vl_widths_cover_pow2_padding():
    """Contract with attacks/batched.py: a bucket's position count pads to
    the next power of two, and every such width must be pre-warmed."""
    for max_k in (1, 2, 4, 8):
        widths = warm_cache._vl_widths(max_k)
        for max_p in range(1, 2 * max_k + 1):
            padded = 1 << (max_p - 1).bit_length()
            assert padded in widths, (max_k, max_p, widths)
