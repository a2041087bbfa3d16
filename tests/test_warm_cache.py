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


def _warm_in_subprocess(fn_name: str, extra: str = "") -> int:
    """Run a warm function in a FRESH interpreter.

    The full suite accumulates hundreds of XLA:CPU compilations in one
    process; compiling the warm lattice on top of that has segfaulted
    XLA:CPU twice (flaky, never reproduces standalone).  A subprocess
    isolates the crash domain: worst case this test fails instead of
    killing the whole pytest run.
    """
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from vqattack_tpu.utils.cache import enable_compile_cache\n"
        "enable_compile_cache()\n"
        "from vqattack_tpu.config import tiny_test_config\n"
        "import importlib.util, os\n"
        "spec = importlib.util.spec_from_file_location('warm_cache', "
        f"{os.path.join(os.path.dirname(__file__), '..', 'scripts', 'warm_cache.py')!r})\n"
        "wc = importlib.util.module_from_spec(spec); spec.loader.exec_module(wc)\n"
        f"n = wc.{fn_name}((1,), 1, 4, 32, False, cfg=tiny_test_config(){extra})\n"
        "print('WARMED', n)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for line in out.stdout.splitlines():
        if line.startswith("WARMED"):
            return int(line.split()[1])
    raise AssertionError(out.stdout[-2000:])


def test_warm_albef_compiles_tiny():
    # k in {0,1}: blocks {(4,True),(2,True),(2,False)} -> 3 feature + 12
    # alternating (2D/3D labels x plain/mixed) + 4 vl widths (the
    # max_text_len=8 hard bound -> pow2 widths {1,2,4,8}) = 19 programs
    assert _warm_in_subprocess("warm_albef") == 19


def test_warm_vlmo_compiles_tiny():
    assert _warm_in_subprocess("warm_vlmo") == 19


def test_warm_albef_dynamic_compiles_tiny():
    # --dynamic collapses the block lattice: 1 feature-dynamic + 4
    # alternating-dynamic (2D/3D labels x plain/mixed) + 2 vl programs
    # (widths >= the tiny config's max_sub_words=4 floor, up to the
    # max_text_len=8 bound: {4,8}) = 7 programs
    assert _warm_in_subprocess("warm_albef", ", dynamic=True") == 7


def test_vl_widths_cover_pow2_padding():
    """Contract with attacks/batched.py: a bucket's position count pads to
    the next power of two, and every such width must be pre-warmed."""
    for max_k in (1, 2, 4, 8):
        widths = warm_cache._vl_widths(max_k)
        for max_p in range(1, 2 * max_k + 1):
            padded = 1 << (max_p - 1).bit_length()
            assert padded in widths, (max_k, max_p, widths)


def test_expand_batch_sizes_covers_pow2_tails():
    """The sweep's leftover chunks run at every power of two below
    --batch-size (attacks/batched.py pow2 tail padding), so warming must
    close the requested set downward."""
    assert warm_cache.expand_batch_sizes([8]) == (1, 2, 4, 8)
    assert warm_cache.expand_batch_sizes([1, 8]) == (1, 2, 4, 8)
    assert warm_cache.expand_batch_sizes([6]) == (1, 2, 4, 6)
    assert warm_cache.expand_batch_sizes([1]) == (1,)
