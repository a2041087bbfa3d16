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


def test_warm_albef_fused_compiles_tiny():
    # --fused (the production default under --dynamic-pgd): per VL width
    # (tiny: {4,8}) -> feature first/rest + alternating first (2 ranks)
    # + alternating rest (2 ranks x plain/mixed) = 8 programs x 2 widths
    assert _warm_in_subprocess("warm_albef", ", dynamic=True, fused=True") == 16


def test_fused_warm_hlo_matches_pipeline(tmp_path):
    """warm_cache's replica embed_fn/targets_fn must lower the fused block
    program to byte-identical HLO as the real pipeline's closures — that
    equality IS the disk-cache hit the sweep protocol relies on."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline
    from vqattack_tpu.attacks.pgd import pgd_feature_block
    from vqattack_tpu.config import tiny_test_config
    from vqattack_tpu.models.albef import AlbefPretrain
    from vqattack_tpu.text.similarity import NullGate
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer

    # vocab with the HF special positions the replica hardcodes
    vocab = tmp_path / "vocab.txt"
    toks = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]", "dog", "cat", "red"]
    while len(toks) < 128:
        toks.append(f"tok{len(toks)}")
    vocab.write_text("\n".join(toks) + "\n")
    tok = WordPieceTokenizer.from_file(str(vocab))

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, albef=dataclasses.replace(
            cfg.albef,
            bert=dataclasses.replace(cfg.albef.bert, vocab_size=tok.vocab_size),
        ),
    )
    model = AlbefPretrain(cfg.albef)
    pipe = AlbefAttackPipeline(cfg, model, None, tok, NullGate())
    wc_embed, wc_targets = warm_cache._albef_fused_fns(cfg, model)

    s = cfg.attack.max_text_len
    size = cfg.albef.vit.image_size
    sds = jax.ShapeDtypeStruct
    i32 = jnp.int32
    key = jax.random.key(0)
    px = sds((1, size, size, 3), jnp.float32)
    params = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, size, size, 3)), jnp.ones((1, s), i32),
            jnp.ones((1, s), i32), method=AlbefPretrain.init_all),
        key,
    )
    aux = {
        "variables": params,
        "text_ids": sds((1, s), i32),
        "text_mask": sds((1, s), i32),
        "txt_token_mask": sds((1, s), jnp.float32),
        "special_ids": (103, 0, 101),
        "ori_ids": sds((1, s), i32),
        "ori_mask": sds((1, s), i32),
    }
    from vqattack_tpu.attacks import albef as albef_losses

    feat = albef_losses.make_feature_loss(model)
    vl = albef_losses.make_vl_loss(model)
    nb, flag = sds((), i32), sds((), jnp.bool_)
    pos = sds((1, 4), i32)
    texts = []
    for embed_fn, targets_fn in ((wc_embed, wc_targets),
                                 (pipe._embed_text, pipe._targets_fn)):
        lowered = pgd_feature_block.lower(
            feat, vl, embed_fn, targets_fn, px, px, key, key, key,
            nb, flag, flag, pos, aux, target_keys=("tgt_img", "tgt_txt"),
            max_iter=4,
        )
        texts.append(lowered.as_text())
    assert texts[0] == texts[1]
