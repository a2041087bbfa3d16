"""Typed configuration tree for the whole framework.

The reference splits configuration across argparse + two ruamel-yaml files
(ALBEF: ``VQA.py:118-134``, ``configs/VQA.yaml``, ``configs/Pretrain.yaml``,
``configs/config_bert.json``) and a sacred Experiment with ~25 named configs
(VLMo: ``vlmo/config.py``), with several attack constants hard-coded at call
sites (``adv_attack.py:607-618``).  Here everything lives in one frozen
dataclass tree; presets reproduce the reference's configurations, and the
attack hyper-parameters are promoted to first-class config.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig:
    """DeiT-style ViT encoder (reference ``models/vit.py:97-177``)."""

    image_size: int = 480
    patch_size: int = 16
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    remat: bool = False  # jax.checkpoint each block (memory for FLOPs)
    # checkpoint only the [B,H,S,S] attention scores/probs (recomputed in
    # backward); the selective point between remat on/off — see PERF.md
    remat_scores: bool = False
    # fuse every residual-add + LayerNorm pair into one Pallas pass
    # (ops/fused_ln.py); same math, A/B'd in PERF.md round 3
    fused_ln: bool = False
    # softmax pipeline dtype over the [B,H,S,S] scores: "float32" matches
    # the reference bit-for-bit; "bfloat16" halves the score-tensor bytes
    # (~1/3 of the program) at a drift-validated precision cost (PERF.md r3)
    softmax_dtype: str = "float32"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + [CLS]


@dataclass(frozen=True)
class BertConfig:
    """Fusion BERT (reference ``models/xbert.py`` + ``configs/config_bert.json``).

    ``fusion_layer`` splits the stack: layers ``< fusion_layer`` are text-only,
    layers ``>= fusion_layer`` additionally cross-attend to image embeddings
    (``xbert.py:448-453``).  ``fusion_layer == num_layers`` disables fusion
    entirely (a vanilla BERT, used for the substitution MLM).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    fusion_layer: int = 6
    encoder_width: int = 768  # width of the cross-attended (image) states
    is_decoder: bool = False  # causal self-attention (answer decoder)
    pad_token_id: int = 0
    remat: bool = False  # jax.checkpoint each layer
    remat_scores: bool = False  # checkpoint only attention scores/probs
    softmax_dtype: str = "float32"  # see ViTConfig.softmax_dtype

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class ALBEFConfig:
    """ALBEF pre-trained surrogate + fine-tuned victim geometry.

    Reference: ``models/model_pretrain.py:20-84`` (surrogate) and
    ``models/model_vqa.py:11-47`` (victim: 12-layer fusion encoder + 6-layer
    causal answer decoder with ``fusion_layer=0``).
    """

    vit: ViTConfig = field(default_factory=ViTConfig)
    bert: BertConfig = field(default_factory=BertConfig)
    embed_dim: int = 256  # ITA projection dim (Pretrain.yaml: embed_dim)
    temp: float = 0.07
    mlm_probability: float = 0.15
    decoder_layers: int = 6  # model_vqa.py:32 num_hidden_layers=6

    @property
    def decoder_config(self) -> BertConfig:
        return _replace(
            self.bert, num_layers=self.decoder_layers, fusion_layer=0, is_decoder=True
        )


@dataclass(frozen=True)
class VLMoConfig:
    """VLMo MoME multiway transformer (reference
    ``vlmo/modules/multiway_transformer.py:244-412`` + ``vlmo/config.py``)."""

    image_size: int = 480
    patch_size: int = 16
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    vlffn_start_layer: int = 10  # vlmo_base_patch16: vlffn_start_layer_index=10
    layer_scale_init: Optional[float] = 0.1
    use_abs_pos_emb: bool = False
    need_relative_position_embed: bool = True
    max_text_len: int = 40  # config.py:38
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2  # token type embeddings reused as modality embeds
    vqa_label_size: int = 3129  # config.py:37 vqav2_label_size
    drop_path_rate: float = 0.0
    remat: bool = False  # jax.checkpoint each block
    remat_scores: bool = False  # checkpoint only attention scores/probs
    softmax_dtype: str = "float32"  # see ViTConfig.softmax_dtype
    # False = single shared FFN per block (the ViLT single-stream family —
    # the paper's black-box transfer target — is VLMo minus the experts)
    moe: bool = True

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def image_seq_len(self) -> int:
        return self.num_patches + 1

    @property
    def window_size(self) -> Tuple[int, int]:
        g = self.image_size // self.patch_size
        return (g, g)


# ---------------------------------------------------------------------------
# Attack config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AttackConfig:
    """PGD + word-substitution attack budget.

    Reference constants hard-coded at ``adv_attack.py:607-695`` and
    ``vlmo_module.py:1946-2032``.
    """

    eps: float = 0.125  # L-inf ball radius in [-1, 1] pixel space
    step_size: float = 0.01  # per-iteration FGM step
    num_iters: int = 40  # total PGD budget (feature-only path)
    clip_min: float = -1.0
    clip_max: float = 1.0
    norm: str = "linf"  # {"linf", "l2"}
    rand_init: bool = True  # uniform +/- eps, first block only (pgd:106-116)
    max_text_len: int = 25  # ALBEF question tokenization (adv_attack.py:113)
    mlm_top_k: int = 5  # substitution candidates per position
    mlm_score_threshold: float = 0.3  # get_substitues threshold (adv_attack.py:190)
    sim_threshold: float = 0.95  # USE similarity gate (adv_attack.py:303)
    max_bpe_len: int = 12  # get_bpe_substitues caps (adv_attack.py:162)
    max_bpe_width: int = 4
    max_bpe_candidates: int = 24
    max_answers: int = 8  # padded multi-answer MAR label variants
    max_sub_words: int = 16  # padded substitutable-word positions
    max_candidates: int = 8  # padded candidates per position
    # lax.scan unroll width for the PGD iteration loop.  Same math (agrees
    # to float-reassociation tolerance); 4 lets XLA schedule across
    # iteration boundaries and is the measured TPU sweet spot (+3.8%
    # throughput at the production b=16 bf16 config; flat beyond 4 — PERF.md).
    # Bit-exact reproduction of the reference's trajectories holds at
    # scan_unroll=1 (tests/test_reference_differential.py bit_exact tests);
    # the unroll=4 drift budget over a full 40-iteration attack is pinned by
    # test_pgd_feature_trajectory_production_unroll.
    scan_unroll: int = 4
    # Storage dtype for the clean per-layer feature-target stacks
    # (tgt_img/tgt_txt [B,13,S,D], VLMo tgt_tokens/tgt_layer_cls) the
    # feature loss reads EVERY iteration — at b=16 the f32 ALBEF stacks are
    # ~0.6 GB of pure HBM reads per grad step.  "bfloat16" halves that
    # stream; the cosine terms still accumulate per cosine_sim's promotion
    # rules and the trajectory drift is gated like the bf16 trunk's
    # (tests/test_tap_dtype.py).  Default f32 until the A/B is measured
    # on-chip (PERF.md round 4).
    tap_dtype: str = "float32"
    # Trace the PGD trip count + rand-init flag instead of specializing a
    # program per (block length, first-block) pair: ONE compiled program per
    # (algorithm, batch shape) serves every block schedule.  The realistic
    # k-distribution otherwise compiles tens of multi-minute programs
    # (PERF.md round-3 256-sample sweep).  Trajectories are bit-identical to
    # the static kernels at scan_unroll=1 (tests/test_pgd_dynamic.py);
    # scan_unroll is ignored on this path (a traced bound lowers to
    # while_loop, which cannot unroll — measured a wash anyway).
    dynamic_pgd: bool = False
    # Fuse each per-block device program (dynamic path only): clean feature
    # targets compute INSIDE the first block's program and the VL joint
    # step + text-grad harvest run at the END of every non-final block's
    # program, collapsing the 3-4 dispatches per block (clean targets /
    # PGD / embed_text / VL step) to one and shrinking the program lattice
    # to two variants per algorithm.  Trajectories bit-match the unfused
    # composition under the same keys (tests/test_pgd_fused.py).  Ignored
    # when dynamic_pgd is False.
    fused_block: bool = True


# ---------------------------------------------------------------------------
# Data / eval / parallel configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DataConfig:
    """Dataset layout (reference ``configs/VQA.yaml`` + ``vlmo/config.py:75``)."""

    vqa_root: str = ""
    test_files: Tuple[str, ...] = ()
    answer_list: str = ""
    arrow_root: str = ""  # VLMo pyarrow tables
    image_size: int = 480
    # side tables (qid lists, answer tables, paraphrases)
    right_part: Tuple[str, ...] = ()
    surrogate_ans_table: Tuple[str, ...] = ()
    target_ans_table: Tuple[str, ...] = ()
    chatgpt_paraphrases: Tuple[str, ...] = ()
    all_correct_ans: Tuple[str, ...] = ()
    vocab_file: str = ""
    num_workers: int = 4


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the data-parallel attack sweep.

    The reference is DP-only (SURVEY §2.4); the rebuild shards the batch of
    independent attack samples over a 1-D ``data`` axis riding ICI, and keeps
    a ``model`` axis available for larger surrogates.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallelism: int = -1  # -1 => all devices
    model_parallelism: int = 1


@dataclass(frozen=True)
class RunConfig:
    """Top-level run configuration."""

    albef: ALBEFConfig = field(default_factory=ALBEFConfig)
    vlmo: VLMoConfig = field(default_factory=VLMoConfig)
    attack: AttackConfig = field(default_factory=AttackConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 42
    batch_size: int = 1
    k_test: int = 128  # ALBEF answer re-rank top-k (VQA.yaml: k_test)
    eval_every: int = 10  # black-box eval cadence (adv_attack.py:717)
    output_dir: str = "attack_out"
    compute_dtype: str = "float32"  # attack-parity default; bfloat16 for speed


# ---------------------------------------------------------------------------
# Presets + (de)serialization
# ---------------------------------------------------------------------------


def albef_attack_config() -> RunConfig:
    """The reference ALBEF attack configuration (VQA.yaml + Pretrain.yaml).

    remat is on for the full-size trunks: measured faster on v5e (96 vs 91
    PGD it/s — recomputing activations beats their HBM round-trip) while
    keeping gradients identical (tests/test_remat.py)."""
    base = RunConfig()
    albef = _replace(
        base.albef,
        vit=_replace(base.albef.vit, remat=True),
        bert=_replace(base.albef.bert, remat=True),
    )
    # dynamic trip-count kernels: measured at steady-state parity with the
    # static scan at the sweep batch sizes (138.64 vs 137.43 agg s-it/s at
    # b=16 bf16, PERF.md round 4) while collapsing the multi-minute
    # per-block-length compile lattice; production default since round 4.
    # dynamic_pgd=False (the AttackConfig dataclass default) reproduces the
    # static-scan execution shape.
    return _replace(base, albef=albef,
                    attack=_replace(base.attack, dynamic_pgd=True))


def vlmo_attack_config() -> RunConfig:
    """The reference VLMo attack configuration
    (``task_finetune_vqa_base_image480``)."""
    base = RunConfig()
    # dynamic_pgd production default: see albef_attack_config
    return _replace(base, vlmo=_replace(base.vlmo, remat=True),
                    attack=_replace(base.attack, dynamic_pgd=True))


def blip_vqa_config(image_size: int = 480) -> ALBEFConfig:
    """BLIP-VQA (the paper's other black-box transfer target): structurally
    an ALBEF-VQA with image-grounded cross-attention at *every* text layer
    (``fusion_layer=0``) and a 12-layer causal answer decoder.  Checkpoints
    convert via :func:`~vqattack_tpu.checkpoint.convert.convert_albef_vqa`
    with ``fusion_layer=0`` (BLIP's text stack uses the same HF key naming)."""
    return ALBEFConfig(
        vit=ViTConfig(image_size=image_size),
        bert=BertConfig(fusion_layer=0),
        decoder_layers=12,
    )


def vilt_base_config(image_size: int = 384) -> VLMoConfig:
    """ViLT-B/32 (the reference paper's main black-box transfer target):
    single-stream transformer = shared FFN, absolute pos embeds, no rel-pos
    bias, no layer scale, patch 32."""
    return VLMoConfig(
        image_size=image_size,
        patch_size=32,
        moe=False,
        use_abs_pos_emb=True,
        need_relative_position_embed=False,
        layer_scale_init=None,
        vlffn_start_layer=12,
        max_text_len=40,
    )


def vlmo_large_config(image_size: int = 480) -> VLMoConfig:
    """VLMo-large/p16 (reference registry ``multiway_transformer.py:394-401``):
    24 layers, 1024-d, 16 heads, VL experts from layer 21; rel-pos bias and
    layer scale as in base."""
    return VLMoConfig(
        image_size=image_size,
        patch_size=16,
        hidden_size=1024,
        depth=24,
        num_heads=16,
        vlffn_start_layer=21,
    )


def vlmo_base_plus_config(image_size: int = 480) -> VLMoConfig:
    """VLMo-base+/p16 (reference registry ``multiway_transformer.py:404-412``):
    24 layers, 544-d, 16 heads, VL experts from layer 21, absolute pos
    embeds instead of rel-pos bias, no layer scale."""
    return VLMoConfig(
        image_size=image_size,
        patch_size=16,
        hidden_size=544,
        depth=24,
        num_heads=16,
        vlffn_start_layer=21,
        use_abs_pos_emb=True,
        need_relative_position_embed=False,
        layer_scale_init=None,
    )


def tiny_test_config(image_size: int = 32, vocab_size: int = 64) -> RunConfig:
    """A miniature geometry for unit tests (2 layers, 32px, toy vocab)."""
    vit = ViTConfig(image_size=image_size, patch_size=16, hidden_size=32, depth=2, num_heads=2)
    bert = BertConfig(
        vocab_size=vocab_size,
        hidden_size=32,
        num_layers=4,
        num_heads=2,
        intermediate_size=64,
        fusion_layer=2,
        encoder_width=32,
        max_position_embeddings=64,
    )
    vlmo = VLMoConfig(
        image_size=image_size,
        patch_size=16,
        hidden_size=32,
        depth=4,
        num_heads=2,
        vlffn_start_layer=3,
        max_text_len=8,
        vocab_size=vocab_size,
        max_position_embeddings=64,
        vqa_label_size=16,
    )
    albef = ALBEFConfig(vit=vit, bert=bert, embed_dim=16, decoder_layers=2)
    attack = AttackConfig(
        num_iters=4, max_text_len=8, max_answers=2, max_sub_words=4, max_candidates=3
    )
    return RunConfig(albef=albef, vlmo=vlmo, attack=attack, batch_size=2, k_test=4)


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, tuple):
        return [to_dict(v) for v in cfg]
    return cfg


def from_dict(cls, d: dict):
    """Generic inverse of :func:`to_dict`.  Field types are resolved through
    ``typing.get_type_hints`` — under ``from __future__ import annotations``
    every ``f.type`` is a STRING, so testing it with ``is_dataclass``
    directly would silently leave nested dicts unconverted."""
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        t = hints.get(f.name, f.type)
        if dataclasses.is_dataclass(t) and isinstance(v, dict):
            kwargs[f.name] = from_dict(t, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


_NESTED = {
    "albef": ALBEFConfig,
    "vlmo": VLMoConfig,
    "attack": AttackConfig,
    "data": DataConfig,
    "mesh": MeshConfig,
    "vit": ViTConfig,
    "bert": BertConfig,
}


def run_config_from_dict(d: dict) -> RunConfig:
    def build(cls, dd):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in dd:
                continue
            v = dd[f.name]
            if f.name in _NESTED and isinstance(v, dict):
                kwargs[f.name] = build(_NESTED[f.name], v)
            elif isinstance(v, list):
                kwargs[f.name] = tuple(v)
            else:
                kwargs[f.name] = v
        return cls(**kwargs)

    return build(RunConfig, d)


def save_config(cfg: RunConfig, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)


def load_config(path: str) -> RunConfig:
    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            d = yaml.safe_load(f)
        else:
            d = json.load(f)
    return run_config_from_dict(d)
