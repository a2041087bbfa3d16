"""ViT-B/16 image encoder with per-layer feature taps.

Behavioral parity with the reference's DeiT-style encoder
(``ALBEF_VQAttack/ALBEF_attack/models/vit.py:97-177``):

- patchify -> prepend [CLS] -> add (truncated) absolute position embedding;
- 12 pre-LN blocks; final LayerNorm applied to the *output* only;
- the feature list captures the embedding output plus every block output
  **before** the final norm — 13 tensors for depth 12 (``vit.py:160-177``).

TPU-first differences: NHWC pixel layout (XLA-native conv), features returned
as one stacked array ``[B, depth+1, N, D]`` instead of a Python list so the
attack's layer-sum cosine loss is a single fused reduction.  With
``stack_feats=False`` the per-layer tensors come back as a tuple instead —
the attack loss then reduces each layer in place and XLA never materializes
the [B, 13, N, D] adversarial stack in HBM (round-2 perf lever; A/B'd in
bench.py via ``BENCH_FUSED_LOSS``).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vqattack_tpu.config import ViTConfig
from vqattack_tpu.models.layers import PatchEmbed, ViTBlock


class VisionTransformer(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.float32
    stack_feats: bool = True

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixels: [B, H, W, 3] in normalized [-1, 1] space.

        Returns ``(normed_output, feats)`` with ``feats: [B, depth+1, N+1, D]``
        (or a ``depth+1``-tuple of ``[B, N+1, D]`` when ``stack_feats=False``).
        """
        cfg = self.cfg
        b = pixels.shape[0]
        x = PatchEmbed(
            patch_size=cfg.patch_size,
            hidden_size=cfg.hidden_size,
            dtype=self.dtype,
            name="patch_embed",
        )(pixels)

        cls_token = self.param(
            # trunc_normal_(std=.02), reference vit.py:144 (from-scratch
            # training parity; checkpoint loads overwrite it either way)
            "cls_token",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, 1, cfg.hidden_size),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, cfg.hidden_size)).astype(self.dtype), x],
            axis=1,
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, cfg.seq_len, cfg.hidden_size),
            jnp.float32,
        )
        # reference truncates pos_embed to the actual sequence (vit.py:168)
        x = x + pos_embed[:, : x.shape[1], :].astype(self.dtype)

        # remat trades recompute for activation memory in the attack backward
        block_cls = nn.remat(ViTBlock) if cfg.remat else ViTBlock

        def make_block(i):
            return block_cls(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                layer_norm_eps=cfg.layer_norm_eps,
                remat_scores=cfg.remat_scores,
                fused_ln=cfg.fused_ln,
                softmax_dtype=cfg.softmax_dtype,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )

        feats = [x]
        if cfg.fused_ln:
            # pending-residual carry: each block's entry fuses the previous
            # block's residual add with its LN1; the final norm closes the
            # last pending pair (see ViTBlock docstring / ops/fused_ln.py)
            from vqattack_tpu.models.layers import ResidualLayerNorm

            delta = None
            for i in range(cfg.depth):
                x, delta, tap = make_block(i)(x, delta)
                if i > 0:
                    feats.append(tap)
            x, out = ResidualLayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm"
            )(x, delta)
            feats.append(x)
        else:
            for i in range(cfg.depth):
                x = make_block(i)(x)
                feats.append(x)
            out = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm"
            )(x)
        if not self.stack_feats:
            return out, tuple(feats)
        return out, jnp.stack(feats, axis=1)
