"""Trajectory-level attack parity vs a torch golden (SURVEY §7.2).

A tiny torch ALBEF-surrogate (timm-style ViT + xbert-semantics fusion BERT,
weights copied through the checkpoint converter) runs the reference's PGD
semantics (sign step -> clamp -> ball project -> clamp, feature cosine loss)
under torch autograd; the jax pipeline must reproduce the adversarial image
and the per-iteration loss trajectory.  Randomness is disabled
(rand_init=False, mlm_probability=0) so the trajectories are deterministic.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vqattack_tpu.attacks import albef as albef_losses  # noqa: E402
from vqattack_tpu.attacks.pgd import pgd_feature  # noqa: E402
from vqattack_tpu.checkpoint.convert import convert_fusion_bert, convert_vit  # noqa: E402
from vqattack_tpu.config import ALBEFConfig, BertConfig, ViTConfig  # noqa: E402
from vqattack_tpu.models.albef import AlbefPretrain  # noqa: E402

DIM, HEADS, DEPTH, VOCAB, SEQ = 32, 2, 2, 64, 6
FUSION = 1  # cross-attention from layer 1 of 2


class _TorchFusionBert(torch.nn.Module):
    """xbert-semantics golden: post-LN layers, cross-attn for layers >=
    fusion, per-layer hidden-state taps."""

    def __init__(self):
        super().__init__()
        import torch.nn as nn

        self.word = nn.Embedding(VOCAB, DIM)
        self.pos = nn.Embedding(64, DIM)
        self.tok_type = nn.Embedding(2, DIM)
        self.emb_ln = nn.LayerNorm(DIM, eps=1e-12)
        self.layers = nn.ModuleList()
        for i in range(DEPTH):
            l = nn.Module()
            for prefix in (["self"] if i < FUSION else ["self", "cross"]):
                setattr(l, f"{prefix}_q", nn.Linear(DIM, DIM))
                setattr(l, f"{prefix}_k", nn.Linear(DIM, DIM))
                setattr(l, f"{prefix}_v", nn.Linear(DIM, DIM))
                setattr(l, f"{prefix}_o", nn.Linear(DIM, DIM))
                setattr(l, f"{prefix}_ln", nn.LayerNorm(DIM, eps=1e-12))
            l.inter = nn.Linear(DIM, DIM * 2)
            l.out = nn.Linear(DIM * 2, DIM)
            l.out_ln = nn.LayerNorm(DIM, eps=1e-12)
            self.layers.append(l)

    @staticmethod
    def _attn(q, k, v, heads=HEADS):
        b, n, d = q.shape
        hd = d // heads

        def split(t):
            return t.reshape(b, -1, heads, hd).transpose(1, 2)

        att = (split(q) @ split(k).transpose(-2, -1)) * hd ** -0.5
        att = att.softmax(-1)
        out = (att @ split(v)).transpose(1, 2).reshape(b, -1, d)
        return out

    def forward(self, ids, enc):
        x = self.word(ids) + self.pos(torch.arange(ids.shape[1])) + self.tok_type(
            torch.zeros_like(ids)
        )
        x = self.emb_ln(x)
        taps = [x]
        for i, l in enumerate(self.layers):
            h = self._attn(l.self_q(x), l.self_k(x), l.self_v(x))
            x = l.self_ln(l.self_o(h) + x)
            if i >= FUSION:
                h = self._attn(l.cross_q(x), l.cross_k(enc), l.cross_v(enc))
                x = l.cross_ln(l.cross_o(h) + x)
            h = l.out(torch.nn.functional.gelu(l.inter(x)))
            x = l.out_ln(h + x)
            taps.append(x)
        return taps

    def state_dict_hf(self):
        """Emit HF-style key names for the converter."""
        sd = {}
        sd["embeddings.word_embeddings.weight"] = self.word.weight
        sd["embeddings.position_embeddings.weight"] = self.pos.weight
        sd["embeddings.token_type_embeddings.weight"] = self.tok_type.weight
        sd["embeddings.LayerNorm.weight"] = self.emb_ln.weight
        sd["embeddings.LayerNorm.bias"] = self.emb_ln.bias
        for i, l in enumerate(self.layers):
            p = f"encoder.layer.{i}"
            m = {
                f"{p}.attention.self.query": l.self_q,
                f"{p}.attention.self.key": l.self_k,
                f"{p}.attention.self.value": l.self_v,
                f"{p}.attention.output.dense": l.self_o,
                f"{p}.intermediate.dense": l.inter,
                f"{p}.output.dense": l.out,
            }
            if i >= FUSION:
                m.update({
                    f"{p}.crossattention.self.query": l.cross_q,
                    f"{p}.crossattention.self.key": l.cross_k,
                    f"{p}.crossattention.self.value": l.cross_v,
                    f"{p}.crossattention.output.dense": l.cross_o,
                })
            for name, mod in m.items():
                sd[f"{name}.weight"] = mod.weight
                sd[f"{name}.bias"] = mod.bias
            sd[f"{p}.attention.output.LayerNorm.weight"] = l.self_ln.weight
            sd[f"{p}.attention.output.LayerNorm.bias"] = l.self_ln.bias
            if i >= FUSION:
                sd[f"{p}.crossattention.output.LayerNorm.weight"] = l.cross_ln.weight
                sd[f"{p}.crossattention.output.LayerNorm.bias"] = l.cross_ln.bias
            sd[f"{p}.output.LayerNorm.weight"] = l.out_ln.weight
            sd[f"{p}.output.LayerNorm.bias"] = l.out_ln.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_attack_trajectory_parity():
    from tests.test_torch_parity import _TorchViT

    torch.manual_seed(0)
    tvit = _TorchViT(img=32, patch=16, dim=DIM, depth=DEPTH, heads=HEADS).eval()
    tbert = _TorchFusionBert().eval()

    # --- torch reference attack -------------------------------------------
    rng = np.random.default_rng(0)
    px0 = rng.uniform(-0.5, 0.5, (1, 3, 32, 32)).astype(np.float32)
    ids_np = rng.integers(5, VOCAB, (1, SEQ)).astype(np.int64)
    eps, step, iters = 0.125, 0.01, 6

    def torch_feats(px):
        img_out, img_taps = tvit(px)
        txt_taps = tbert(torch.tensor(ids_np), img_out)
        return img_taps, txt_taps

    with torch.no_grad():
        tgt_img, tgt_txt = torch_feats(torch.tensor(px0))
        tgt_img = [t.detach() for t in tgt_img]
        tgt_txt = [t.detach() for t in tgt_txt]

    cos = torch.nn.CosineSimilarity(dim=2, eps=1e-6)
    # start from a fixed non-degenerate perturbation: at the clean image the
    # cosine gradient is exactly zero and sign() would amplify pure float
    # noise (the chaotic-divergence hazard SURVEY §7.2 flags)
    delta0 = 0.05 * np.sin(np.arange(px0.size).reshape(px0.shape)).astype(np.float32)
    adv0 = np.clip(px0 + delta0, -1, 1)
    adv = torch.tensor(adv0)
    torch_losses = []
    torch_first_step = None
    for it in range(iters):
        adv = adv.clone().detach().requires_grad_(True)
        img_taps, txt_taps = torch_feats(adv)
        loss = sum((-cos(a, b)).sum() for a, b in zip(img_taps, tgt_img))
        loss = loss + sum((-cos(a, b)).sum() for a, b in zip(txt_taps, tgt_txt))
        loss.backward()
        torch_losses.append(float(loss))
        with torch.no_grad():
            adv = torch.clamp(adv + step * adv.grad.sign(), -1, 1)
            eta = torch.clamp(adv - torch.tensor(px0), -eps, eps)
            adv = torch.clamp(torch.tensor(px0) + eta, -1, 1)
        if it == 0:
            torch_first_step = adv.detach().numpy()
    torch_adv = adv.detach().numpy()

    # --- jax pipeline -------------------------------------------------------
    cfg = ALBEFConfig(
        vit=ViTConfig(image_size=32, patch_size=16, hidden_size=DIM,
                      depth=DEPTH, num_heads=HEADS),
        bert=BertConfig(vocab_size=VOCAB, hidden_size=DIM, num_layers=DEPTH,
                        num_heads=HEADS, intermediate_size=DIM * 2,
                        max_position_embeddings=64, fusion_layer=FUSION,
                        encoder_width=DIM),
        mlm_probability=0.0,  # disable stochastic masking for determinism
    )
    model = AlbefPretrain(cfg)
    tree = {
        "visual_encoder": convert_vit(
            {k: v.detach().numpy() for k, v in tvit.state_dict().items()},
            prefix="", depth=DEPTH,
        ),
        "text_encoder": convert_fusion_bert(
            tbert.state_dict_hf(), prefix="", num_layers=DEPTH,
            fusion_layer=FUSION,
        ),
    }
    # untouched heads: random-init and graft (unused by gen_feats)
    px_j = jnp.asarray(px0.transpose(0, 2, 3, 1))
    ids_j = jnp.asarray(ids_np.astype(np.int32))
    mask_j = jnp.ones_like(ids_j)
    init = model.init(jax.random.key(0), px_j, ids_j, mask_j,
                      method=AlbefPretrain.init_all)

    def unfreeze(d):
        return {k: unfreeze(v) for k, v in d.items()} if isinstance(d, dict) or hasattr(d, "items") else d

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    params = unfreeze(init["params"])
    merge(params, tree)  # graft converted trunks, keep init'd (unused) heads
    variables = {"params": params}

    loss_fn = albef_losses.make_feature_loss(model)
    aux = {
        "variables": variables,
        "text_ids": ids_j,
        "text_mask": mask_j,
        "special_ids": (4, 0, 2),
        "txt_token_mask": None,
    }
    img_f, txt_f, _ = model.apply(variables, px_j, ids_j, mask_j,
                                  method=AlbefPretrain.gen_feats)
    aux["tgt_img"], aux["tgt_txt"] = img_f, txt_f

    adv0_j = jnp.asarray(adv0.transpose(0, 2, 3, 1))
    adv_j, losses_j = pgd_feature(
        loss_fn, adv0_j, px_j, jax.random.key(0), aux,
        eps=eps, eps_iter=step, nb_iter=iters, rand_init=False,
        use_pallas=False,
    )
    jl = np.asarray(losses_j)[:, 0]
    tl = np.asarray(torch_losses)

    # the loss at the shared start point must agree tightly (model+loss parity)
    np.testing.assert_allclose(jl[0], tl[0], rtol=1e-4)
    # early-trajectory agreement before sign-chaos accumulates
    np.testing.assert_allclose(jl[1], tl[1], rtol=5e-3)
    # first-step sign agreement: the overwhelming majority of pixels move the
    # same way (the residue is near-zero-gradient components)
    adv1_j, _ = pgd_feature(
        loss_fn, adv0_j, px_j, jax.random.key(0), aux,
        eps=eps, eps_iter=step, nb_iter=1, rand_init=False, use_pallas=False,
    )
    agree = np.isclose(
        np.asarray(adv1_j), torch_first_step.transpose(0, 2, 3, 1), atol=1e-4
    ).mean()
    assert agree > 0.97, agree
    # both trajectories ascend (PGD maximizes the -cos objective,
    # driving adversarial features away from the clean ones)
    assert jl[-1] > jl[0] and tl[-1] > tl[0]
