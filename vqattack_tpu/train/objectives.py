"""Pre-training / fine-tuning objectives in jax.

Re-derivations of the reference's task losses:

- ALBEF pretrain (``models/model_pretrain.py:144-270``): image-text
  contrastive (ITA) with a momentum feature queue, image-text matching (ITM)
  with similarity-weighted hard negatives, masked-LM;
- VLMo (``vlmo/modules/objectives.py``): ``compute_mlm:18``,
  ``compute_itc:180`` (open_clip-style), ``compute_itm_hardneg:76``,
  ``compute_vqa:375`` (BCE over 3,129 soft targets), ``compute_nlvr2:416``.

Collectives: the reference mines hard negatives across GPUs with NCCL
``all_gather`` (``objectives.py:91-124``); here pass ``axis_name`` when the
loss runs under ``shard_map``/``pjit`` over a named mesh axis and
``lax.all_gather`` rides ICI — single-device callers just omit it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def _maybe_gather(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    if axis_name is None:
        return x
    return jax.lax.all_gather(x, axis_name, tiled=True)


def masked_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over labeled (!= -100) positions (HF convention)."""
    valid = (labels != IGNORE_INDEX).astype(jnp.float32)
    safe = jnp.where(labels == IGNORE_INDEX, 0, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def contrastive_loss(
    image_feat: jnp.ndarray,
    text_feat: jnp.ndarray,
    temp: jnp.ndarray,
    queue_image: Optional[jnp.ndarray] = None,
    queue_text: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """ITA/ITC: symmetric InfoNCE.  With queues ([D, Q] memory banks,
    ``model_pretrain.py:178-184``) the negatives extend past the batch."""
    img = image_feat / jnp.linalg.norm(image_feat, axis=-1, keepdims=True)
    txt = text_feat / jnp.linalg.norm(text_feat, axis=-1, keepdims=True)
    img_all = _maybe_gather(img, axis_name)
    txt_all = _maybe_gather(txt, axis_name)
    if queue_text is not None:
        txt_all = jnp.concatenate([txt_all, queue_text.T], axis=0)
    if queue_image is not None:
        img_all = jnp.concatenate([img_all, queue_image.T], axis=0)
    sim_i2t = img @ txt_all.T / temp
    sim_t2i = txt @ img_all.T / temp
    n = img.shape[0]
    offset = 0
    if axis_name is not None:
        offset = jax.lax.axis_index(axis_name) * n
    labels = jnp.arange(n) + offset
    loss_i2t = -jnp.mean(
        jnp.take_along_axis(jax.nn.log_softmax(sim_i2t, -1), labels[:, None], 1)
    )
    loss_t2i = -jnp.mean(
        jnp.take_along_axis(jax.nn.log_softmax(sim_t2i, -1), labels[:, None], 1)
    )
    return (loss_i2t + loss_t2i) / 2


def sample_hard_negatives(
    rng: jax.Array,
    sim_i2t: jnp.ndarray,
    sim_t2i: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Similarity-weighted negative indices (``model_pretrain.py:197-220``,
    ``objectives.py:126-178``): for each text sample a negative image with
    probability softmax(sim) (diagonal zeroed), and vice versa."""
    n = sim_i2t.shape[0]
    eye = jnp.eye(n, dtype=bool)
    w_i2t = jnp.where(eye, -jnp.inf, sim_i2t)
    w_t2i = jnp.where(eye, -jnp.inf, sim_t2i)
    r1, r2 = jax.random.split(rng)
    neg_text_idx = jax.random.categorical(r1, w_i2t, axis=-1)
    neg_image_idx = jax.random.categorical(r2, w_t2i, axis=-1)
    return neg_image_idx, neg_text_idx


def itm_loss(pos_logits: jnp.ndarray, neg_logits: jnp.ndarray) -> jnp.ndarray:
    """Binary match CE: positives labeled 1, negatives 0."""
    logits = jnp.concatenate([pos_logits, neg_logits], axis=0)
    labels = jnp.concatenate(
        [jnp.ones(pos_logits.shape[0], jnp.int32),
         jnp.zeros(neg_logits.shape[0], jnp.int32)]
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))


def vqa_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """BCE-with-logits x label_size, scaled by label count — the reference's
    ``compute_vqa`` (``objectives.py:375-414``: ``binary_cross_entropy_with_
    logits * label_size``)."""
    import optax

    logits = logits.astype(jnp.float32)
    per = optax.sigmoid_binary_cross_entropy(logits, targets)
    return jnp.mean(per) * logits.shape[-1]


def nlvr2_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))


def update_feature_queue(
    queue: jnp.ndarray, ptr: jnp.ndarray, feats: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Functional ring-buffer enqueue (``_dequeue_and_enqueue``,
    ``model_pretrain.py:290-306``): queue [D, Q], feats [B, D] (already
    all-gathered by the caller when distributed)."""
    b = feats.shape[0]
    q = queue.shape[1]
    if q % b != 0:
        # dynamic_update_slice CLAMPS out-of-range starts instead of
        # wrapping, which would silently double-write the tail slots while
        # the pointer wraps — the reference guards the same invariant with
        # ``assert queue_size % batch_size == 0`` (model_pretrain.py:295)
        raise ValueError(
            f"queue size {q} must be a multiple of batch size {b}"
        )
    queue = jax.lax.dynamic_update_slice(queue, feats.T, (0, ptr))
    return queue, (ptr + b) % q


def momentum_update(params: Any, momentum_params: Any, m: float = 0.995) -> Any:
    """EMA teacher update (``model_pretrain.py:282-287``)."""
    return jax.tree_util.tree_map(
        lambda p, mp: mp * m + p * (1.0 - m), params, momentum_params
    )


# ---------------------------------------------------------------------------
# full ALBEF pretrain step loss (ITA + ITM + MLM)
# ---------------------------------------------------------------------------


def soft_contrastive_loss(
    image_feat, text_feat, temp, t_image_feat, t_text_feat, alpha,
    queue_image=None, queue_text=None, axis_name=None,
) -> jnp.ndarray:
    """ITA with momentum distillation (``model_pretrain.py:158-184``):
    targets blend the one-hot diagonal with the EMA teacher's softmax
    similarities at weight ``alpha``.  ``axis_name`` extends the teacher
    negative pool across the data axis like :func:`contrastive_loss` does
    for the hard path, so distillation on/off does not silently change the
    negative count in distributed runs."""
    def norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    img, txt = norm(image_feat), norm(text_feat)
    t_img, t_txt = norm(t_image_feat), norm(t_text_feat)
    t_img_all = _maybe_gather(t_img, axis_name)
    t_txt_all = _maybe_gather(t_txt, axis_name)
    txt_all = jnp.concatenate([t_txt_all, queue_text.T], 0) if queue_text is not None else t_txt_all
    img_all = jnp.concatenate([t_img_all, queue_image.T], 0) if queue_image is not None else t_img_all

    sim_i2t = img @ txt_all.T / temp
    sim_t2i = txt @ img_all.T / temp
    t_i2t = jax.lax.stop_gradient(jax.nn.softmax(t_img @ txt_all.T / temp, -1))
    t_t2i = jax.lax.stop_gradient(jax.nn.softmax(t_txt @ img_all.T / temp, -1))
    n = img.shape[0]
    offset = 0 if axis_name is None else jax.lax.axis_index(axis_name) * n
    onehot = jax.nn.one_hot(jnp.arange(n) + offset, sim_i2t.shape[1])
    tgt_i2t = alpha * t_i2t + (1 - alpha) * onehot
    tgt_t2i = alpha * t_t2i + (1 - alpha) * onehot
    loss_i2t = -jnp.mean(jnp.sum(jax.nn.log_softmax(sim_i2t, -1) * tgt_i2t, -1))
    loss_t2i = -jnp.mean(jnp.sum(jax.nn.log_softmax(sim_t2i, -1) * tgt_t2i, -1))
    return (loss_i2t + loss_t2i) / 2


def soft_masked_lm_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, teacher_logits: jnp.ndarray,
    alpha: float,
) -> jnp.ndarray:
    """MLM with soft-label distillation (``xbert.py:1445-1453``): blend the
    hard-label CE with KL to the teacher's distribution on masked positions."""
    hard = masked_lm_loss(logits, labels)
    valid = (labels != IGNORE_INDEX).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    soft_tgt = jax.lax.stop_gradient(
        jax.nn.softmax(teacher_logits.astype(jnp.float32), -1)
    )
    soft = -jnp.sum(jnp.sum(soft_tgt * logp, -1) * valid) / jnp.maximum(
        jnp.sum(valid), 1.0
    )
    return (1 - alpha) * hard + alpha * soft


def albef_pretrain_loss(
    model,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    queue_state: Optional[Dict[str, jnp.ndarray]] = None,
    axis_name: Optional[str] = None,
    teacher_params: Optional[Any] = None,
    alpha: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One ALBEF pre-training loss evaluation (``model_pretrain.py:144-270``).

    ``teacher_params`` (the EMA momentum copy, updated by the caller via
    :func:`momentum_update`) + ``alpha`` enable the reference's momentum
    distillation: soft ITA targets and soft MLM labels.  ``alpha=0`` or no
    teacher reproduces the hard-target path.

    ``batch``: pixels [B,H,W,3], text_ids/text_mask [B,S], mlm_ids/mlm_labels.
    Returns (total_loss, metrics).
    """
    m = model.bind(params)
    image_embeds, _ = m.visual_encoder(batch["pixels"])
    image_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
    image_feat = m.vision_proj(image_embeds[:, 0])

    text_last, _, _ = m.text_encoder(
        batch["text_ids"], attention_mask=batch["text_mask"], mode="text"
    )
    text_feat = m.text_proj(text_last[:, 0])
    temp = jnp.clip(m.temp, 0.001, 0.5)

    qi = queue_state.get("image_queue") if queue_state else None
    qt = queue_state.get("text_queue") if queue_state else None
    if teacher_params is not None and alpha > 0:
        tm = model.bind(teacher_params)
        t_image_embeds, _ = tm.visual_encoder(batch["pixels"])
        t_image_feat = tm.vision_proj(t_image_embeds[:, 0])
        t_text_last, _, _ = tm.text_encoder(
            batch["text_ids"], attention_mask=batch["text_mask"], mode="text"
        )
        t_text_feat = tm.text_proj(t_text_last[:, 0])
        loss_ita = soft_contrastive_loss(
            image_feat, text_feat, temp, t_image_feat, t_text_feat, alpha,
            qi, qt, axis_name,
        )
    else:
        loss_ita = contrastive_loss(image_feat, text_feat, temp, qi, qt, axis_name)

    # ITM with in-batch hard negatives
    imgn = image_feat / jnp.linalg.norm(image_feat, -1, keepdims=True)
    txtn = text_feat / jnp.linalg.norm(text_feat, -1, keepdims=True)
    sim = imgn @ txtn.T / temp
    r_neg, r_mlm = jax.random.split(rng)
    neg_img_idx, neg_txt_idx = sample_hard_negatives(r_neg, sim, sim.T)

    def fusion_cls(text_embeds, tmask, img_embeds):
        imask = jnp.ones(img_embeds.shape[:2], jnp.int32)
        last, _ = m.text_encoder.encode(
            text_embeds, tmask, img_embeds, imask, mode="fusion"
        )
        return last[:, 0]

    pos_cls = fusion_cls(text_last, batch["text_mask"], image_embeds)
    neg_cls_1 = fusion_cls(text_last, batch["text_mask"], image_embeds[neg_img_idx])
    neg_cls_2 = fusion_cls(
        text_last[neg_txt_idx], batch["text_mask"][neg_txt_idx], image_embeds
    )
    pos_logits = m.itm_head(pos_cls)
    neg_logits = m.itm_head(jnp.concatenate([neg_cls_1, neg_cls_2], axis=0))
    loss_itm = itm_loss(pos_logits, neg_logits)

    # MLM over the fused encoder
    _, _, mlm_logits = m.text_encoder(
        batch["mlm_ids"],
        attention_mask=batch["text_mask"],
        encoder_states=image_embeds,
        encoder_mask=image_mask,
        mode="multi_modal",
    )
    if teacher_params is not None and alpha > 0:
        # reuse the teacher image embeds computed for the ITA branch — a
        # second teacher ViT-B forward at 480px would be the single most
        # expensive redundant op in the step
        _, _, t_mlm_logits = tm.text_encoder(
            batch["mlm_ids"],
            attention_mask=batch["text_mask"],
            encoder_states=t_image_embeds,
            encoder_mask=image_mask,
            mode="multi_modal",
        )
        loss_mlm = soft_masked_lm_loss(
            mlm_logits, batch["mlm_labels"], t_mlm_logits, alpha
        )
    else:
        loss_mlm = masked_lm_loss(mlm_logits, batch["mlm_labels"])

    total = loss_ita + loss_itm + loss_mlm
    metrics = {
        "loss": total, "loss_ita": loss_ita, "loss_itm": loss_itm,
        "loss_mlm": loss_mlm,
        "image_feat": jax.lax.stop_gradient(imgn),
        "text_feat": jax.lax.stop_gradient(txtn),
    }
    return total, metrics


def indexed_contrastive_loss(
    image_feat: jnp.ndarray,
    text_feat: jnp.ndarray,
    temp: jnp.ndarray,
    idx: jnp.ndarray,
) -> jnp.ndarray:
    """ITA with identity-aware positives (the retrieval/grounding training
    path — ``Grounding.py:55`` / ``model_retrieval.py``): samples sharing the
    same image index ``idx`` are mutual positives, so the target distribution
    spreads over all matching columns instead of the diagonal."""
    img = image_feat / jnp.linalg.norm(image_feat, -1, keepdims=True)
    txt = text_feat / jnp.linalg.norm(text_feat, -1, keepdims=True)
    sim_i2t = img @ txt.T / temp
    sim_t2i = txt @ img.T / temp
    pos = (idx[:, None] == idx[None, :]).astype(jnp.float32)
    tgt = pos / jnp.maximum(pos.sum(-1, keepdims=True), 1.0)
    loss_i2t = -jnp.mean(jnp.sum(jax.nn.log_softmax(sim_i2t, -1) * tgt, -1))
    loss_t2i = -jnp.mean(jnp.sum(jax.nn.log_softmax(sim_t2i, -1) * tgt, -1))
    return (loss_i2t + loss_t2i) / 2


def retrieval_train_loss(
    model,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Retrieval/grounding fine-tuning: identity-aware ITA + hard-negative
    ITM over :class:`~vqattack_tpu.models.albef_tasks.AlbefRetrieval`
    (``Grounding.py:32-72`` trains exactly this pair; grounding *evaluation*
    is the Grad-CAM probe, ``utils/gradcam.py``)."""
    m = model.bind(params)
    img_feat, image_embeds = m.image_features(batch["pixels"])
    txt_feat, text_embeds = m.text_features(batch["text_ids"], batch["text_mask"])
    temp = jnp.clip(m.temp, 0.001, 0.5)
    idx = batch.get("idx")
    if idx is None:
        idx = jnp.arange(img_feat.shape[0])
    loss_ita = indexed_contrastive_loss(img_feat, txt_feat, temp, idx)

    sim = (img_feat @ txt_feat.T) / temp
    neg_img_idx, neg_txt_idx = sample_hard_negatives(rng, sim, sim.T)
    pos_logits = m.itm_score(text_embeds, batch["text_mask"], image_embeds)
    neg1 = m.itm_score(text_embeds, batch["text_mask"], image_embeds[neg_img_idx])
    neg2 = m.itm_score(
        text_embeds[neg_txt_idx], batch["text_mask"][neg_txt_idx], image_embeds
    )
    loss_itm = itm_loss(pos_logits, jnp.concatenate([neg1, neg2], 0))
    total = loss_ita + loss_itm
    return total, {"loss": total, "loss_ita": loss_ita, "loss_itm": loss_itm}


def albef_vqa_train_loss(
    victim,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    pad_token_id: int = 0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """ALBEF VQA fine-tuning loss (``model_vqa.py:49-119``): per-question
    answer sets decoded against the (question,image) states, weighted by the
    answer-frequency weights, normalized by the image batch size.

    Static-shape formulation: every question carries ``A_max`` answer slots
    (``answer_ids [B, A, L]``, ``answer_weights [B, A]`` zero-padded) — the
    reference's ragged ``k``-repetition becomes a weighted sum over slots.
    """
    from vqattack_tpu.models.albef import AlbefVQA

    states = victim.apply(
        params, batch["pixels"], batch["text_ids"], batch["text_mask"],
        method=AlbefVQA.encode_question,
    )
    b, a, l = batch["answer_ids"].shape
    flat_ids = batch["answer_ids"].reshape(b * a, l)
    flat_mask = batch["answer_mask"].reshape(b * a, l)
    states_rep = jnp.repeat(states, a, axis=0)
    qmask_rep = jnp.repeat(batch["text_mask"], a, axis=0)
    nll = victim.apply(
        params, flat_ids, flat_mask, states_rep, qmask_rep, pad_token_id,
        method=AlbefVQA.answer_nll,
    )
    seq_nll = jnp.sum(nll, axis=-1).reshape(b, a)
    loss = jnp.sum(batch["answer_weights"] * seq_nll) / b
    return loss, {"loss": loss}


def vlmo_irtr_train_loss(
    model,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    num_negs: int = 3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """VLMo IRTR fine-tuning (``objectives.py:301-373``): each image scores
    its own caption against ``num_negs`` sampled in-batch false captions via
    the ITM match logit; CE with the positive at index 0.

    ``batch``: pixels [B,H,W,3], text_ids/text_mask [B,T].
    """
    from vqattack_tpu.models.vlmo import VLMo

    b = batch["pixels"].shape[0]
    if b < 2:
        # randint over the empty range [1, 1) returns 1, making every
        # "negative" the positive caption itself — fail loudly instead
        raise ValueError("irtr loss needs batch >= 2 to sample negatives")
    # sample negative caption indices != own row
    offs = jax.random.randint(rng, (b, num_negs), 1, b)
    neg_idx = (jnp.arange(b)[:, None] + offs) % b
    idx = jnp.concatenate([jnp.arange(b)[:, None], neg_idx], axis=1)  # [B, 1+n]

    flat_idx = idx.reshape(-1)
    text_ids = batch["text_ids"][flat_idx]
    text_mask = batch["text_mask"][flat_idx]
    pixels = jnp.repeat(batch["pixels"], 1 + num_negs, axis=0)

    m = model.bind(params)
    xn, _, _ = m._joint_trunk(text_ids, text_mask, pixels)
    match_logit = m.itm_score(m.pooler(xn))[:, 1]  # [B*(1+n)]
    logits = match_logit.reshape(b, 1 + num_negs)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.mean(logp[:, 0])
    acc = jnp.mean((jnp.argmax(logits, -1) == 0).astype(jnp.float32))
    return loss, {"loss": loss, "irtr_acc": acc}


def vlmo_pretrain_loss(
    model,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    weights: Optional[Dict[str, float]] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """VLMo pretraining multi-task loss: MLM over the joint trunk
    (``objectives.py::compute_mlm:18-45``), dual-branch contrastive ITC with
    learnable logit scales incl. the vlffn branch (``compute_itc:180-299``),
    and hard-negative ITM mined from the ITC similarities
    (``compute_itm_hardneg:76-178``).

    ``batch``: pixels [B,H,W,3], text_ids/text_mask [B,T], mlm_ids [B,T],
    mlm_labels [B,T] (-100 ignore).  ``weights`` is a named-config
    ``loss_names`` subset over {mlm, itc, itm}; zero-weight terms are
    skipped.  With ``axis_name`` the ITC negatives and ITM hard-negative
    candidates extend across the mesh axis (the reference's all_gather).
    """
    w = {"mlm": 1.0, "itc": 1.0, "itm": 1.0}
    if weights:
        w.update({k: float(v) for k, v in weights.items() if k in w})
    m = model.bind(params)
    metrics: Dict[str, jnp.ndarray] = {}
    total = jnp.zeros((), jnp.float32)

    def norm(x):
        x = x.astype(jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    n = batch["pixels"].shape[0]
    off = jax.lax.axis_index(axis_name) * n if axis_name else 0
    labels = jnp.arange(n) + off

    def ce(logits):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    sim_i2t = sim_t2i = None
    if w["itc"] > 0 or w["itm"] > 0:
        ti = m.infer_text(batch["text_ids"], batch["text_mask"], vlffn=True)
        ii = m.infer_image(batch["pixels"], vlffn=True)
        img, txt = norm(ii["cls_feats"]), norm(ti["cls_feats"])
        scale = jnp.exp(m.logit_scale())
        sim_i2t = scale * (img @ _maybe_gather(txt, axis_name).T)
        sim_t2i = scale * (txt @ _maybe_gather(img, axis_name).T)
        itc = (ce(sim_i2t) + ce(sim_t2i)) / 2
        if "cls_vlffn_feats" in ti:
            vimg = norm(ii["cls_vlffn_feats"])
            vtxt = norm(ti["cls_vlffn_feats"])
            vscale = jnp.exp(m.logit_vl_scale())
            vl_i2t = vscale * (vimg @ _maybe_gather(vtxt, axis_name).T)
            vl_t2i = vscale * (vtxt @ _maybe_gather(vimg, axis_name).T)
            itc_vl = (ce(vl_i2t) + ce(vl_t2i)) / 2
            itc = (itc + itc_vl) * 0.5  # ref objectives.py:263
            metrics["itc_vl_loss"] = itc_vl
        metrics["itc_loss"] = itc
        if w["itc"] > 0:
            total = total + w["itc"] * itc

    if w["itm"] > 0:
        if n < 2 and axis_name is None:
            raise ValueError("itm hard negatives need batch >= 2")
        # similarity-weighted hard negatives; the own pair (the diagonal of
        # the reference's fill_diagonal_) is masked out (ref :126-142)
        cols = sim_i2t.shape[1]
        own = jax.nn.one_hot(labels, cols, dtype=bool)
        r1, r2 = jax.random.split(rng)
        neg_txt_idx = jax.random.categorical(
            r1, jnp.where(own, -jnp.inf, sim_i2t), axis=-1)
        neg_img_idx = jax.random.categorical(
            r2, jnp.where(own, -jnp.inf, sim_t2i), axis=-1)
        all_px = _maybe_gather(batch["pixels"], axis_name)
        all_ids = _maybe_gather(batch["text_ids"], axis_name)
        all_mask = _maybe_gather(batch["text_mask"], axis_name)
        # [pos, neg-image+own-text, own-image+neg-text] in one joint forward
        px3 = jnp.concatenate(
            [batch["pixels"], all_px[neg_img_idx], batch["pixels"]])
        ids3 = jnp.concatenate(
            [batch["text_ids"], batch["text_ids"], all_ids[neg_txt_idx]])
        mask3 = jnp.concatenate(
            [batch["text_mask"], batch["text_mask"], all_mask[neg_txt_idx]])
        xn, _, _ = m._joint_trunk(ids3, mask3, px3)
        itm_logits = m.itm_score(m.pooler(xn))
        itm_labels = jnp.concatenate(
            [jnp.ones(n, jnp.int32), jnp.zeros(2 * n, jnp.int32)])
        logp = jax.nn.log_softmax(itm_logits.astype(jnp.float32), -1)
        itm = -jnp.mean(jnp.take_along_axis(logp, itm_labels[:, None], 1))
        metrics["itm_loss"] = itm
        metrics["itm_acc"] = jnp.mean(
            (jnp.argmax(itm_logits, -1) == itm_labels).astype(jnp.float32))
        total = total + w["itm"] * itm

    if w["mlm"] > 0:
        out = m.infer(batch["mlm_ids"], batch["text_mask"], batch["pixels"])
        mlm_logits = m.mlm_score(out["text_feats"])
        # the reference's joint-trunk compute_mlm scales the CE by 0.25
        # (objectives.py:31 `mlm_loss * 0.25`) and the module total sums the
        # scaled value; the text-only path (vlmo_textmlm) stays unscaled
        mlm = 0.25 * masked_lm_loss(mlm_logits, batch["mlm_labels"])
        metrics["mlm_loss"] = mlm
        total = total + w["mlm"] * mlm

    metrics["loss"] = total
    return total, metrics
