"""Optimizer + LR-schedule factories (optax).

Replaces the reference's vendored timm optimizer zoo
(``ALBEF_attack/optim/`` — AdamW/Adam/SGD/RMSprop/Adafactor/... behind
``optim_factory.create_optimizer``) and scheduler collection
(``ALBEF_attack/scheduler/`` — cosine/tanh/step/plateau) plus VLMo's
4-param-group AdamW with no-decay masks, head ``lr_mult`` and HF
warmup-poly/cosine schedules (``vlmo_utils.set_schedule:218-325``).

Everything is a pure optax transform: weight-decay masking via pytree path
predicates (bias / LayerNorm / embeddings excluded — the torch convention),
per-group learning-rate multipliers via ``optax.multi_transform``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import optax


def _path_contains(path: Tuple, names: Sequence[str]) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    return any(any(n in str(k) for n in names) for k in keys)


NO_DECAY_NAMES = ("bias", "LayerNorm", "layer_norm", "norm", "embeddings",
                  "cls_token", "pos_embed", "gamma_", "temp",
                  "relative_position_bias_table")


def decay_mask(params: Any) -> Any:
    """True where weight decay applies (the torch no-decay convention:
    biases, norms, embeddings, position/cls tokens excluded)."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: not _path_contains(path, NO_DECAY_NAMES), params
    )
    return flat


def create_schedule(
    kind: str = "cosine",
    base_lr: float = 2e-5,
    total_steps: int = 10000,
    warmup_steps: int = 0,
    warmup_lr: float = 0.0,
    min_lr: float = 0.0,
    decay_rate: float = 1.0,
    decay_steps: int = 0,
    power: float = 1.0,
) -> optax.Schedule:
    """cosine | linear | polynomial | step | constant, with linear warmup."""
    if kind == "cosine":
        main = optax.cosine_decay_schedule(
            base_lr, max(1, total_steps - warmup_steps), alpha=min_lr / max(base_lr, 1e-12)
        )
    elif kind == "linear":
        main = optax.linear_schedule(base_lr, min_lr, max(1, total_steps - warmup_steps))
    elif kind == "polynomial":
        main = optax.polynomial_schedule(
            base_lr, min_lr, power, max(1, total_steps - warmup_steps)
        )
    elif kind == "step":
        assert decay_steps > 0
        main = optax.exponential_decay(
            base_lr, decay_steps, decay_rate, staircase=True, end_value=min_lr
        )
    elif kind == "constant":
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unknown schedule {kind!r}")
    if warmup_steps > 0:
        warm = optax.linear_schedule(warmup_lr, base_lr, warmup_steps)
        return optax.join_schedules([warm, main], [warmup_steps])
    return main


def create_optimizer(
    params: Any,
    opt: str = "adamw",
    schedule: optax.Schedule | float = 2e-5,
    weight_decay: float = 0.02,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    momentum: float = 0.9,
    head_lr_mult: float = 1.0,
    head_names: Sequence[str] = ("vqa_classifier", "nlvr2_classifier", "mlm_head"),
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """The factory (``optim_factory.create_optimizer`` surface): masked decay,
    optional head lr multiplier, optional global-norm clipping.  A
    ``lookahead_`` prefix wraps the base optimizer like the factory's
    ``opt_split`` dispatch (``optim_factory.py:119-121``)."""
    if opt.startswith("lookahead_"):
        from vqattack_tpu.train.optim_extra import lookahead

        base = create_optimizer(
            params, opt[len("lookahead_"):], schedule, weight_decay,
            b1, b2, eps, momentum, head_lr_mult, head_names, grad_clip)
        return lookahead(base)

    mask = decay_mask(params)
    if opt == "adamw":
        core = optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay, mask=mask)
    elif opt == "adam":
        core = optax.adam(schedule, b1=b1, b2=b2, eps=eps)
    elif opt == "sgd":
        core = optax.chain(
            optax.add_decayed_weights(weight_decay, mask),
            optax.sgd(schedule, momentum=momentum, nesterov=True),
        )
    elif opt == "rmsprop":
        core = optax.chain(
            optax.add_decayed_weights(weight_decay, mask),
            optax.rmsprop(schedule, momentum=momentum),
        )
    elif opt == "adafactor":
        core = optax.adafactor(schedule)
    elif opt == "lamb":
        core = optax.lamb(schedule, b1=b1, b2=b2, eps=eps,
                          weight_decay=weight_decay, mask=mask)
    elif opt == "lion":
        core = optax.lion(schedule, weight_decay=weight_decay, mask=mask)
    elif opt in ("nadam", "radam", "adamp", "sgdp", "novograd",
                 "nvnovograd", "rmsproptf"):
        from vqattack_tpu.train import optim_extra as extra

        if opt == "nadam":
            core = extra.nadam(schedule, b1=b1, b2=b2, eps=eps,
                               weight_decay=weight_decay, mask=mask)
        elif opt == "radam":
            core = extra.radam(schedule, b1=b1, b2=b2, eps=eps,
                               weight_decay=weight_decay, mask=mask)
        elif opt == "adamp":
            # factory wiring: wd_ratio=0.01, nesterov=True (optim_factory.py:79-80)
            core = extra.adamp(schedule, b1=b1, b2=b2, eps=eps,
                               weight_decay=weight_decay, wd_ratio=0.01,
                               nesterov=True, mask=mask)
        elif opt == "sgdp":
            core = extra.sgdp(schedule, momentum=momentum, nesterov=True,
                              eps=eps, weight_decay=weight_decay, mask=mask)
        elif opt == "novograd":
            # NB: the reference's NovoGrad ignores per-group decay entirely
            # (see optim_extra.novograd docstring); decay works here
            core = extra.novograd(schedule, b1=b1, b2=b2, eps=eps,
                                  weight_decay=weight_decay, mask=mask)
        elif opt == "nvnovograd":
            core = extra.nvnovograd(schedule, b1=b1, b2=b2, eps=eps,
                                    weight_decay=weight_decay, mask=mask)
        else:  # rmsproptf — factory passes alpha=0.9, momentum (optim_factory.py:93-94)
            core = extra.rmsprop_tf(schedule, alpha=0.9, eps=eps,
                                    momentum=momentum,
                                    weight_decay=weight_decay, mask=mask)
    elif opt == "adahessian":
        # second-order: update() requires hess_diag= (see train/adahessian.py)
        from vqattack_tpu.train.adahessian import adahessian as _adahessian

        core = _adahessian(schedule, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay, mask=mask)
    else:
        raise ValueError(f"unknown optimizer {opt!r}")

    if head_lr_mult != 1.0:
        def label(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "head" if _path_contains(path, head_names) else "body",
                params,
            )

        core = optax.multi_transform(
            {
                "body": core,
                "head": optax.chain(core, optax.scale(head_lr_mult)),
            },
            label,
        )
    if grad_clip:
        core = optax.chain(optax.clip_by_global_norm(grad_clip), core)
    return core
