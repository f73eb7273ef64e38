"""Optimizer + LR schedule.

Reference: AdamW(lr, weight_decay=1e-2) + HF get_cosine_schedule_with_warmup
(linear 0->lr over warmup_steps, then cosine lr->0 over total_steps)
(ref: train_offline.py:94-105, configs/twj.yaml:25-33). bf16-native training
needs no GradScaler (ref train.py:136-190 becomes a no-op on TPU).
"""
from __future__ import annotations

import optax

from ..core.config import TrainConfig


def cosine_warmup_schedule(cfg: TrainConfig) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=max(cfg.warmup_steps, 1),
        decay_steps=max(cfg.total_steps, 2),
        end_value=0.0,
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = (cosine_warmup_schedule(cfg) if cfg.scheduler == "cosine"
                else cfg.lr)
    chain = []
    if cfg.max_grad_norm:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    chain.append(optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=cfg.weight_decay))
    # gradient accumulation is handled inside train_step (lax.scan over a
    # leading microbatch axis), NOT optax.MultiSteps: MultiSteps pays a
    # full params read+write (apply_updates of zero deltas) plus an extra
    # accumulator on every skipped microstep — measured ~18 ms/microstep of
    # pure HBM traffic on the 1B flagship.
    return optax.chain(*chain)
