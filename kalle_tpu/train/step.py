"""The jitted training step.

Replaces the reference's Accelerate loop body (ref: train_offline.py:209-252):
forward -> weighted loss -> backward -> AdamW + cosine step, with the DDP
gradient all-reduce realized as XLA psum inserted by jit from the dp-sharded
batch (SURVEY.md §2.8). Loss weights: total = audio*w_a + end*w_e
(ref: train_offline.py:237-241).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import LlasaConfig, TrainConfig
from ..models.lm import llasa


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # () int32


def make_train_state(params: dict, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def loss_fn(params, cfg: LlasaConfig, tcfg: TrainConfig, batch, rng):
    out = llasa.forward(params, cfg, batch, rng=rng)
    total = (out["audio_loss"] * tcfg.audio_loss_weight
             + out["end_loss"] * tcfg.end_loss_weight)
    metrics = {
        "total_loss": total,
        "audio_loss": out["audio_loss"],
        "end_loss": out["end_loss"],
    }
    return total, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg", "tx"),
                   donate_argnames=("state",))
def train_step(
    state: TrainState,
    cfg: LlasaConfig,
    tcfg: TrainConfig,
    tx: optax.GradientTransformation,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    step_rng = jax.random.fold_in(rng, state.step)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, metrics), grads = grad_fn(state.params, cfg, tcfg, batch, step_rng)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    new_state = TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1)
    return new_state, metrics
