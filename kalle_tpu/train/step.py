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
    """One optimizer step.

    When tcfg.gradient_accumulation_steps == A > 1, batch leaves must carry
    a leading microbatch axis (A, B, ...): a lax.scan runs fwd+bwd per
    microbatch with only one microbatch's activations live, accumulates
    grads in-place (scan carry, grad dtype), and applies ONE AdamW update.
    This replaces optax.MultiSteps, which paid a full params read+write
    (apply_updates of zero deltas) plus accumulator traffic on EVERY
    microstep — on the 1B flagship the fixed optimizer cost is ~20 ms/step
    at the HBM traffic wall, so amortizing it over A microbatches is the
    whole point (ref accelerator.accumulate, train_offline.py:216).
    """
    step_rng = jax.random.fold_in(rng, state.step)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    accum = tcfg.gradient_accumulation_steps
    if accum > 1:
        inv = 1.0 / accum

        def micro(acc, xs):
            i, mb = xs

            # fold the 1/A mean-scale into the microbatch loss: the scalar
            # multiply fuses into the backward cotangents for free, where a
            # post-scan `grads * 1/A` pass costs a full grad-tree
            # read+write (~6 ms on the 1B flagship)
            def scaled_loss(p):
                l, m = loss_fn(p, cfg, tcfg, mb,
                               jax.random.fold_in(step_rng, i))
                return l * inv, m

            (_, m), g = jax.value_and_grad(scaled_loss, has_aux=True)(
                state.params)
            return jax.tree.map(jnp.add, acc, g), m

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        # sum of per-microbatch (loss/A) grads == one big-batch mean loss
        grads, ms = jax.lax.scan(micro, zeros,
                                 (jnp.arange(accum), batch))
        metrics = {k: v.mean() for k, v in ms.items()}
    else:
        (_, metrics), grads = grad_fn(state.params, cfg, tcfg, batch,
                                      step_rng)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    if tcfg.log_grad_norm:
        metrics["grad_norm"] = optax.global_norm(grads)
    new_state = TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1)
    return new_state, metrics
