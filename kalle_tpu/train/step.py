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
    if _use_1f1b(cfg):
        return _loss_1f1b(params, cfg, tcfg, batch, rng)
    out = llasa.forward(params, cfg, batch, rng=rng)
    total = (out["audio_loss"] * tcfg.audio_loss_weight
             + out["end_loss"] * tcfg.end_loss_weight)
    metrics = {
        "total_loss": total,
        "audio_loss": out["audio_loss"],
        "end_loss": out["end_loss"],
    }
    return total, metrics


def _use_1f1b(cfg: LlasaConfig) -> bool:
    if cfg.llama.pp_schedule != "1f1b":
        return False
    mesh = jax.sharding.get_abstract_mesh()
    return (mesh is not None and "pp" in getattr(mesh, "axis_names", ())
            and dict(mesh.shape)["pp"] > 1)


def _loss_1f1b(params, cfg: LlasaConfig, tcfg: TrainConfig, batch, rng):
    """Pipeline training with the hand-scheduled 1F1B schedule
    (parallel/pipeline_1f1b.py): embed outside, layer stack + final norm +
    head + loss inside the schedule. Exactly the GPipe-path loss — the
    masked-mean denominators are the GLOBAL mask counts, computed on the
    full batch and folded into the per-microbatch contributions so they
    sum to the batch loss."""
    from ..models.lm import llama
    from ..models.lm.llama import make_causal_padding_mask
    from ..parallel.pipeline_1f1b import pipeline_1f1b_loss

    lcfg = cfg.llama
    dt = jnp.dtype(lcfg.dtype)
    x, am, _ = llasa.embed_inputs(params, cfg, batch, rng=rng)
    t = x.shape[1]
    cos, sin = llama.rope_cos_sin(lcfg, jnp.arange(t))
    mesh = jax.sharding.get_abstract_mesh()
    tp_ax = "tp" if dict(mesh.shape).get("tp", 1) > 1 else None

    def layer_fn(h, lp, rows_m):
        # XLA attention with the bool mask rebuilt from the float row (the
        # rows pytree must be all-float for the custom_vjp zero cotangents);
        # the rebuild is scan-invariant elementwise work
        mask = make_causal_padding_mask(rows_m["attention_mask"], h.shape[1])
        # tp_megatron_vjp: the schedule differentiates this body with a
        # manual jax.vjp inside shard_map, where bare psum transposes are
        # wrong — see llama._megatron_fg
        h2, _ = llama._layer(lcfg, h, lp, cos, sin, mask, tp_axis=tp_ax,
                             tp_megatron_vjp=True)
        return h2

    if lcfg.remat:
        layer_fn = jax.checkpoint(layer_fn, policy=llama._remat_policy(lcfg))

    tm = batch["target_mask"].astype(jnp.float32)
    em = batch["end_mask"].astype(jnp.float32)
    c_a = jnp.maximum(tm.sum(), 1.0)  # global under jit (dp-sharded batch)
    c_e = jnp.maximum(em.sum(), 1.0)
    w_a, w_e = tcfg.audio_loss_weight, tcfg.end_loss_weight

    def head_loss_fn(hp, y, rows_m):
        hidden = llama.rms_norm(y, hp["final_norm"].astype(dt),
                                lcfg.rms_norm_eps)
        kl_elem, _, _ = llasa.head_kl(hp, cfg, hidden,
                                      rows_m["distribute_labels"])
        kl = kl_elem.sum(axis=2) / jnp.float32(cfg.latent_dim)
        s_a = (kl * rows_m["target_mask"]).sum() / c_a
        s_e = (kl * rows_m["end_mask"]).sum() / c_e
        return (w_a * s_a + w_e * s_e,
                {"audio_loss": s_a, "end_loss": s_e})

    rows = {
        "attention_mask": am.astype(jnp.float32),
        "distribute_labels": batch["distribute_labels"].astype(jnp.float32),
        "target_mask": tm,
        "end_mask": em,
    }
    hp = {"final_norm": params["llama"]["final_norm"],
          "distribution_linear": params["distribution_linear"]}
    total, aux = pipeline_1f1b_loss(
        layer_fn, head_loss_fn, params["llama"]["layers"], hp, x, rows,
        lcfg.pp_microbatches)
    metrics = {"total_loss": total,
               "audio_loss": aux["audio_loss"],
               "end_loss": aux["end_loss"]}
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
