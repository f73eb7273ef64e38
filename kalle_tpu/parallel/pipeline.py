"""GPipe-style pipeline parallelism over a `pp` mesh axis.

The reference scales only by DDP (SURVEY.md §2.8); tp/sp/fsdp extensions
live in parallel/mesh.py. This module adds the remaining classic axis:
**pipeline parallelism** — the stacked Llama layers (L, ...) are partitioned
over `pp` stages (each device owns L/pp consecutive layers) and microbatches
stream through the stages with `jax.lax.ppermute` rotations inside a
`shard_map`. Differentiating through the scan-of-ppermute yields the reverse
pipeline automatically (the transpose of a ppermute is the reverse
ppermute), so the SAME code path trains — no hand-written 1F1B schedule.

Memory profile and the 1F1B decision: plain GPipe keeps all-microbatch
activations live through backward; with `remat_policy` set (LlamaConfig
.remat), the per-stage layer body is jax.checkpoint-wrapped (llama.forward
pp path) and each microbatch's intra-layer activations are recomputed in
backward — GPipe-with-rematerialization, the original GPipe paper's design
point, which removes the same O(M) activation blow-up 1F1B's schedule
targets (1F1B additionally bounds in-flight microbatch STATES to S instead
of M; those states are (mb, t, h) layer inputs, small next to intra-layer
activations). A hand-written 1F1B needs a custom-VJP scheduler that
interleaves forward and backward ticks — complexity not justified at the
1B scale this framework targets; revisit if model size grows 10x.

Schedule: M microbatches, S stages, M + S - 1 ticks. At tick t, stage 0
ingests microbatch t (while t < M), every stage applies its local layers to
its resident state, stage S-1 emits microbatch t-(S-1), and states rotate
one stage rightward. Bubble fraction = (S-1)/(M+S-1); pick
n_microbatches >= 4*pp for >80% utilization.

Composition: dp x pp (x tp) meshes — batch sharded over dp outside the
pipeline, each dp replica runs an independent pipeline down its pp column,
and with a tp axis present each stage's layer weights additionally shard
Megatron-style over tp: the shard_map layer body computes with its local
heads/ffn columns and psums the row-parallel (wo, wd) matmul outputs over
tp (llama._layer tp_axis). sp inside pp is unsupported
(parallel.mesh.make_mesh asserts sp == 1 when pp > 1).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

PP_AXIS = "pp"
DP_AXIS = "dp"


def pipeline_apply(
    layer_fn: Callable,          # (state_tree, layer_params) -> state_tree
    local_layers,                # pytree, leading axis = L / n_stages
    rows,                        # pytree of (b_local, ...) leaves: activation
                                 # + per-row aux (masks) that must travel
                                 # with their microbatch through the stages
    n_stages: int,
    n_microbatches: int,
    axis: str = PP_AXIS,
):
    """Run the stacked layers as a pipeline across `axis`. Must be called
    inside shard_map with `local_layers` partitioned on the leading axis
    over `axis` and `rows` replicated across it. Returns the fully-processed
    state tree, identical on every stage (psum-broadcast from the last)."""
    b = jax.tree.leaves(rows)[0].shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    mb = b // n_microbatches
    rows_mb = jax.tree.map(
        lambda a: a.reshape((n_microbatches, mb) + a.shape[1:]), rows)
    my = jax.lax.axis_index(axis)
    m = n_microbatches
    ticks = m + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def run_local(state):
        def body(state, lp):
            return layer_fn(state, lp), None

        state, _ = jax.lax.scan(body, state, local_layers)
        return state

    def tick(carry, t):
        state, out = carry
        feed = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, jnp.clip(t, 0, m - 1), 0, keepdims=False), rows_mb)
        ingest = jnp.logical_and(my == 0, t < m)
        state = jax.tree.map(lambda f, s: jnp.where(ingest, f, s), feed, state)
        y = run_local(state)
        em = t - (n_stages - 1)
        emit = jnp.logical_and(my == n_stages - 1,
                               jnp.logical_and(em >= 0, em < m))
        emc = jnp.clip(em, 0, m - 1)
        out = jax.tree.map(
            lambda o, yy: jax.lax.dynamic_update_index_in_dim(
                o, jnp.where(
                    emit, yy,
                    jax.lax.dynamic_index_in_dim(o, emc, 0, keepdims=False)),
                emc, 0),
            out, y)
        state = jax.tree.map(lambda s: jax.lax.ppermute(s, axis, perm), y)
        return (state, out), None

    init = (jax.tree.map(lambda a: jnp.zeros_like(a[0]), rows_mb),
            jax.tree.map(jnp.zeros_like, rows_mb))
    (_, out), _ = jax.lax.scan(tick, init, jnp.arange(ticks))
    # broadcast the last stage's outputs to every pp rank (grad of psum is
    # the identity broadcast, so only stage S-1 receives cotangents — the
    # backward pipeline then rotates them leftward via the scan transpose)
    last = my == n_stages - 1
    out = jax.tree.map(
        lambda o: jax.lax.psum(jnp.where(last, o, jnp.zeros_like(o)), axis),
        out)
    return jax.tree.map(lambda a: a.reshape((b,) + a.shape[2:]), out)


def pipelined_layer_stack(
    layer_fn: Callable,          # ((x, mask), lp) -> (x, mask)
    layers,                      # pytree, leading axis L (global)
    x: jnp.ndarray,              # (b, t, h) activations, dp-sharded batch
    mask,                        # (b, ...) per-row attention mask
    n_microbatches: int,
):
    """shard_map wrapper: partition `layers` over pp, stream (x, mask)
    microbatches through the stages. Requires an ambient concrete mesh
    (jax.sharding.set_mesh) containing a `pp` axis; batch dims shard over
    `dp` when present. Returns processed activations (b, t, h)."""
    mesh = jax.sharding.get_abstract_mesh()
    assert mesh is not None and PP_AXIS in mesh.axis_names, mesh
    shape = dict(mesh.shape)
    n_stages = shape[PP_AXIS]
    bspec = P(DP_AXIS) if DP_AXIS in mesh.axis_names else P()
    # per-leaf specs carry the tp dims too (pp x tp composition) when the
    # mesh has a tp axis; prune_spec drops them otherwise
    from .mesh import param_pspecs, prune_spec

    wspecs = param_pspecs(None, pp=True)["llama"]["layers"]
    names = set(mesh.axis_names)
    lspec = {k: prune_spec(wspecs[k], names) if k in wspecs else P(PP_AXIS)
             for k in layers}

    def f(layers_local, x, mask):
        out_x, _ = pipeline_apply(layer_fn, layers_local, (x, mask),
                                  n_stages, n_microbatches)
        return out_x

    return jax.shard_map(f, mesh=mesh,
                         in_specs=(lspec, bspec, bspec),
                         out_specs=bspec,
                         check_vma=False)(layers, x, mask)
