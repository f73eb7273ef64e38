"""1F1B (one-forward-one-backward) pipeline schedule over a `pp` mesh axis.

`parallel/pipeline.py` trains through GPipe by differentiating a scan of
ppermutes — simple, but every stage holds the scan residuals of ALL
M microbatches through backward (O(M) stage-input states live at once).
This module hand-writes the classic 1F1B schedule (PipeDream-flush /
Megatron's non-interleaved schedule): each stage starts backward work as
soon as its first microbatch returns from downstream, so at most S
stage-input states are ever in flight. The bubble fraction is identical to
GPipe ((S-1)/(M+S-1) per direction) — 1F1B is a MEMORY optimization, the
enabler for M >> S microbatches, which is what actually shrinks the bubble.

The reference has no pipeline parallelism at all (DDP only,
ref: train_offline.py:74-78); this closes the last classic-axis hole noted
in round 3 review.

Lockstep SPMD encoding
----------------------
All stages run one scan over global ticks t in [0, 2(M+S-1)). At stage s:

  * forward of microbatch m fires at tick  t = s + 2m
  * backward of microbatch m fires at tick t = (2S - 1 - s) + 2m

Forwards land on ticks with parity s, backwards on parity s+1, so each
stage does at most one unit per tick (they interleave F,B,F,B in steady
state — the 1F1B signature). Activations ppermute rightward and cotangents
leftward once per tick, timed so a unit's operand always arrived on the
immediately preceding tick. Units are `lax.cond`-gated: the predicate
depends only on the pp index, so dp/tp peers of a stage take identical
branches and collectives inside the layer body (tp psums) stay consistent;
the ppermutes themselves run unconditionally every tick on every device.

Backward units recompute the stage's forward from the saved stage INPUT
(a ring buffer of S inputs — the O(S) bound) via `jax.vjp`. One unified
vjp covers both stage kinds: the local forward also computes
`head_loss_fn` and the cotangent seed is (dy=incoming, dl=0) on interior
stages and (dy=0, dl=1) on the last — the head contributes zero gradient
wherever dl=0, so no stage-special code paths exist.

Autodiff integration: the schedule computes gradients directly, so the
public wrapper is a `jax.custom_vjp` whose forward runs the whole fwd+bwd
schedule and stashes (dlayers, dhead, dx) as residuals; the outer
`jax.grad` then sees an ordinary differentiable loss function and the
embedding / input-side parameters upstream of `x` get their gradients
through the returned dx cotangent.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

PP_AXIS = "pp"
DP_AXIS = "dp"


def _schedule(layer_fn, head_loss_fn, lp, hp, x_mb, rows_mb,
              n_stages: int, n_microbatches: int, axis: str):
    """Per-device 1F1B schedule body (inside shard_map).

    x_mb:    (M, mb, t, h) embedded stage-0 feeds (replicated over pp)
    rows_mb: pytree of (M, mb, ...) float leaves (labels/masks), nondiff
    Returns (loss, aux, dlayers_local, dhead, dx_mb) — loss/aux/dhead
    psum-reduced over (pp[, dp]); dlayers per-stage; dx per-device batch.
    """
    my = jax.lax.axis_index(axis)
    m_total, s_total = n_microbatches, n_stages
    is_first = my == 0
    is_last = my == s_total - 1

    def run_local(lp_, x_, rows_m):
        def body(x, one_layer):
            return layer_fn(x, one_layer, rows_m), None

        y, _ = jax.lax.scan(body, x_, lp_)
        return y

    def full(lp_, hp_, x_, rows_m):
        y = run_local(lp_, x_, rows_m)
        l, aux = head_loss_fn(hp_, y, rows_m)
        return y, l, aux

    def rows_at(m):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False),
            rows_mb)

    aux_shape = jax.eval_shape(
        lambda: head_loss_fn(hp, x_mb[0], rows_at(jnp.int32(0)))[1])
    zero_aux = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux_shape)

    ticks = 2 * (m_total + s_total - 1)

    def tick(carry, t):
        ring, fa, ca, gl, gh, dxo, loss, aux = carry

        # ---- forward unit: stage `my` forwards microbatch (t - my)/2 ----
        tf = t - my
        f_act = jnp.logical_and(tf >= 0,
                                jnp.logical_and(tf % 2 == 0, tf // 2 < m_total))
        m_f = jnp.clip(tf // 2, 0, m_total - 1)
        feed = jax.lax.dynamic_index_in_dim(x_mb, m_f, 0, keepdims=False)
        x_in = jnp.where(is_first, feed, fa)

        def f_unit(ring_):
            ring2 = jax.lax.dynamic_update_index_in_dim(
                ring_, x_in, m_f % s_total, 0)
            return ring2, run_local(lp, x_in, rows_at(m_f))

        ring, y = jax.lax.cond(
            f_act, f_unit, lambda r: (r, jnp.zeros_like(fa)), ring)

        # ---- backward unit: microbatch (t - (2S-1-my))/2 ----
        tb = t - (2 * s_total - 1 - my)
        b_act = jnp.logical_and(tb >= 0,
                                jnp.logical_and(tb % 2 == 0, tb // 2 < m_total))
        m_b = jnp.clip(tb // 2, 0, m_total - 1)

        def b_unit(ops):
            gl_, gh_, loss_, aux_ = ops
            x_saved = jax.lax.dynamic_index_in_dim(
                ring, m_b % s_total, 0, keepdims=False)
            rows_b = rows_at(m_b)
            (y2, l, aux_m), pull = jax.vjp(
                lambda a, b, c: full(a, b, c, rows_b), lp, hp, x_saved)
            dy = jnp.where(is_last, jnp.zeros_like(ca), ca)
            dl = jnp.where(is_last, 1.0, 0.0).astype(l.dtype)
            dlp, dhp, dxi = pull((dy, dl, jax.tree.map(jnp.zeros_like, aux_m)))
            gl2 = jax.tree.map(jnp.add, gl_, dlp)
            gh2 = jax.tree.map(jnp.add, gh_, dhp)
            gate = is_last.astype(l.dtype)
            loss2 = loss_ + gate * l
            aux2 = jax.tree.map(lambda a, b: a + gate * b, aux_, aux_m)
            return gl2, gh2, loss2, aux2, dxi

        gl, gh, loss, aux, dxi = jax.lax.cond(
            b_act, b_unit,
            lambda ops: ops + (jnp.zeros_like(ca),),
            (gl, gh, loss, aux))

        # stage 0's input cotangent is the pipeline's dx output
        wr = jnp.logical_and(b_act, is_first)
        old = jax.lax.dynamic_index_in_dim(dxo, m_b, 0, keepdims=False)
        dxo = jax.lax.dynamic_update_index_in_dim(
            dxo, jnp.where(wr, dxi, old), m_b, 0)

        # ---- transit (unconditional: every device, every tick) ----
        right = [(i, (i + 1) % s_total) for i in range(s_total)]
        left = [(i, (i - 1) % s_total) for i in range(s_total)]
        fa2 = jax.lax.ppermute(y, axis, right)
        ca2 = jax.lax.ppermute(dxi, axis, left)
        return (ring, fa2, ca2, gl, gh, dxo, loss, aux), None

    mb_zeros = jnp.zeros_like(x_mb[0])
    init = (
        jnp.zeros((s_total,) + x_mb.shape[1:], x_mb.dtype),  # ring: O(S)
        mb_zeros, mb_zeros,                                   # fa, ca
        jax.tree.map(jnp.zeros_like, lp),
        jax.tree.map(jnp.zeros_like, hp),
        jnp.zeros_like(x_mb),                                 # dx out
        jnp.zeros((), jnp.float32),
        zero_aux,
    )
    (_, _, _, gl, gh, dxo, loss, aux), _ = jax.lax.scan(
        tick, init, jnp.arange(ticks))
    return loss, aux, gl, gh, dxo


def pipeline_1f1b_loss(
    layer_fn: Callable,       # (x (mb,t,h), layer_params, rows_m) -> x
    head_loss_fn: Callable,   # (head_params, y (mb,t,h), rows_m) ->
                              #   (scalar loss contribution, aux pytree);
                              #   contributions must SUM to the batch loss
                              #   (fold any global masked-mean denominators
                              #   in via closure)
    layers,                   # pytree, leading axis L, pp-sharded
    head_params,              # pytree, replicated
    x: jnp.ndarray,           # (b, t, h) embedded inputs, dp-sharded batch
    rows,                     # pytree of (b, ...) float leaves, nondiff
    n_microbatches: int,
):
    """Differentiable pipelined loss: sum_m head_loss_fn(head, stack(x_m)).

    Requires an ambient concrete mesh with a `pp` axis (dp/tp optional; tp
    sharding of `layers` is the caller's business via layer_fn psums, the
    head is gathered replicated). Gradients for `layers`, `head_params` and
    `x` come from the 1F1B schedule itself (custom_vjp); `rows` gets zero
    cotangents — cast mask/label leaves to floats before calling.
    """
    mesh = jax.sharding.get_abstract_mesh()
    assert mesh is not None and PP_AXIS in mesh.axis_names, mesh
    shape = dict(mesh.shape)
    n_stages = shape[PP_AXIS]
    has_dp = DP_AXIS in mesh.axis_names and shape.get(DP_AXIS, 1) > 1
    bspec = P(DP_AXIS) if DP_AXIS in mesh.axis_names else P()

    from .mesh import param_pspecs, prune_spec

    wspecs = param_pspecs(None, pp=True)["llama"]["layers"]
    names = set(mesh.axis_names)
    lspec = jax.tree.map(
        lambda _: P(PP_AXIS), layers,
        is_leaf=lambda a: hasattr(a, "shape"))
    if isinstance(layers, dict):
        lspec = {k: (prune_spec(wspecs[k], names) if k in wspecs
                     else P(PP_AXIS))
                 for k in layers}

    def sharded(layers_, head_, x_, rows_):
        b = x_.shape[0]
        assert b % n_microbatches == 0, (b, n_microbatches)
        mb = b // n_microbatches
        x_mb = x_.reshape((n_microbatches, mb) + x_.shape[1:])
        rows_mb = jax.tree.map(
            lambda a: a.reshape((n_microbatches, mb) + a.shape[1:]), rows_)
        loss, aux, gl, gh, dxo = _schedule(
            layer_fn, head_loss_fn, layers_, head_, x_mb, rows_mb,
            n_stages, n_microbatches, PP_AXIS)
        red = (PP_AXIS, DP_AXIS) if has_dp else (PP_AXIS,)
        loss = jax.lax.psum(loss, red)        # only stage S-1 contributes
        aux = jax.tree.map(lambda a: jax.lax.psum(a, red), aux)
        if has_dp:
            gl = jax.tree.map(lambda g: jax.lax.psum(g, DP_AXIS), gl)
        gh = jax.tree.map(lambda g: jax.lax.psum(g, red), gh)
        dx = jax.lax.psum(dxo, PP_AXIS)       # only stage 0 contributes
        return loss, aux, gl, gh, dx.reshape((b,) + x_.shape[1:])

    smapped = jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(lspec, P(), bspec, bspec),
        out_specs=(P(), P(), lspec, P(), bspec),
        check_vma=False)

    def fwd(layers_, head_, x_, rows_):
        loss, aux, gl, gh, dx = smapped(layers_, head_, x_, rows_)
        return (loss, aux), (gl, gh, dx, rows_)

    def bwd(res, cts):
        gl, gh, dx, rows_ = res
        dloss, _ = cts  # aux is metrics-only; its cotangent is discarded
        scale = lambda g: (g * dloss).astype(g.dtype)
        zeros_rows = jax.tree.map(jnp.zeros_like, rows_)
        return (jax.tree.map(scale, gl), jax.tree.map(scale, gh),
                scale(dx), zeros_rows)

    @jax.custom_vjp
    def call(layers_, head_, x_, rows_):
        loss, aux, _, _, _ = smapped(layers_, head_, x_, rows_)
        return loss, aux

    call.defvjp(fwd, bwd)
    return call(layers, head_params, x, rows)
