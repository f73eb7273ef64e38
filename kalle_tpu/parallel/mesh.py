"""Device mesh + sharding rules.

The reference's only parallelism is single-node DDP over NCCL
(ref: train_offline.py:74-78,193-195, default_config.yaml:9). The TPU-native
equivalent is a 2-D (dp, tp) mesh: data parallel replaces the DDP
all-reduce with an XLA psum-on-ICI inserted by jit from sharding specs, and
tensor parallel shards the Llama attention heads / MLP as an extension the
reference never had (SURVEY.md §2.8). Optimizer states inherit param
shardings (the ZeRO-2 intent of the reference's inactive deepspeed block,
default_config.yaml:3-8, falls out for free along tp).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LlamaConfig

DP_AXIS = "dp"
TP_AXIS = "tp"
SP_AXIS = "sp"
PP_AXIS = "pp"


def make_mesh(dp: int = -1, tp: int = 1, sp: int = 1, pp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """dp x tp (x sp) mesh, or dp x pp (x tp) when pp > 1. sp enables
    sequence parallelism: activation sequence dims get constrained to the sp
    axis in the backbone (GSPMD inserts the attention all-gathers/reduce-
    scatters over ICI). pp enables GPipe pipeline parallelism over the
    stacked layer axis (parallel/pipeline.py); tp inside pp stages runs
    Megatron-style with manual psums in the shard_map layer body
    (llama._layer tp_axis); sp inside pp is unsupported. tp is the
    innermost (fastest-varying) mesh dim so its per-matmul collectives ride
    the shortest ICI hops."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if pp > 1:
        assert sp == 1, "pp does not compose with sp"
        if dp == -1:
            dp = n // (pp * tp)
        assert dp * pp * tp == n, f"dp({dp})*pp({pp})*tp({tp}) != devices({n})"
        if tp > 1:
            arr = np.asarray(devices).reshape(dp, pp, tp)
            return Mesh(arr, (DP_AXIS, PP_AXIS, TP_AXIS))
        arr = np.asarray(devices).reshape(dp, pp)
        return Mesh(arr, (DP_AXIS, PP_AXIS))
    if dp == -1:
        dp = n // (tp * sp)
    assert dp * tp * sp == n, f"dp({dp})*tp({tp})*sp({sp}) != devices({n})"
    if sp > 1:
        arr = np.asarray(devices).reshape(dp, tp, sp)
        return Mesh(arr, (DP_AXIS, TP_AXIS, SP_AXIS))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def layer_slice_constraint(lp: dict) -> dict:
    """Pin the per-layer weights sliced out of the stacked (L, ...) arrays
    inside the layer scan to the tp-sharded specs of the stacked tensors
    (minus the leading L axis).

    Without this, the backward of the scan (transpose(jvp)/while/body)
    leaves the dynamic-slice/squeeze of each layer's weights unannotated and
    GSPMD picks a different sharding for the slice than for the stacked
    buffer it accumulates into — the compiler then falls back to
    "involuntary full rematerialization" (replicate + repartition) on every
    loop iteration, wasting ICI bandwidth. Constraining the slices makes
    forward slice, backward cotangent, and the gradient accumulator agree.

    Deliberately tp-only even when the params at rest are FSDP-sharded
    (('tp','dp') column layout, param_pspecs(fsdp=True)): constraining the
    in-scan slice to P(None, tp) makes XLA all-gather each layer's weights
    over dp right at the slice — exactly the ZeRO-3 contract (gather at
    use, shard at rest) — and keeps the backward layouts identical to the
    plain-tp case, which reshards cleanly. Pinning ('tp','dp') instead
    reintroduces involuntary-remat warnings in the scan backward.
    No-op when the ambient mesh has no tp axis."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or TP_AXIS not in getattr(mesh, "axis_names", ()):
        return lp
    tp = TP_AXIS
    specs = {
        "attn_norm": P(None),
        "wq": P(None, tp), "wk": P(None, tp), "wv": P(None, tp),
        "wo": P(tp, None),
        "mlp_norm": P(None),
        "wg": P(None, tp), "wu": P(None, tp),
        "wd": P(tp, None),
    }
    return {k: (jax.lax.with_sharding_constraint(v, specs[k])
                if k in specs else v)
            for k, v in lp.items()}


def activation_seq_constraint(x):
    """Constrain (b, t, h) activations to P(dp, sp, None) when an sp axis is
    present in the ambient mesh; no-op otherwise."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or SP_AXIS not in getattr(mesh, "axis_names", ()):
        return x
    return jax.lax.with_sharding_constraint(x, P(DP_AXIS, SP_AXIS, None))


def param_pspecs(llasa_params: dict, fsdp: bool = False,
                 pp: bool = False) -> dict:
    """PartitionSpecs for the Llasa param tree.

    TP layout (Megatron-style, collectives ride ICI):
      wq/wk/wv/wg/wu column-parallel (shard output dim = heads/ffn),
      wo/wd row-parallel (shard input dim); embeddings sharded on vocab;
      norms replicated. Layer-stacked arrays carry a leading L axis.

    fsdp=True additionally shards the tp dimension over the dp axis
    (PartitionSpec element ('tp', 'dp')): at-rest parameter AND optimizer
    memory drop by another 1/dp (ZeRO-3 intent — XLA all-gathers the
    weights over dp inside each scanned layer and the batch stays
    dp-sharded). This is what makes 1B+ f32-master training fit small
    chips at dp >= 2.

    pp=True partitions the stacked layer axis L over the pp mesh axis
    (GPipe stages, parallel/pipeline.py). Layer weights ALSO carry tp specs
    (pp x tp composition: each stage's layer shards split Megatron-style
    over tp and the shard_map layer body psums — llama._layer tp_axis);
    shard_params prunes the tp axis when the mesh doesn't have one, so
    pp-only meshes keep their old replicated-within-stage layout.
    """
    if pp:
        assert not fsdp, "pp composes with dp (x tp) only, not fsdp"
        tp = TP_AXIS

        def lp(spec_without_l):
            return P(PP_AXIS, *spec_without_l)
    else:
        tp = (TP_AXIS, DP_AXIS) if fsdp else TP_AXIS

        def lp(spec_without_l):
            return P(None, *spec_without_l)

    return {
        "llama": {
            # shard hidden (not vocab): the token gather then yields
            # h-sharded activations instead of all-gathering the table
            "embed": P(None, tp),
            "layers": {
                "attn_norm": lp((None,)),
                "wq": lp((None, tp)),
                "wk": lp((None, tp)),
                "wv": lp((None, tp)),
                "wo": lp((tp, None)),
                "mlp_norm": lp((None,)),
                "wg": lp((None, tp)),
                "wu": lp((None, tp)),
                "wd": lp((tp, None)),
            },
            "final_norm": P(None),
        },
        "audio_linear": {"w": P(None, tp), "b": P(tp)},
        "distribution_linear": {
            "w0": P(tp, None), "b0": P(None),
            "w2": P(None, None), "b2": P(None),
        },
    }


def batch_pspec() -> P:
    """Batches shard on dp; sequence/feature dims replicated."""
    return P(DP_AXIS)


def prune_spec(spec: P, axis_names) -> P:
    """Drop mesh-axis names absent from `axis_names` from a PartitionSpec
    (those dims fall back to replicated) — lets param_pspecs emit the full
    dp/tp/pp layout and meshes with fewer axes still shard what they have."""
    out = []
    for el in spec:
        if el is None:
            out.append(None)
        elif isinstance(el, tuple):
            kept = tuple(a for a in el if a in axis_names)
            out.append(kept if len(kept) > 1 else (kept[0] if kept else None))
        else:
            out.append(el if el in axis_names else None)
    return P(*out)


def _quant_scale_spec(wspec: P, scale_ndim: int) -> P:
    """Spec for a quantization scale leaf given its weight's spec.
    Group-wise scales (ops.quant int4: same rank as w, the contraction dim
    replaced by n_groups) inherit the weight spec — row-parallel weights
    shard their groups over tp; per-channel scales (int8: one rank lower,
    contraction dim dropped) drop the spec's second-to-last element."""
    if scale_ndim == len(wspec):
        return wspec
    els = list(wspec)
    del els[-2]
    return P(*els)


def shard_params(params: dict, mesh: Mesh, fsdp: bool = False,
                 pp: bool = False) -> dict:
    specs = param_pspecs(params, fsdp=fsdp, pp=pp)
    from ..ops.quant import is_quantized

    def _divisible(spec: P, shape, mesh_) -> P:
        # drop spec entries whose mesh extent doesn't divide the dim (e.g.
        # a tiny model's single int4 group can't shard over tp)
        sizes = dict(zip(mesh_.axis_names, mesh_.devices.shape))
        out = []
        for el, dim in zip(spec, shape):
            n = (1 if el is None else
                 int(np.prod([sizes.get(a, 1) for a in
                              (el if isinstance(el, tuple) else (el,))])))
            out.append(el if n and dim % n == 0 else None)
        return P(*out)

    # quantized leaves ({'q','scale'}, ops.quant) expand the dense weight
    # spec: q shards exactly like the dense weight, the scale follows
    specs = jax.tree.map(
        lambda p, s: ({"q": s,
                       "scale": _divisible(
                           _quant_scale_spec(s, p["scale"].ndim),
                           p["scale"].shape, mesh)}
                      if is_quantized(p) else s),
        params, specs, is_leaf=is_quantized)
    names = set(mesh.axis_names)
    return jax.device_put(
        params, jax.tree.map(
            lambda s: NamedSharding(mesh, prune_spec(s, names)), specs,
            is_leaf=lambda x: isinstance(x, P)))


def shard_batch(batch: dict, mesh: Mesh, leading_accum: bool = False) -> dict:
    """leading_accum=True: leaves are (A, B, ...) microbatch stacks
    (train_step gradient accumulation) — dp shards the B axis, the scan
    axis A stays replicated."""
    spec = P(None, DP_AXIS) if leading_accum else batch_pspec()
    sh = NamedSharding(mesh, spec)
    return {k: (jax.device_put(v, sh) if hasattr(v, "shape") else v)
            for k, v in batch.items()}
