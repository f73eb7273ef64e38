"""Continuous-batching serving loop over the KV-cached decoder.

The reference serves one request at a time (infer_single / gradio demo,
ref infer_backup/infer_single_nos.py); tools/batch_infer.py batches a fixed
set of prompts. This module goes further — the natural TPU serving design:
a fixed-B decode batch where finished rows are refilled with NEW prompts
mid-decode, so the MXU never idles while requests queue.

Design (static shapes, two compiled graphs + one per prompt bucket):
  * decode_step: steps ALL B rows one frame; each row writes its KV at its
    own slot (per-row scatter, not the shared-scalar slot of
    llama.forward_with_cache) and carries its own RoPE position.
  * prefill (per prompt-length bucket): runs the prompt through the
    backbone with a fresh single-row cache, then `insert` splices the row
    cache + hidden into the batch state at a free row index.
  * the host loop admits pending prompts into free rows, steps, and
    harvests rows whose end-detector fired (KL(pred || N(1, e))/d < thres
    after min_frames, ref model.py:138-144) or that hit max_frames.

Semantics match infer/generate.py: the last emitted frame is discarded
(ref model_sigmaVAE.py:147), sigma rows decode their SAMPLED latents.
"""
from __future__ import annotations

import functools
from typing import Dict, Iterable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlasaConfig
from ..models.lm import llama, llasa
from ..ops.attention import mha_t
from ..ops.quant import maybe_matmul
from .generate import _head_step


class ServeState(NamedTuple):
    k: jnp.ndarray            # (L, B, n_kv, hd, C) — transposed keys
    v: jnp.ndarray            # (L, B, n_kv, C, hd)   (llama.KVCache layout)
    # int8-KV mode (cfg.llama.kv_cache_dtype == "int8"): k/v int8 plus
    # per-(token, head) scales, same semantics as llama.KVCache
    k_scale: Optional[jnp.ndarray]  # (L, B, n_kv, 1, C) f32 or None
    v_scale: Optional[jnp.ndarray]  # (L, B, n_kv, 1, C) f32 or None
    valid: jnp.ndarray        # (B, C) bool — attendable cache slots
    length: jnp.ndarray       # (B,) int32 — next write slot per row
    pos: jnp.ndarray          # (B,) int32 — next local RoPE position
    last_hidden: jnp.ndarray  # (B, 1, h)
    means: jnp.ndarray        # (B, max_frames, d)
    logs: jnp.ndarray         # (B, max_frames, d)
    samples: jnp.ndarray      # (B, max_frames, d)
    n_frames: jnp.ndarray     # (B,) int32
    done: jnp.ndarray         # (B,) bool
    active: jnp.ndarray       # (B,) bool — row holds a live request


def init_state(cfg: LlasaConfig, batch_size: int, cache_len: int,
               max_frames: int) -> ServeState:
    lcfg = cfg.llama
    int8 = lcfg.kv_cache_dtype == "int8"
    dt = jnp.dtype(lcfg.dtype)
    kv_dt = jnp.int8 if int8 else dt
    L, nkv, hd = lcfg.num_layers, lcfg.num_kv_heads, lcfg.head_dim
    d = cfg.latent_dim
    def scales():
        # distinct buffers: insert/decode_step donate the state, and jax
        # rejects donating the same buffer twice
        return (jnp.zeros((L, batch_size, nkv, 1, cache_len), jnp.float32)
                if int8 else None)

    return ServeState(
        k=jnp.zeros((L, batch_size, nkv, hd, cache_len), kv_dt),
        v=jnp.zeros((L, batch_size, nkv, cache_len, hd), kv_dt),
        k_scale=scales(), v_scale=scales(),
        valid=jnp.zeros((batch_size, cache_len), bool),
        length=jnp.zeros((batch_size,), jnp.int32),
        pos=jnp.zeros((batch_size,), jnp.int32),
        last_hidden=jnp.zeros((batch_size, 1, lcfg.hidden_size), dt),
        means=jnp.zeros((batch_size, max_frames, d), dt),
        logs=jnp.zeros((batch_size, max_frames, d), dt),
        samples=jnp.zeros((batch_size, max_frames, d), dt),
        n_frames=jnp.zeros((batch_size,), jnp.int32),
        done=jnp.zeros((batch_size,), bool),
        active=jnp.zeros((batch_size,), bool),
    )


# ---------------------------------------------------------------------------
# prefill + insert
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(params: dict, cfg: LlasaConfig, ids: jnp.ndarray,
            mask: jnp.ndarray):
    """LEFT-padded (1, bucket) prompt -> (row_k, row_v, hidden, n_tokens).
    One compile per bucket length."""
    lcfg = cfg.llama
    b, tp = ids.shape
    embeds = llama.embed_tokens(params["llama"], ids, lcfg)
    embeds = embeds * mask[..., None].astype(embeds.dtype)
    n_pads = (tp - mask.sum(axis=1)).astype(jnp.int32)
    positions = jnp.maximum(jnp.arange(tp)[None, :] - n_pads[:, None], 0)
    cache = llama.KVCache.zeros(lcfg, b, tp)  # dtype from cfg (int8 opt)
    valid = mask.astype(bool)
    hidden, cache = llama.forward_with_cache(
        params["llama"], lcfg, embeds, cache, attention_mask=valid,
        positions=positions)
    return (cache.k, cache.v, cache.k_scale, cache.v_scale,
            hidden[:, -1:, :], mask.sum(axis=1).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("max_frames",), donate_argnums=(0,))
def insert(state: ServeState, row: jnp.ndarray, row_k: jnp.ndarray,
           row_v: jnp.ndarray, row_ks, row_vs, hidden: jnp.ndarray,
           mask: jnp.ndarray, n_tokens: jnp.ndarray,
           max_frames: int) -> ServeState:
    """Splice a prefilled request into batch row `row`. The prompt occupies
    slots [0, bucket); generation continues at slot `bucket`."""
    bucket = row_k.shape[-1]
    C = state.k.shape[-1]
    k = jax.lax.dynamic_update_slice(state.k, row_k.astype(state.k.dtype),
                                     (0, row, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(state.v, row_v.astype(state.v.dtype),
                                     (0, row, 0, 0, 0))
    ks, vs = state.k_scale, state.v_scale
    if ks is not None:
        ks = jax.lax.dynamic_update_slice(ks, row_ks, (0, row, 0, 0, 0))
        vs = jax.lax.dynamic_update_slice(vs, row_vs, (0, row, 0, 0, 0))
    row_valid = jnp.zeros((1, C), bool).at[:, :bucket].set(mask.astype(bool))
    valid = jax.lax.dynamic_update_slice(state.valid, row_valid, (row, 0))
    d = state.means.shape[-1]
    zeros_f = jnp.zeros((1, max_frames, d), state.means.dtype)
    return state._replace(
        k=k, v=v, k_scale=ks, v_scale=vs, valid=valid,
        length=state.length.at[row].set(bucket),
        pos=state.pos.at[row].set(n_tokens[0]),
        last_hidden=jax.lax.dynamic_update_slice(
            state.last_hidden, hidden.astype(state.last_hidden.dtype),
            (row, 0, 0)),
        means=jax.lax.dynamic_update_slice(state.means, zeros_f, (row, 0, 0)),
        logs=jax.lax.dynamic_update_slice(state.logs, zeros_f, (row, 0, 0)),
        samples=jax.lax.dynamic_update_slice(state.samples, zeros_f,
                                             (row, 0, 0)),
        n_frames=state.n_frames.at[row].set(0),
        done=state.done.at[row].set(False),
        active=state.active.at[row].set(True),
    )


# ---------------------------------------------------------------------------
# decode step (per-row slots)
# ---------------------------------------------------------------------------

def _decode_layer(cfg, x, lp, cos, sin, k_full, v_full, ks_full, vs_full,
                  li, lengths, mask, prev_valid=None, live=None):
    """x (B,1,h); k_full (L,B,nkv,hd,C) / v_full (L,B,nkv,C,hd) (the
    llama.KVCache decode layouts); writes each row's new KV at its own slot
    IN PLACE on the full layer-stacked cache (scatter over rows at layer
    index li) — the continuous-batching variant of llama._layer. The full
    cache rides the scan carry so XLA aliases the buffer instead of
    materializing fresh per-layer cache copies each step (same restructure
    as llama.forward_with_cache). Attention runs through the fused Pallas
    decode kernel on TPU when the cache length is 128-aligned AND the KV
    cache is bf16 AND the batch is >= cfg.decode_attention_min_batch
    (default 8); int8 caches always take the XLA fused-dequant path, which
    measures faster (see the gate below and docs/inference.md).

    The kernel branch reads the PRE-scatter cache and receives this step's
    K/V as a sideband column (prev_valid (B,C) = validity before this step,
    live (B,) = rows whose sideband column counts): feeding the scattered
    cache to the pallas_call instead makes XLA copy the whole cache every
    layer (it can't prove in-place aliasing across a custom call) — the
    round-3 profile showed those copies were 9 of the 12 ms/step at b=8."""
    dt = x.dtype
    B = x.shape[0]
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    attn_in = llama.rms_norm(x, lp["attn_norm"].astype(dt), cfg.rms_norm_eps)
    if "wqkv" in lp:  # fused decode layout (ops.quant.fuse_decode_params)
        qkv = maybe_matmul(attn_in, lp["wqkv"])
        q = qkv[..., : nq * hd].reshape(B, 1, nq, hd)
        k = qkv[..., nq * hd: (nq + nkv) * hd].reshape(B, 1, nkv, hd)
        v = qkv[..., (nq + nkv) * hd:].reshape(B, 1, nkv, hd)
    else:
        q = maybe_matmul(attn_in, lp["wq"]).reshape(B, 1, nq, hd)
        k = maybe_matmul(attn_in, lp["wk"]).reshape(B, 1, nkv, hd)
        v = maybe_matmul(attn_in, lp["wv"]).reshape(B, 1, nkv, hd)
    q = llama.apply_rope(q, cos, sin)
    k = llama.apply_rope(k, cos, sin)

    rows = jnp.arange(B)
    if ks_full is not None:  # int8-KV: quantize the new frame per head
        k_st, ks = llama._quantize_kv(k)
        v_st, vs = llama._quantize_kv(v)
        ks_full = ks_full.at[li, rows, :, 0, lengths].set(ks[:, 0, :, 0])
        vs_full = vs_full.at[li, rows, :, 0, lengths].set(vs[:, 0, :, 0])
    else:
        k_st, v_st = k, v
    C = k_full.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = (B >= cfg.decode_attention_min_batch and ks_full is None
                  and cfg.use_decode_attention and C % 128 == 0
                  and prev_valid is not None
                  and (on_tpu or cfg.decode_attention_interpret))
    if use_kernel:
        # the kernel reads the PRE-update cache (this step's column rides
        # the k_new/v_new sideband), so the ragged cache write stays out of
        # its read path: a vector-index scatter feeding the pallas_call
        # forces a {3,2,4,1,0} cache layout conflicting with the kernel's
        # default layout, and XLA inserts two 67 MB layout-conversion
        # copies per layer (~9 of 12 ms/step at b=8 cache 256,
        # tools/serve_profile.py --profile). The write itself is a per-row
        # dynamic_update_slice CHAIN (static row index, dynamic li/length)
        # — layout-neutral, updates the donated buffer in place.
        from ..ops.pallas.decode_attention import decode_attention_cached

        attn = decode_attention_cached(
            q[:, 0], k_full, v_full, li, prev_valid,
            k_new=k_st[:, 0], v_new=v_st[:, 0], new_valid=live,
            interpret=not on_tpu)[:, None]
        kk = k_st[:, 0].astype(k_full.dtype)  # (B, nkv, hd)
        vv = v_st[:, 0].astype(v_full.dtype)
        zero = jnp.int32(0)
        for r in range(B):
            k_full = jax.lax.dynamic_update_slice(
                k_full, kk[r][None, None, :, :, None],
                (li, jnp.int32(r), zero, zero, lengths[r]))
            v_full = jax.lax.dynamic_update_slice(
                v_full, vv[r][None, None, :, None, :],
                (li, jnp.int32(r), zero, lengths[r], zero))
    else:
        # frozen rows overwrite their slot harmlessly (masked out of valid)
        k_full = k_full.at[li, rows, :, :, lengths].set(
            k_st[:, 0].astype(k_full.dtype))
        v_full = v_full.at[li, rows, :, lengths, :].set(
            v_st[:, 0].astype(v_full.dtype))
        kt_l = jax.lax.dynamic_index_in_dim(k_full, li, 0, False)
        vt_l = jax.lax.dynamic_index_in_dim(v_full, li, 0, False)
        if ks_full is not None:
            ks_l = jax.lax.dynamic_index_in_dim(ks_full, li, 0, False)
            vs_l = jax.lax.dynamic_index_in_dim(vs_full, li, 0, False)
            kt_l = (kt_l.astype(jnp.float32) * ks_l).astype(dt)
            vt_l = (vt_l.astype(jnp.float32)
                    * jnp.swapaxes(vs_l, -1, -2)).astype(dt)
        attn = mha_t(q, kt_l, vt_l, mask)

    x = x + maybe_matmul(attn.reshape(B, 1, nq * hd), lp["wo"])
    mlp_in = llama.rms_norm(x, lp["mlp_norm"].astype(dt), cfg.rms_norm_eps)
    if "wgu" in lp:
        g, up = jnp.split(maybe_matmul(mlp_in, lp["wgu"]), 2, axis=-1)
        gate = jax.nn.silu(g)
    else:
        gate = jax.nn.silu(maybe_matmul(mlp_in, lp["wg"]))
        up = maybe_matmul(mlp_in, lp["wu"])
    x = x + maybe_matmul(gate * up, lp["wd"])
    return x, (k_full, v_full, ks_full, vs_full)


@functools.partial(jax.jit, static_argnames=("cfg", "greedy"),
                   donate_argnums=(1,))
def decode_step(params: dict, state: ServeState, cfg: LlasaConfig,
                rng: jax.Array, greedy: bool = False) -> ServeState:
    """One frame for every live row; finished/empty rows are frozen."""
    lcfg = cfg.llama
    dt = jnp.dtype(lcfg.dtype)
    B = state.k.shape[1]
    max_frames = state.means.shape[1]

    live = jnp.logical_and(state.active, ~state.done)
    mean, logs, sample = _head_step(cfg, params, state.last_hidden, rng,
                                    greedy)

    kl = llasa.end_kl(cfg, mean, jnp.exp(logs.astype(jnp.float32)))[:, 0]
    fi = jnp.minimum(state.n_frames, max_frames - 1)
    rows = jnp.arange(B)
    sel = live[:, None]
    means = state.means.at[rows, fi].set(
        jnp.where(sel, mean[:, 0], state.means[rows, fi]))
    logs_b = state.logs.at[rows, fi].set(
        jnp.where(sel, logs[:, 0], state.logs[rows, fi]))
    samples = state.samples.at[rows, fi].set(
        jnp.where(sel, sample[:, 0], state.samples[rows, fi]))
    n_frames = state.n_frames + live.astype(jnp.int32)

    newly_done = jnp.logical_and(kl < cfg.end_kl_threshold,
                                 state.n_frames >= cfg.min_frames)
    newly_done = jnp.logical_or(newly_done, n_frames >= max_frames)
    done = jnp.logical_or(state.done, jnp.logical_and(live, newly_done))

    # next-token forward for live rows
    a_embed = llasa.audio_proj(params, sample, dt)
    valid = state.valid.at[rows, state.length].set(
        jnp.logical_or(state.valid[rows, state.length], live))
    mask = valid[:, None, None, :]  # (B,1,1,C)
    cos, sin = llama.rope_cos_sin(lcfg, state.pos[:, None])

    def body(carry, layer_in):
        x, k_full, v_full, ks, vs = carry
        li, lp = layer_in
        x, (k_full, v_full, ks, vs) = _decode_layer(
            lcfg, x, lp, cos, sin, k_full, v_full, ks, vs, li,
            state.length, mask, prev_valid=state.valid, live=live)
        return (x, k_full, v_full, ks, vs), None

    (x, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
        body, (a_embed.astype(dt), state.k, state.v, state.k_scale,
               state.v_scale),
        (jnp.arange(lcfg.num_layers), params["llama"]["layers"]))
    x = llama.rms_norm(x, params["llama"]["final_norm"].astype(dt),
                       lcfg.rms_norm_eps)
    last_hidden = jnp.where(live[:, None, None], x, state.last_hidden)

    return state._replace(
        k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs, valid=valid,
        length=state.length + live.astype(jnp.int32),
        pos=state.pos + live.astype(jnp.int32),
        last_hidden=last_hidden,
        means=means, logs=logs_b, samples=samples,
        n_frames=n_frames, done=done,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "greedy", "max_steps"),
                   donate_argnums=(1,))
def decode_until(params: dict, state: ServeState, cfg: LlasaConfig,
                 rng: jax.Array, max_steps: int,
                 greedy: bool = False):
    """Run decode steps ON DEVICE until some row completes (needs host
    harvesting) or `max_steps` elapse. One host round-trip per completion
    instead of per frame — decisive over a remote-TPU tunnel, where each
    fetch costs tens of ms."""

    def harvestable(s):
        return jnp.any(jnp.logical_and(s.active, s.done))

    def cond(carry):
        s, _, i = carry
        live = jnp.any(jnp.logical_and(s.active, ~s.done))
        return jnp.logical_and(i < max_steps,
                               jnp.logical_and(~harvestable(s), live))

    def body(carry):
        s, r, i = carry
        r, k = jax.random.split(r)
        return decode_step(params, s, cfg, k, greedy=greedy), r, i + 1

    state, rng, n = jax.lax.while_loop(cond, body, (state, rng, jnp.int32(0)))
    return state, rng, n


# ---------------------------------------------------------------------------
# host loop
# ---------------------------------------------------------------------------

class Completion(NamedTuple):
    index: int                 # position in the submitted prompt sequence
    means: np.ndarray          # (n, d)
    log_scales: np.ndarray     # (n, d)
    samples: np.ndarray        # (n, d)
    n_frames: int              # valid frames (last frame discarded)
    steps_waited: int          # decode steps from admission to completion


class Chunk(NamedTuple):
    """Incremental frames for one request (streaming mode). The consumer
    decodes `means` through the codec and appends to the request's wav
    stream (serve/web.wav_chunk_header emits a length-agnostic header, ref
    backup/web.py:145 chunked-wav convention)."""
    index: int                 # request index
    means: np.ndarray          # (k, d) new frames since the last chunk
    samples: np.ndarray        # (k, d)
    start_frame: int           # offset of means[0] in the full stream
    final: bool                # True on the request's last chunk


def state_pspecs(state: ServeState) -> ServeState:
    """PartitionSpecs for the serving state on a dp x tp mesh: batch rows
    over dp, KV heads over tp — the Megatron decode layout (wq/wk/wv
    column-parallel so each tp shard produces its own heads' KV and attends
    locally; wo row-parallel psums the attention output back — the same
    contract as the tp-sharded training params,
    parallel/mesh.param_pspecs)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DP_AXIS as dp, TP_AXIS as tp

    kv = P(None, dp, tp, None, None)
    return ServeState(
        k=kv, v=kv,
        k_scale=kv if state.k_scale is not None else None,
        v_scale=kv if state.v_scale is not None else None,
        valid=P(dp, None), length=P(dp), pos=P(dp),
        last_hidden=P(dp, None, None),
        means=P(dp, None, None), logs=P(dp, None, None),
        samples=P(dp, None, None),
        n_frames=P(dp), done=P(dp), active=P(dp),
    )


def shard_state(state: ServeState, mesh) -> ServeState:
    """Apply state_pspecs over `mesh` (specs pruned to the mesh's axes, so
    tp-only / dp-only meshes shard what they have). Beyond reference
    parity: the reference serves single-GPU (ref
    infer_vibevoice.py:434-448)."""
    from jax.sharding import NamedSharding

    from ..parallel.mesh import prune_spec

    names = set(mesh.axis_names)

    def put(x, s):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, prune_spec(s, names)))

    return ServeState(*(put(x, s) for x, s in zip(state, state_pspecs(state))))


@functools.partial(jax.jit, static_argnames=("n",))
def _frame_windows(means: jnp.ndarray, samples: jnp.ndarray,
                   starts: jnp.ndarray, n: int):
    """Per-row fixed-size windows of the frame buffers: row r yields
    frames [starts[r], starts[r]+n) (dynamic_slice clamps at the end).
    Chunk syncs fetch ONLY these windows — O(B x chunk_frames x d) per sync
    instead of the full (B, max_frames, d) buffers, which at B=32 x 1024
    frames would ship ~8 MB over the remote-TPU tunnel every sync."""

    def take(buf):
        d = buf.shape[-1]
        return jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s, 0), (n, d))
        )(buf, starts)

    return take(means), take(samples)


class ContinuousBatcher:
    """Admit prompts into free rows of a persistent decode batch.

    Compiles: one decode_step, one insert, one prefill per prompt bucket.
    """

    def __init__(self, params: dict, cfg: LlasaConfig, batch_size: int = 8,
                 max_frames: int = 200,
                 prompt_buckets: Sequence[int] = (16, 32, 64, 128),
                 seed: int = 0, greedy: bool = False, mesh=None):
        self.greedy = greedy
        self.params = params
        self.cfg = cfg
        self.B = batch_size
        self.max_frames = max_frames
        self.buckets = tuple(sorted(prompt_buckets))
        # 128-aligned so the Pallas decode-attention kernel can block it
        cache_len = -(-(self.buckets[-1] + max_frames + 1) // 128) * 128
        self.state = init_state(cfg, batch_size, cache_len, max_frames)
        if mesh is not None:
            # multi-chip serving: rows over dp, KV heads over tp; `params`
            # should be tp-sharded too (parallel/mesh.shard_params). The
            # jitted prefill/insert/decode_step then compile SPMD from the
            # input shardings — no set_mesh needed (no in-graph constraints)
            self.state = shard_state(self.state, mesh)
        self.rng = jax.random.key(seed)
        self.row_req: List[Optional[int]] = [None] * batch_size
        self.row_admit_step: List[int] = [0] * batch_size
        self.step_count = 0

    def _bucket(self, n: int) -> int:
        for bk in self.buckets:
            if bk >= n:
                return bk
        raise ValueError(f"prompt length {n} exceeds largest bucket "
                         f"{self.buckets[-1]}")

    def _admit(self, row: int, req_idx: int, ids: np.ndarray) -> None:
        bk = self._bucket(len(ids))
        buf = np.zeros((1, bk), np.int32)
        msk = np.zeros((1, bk), np.int32)
        buf[0, bk - len(ids):] = ids
        msk[0, bk - len(ids):] = 1
        rk, rv, rks, rvs, hid, ntok = prefill(
            self.params, self.cfg, jnp.asarray(buf), jnp.asarray(msk))
        self.state = insert(self.state, jnp.int32(row), rk, rv, rks, rvs,
                            hid, jnp.asarray(msk), ntok,
                            max_frames=self.max_frames)
        self.row_req[row] = req_idx
        self.row_admit_step[row] = self.step_count

    def _harvest(self) -> List[Completion]:
        """Pull finished rows off the device and free them."""
        done = np.asarray(self.state.done)
        active = np.asarray(self.state.active)
        out = []
        for r in range(self.B):
            if not (active[r] and done[r]):
                continue
            n_emitted = int(np.asarray(self.state.n_frames[r]))
            n = max(n_emitted - 1, 0)  # discard-last (model_sigmaVAE.py:147)
            out.append(Completion(
                index=self.row_req[r],
                means=np.asarray(self.state.means[r, :n], np.float32),
                log_scales=np.asarray(self.state.logs[r, :n], np.float32),
                samples=np.asarray(self.state.samples[r, :n], np.float32),
                n_frames=n,
                steps_waited=self.step_count - self.row_admit_step[r],
            ))
            self.state = self.state._replace(
                active=self.state.active.at[r].set(False))
            self.row_req[r] = None
        return out

    def poll_chunks(self, emitted: Dict[int, int],
                    window: int) -> List[Chunk]:
        """Chunk events for every live row with frames beyond `emitted`
        (req idx -> frames already streamed; updated in place). The device
        fetch is a fixed-size per-row window of `window` frames
        (_frame_windows), NOT the full (B, max_frames, d) buffers — callers
        that sync at least every `window` decode steps pay O(new frames)
        per sync. A row that somehow outran the window (e.g. a larger
        sync interval) just widens the fetch for that call."""
        n_frames = np.asarray(self.state.n_frames)
        done = np.asarray(self.state.done)
        active = np.asarray(self.state.active)
        rows = []  # (row, req idx, lo, avail)
        for r in range(self.B):
            idx = self.row_req[r]
            if idx is None or not active[r]:
                continue
            # stream up to n-1 emitted frames (the final frame is discarded,
            # model_sigmaVAE.py:147) once known-done; live rows stream
            # everything minus 1 (the last frame could be the discard)
            avail = max(int(n_frames[r]) - 1, 0)
            lo = emitted.get(idx, 0)
            if avail > lo:
                rows.append((r, idx, lo, avail))
        if not rows:
            return []
        need = max(avail - lo for _, _, lo, avail in rows)
        # round up in `window` multiples: few jit variants, bounded fetch
        n = min(-(-need // window) * window, self.max_frames)
        starts = np.zeros((self.B,), np.int32)
        for r, _, lo, _ in rows:
            starts[r] = min(lo, self.max_frames - n)  # dynamic_slice clamp
        w_means, w_samples = _frame_windows(
            self.state.means, self.state.samples, jnp.asarray(starts), n)
        w_means = np.asarray(w_means, np.float32)
        w_samples = np.asarray(w_samples, np.float32)
        out = []
        for r, idx, lo, avail in rows:
            es = int(starts[r])
            out.append(Chunk(
                index=idx, means=w_means[r, lo - es:avail - es],
                samples=w_samples[r, lo - es:avail - es],
                start_frame=lo, final=bool(done[r])))
            emitted[idx] = avail
        return out

    def run_iter(self, prompts: Iterable[np.ndarray]):
        """prompts: iterable of int32 token-id arrays. Yields Completions
        the moment their row finishes (completion order; .index maps back)."""
        pending = list(enumerate(prompts))
        pending.reverse()  # pop() takes them in submission order
        n_total, n_done = len(pending), 0

        while n_done < n_total:
            active = np.asarray(self.state.active)
            free = [r for r in range(self.B) if not active[r]]
            while pending and free:
                idx, ids = pending.pop()
                self._admit(free.pop(0), idx, np.asarray(ids, np.int32))
            # multi-step on-device decode: one host sync per completion,
            # not per frame (remote-TPU fetches cost tens of ms each)
            self.state, self.rng, n = decode_until(
                self.params, self.state, self.cfg, self.rng,
                max_steps=self.max_frames + 1, greedy=self.greedy)
            self.step_count += int(n)
            for c in self._harvest():
                n_done += 1
                yield c

    def run(self, prompts: Iterable[np.ndarray]) -> List[Completion]:
        return list(self.run_iter(prompts))

    def serve(self, prompts: Sequence[np.ndarray],
              arrivals: Optional[Sequence[float]] = None,
              chunk_frames: int = 0, clock=None, sleep=None):
        """Open-loop serving: requests become admittable at `arrivals[i]`
        seconds (relative to the call; None = all at t=0, closed loop), and
        with chunk_frames > 0 the device is synced every chunk_frames decode
        steps to stream Chunk events for live rows — TTFA is the first
        chunk, not the completion.

        Yields ("chunk", Chunk) and ("done", Completion) events. `clock` /
        `sleep` default to time.monotonic / time.sleep (tests inject fakes
        — a fake clock MUST come with a fake sleep, else idle waits for a
        future arrival would sleep real seconds).
        """
        import time as _time

        clock = clock or _time.monotonic
        sleep = sleep or _time.sleep
        t0 = clock()
        arr = list(arrivals) if arrivals is not None else [0.0] * len(prompts)
        order = sorted(range(len(prompts)), key=lambda i: arr[i])
        pending = [(i, np.asarray(prompts[i], np.int32)) for i in order]
        pending.reverse()  # pop() takes them in arrival order
        emitted = {}  # req idx -> frames already streamed
        n_done, n_total = 0, len(prompts)
        sync_steps = chunk_frames if chunk_frames > 0 else self.max_frames + 1

        while n_done < n_total:
            now = clock() - t0
            active = np.asarray(self.state.active)
            free = [r for r in range(self.B) if not active[r]]
            while pending and free and arr[pending[-1][0]] <= now:
                idx, ids = pending.pop()
                self._admit(free.pop(0), idx, ids)
                emitted[idx] = 0
            if not np.asarray(self.state.active).any():
                if not pending:
                    break  # nothing live, nothing waiting
                sleep(max(0.0, arr[pending[-1][0]] - (clock() - t0)))
                continue
            self.state, self.rng, n = decode_until(
                self.params, self.state, self.cfg, self.rng,
                max_steps=sync_steps, greedy=self.greedy)
            self.step_count += int(n)

            if chunk_frames > 0:
                # windowed per-row fetch: O(new frames) per sync
                for ch in self.poll_chunks(emitted, window=chunk_frames):
                    yield ("chunk", ch)

            for c in self._harvest():
                n_done += 1
                if chunk_frames > 0 and emitted.get(c.index, 0) < c.n_frames:
                    lo = emitted[c.index]
                    yield ("chunk", Chunk(
                        index=c.index, means=c.means[lo:],
                        samples=c.samples[lo:], start_frame=lo, final=True))
                    emitted[c.index] = c.n_frames
                yield ("done", c)
