"""The training loop: glue for data -> jitted step -> metrics/checkpoints.

Replaces the reference's accelerate loop (ref train_offline.py:45-336) with:
  * dp x tp mesh + jit (DDP all-reduce -> XLA psum)
  * orbax checkpoints INCLUDING optimizer state (reference gap, :264)
  * static-bucket batches from PrefetchLoader
  * JSONL + TensorBoard metrics, plain-text log parity
  * optional mid-train eval hook (decode pre_mean -> codec -> wav triplets,
    ref :289-326) supplied by the caller once a codec is configured.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointManager, load_reference_llasa_checkpoint
from ..core.config import ExperimentConfig
from ..data.collate import pad_batch_rows, stack_microbatches
from ..data.datasets import OfflineLatentDataset, PrefetchLoader
from ..models.lm import llasa
from ..parallel import multihost
from ..parallel.mesh import make_mesh, shard_batch, shard_params
from .metrics import MetricsWriter
from .optim import make_optimizer
from .step import TrainState, make_train_state, train_step

BATCH_KEYS = ("input_ids", "audio_latents", "distribute_labels",
              "ids_mask", "audio_mask", "target_mask", "end_mask")


class Trainer:
    def __init__(self, exp: ExperimentConfig, tokenizer,
                 eval_hook: Optional[Callable] = None):
        self.exp = exp
        self.cfg = exp.model
        self.tcfg = exp.train
        self.tokenizer = tokenizer
        self.eval_hook = eval_hook

        # multi-host: jax.distributed rendezvous (no-op on single host);
        # every host runs this same program and feeds its own data shard
        multihost.initialize()
        self.process_index, self.process_count = multihost.process_info()

        os.makedirs(exp.output_dir, exist_ok=True)
        os.makedirs(exp.log_dir, exist_ok=True)
        self.metrics = MetricsWriter(exp.log_dir)
        self.ckpt = CheckpointManager(os.path.join(exp.output_dir, "orbax"))

        self.mesh = make_mesh(dp=self.tcfg.dp, tp=self.tcfg.tp,
                              pp=self.tcfg.pp)
        self.tx = make_optimizer(self.tcfg)

        params = self._init_or_load_params()
        with jax.sharding.set_mesh(self.mesh):
            params = shard_params(params, self.mesh, fsdp=self.tcfg.fsdp,
                                  pp=self.tcfg.pp > 1)
            self.state = make_train_state(params, self.tx)
        self.state, self.start_step = self.ckpt.restore(self.state)
        if self.start_step:
            print(f"resumed from orbax step {self.start_step}")

    def _init_or_load_params(self) -> dict:
        key = jax.random.key(self.tcfg.seed)
        params = llasa.init_params(self.cfg, key)
        if self.exp.llm_model_name_or_path:
            path = self.exp.llm_model_name_or_path
            try:
                import torch  # host-side only
                from transformers import AutoModelForCausalLM

                from ..models.lm.convert import llama_params_from_state_dict

                m = AutoModelForCausalLM.from_pretrained(
                    path, torch_dtype=torch.float32)
                params["llama"] = llama_params_from_state_dict(
                    m.state_dict(), self.cfg.llama)
                print(f"loaded Llama backbone from {path}")
            except Exception as e:
                print(f"WARNING: could not load backbone from {path}: {e}; "
                      "using random init")
        if self.exp.start_checkpoint and os.path.exists(self.exp.start_checkpoint):
            params = load_reference_llasa_checkpoint(
                self.exp.start_checkpoint, self.cfg)
            print(f"warm-started from {self.exp.start_checkpoint}")
        return params

    def _device_batch(self, np_batch: Dict[str, np.ndarray]):
        dp = self.mesh.shape["dp"]
        if self.process_count > 1:
            # each host holds 1/process_count of the global batch; pad rows
            # to the host-local dp extent, then assemble the global array
            local_dp = max(1, dp // self.process_count)
            np_batch = pad_batch_rows(np_batch, local_dp,
                                      self.tokenizer.pad_token_id)
            b = {k: np_batch[k] for k in BATCH_KEYS}
            return multihost.host_local_to_global(b, self.mesh)
        np_batch = pad_batch_rows(np_batch, dp, self.tokenizer.pad_token_id)
        b = {k: jnp.asarray(np_batch[k]) for k in BATCH_KEYS}
        return shard_batch(b, self.mesh)

    def _device_batch_accum(self, np_batches):
        """Stack A loader batches into the (A, B, ...) microbatch form
        train_step's gradient-accumulation scan expects (dp on axis 1)."""
        pad_id = self.tokenizer.pad_token_id
        dp = self.mesh.shape["dp"]
        local_dp = (max(1, dp // self.process_count)
                    if self.process_count > 1 else dp)
        padded = [pad_batch_rows(b, local_dp, pad_id) for b in np_batches]
        stacked = stack_microbatches(
            [{k: b[k] for k in BATCH_KEYS} for b in padded], pad_id)
        if self.process_count > 1:
            return multihost.host_local_to_global(stacked, self.mesh,
                                                  leading_accum=True)
        b = {k: jnp.asarray(v) for k, v in stacked.items()}
        return shard_batch(b, self.mesh, leading_accum=True)

    def fit(self, max_steps: Optional[int] = None,
            profile_steps: Optional[tuple] = None) -> Dict[str, float]:
        """profile_steps=(start, stop): capture a jax.profiler trace into
        log_dir between those steps (tracing/profiling subsystem —
        the reference has none, SURVEY.md §5)."""
        exp, tcfg = self.exp, self.tcfg
        dataset = OfflineLatentDataset(
            exp.data.meta_path, self.tokenizer,
            latent_kind=exp.data.latent_kind, seed=tcfg.seed,
            max_length=exp.data.max_length,
            # per-host data sharding (each host reads its own slice)
            shard_index=self.process_index,
            shard_count=self.process_count)
        loader = PrefetchLoader(
            dataset, self.tokenizer.pad_token_id,
            max_token_length=exp.data.max_token_length,
            batch_size=exp.data.batch_size,
            use_dynamic=exp.data.use_dynamic,
            buckets=exp.data.length_buckets,
            num_workers=exp.data.num_workers,
            prefetch=exp.data.prefetch_size)

        rng = jax.random.key(tcfg.seed + 1)
        step = self.start_step
        epoch = 0
        last_metrics: Dict[str, float] = {}
        t_last = time.time()
        accum = tcfg.gradient_accumulation_steps
        micro_buf: list = []
        with jax.sharding.set_mesh(self.mesh):
            while True:
                for np_batch in loader.epoch_iter(epoch):
                    if not len(np_batch["input_ids"]):
                        continue
                    if accum > 1:
                        micro_buf.append(np_batch)
                        if len(micro_buf) < accum:
                            continue
                        batch = self._device_batch_accum(micro_buf)
                        np_batch = micro_buf[-1]  # for log line / eval hook
                        micro_buf = []
                    else:
                        batch = self._device_batch(np_batch)
                    if profile_steps and step == profile_steps[0]:
                        jax.profiler.start_trace(exp.log_dir)
                    self.state, m = train_step(
                        self.state, self.cfg, tcfg, self.tx, batch, rng)
                    if profile_steps and step == profile_steps[1]:
                        jax.block_until_ready(m["total_loss"])
                        jax.profiler.stop_trace()
                    step += 1

                    if step % tcfg.log_interval == 0:
                        m = {k: float(v) for k, v in m.items()}
                        dt = time.time() - t_last
                        t_last = time.time()
                        m["steps_per_s"] = tcfg.log_interval / max(dt, 1e-9)
                        last_metrics = m
                        if multihost.is_main_process():
                            # log on main host only (accelerate
                            # is_main_process parity, ref train_offline.py:262)
                            self.metrics.log(step, m)
                            line = (f"{time.ctime()}: Epoch:{epoch}, Step:{step}, "
                                    f"batch_size:{np_batch['input_ids'].shape[0]}, "
                                    f"total_loss:{m['total_loss']:.5f}, "
                                    f"audio_loss:{m['audio_loss']:.5f}, "
                                    f"end_loss:{m['end_loss']:.5f}")
                            print(line)
                            self.metrics.text_log(line)
                            if self.eval_hook is not None:
                                self.eval_hook(self, step, np_batch)

                    if step % tcfg.save_interval == 0:
                        self.ckpt.save(step, jax.device_get(self.state))

                    if max_steps is not None and step >= max_steps:
                        self.ckpt.save(step, jax.device_get(self.state), wait=True)
                        return last_metrics
                epoch += 1
        return last_metrics
