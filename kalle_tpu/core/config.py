"""Typed configuration system.

The reference uses flat YAML dicts with absolute paths computed in-code
(ref: train_offline.py:47-58, configs/twj.yaml). Here every config is a
frozen dataclass so it can be closed over by jitted functions, with a YAML
loader that accepts the reference's experiment-YAML schema verbatim
(model.{llm_model_name_or_path,latent_dim,audio_proj_dim}, loss weights,
lr/scheduler block, dataset block, datapool, batch_generator).
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import yaml


@dataclass(frozen=True)
class RopeScaling:
    """Llama-3 rope scaling (matches HF `rope_scaling` for Llama-3.2)."""

    factor: float = 32.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


@dataclass(frozen=True)
class LlamaConfig:
    """Decoder backbone config. Defaults = Llama-3.2-1B-Instruct
    (ref: configs/twj.yaml:10-13 selects this model)."""

    vocab_size: int = 128264  # 128256 + 8 audio special tokens
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_layers: int = 16
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 64
    rope_theta: float = 500000.0
    rope_scaling: Optional[RopeScaling] = field(default_factory=RopeScaling)
    rms_norm_eps: float = 1e-5
    max_seq_len: int = 2048  # ref: twj_dataset.py:164
    dtype: str = "bfloat16"  # compute dtype (MXU-native)
    param_dtype: str = "float32"  # master params
    remat: bool = False  # jax.checkpoint each layer block
    # remat policy when remat=True: "full" recomputes everything;
    # "dots" saves matmul outputs and recomputes only elementwise/norms
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — most of
    # the no-remat speed at a fraction of the activation memory
    remat_policy: str = "full"
    # route full-sequence attention through the Pallas flash kernel (fwd+bwd)
    # when the bucket length is block-aligned; TPU equivalent of the
    # reference's attn_implementation="flash_attention_2" default
    # (ref model.py:20-23, model_sigmaVAE.py:17-22). Auto-disabled on CPU
    # unless forced (tests force interpret mode).
    use_flash_attention: bool = True
    # microbatches streamed through the pipeline stages when the ambient
    # mesh has a `pp` axis (parallel/pipeline.py). Per-device batch must be
    # divisible by it; bubble fraction = (pp-1)/(pp_microbatches+pp-1).
    pp_microbatches: int = 4
    # pipeline TRAINING schedule when the mesh has a pp axis:
    #   "gpipe" — differentiate through the forward pipeline scan
    #             (parallel/pipeline.py); all-microbatch stage inputs live
    #             through backward (O(M) states/stage)
    #   "1f1b"  — hand-scheduled one-forward-one-backward
    #             (parallel/pipeline_1f1b.py); at most `pp` stage inputs in
    #             flight, enabling pp_microbatches >> pp, which is what
    #             shrinks the pipeline bubble. Same loss, same grads.
    # Inference/eval forwards always use the GPipe forward pass.
    pp_schedule: str = "gpipe"
    # unroll factor for the training-forward layer scan (llama.forward).
    # 1 = rolled while-loop (one compiled layer body, smallest compile).
    # num_layers = fully unrolled straight-line layers: the backward's
    # per-layer dW writes and residual saves become plain fusion outputs
    # instead of dynamic-update-slice writes into (L, ...) stacks (profiled
    # at ~80 GB/s effective on v5e — a layout-converting bitcast+DUS).
    scan_unroll: int = 1
    # fused Pallas decode attention over the KV cache (TPU, t=1, cache_len
    # % 128 == 0 — callers round the cache up; ops/pallas/decode_attention
    # .py). Engages only for bf16 KV caches: in-step on v5e (int8 weights,
    # decode_microbench r3) the kernel wins +4%/+13% (b=8, cache 256/1024)
    # to +14%/+27% (b=32) over the XLA lowering — but with an int8 KV cache
    # XLA's fused dequant-attention matches or beats it everywhere measured,
    # so int8-KV decode always takes the XLA path. Rule of thumb: short
    # caches -> bf16 KV + kernel (fastest); long caches -> int8 KV + XLA
    # (fastest AND half the memory).
    use_decode_attention: bool = True
    # batch floor for the fused decode kernel: at b=1 the kernel regresses
    # TTFA (0.068 -> 0.086 s, round 2); from 8 up it wins for bf16 KV.
    # Tunable so benches can force the kernel on (1) or off (big).
    decode_attention_min_batch: int = 8
    # test hook: run the decode-attention kernel in Pallas interpret mode
    # off-TPU so CPU tests can exercise the serving loop's kernel branch
    # (sideband column + dynamic_update_slice chain) end to end.
    decode_attention_interpret: bool = False
    # "int8" stores the KV cache quantized with per-(token, kv-head) absmax
    # scales: half the KV HBM traffic / double the servable context. The
    # decode kernel folds the scales into its two matmuls (no dequantized
    # copy); quality-gated on a trained model in tests/test_quant.py.
    kv_cache_dtype: str = "bfloat16"

    @staticmethod
    def tiny(vocab_size: int = 300) -> "LlamaConfig":
        """Small config for unit tests / CPU."""
        return LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            max_seq_len=128,
            dtype="float32",
        )


@dataclass(frozen=True)
class LlasaConfig:
    """Audio-LM head config.

    head_variant selects among the three reference model files:
      - "sigma":       mean-only head, fixed sigma=0.5 (model_sigmaVAE.py:42-52,150-151)
      - "stableaudio": (mean, log_scale) 2x head, label std x1.25 (model.py:43-51,84-87)
      - "melvae":      (mean, log_scale) 2x head, no std rescale
                       (training_version/melvae/model.py)
    """

    llama: LlamaConfig = field(default_factory=LlamaConfig)
    latent_dim: int = 64  # ref: configs/twj.yaml:12
    audio_proj_dim: int = 2048  # ref: configs/twj.yaml:13
    head_variant: str = "sigma"
    sigma: float = 0.5  # ref: model_sigmaVAE.py:151
    label_std_scale: float = 1.25  # ref: model.py:87 (stableaudio only)
    # end-of-speech detector: KL(pred || N(end_mean, end_std)) / d < thres
    # after > min_frames frames (ref: model.py:138-144)
    end_kl_threshold: float = 0.5
    end_mean: float = 1.0
    end_std: float = 2.718281828459045  # exp(1) (ref: model.py:136)
    min_frames: int = 4

    @property
    def head_out_dim(self) -> int:
        return self.latent_dim if self.head_variant == "sigma" else 2 * self.latent_dim

    @staticmethod
    def tiny(head_variant: str = "sigma", latent_dim: int = 8) -> "LlasaConfig":
        return LlasaConfig(
            llama=LlamaConfig.tiny(),
            latent_dim=latent_dim,
            audio_proj_dim=64,
            head_variant=head_variant,
        )


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (ref: configs/twj.yaml:25-33, train_offline.py:94-105)."""

    lr: float = 5e-5
    weight_decay: float = 1e-2
    warmup_steps: int = 1000
    total_steps: int = 1_000_000
    scheduler: str = "cosine"
    gradient_accumulation_steps: int = 1
    audio_loss_weight: float = 1.0
    end_loss_weight: float = 0.002
    save_interval: int = 5000
    log_interval: int = 100
    # speaker-VAE KL regularizer weight for the _spkvae variants
    # (ref configs/vae_12_5hz_dim2048_tts-sft.yaml:20, variants.py losses)
    speaker_cond_kl_weight: float = 0.0
    # flow-space KL weight (train/flow_kl.py; ref infer_backup/train copy.py:175-183)
    kl_loss_weight: float = 0.0
    seed: int = 42
    max_grad_norm: Optional[float] = None
    # emit metrics["grad_norm"] from train_step. Off by default: with
    # max_grad_norm=None (reference parity — clipping is commented out at
    # ref train_offline.py:246) the norm is a dedicated full read pass over
    # ~2.5 GB of grads, measured 4.7 ms/step on the 1B flagship (v5e) —
    # ~3.4% of the b4xt512 step — purely for a log line the reference
    # doesn't have.
    log_grad_norm: bool = False
    # parallelism: mesh axis sizes; -1 means "all remaining devices"
    dp: int = -1
    tp: int = 1
    # ZeRO-3/FSDP: shard tp-sharded weight dims over dp too (params and
    # optimizer state at rest drop to 1/(tp*dp) per chip; XLA all-gathers
    # weights over dp inside each scanned layer)
    fsdp: bool = False
    # GPipe pipeline stages (parallel/pipeline.py); composes with dp only.
    # Microbatch count comes from LlamaConfig.pp_microbatches.
    pp: int = 1


@dataclass(frozen=True)
class DataConfig:
    """Dataset config (ref: configs/twj.yaml:36-51)."""

    meta_path: str = ""
    latent_kind: str = "sigma"  # "sigma" (.npy (1,T,64)) | "stableaudio" (.npy (1,128,T))
    spk_drop_prob: float = 0.0
    # streaming interleave: audio stream lags text by this many frames
    # (ref configs/vae_12_5hz_dim2048_tts-sft.yaml:43, dy_dataset.py:795-807)
    delay_frames: int = 0
    max_token_length: int = 11000  # dynamic batch token budget
    batch_size: int = 16
    use_dynamic: bool = True
    num_workers: int = 4
    prefetch_size: int = 64
    max_length: int = 2048
    # static-shape buckets (sequence lengths) the dynamic batcher rounds up to;
    # XLA-friendly replacement for per-batch max-length padding
    length_buckets: Tuple[int, ...] = (128, 256, 384, 512, 768, 1024, 1536, 2048)


@dataclass(frozen=True)
class ExperimentConfig:
    project_name: str = "kalle_tpu"
    exp_dir: str = "/tmp/kalle_tpu_exp"
    llm_model_name_or_path: str = ""
    tokenizer_path: str = ""
    start_checkpoint: str = ""
    use_flash_attention: bool = True
    model: LlasaConfig = field(default_factory=LlasaConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    vae_config_file: str = ""
    vae_ckpt_path: str = ""

    @property
    def log_dir(self) -> str:
        return os.path.join(self.exp_dir, self.project_name, "logs")

    @property
    def output_dir(self) -> str:
        return os.path.join(self.exp_dir, self.project_name, "output")

    @property
    def resume_dir(self) -> str:
        return os.path.join(self.exp_dir, self.project_name, "resume")


def _get(d: dict, key: str, default: Any = None) -> Any:
    v = d.get(key, default)
    return default if v is None else v


def load_experiment_config(path_or_dict: Any) -> ExperimentConfig:
    """Load a reference-schema experiment YAML (e.g. configs/twj_0828.yaml)
    into the typed config tree. Unknown keys are ignored; paths are kept
    verbatim so the caller decides host-side IO."""
    if isinstance(path_or_dict, (str, os.PathLike)):
        with open(path_or_dict) as f:
            raw = yaml.safe_load(f)
    else:
        raw = dict(path_or_dict)

    m = _get(raw, "model", {})
    latent_dim = int(_get(m, "latent_dim", 64))
    head_variant = str(_get(m, "head_variant", _get(raw, "head_variant", "sigma")))

    llama_overrides = _get(m, "llama", {})
    if llama_overrides:
        valid = {f.name for f in dataclasses.fields(LlamaConfig)}
        kwargs = {k: v for k, v in llama_overrides.items()
                  if k in valid and k != "rope_scaling"}
        if isinstance(llama_overrides.get("rope_scaling"), dict):
            kwargs["rope_scaling"] = RopeScaling(**llama_overrides["rope_scaling"])
        elif llama_overrides.get("rope_scaling") is None and "rope_scaling" in llama_overrides:
            kwargs["rope_scaling"] = None
        llama = dataclasses.replace(LlamaConfig(), **kwargs)
    else:
        llama = LlamaConfig()
    # the reference YAML spells it "use_flash_attation" (typo kept verbatim)
    llama = dataclasses.replace(llama, use_flash_attention=bool(
        _get(raw, "use_flash_attation", _get(raw, "use_flash_attention", True))))

    model = LlasaConfig(
        llama=llama,
        latent_dim=latent_dim,
        audio_proj_dim=int(_get(m, "audio_proj_dim", 2048)),
        head_variant=head_variant,
    )

    ds = _get(raw, "dataset", {})
    bg = _get(raw, "batch_generator", {})
    dp = _get(raw, "datapool", {})
    data = DataConfig(
        meta_path=str(_get(ds, "meta_path", "")),
        latent_kind=str(_get(ds, "latent_kind", "sigma")),
        spk_drop_prob=float(_get(ds, "spk_drop_prob", 0.0)),
        delay_frames=int(_get(ds, "delay_frames", 0)),
        max_token_length=int(_get(bg, "max_token_length", 11000)),
        batch_size=int(_get(bg, "batch_size", 16)),
        use_dynamic=bool(_get(bg, "use_dynamic", True)),
        num_workers=int(_get(dp, "num_workers", 4)),
        prefetch_size=int(_get(dp, "prefetch_size", 64)),
    )

    train = TrainConfig(
        lr=float(_get(raw, "lr", 5e-5)),
        weight_decay=float(_get(raw, "weight_decay", 1e-2)),
        warmup_steps=int(_get(raw, "warmup_steps", 1000)),
        total_steps=int(_get(raw, "total_steps", 1_000_000)),
        scheduler=str(_get(raw, "scheduler", "cosine")),
        gradient_accumulation_steps=int(_get(raw, "gradient_accumulation_steps", 1)),
        audio_loss_weight=float(_get(raw, "audio_loss_weight", 1.0)),
        end_loss_weight=float(_get(raw, "end_loss_weight", 0.002)),
        speaker_cond_kl_weight=float(_get(raw, "speaker_cond_kl_weight", 0.0)),
        kl_loss_weight=float(_get(raw, "kl_loss_weight", 0.0)),
        save_interval=int(_get(raw, "save_interval", 5000)),
        log_interval=int(_get(raw, "log_interval", 100)),
        dp=int(_get(raw, "dp", -1)),
        tp=int(_get(raw, "tp", 1)),
        fsdp=bool(_get(raw, "fsdp", False)),
        pp=int(_get(raw, "pp", 1)),
    )

    vae_cfg = _get(ds, "vae_config", {})
    return ExperimentConfig(
        project_name=str(_get(raw, "project_name", "kalle_tpu")),
        exp_dir=str(_get(raw, "exp_dir", "/tmp/kalle_tpu_exp")),
        llm_model_name_or_path=str(_get(m, "llm_model_name_or_path", "")),
        tokenizer_path=str(_get(raw, "tokenizer_path", "")),
        start_checkpoint=str(_get(raw, "start_checkpoint", "")),
        use_flash_attention=bool(_get(raw, "use_flash_attation",
                                      _get(raw, "use_flash_attention", True))),
        model=model,
        train=train,
        data=data,
        vae_config_file=str(_get(vae_cfg, "config_file", "")),
        vae_ckpt_path=str(_get(vae_cfg, "cpt_path", "")),
    )
