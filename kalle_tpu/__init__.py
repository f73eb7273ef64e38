"""kalle_tpu — TPU-native rebuild of the KALL-E-style continuous-latent
speech/audio LM framework (reference: 18281818221/kalle-audio).

Compute path is JAX/XLA/Pallas; host runtime has native C++ components.
Package layout:
  core/          config, rng, checkpointing, mesh
  models/lm      Llama backbone + Llasa heads (sigma / stable-audio / mel-VAE)
  models/codecs  Oobleck VAE, BigVGANFlowVAE (mel-VAE), SigmaVAE (VibeVoice-style)
  models/conditioning  ECAPA-TDNN, MRTE, speaker VAE, CFG
  ops/           Pallas kernels + XLA compute ops (attention, snake, stft/mel)
  parallel/      mesh + sharding rules (dp/tp/sp)
  data/          jsonl/npy datasets, token-budget bucketing, prefetch
  train/         pjit train step, optimizer, schedules, loop
  infer/         KV-cached AR decode, streaming, batch inference
  eval/          WER / speaker-sim harnesses
  serve/         web demo
"""

__version__ = "0.1.0"
