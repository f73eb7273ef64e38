from .config import (
    LlamaConfig,
    LlasaConfig,
    TrainConfig,
    DataConfig,
    ExperimentConfig,
    load_experiment_config,
)

__all__ = [
    "LlamaConfig",
    "LlasaConfig",
    "TrainConfig",
    "DataConfig",
    "ExperimentConfig",
    "load_experiment_config",
]
