from petr_tpu.configs.config import (
    BackboneConfig,
    DataConfig,
    HeadConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    ExperimentConfig,
    apply_overrides,
    get_config,
    list_configs,
)
