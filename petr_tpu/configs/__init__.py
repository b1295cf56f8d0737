from petr_tpu.configs.config import (
    BackboneConfig,
    DataConfig,
    HeadConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    ExperimentConfig,
    get_config,
    list_configs,
)
