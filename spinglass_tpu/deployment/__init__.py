from spinglass_tpu.deployment.config import (
    ProductionConfig, ComputeConfig, ServiceConfig, ObservabilityConfig,
    CheckpointingConfig, Environment,
)
