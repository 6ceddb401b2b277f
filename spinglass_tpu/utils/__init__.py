from spinglass_tpu.utils.exceptions import (
    SpinGlassError, ModelError, AnnealingError, DeviceError, ValidationError,
    ConvergenceError, CheckpointError,
)
from spinglass_tpu.utils.logging import (
    setup_logger, get_logger, PerformanceLogger, ProgressLogger,
)
from spinglass_tpu.utils import validation, monitoring, health, checkpoint
from spinglass_tpu.utils.robust import robust_operation
from spinglass_tpu.utils import security, cache, profiling
from spinglass_tpu.utils import enterprise_security
from spinglass_tpu.utils import anomaly, autoscale, metrics_exporter
from spinglass_tpu.utils.anomaly import (
    AnomalyDetector, SelfHealingSystem, AdaptiveMonitoringSystem,
)
from spinglass_tpu.utils.autoscale import (
    AdaptiveScaler, MultiObjectiveScaler, WorkloadPredictor,
    AutoScalingManager,
)
from spinglass_tpu.utils.metrics_exporter import (
    MetricsRegistry, MetricsServer, global_registry,
)
