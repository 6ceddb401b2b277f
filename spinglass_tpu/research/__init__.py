from spinglass_tpu.research.quantum import (
    SQAConfig, PIMCConfig, simulated_quantum_annealing,
    path_integral_monte_carlo, trotterize, j_perp,
)
from spinglass_tpu.research.novel import (
    AQIAConfig, MSHOConfig, LESDConfig,
    adaptive_quantum_inspired_annealing, multi_scale_optimization,
    learning_enhanced_dynamics, compare_algorithms, ALGORITHM_REGISTRY,
)
from spinglass_tpu.research.validation import (
    ExperimentalValidation, welch_t, cohens_d, bootstrap_ci,
)
from spinglass_tpu.research.pareto import (
    ParetoArchive, MultiObjectiveConfig, optimize as pareto_optimize,
    dominates,
)
from spinglass_tpu.research.federated import (
    FederatedAnnealingServer, FederatedConfig, ClientReport,
)
from spinglass_tpu.research.meta import (
    MetaOptimizer, ScheduleMemory, characterize, select_algorithm,
)
from spinglass_tpu.research.federated import (
    FederatedQuantumHybridOptimizer,
)
from spinglass_tpu.research.unified import (
    ProblemAnalyzer, AlgorithmSelector, UnifiedResearchFramework,
    ProblemAnalysis,
)
from spinglass_tpu.research.breakthrough import (
    AdaptiveNeuralAnnealer, BreakthroughConfig, BreakthroughResearchFramework,
    FederatedOptimizationNetwork, QuantumErrorCorrectedAnnealer,
)
from spinglass_tpu.research.meta_rl import (
    AdaptiveMetaRLAgent, EpisodicMemory, MetaLearningNetwork, MetaRLConfig,
    NeuralArchitectureSearch, ProblemCharacterizer, fit_meta_network,
)
