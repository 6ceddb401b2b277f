from spinglass_tpu.rl.env import EnvConfig, EnvState, reset, step, observe
from spinglass_tpu.rl.rewards import RewardConfig
from spinglass_tpu.rl.ppo import PPOConfig, ActorCritic, make_ppo, train
from spinglass_tpu.rl.dqn import (DQNConfig, PrioritizedReplayBuffer,
                                  QNetwork, ReplayBuffer, make_dqn)
from spinglass_tpu.rl.train import TrainingConfig, RLTrainingPipeline
