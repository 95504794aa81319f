from alphazero_tpu.train.learner import (
    TrainState,
    cosine_lr,
    create_train_state,
    train_step,
)
from alphazero_tpu.train.replay import ReplayBuffer
from alphazero_tpu.train.selfplay import (
    selfplay_games,
    selfplay_games_continuous,
)
from alphazero_tpu.train.trainer import Trainer

__all__ = [
    "TrainState", "cosine_lr", "create_train_state", "train_step",
    "ReplayBuffer", "selfplay_games", "selfplay_games_continuous", "Trainer",
]
