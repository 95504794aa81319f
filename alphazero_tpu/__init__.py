"""alphazero_tpu — a TPU-native AlphaZero framework for Breakthrough.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
pure-Python/PyTorch system (pierre-roth/AlphaZero):

- ``env``      vectorized Breakthrough rules (lockstep thousands of boards under jit)
- ``models``   SE-ResNet policy/value network (Flax)
- ``search``   batched on-device MCTS (fixed-size node arrays, one XLA program per move)
- ``train``    actor-learner self-play training with replay + Orbax checkpoints
- ``arena``    ELO evaluation gate with batched model-vs-model matches
- ``parallel`` device mesh / sharding utilities for multi-chip scaling
- ``baseline`` classical alpha-beta engine (host-side)
- ``web``      stdlib HTTP server exposing the reference's /api/* surface
"""

__version__ = "0.1.0"
