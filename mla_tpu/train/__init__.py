"""Training subsystem: TrainState, BCE/Adam step builders (C10-C12),
Orbax checkpointing (C14/T10), the end-to-end fit() loop."""

from mla_tpu.train import checkpoint, loop, state  # noqa: F401
from mla_tpu.train.loop import evaluate, fit  # noqa: F401
from mla_tpu.train.state import TrainState, bce_loss, create_train_state  # noqa: F401
