"""mla_tpu — TPU-native audio tagging framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
``caesar-one/audio-classification-using-a-deep-cnn-combined-with-multi-level-attention``
(see SURVEY.md): log-mel front-end, deep CNN embedding trunk, multi-level
attention pooling heads, balanced multi-label training, mAP/AUC/d-prime
evaluation, checkpointing, and streaming raw-audio inference — all designed
TPU-first (SPMD over a device mesh, one XLA program per step, fused Pallas
front-end kernel).

Component map (SURVEY.md §2):
  C3  front-end            -> mla_tpu.ops.frontend (+ ops.pallas_frontend, T1)
  C4  CNN trunk            -> mla_tpu.models.trunk
  C5-C8 heads / model zoo  -> mla_tpu.models.heads, mla_tpu.models.zoo
  C9  balanced sampler     -> mla_tpu.data.sampler
  C2  HDF5 pack/load       -> mla_tpu.data.hdf5
  C10-C12 train loop       -> mla_tpu.train.loop
  C13 metrics              -> mla_tpu.utils.metrics
  C14 checkpoint           -> mla_tpu.train.checkpoint (Orbax, T10)
  C15 inference            -> mla_tpu.serve.streaming (T11)
  C16 logging              -> mla_tpu.utils.logging
  C17 config/CLI           -> mla_tpu.config, mla_tpu.__main__
  T2-T8 mesh/sharding      -> mla_tpu.parallel
"""

__version__ = "0.1.0"

from mla_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    FrontendConfig,
    ModelConfig,
    TrainConfig,
    get_config,
    list_configs,
)
