"""Dataset layer: HDF5 packing/loading (C2), balanced sampling (C9),
synthetic stand-in datasets (C1 substitute — no network in this
environment), host audio IO."""

from mla_tpu.data import audio_io, hdf5, sampler, synthetic  # noqa: F401
