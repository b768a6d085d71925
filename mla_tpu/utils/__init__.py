"""Host-side utilities: eval metrics (C13), logging (C16)."""

from mla_tpu.utils import logging, metrics  # noqa: F401
