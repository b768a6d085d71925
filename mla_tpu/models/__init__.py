"""Model zoo: CNN trunks (C4), embedded mapping blocks (C5), attention
pooling heads (C6-C8), assembled by ``mla_tpu.models.zoo.build_model``."""

from mla_tpu.models import heads, trunk, zoo  # noqa: F401
from mla_tpu.models.zoo import AudioTagger, build_model  # noqa: F401
