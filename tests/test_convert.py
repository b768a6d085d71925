"""torch VGGish -> flax weight conversion parity: a random-weight torch
VGGish (torchvggish topology) and the converted flax VGGish must produce
identical embeddings for the same 96x64 patches."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from mla_tpu.models.convert import flax_vggish_to_torch, torch_vggish_to_flax
from mla_tpu.models.trunk import VGGish


def _torch_vggish():
    """torchvggish topology (hershey et al. VGGish, NHWC-flatten variant)."""
    features = nn.Sequential(
        nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
        nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(True),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
        nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(True),
        nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
    )
    embeddings = nn.Sequential(
        nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
        nn.Linear(4096, 4096), nn.ReLU(True),
        nn.Linear(4096, 128), nn.ReLU(True),
    )

    class TV(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.embeddings = embeddings

        def forward(self, x):  # x: [B, 1, 96, 64]
            x = self.features(x)
            x = torch.transpose(x, 1, 3)  # -> NWHC (torchvggish does this)
            x = torch.transpose(x, 1, 2)  # -> NHWC
            x = x.contiguous().flatten(1)
            return self.embeddings(x)

    m = TV().eval()
    torch.manual_seed(0)
    for p in m.parameters():
        with torch.no_grad():
            p.normal_(0, 0.05)
    return m


def test_torch_to_flax_vggish_embedding_parity(rng):
    tm = _torch_vggish()
    params = torch_vggish_to_flax(tm.state_dict(), flatten_order="nhwc")
    x = (rng.standard_normal((3, 96, 64)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)[:, None]).numpy()
    model = VGGish(dtype=jnp.float32)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape == (3, 128)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_roundtrip_conversion():
    tm = _torch_vggish()
    sd = tm.state_dict()
    params = torch_vggish_to_flax(sd, flatten_order="nhwc")
    back = flax_vggish_to_torch(params, flatten_order="nhwc")
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), atol=1e-7, err_msg=k)
