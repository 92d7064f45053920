"""Full-model numerical fidelity: Flax forward vs torch forward with the
SAME weights (the 1e-3 eval-fidelity bar, BASELINE.md).

The exported state_dict runs in a hand-written torchvision-compatible
ResNet (tests/torch_resnet.py); eval logits must agree within 1e-3 when the
Flax side uses float32 + HIGHEST precision.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.config import ModelConfig
from irp_tpu.models import flax_variables_to_torch_state_dict, init_classifier


def _fidelity(depth, image_size, batch=2, atol=1e-3, groups=1,
              width_per_group=64):
    torch = pytest.importorskip("torch")
    from irp_tpu.models.torch_ref import TorchAnimalClassifier

    cfg = ModelConfig(depth=depth, num_classes=10, image_size=image_size,
                      dropout_rate=0.0, compute_dtype="float32",
                      groups=groups, width_per_group=width_per_group,
                      precision="highest")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                       image_size)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, image_size, image_size, 3)).astype(
        np.float32)

    ours = np.asarray(model.apply(variables, jnp.array(x), train=False))

    sd = flax_variables_to_torch_state_dict(variables, depth=depth)
    tmodel = TorchAnimalClassifier(depth=depth, num_classes=10,
                                   groups=groups,
                                   width_per_group=width_per_group)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    # only num_batches_tracked buffers may be missing
    assert all("num_batches_tracked" in k for k in missing), missing
    assert not unexpected, unexpected
    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.tensor(x).permute(0, 3, 1, 2)).numpy()

    diff = np.abs(ours - theirs).max()
    assert diff < atol, f"max |flax - torch| = {diff}"
    return diff


def test_fidelity_resnet18_56px():
    _fidelity(18, 56)


@pytest.mark.slow
def test_fidelity_resnet50_224px():
    """The flagship configuration at full resolution."""
    _fidelity(50, 224)


def test_fidelity_resnext50_32x4d_56px():
    """Grouped 3x3 convs (feature_group_count) match torch's groups=32
    numerically, and the state_dict round-trips through the same
    torchvision-compatible layout."""
    _fidelity(50, 56, groups=32, width_per_group=4)


@pytest.mark.slow
def test_fidelity_wide_resnet50_2_56px():
    _fidelity(50, 56, width_per_group=128)
