"""Pose-ResNet backbone parity: torch reference -> converter -> flax,
covering the trunk (incl. bottleneck/basic blocks, downsample branches),
the torch-convention transposed convs, and the final head."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _ref_cfg(num_layers, num_joints):
    return _NS(
        RESNET=_NS(
            NUM_LAYERS=num_layers,
            DECONV_WITH_BIAS=False,
            NUM_DECONV_LAYERS=3,
            NUM_DECONV_FILTERS=[32, 32, 32],
            NUM_DECONV_KERNELS=[4, 4, 4],
            FINAL_CONV_KERNEL=1,
        ),
        DATASET=_NS(NUM_JOINTS=num_joints),
    )


@pytest.mark.parametrize("num_layers", [18, 50])
def test_backbone_matches_reference(num_layers):
    if not add_reference_to_path():
        pytest.skip("reference not available")
    import torch

    torch.manual_seed(0)
    from models import resnet as ref_resnet

    J = 5
    ref_model = ref_resnet.get(_ref_cfg(num_layers, J)).eval()

    import jax
    from faster_voxelpose_tpu.models.resnet import PoseResNet
    from faster_voxelpose_tpu.utils.weights_torch import convert_backbone

    model = PoseResNet(
        num_layers=num_layers,
        num_joints=J,
        deconv_filters=(32, 32, 32),
        deconv_kernels=(4, 4, 4),
        deconv_with_bias=False,
        final_conv_kernel=1,
    )
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = convert_backbone(sd, num_layers)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    ours = np.asarray(model.apply(variables, x, train=False, mutable=False))

    with torch.no_grad():
        ref = (
            ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    assert ours.shape == ref.shape  # (1, 16, 24, J): 1/4 input resolution
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)
