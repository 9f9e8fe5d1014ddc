"""Model registry (reference lib/models/__init__.py)."""

from .faster_voxelpose import FasterVoxelPoseNet, build_model
from .resnet import PoseResNet, build_backbone


def get(name: str):
    if name == "faster_voxelpose":
        return build_model
    if name == "resnet":
        return build_backbone
    raise KeyError(f"unknown model '{name}'")
