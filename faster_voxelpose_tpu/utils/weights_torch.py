"""Torch-checkpoint -> flax-variables converter.

Maps the reference's released PyTorch checkpoints (FasterVoxelPoseNet
state dicts saved by lib/utils/utils.py:89-98, and the pose_resnet50
backbone tarball) onto this framework's flax module trees, so eval parity
against the published model zoo can be validated stage by stage.

Layout conversions:
  Conv2d   (O, I, kh, kw)  -> (kh, kw, I, O)
  Conv1d   (O, I, k)       -> (k, I, O)
  ConvT2d  (I, O, kh, kw)  -> spatially flipped (kh, kw, I, O)
  ConvT1d  (I, O, k)       -> spatially flipped (k, I, O)
  Linear   (O, I)          -> (I, O)
  BatchNorm weight/bias -> params.scale/.bias;
            running_mean/var -> batch_stats.mean/.var
(The transposed-conv flip matches our Deconv module's correlation
formulation; see models/blocks.py:Deconv.)

Only numpy + a torch-free pickle reader are required at runtime: we read
torch .pth/.pth.tar archives with torch when available, else fall back to
a zipfile/pickle loader.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into {name: numpy array}.  Accepts either a
    raw state dict or the reference's training checkpoint format
    {'state_dict': ...} / {'model': ...}."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


# -- leaf converters ---------------------------------------------------------


def conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv1d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def deconv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def deconv1d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])


def linear(w):
    return np.ascontiguousarray(w.T)


class _TreeBuilder:
    """Accumulates (path, leaf) assignments into nested dicts for the
    'params' and 'batch_stats' collections."""

    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}

    def _set(self, tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(leaf, dtype=np.float32)

    def conv(self, sd, tname, path, kind="conv2d", bias=True):
        fn = {"conv2d": conv2d, "conv1d": conv1d, "deconv2d": deconv2d,
              "deconv1d": deconv1d, "linear": linear}[kind]
        self._set(self.params, path + ("kernel",), fn(sd[tname + ".weight"]))
        if bias and tname + ".bias" in sd:
            self._set(self.params, path + ("bias",), sd[tname + ".bias"])

    def bn(self, sd, tname, path):
        self._set(self.params, path + ("scale",), sd[tname + ".weight"])
        self._set(self.params, path + ("bias",), sd[tname + ".bias"])
        self._set(self.batch_stats, path + ("mean",), sd[tname + ".running_mean"])
        self._set(self.batch_stats, path + ("var",), sd[tname + ".running_var"])

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def _res_block(b, sd, tname, path, rank):
    conv = "conv1d" if rank == 1 else "conv2d"
    b.conv(sd, f"{tname}.res_branch.0", path + ("conv1",), conv)
    b.bn(sd, f"{tname}.res_branch.1", path + ("bn1",))
    b.conv(sd, f"{tname}.res_branch.3", path + ("conv2",), conv)
    b.bn(sd, f"{tname}.res_branch.4", path + ("bn2",))
    if f"{tname}.skip_con.0.weight" in sd:
        b.conv(sd, f"{tname}.skip_con.0", path + ("skip_conv",), conv)
        b.bn(sd, f"{tname}.skip_con.1", path + ("skip_bn",))


def _front(b, sd, tname, path, rank):
    conv = "conv1d" if rank == 1 else "conv2d"
    b.conv(sd, f"{tname}.0.block.0", path + ("front_basic", "conv"), conv)
    b.bn(sd, f"{tname}.0.block.1", path + ("front_basic", "bn"))
    _res_block(b, sd, f"{tname}.1", path + ("front_res",), rank)


def _encdec(b, sd, tname, path, rank):
    deconv = "deconv1d" if rank == 1 else "deconv2d"
    for name in ("skip_res1", "encoder_res1", "skip_res2", "encoder_res2",
                 "mid_res", "decoder_res2", "decoder_res1"):
        _res_block(b, sd, f"{tname}.{name}", path + (name,), rank)
    for name in ("decoder_upsample2", "decoder_upsample1"):
        b.conv(sd, f"{tname}.{name}.block.0", path + (name, "deconv"), deconv)
        b.bn(sd, f"{tname}.{name}.block.1", path + (name, "bn"))


def convert_model(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference FasterVoxelPoseNet state dict -> flax variables for
    models.faster_voxelpose.FasterVoxelPoseNet."""
    b = _TreeBuilder()

    # HDN / CenterNet
    cn = ("hdn", "center_net")
    _front(b, sd, "pose_net.center_net.front_layers", cn + ("front",), 2)
    _encdec(b, sd, "pose_net.center_net.encoder_decoder", cn + ("encdec",), 2)
    b.conv(sd, "pose_net.center_net.output_hm.0", cn + ("hm_conv",))
    b.conv(sd, "pose_net.center_net.output_hm.2", cn + ("hm_out",))
    b.conv(sd, "pose_net.center_net.output_size.0", cn + ("size_conv",))
    b.conv(sd, "pose_net.center_net.output_size.2", cn + ("size_out",))

    # HDN / C2CNet
    cc = ("hdn", "c2c_net")
    _front(b, sd, "pose_net.c2c_net.front_layers", cc + ("front",), 1)
    _encdec(b, sd, "pose_net.c2c_net.encoder_decoder", cc + ("encdec",), 1)
    b.conv(sd, "pose_net.c2c_net.output_hm", cc + ("output",), "conv1d")

    # JLN / P2PNet
    pp = ("jln", "p2p_net")
    _front(b, sd, "joint_net.conv_net.front_layers", pp + ("front",), 2)
    _encdec(b, sd, "joint_net.conv_net.encoder_decoder", pp + ("encdec",), 2)
    b.conv(sd, "joint_net.conv_net.output_layer", pp + ("output",))

    # JLN / WeightNet
    wn = ("jln", "weight_net")
    b.conv(sd, "joint_net.weight_net.heatmap_feature_net.0", wn + ("feat_conv",))
    b.bn(sd, "joint_net.weight_net.heatmap_feature_net.1", wn + ("feat_bn",))
    b.conv(sd, "joint_net.weight_net.output.0", wn + ("fc1",), "linear")
    b.conv(sd, "joint_net.weight_net.output.2", wn + ("fc2",), "linear")

    return b.variables()


def convert_backbone(
    sd: Dict[str, np.ndarray], num_layers: int = 50
) -> Dict[str, Any]:
    """Reference pose-resnet state dict -> flax variables for
    models.resnet.PoseResNet."""
    from ..models.resnet import RESNET_SPEC

    _, layout = RESNET_SPEC[num_layers]
    bottleneck = num_layers >= 50
    b = _TreeBuilder()

    b.conv(sd, "conv1", ("conv1",), bias=False)
    b.bn(sd, "bn1", ("bn1",))

    for stage, blocks in enumerate(layout):
        for i in range(blocks):
            t = f"layer{stage + 1}.{i}"
            p = (f"layer{stage + 1}_{i}",)
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                b.conv(sd, f"{t}.conv{c}", p + (f"conv{c}",), bias=False)
                b.bn(sd, f"{t}.bn{c}", p + (f"bn{c}",))
            if f"{t}.downsample.0.weight" in sd:
                b.conv(sd, f"{t}.downsample.0", p + ("down_conv",), bias=False)
                b.bn(sd, f"{t}.downsample.1", p + ("down_bn",))

    # deconv_layers Sequential: indices 0,3,6 = ConvTranspose; 1,4,7 = BN
    for i in range(3):
        b.conv(sd, f"deconv_layers.{i * 3}", (f"deconv{i + 1}",), "deconv2d")
        b.bn(sd, f"deconv_layers.{i * 3 + 1}", (f"deconv_bn{i + 1}",))

    b.conv(sd, "final_layer", ("final",))
    return b.variables()
