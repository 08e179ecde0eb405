"""ResNet backbones (NHWC, flax) for the semantic layer.

Re-design of the reference's mmcv-style ResNet-50 teacher/student
(/root/reference/semantic_layer.py:53-761): DC5-style stride-16 backbone
with strides (1,2,2,1) and dilations (1,1,1,2).

BatchNorm: the reference always runs BN in eval mode (`norm_eval=True`,
semantic_layer.py:752-761) — running statistics are never updated during
any training stage.  We therefore implement BN as a frozen-statistics
affine transform: scale/bias are trainable params, mean/var live in the
``batch_stats`` collection and are only ever written by checkpoint
import (e.g. from torchvision resnet50 weights via utils/torch_import).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import max_pool

Dtype = Any

# 26 = minimal bottleneck variant (1 block/stage) for tests/prototyping
RESNET_STAGE_BLOCKS = {26: (1, 1, 1, 1), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                       152: (3, 8, 36, 3)}


class FrozenBatchNorm(nn.Module):
    """BN with permanently frozen running stats (norm_eval semantics)."""

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        inv = scale / jnp.sqrt(var.value + self.eps)
        return (x.astype(jnp.float32) - mean.value) * inv + bias


def _conv(features, kernel, stride=1, dilation=1, name=None):
    pad = dilation * (kernel // 2)
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        param_dtype=jnp.float32,
        name=name,
    )


class Bottleneck(nn.Module):
    """torch-style bottleneck: stride on the 3x3 conv
    (semantic_layer.py:236-441)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.planes, 1, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, name="ds_conv")(x)
            identity = FrozenBatchNorm(self.planes * 4, name="ds_bn")(identity)
        return nn.relu(out + identity)


class ResStage(nn.Module):
    """One ResNet stage of `num_blocks` bottlenecks."""

    planes: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(
            self.planes, self.stride, self.dilation, downsample=True, name="block0"
        )(x)
        for i in range(1, self.num_blocks):
            x = Bottleneck(self.planes, 1, self.dilation, name=f"block{i}")(x)
        return x


class ResNetStem(nn.Module):
    """conv7x7 s2 + BN + ReLU + maxpool3 s2 (semantic_layer.py:686-700)."""

    stem_channels: int = 64

    @nn.compact
    def __call__(self, x):
        x = _conv(self.stem_channels, 7, 2, name="conv1")(x)
        x = FrozenBatchNorm(self.stem_channels, name="bn1")(x)
        x = nn.relu(x)
        return max_pool(x, 3, 2, 1)


class ResNetTeacher(nn.Module):
    """Frozen ResNet-50 DC5 teacher (semantic_layer.py:445-761).

    out_indices selects which stage outputs are returned; the standalone
    reference copy uses (0,1,2,3), the detection copy (0,3) — here it is
    an explicit attribute (SURVEY §7 "reference ambiguities").
    """

    depth: int = 50
    strides: Sequence[int] = (1, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # Accepted for factory uniformity (core/factory.py builds every model
    # with a dtype); the teacher always computes in f32 (frozen BN casts).
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResNetStem(name="stem")(x)
        outs = []
        blocks = RESNET_STAGE_BLOCKS[self.depth]
        for i, num_blocks in enumerate(blocks):
            x = ResStage(
                planes=64 * 2**i,
                num_blocks=num_blocks,
                stride=self.strides[i],
                dilation=self.dilations[i],
                name=f"layer{i + 1}",
            )(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
