"""STDCNet student backbone (NHWC, flax).

Capability parity with the reference ``models/backbones/stdc.py`` ("Rethinking
BiSeNet" STDC1/STDC2): two stride-2 ConvX stems, then Cat- or Add-bottleneck
stages. Stage outputs: res2 (stride 4, base ch), res3 (stride 8, 4*base),
res4 (stride 16, 8*base), res5 (stride 32, 16*base) — the wrapper channel
table {res2:64, res3:256, res4:512, res5:1024} at base=64
(reference ``models/wrappers/stdc_wrapper.py:106-111``).

Variants (reference stdc_wrapper.py:8-11): stdc_1 -> layers [2,2,2],
stdc_2 -> layers [4,5,3]; block_num=4, cat bottlenecks.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import ConvBN, avg_pool_torch, batch_norm


class CatBottleneck(nn.Module):
    """Short-term dense concat block (reference stdc.py:105-172).

    ``block_num`` ConvX stages with halving widths, concatenated. At
    stride 2 the first branch is average-pooled and the second goes through a
    depthwise stride-2 'avd' layer.
    """

    out_planes: int
    block_num: int = 4
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        op = self.out_planes
        widths = self._branch_widths(op, self.block_num)

        out1 = ConvBN(widths[0], kernel=1, dtype=self.dtype, name="conv_0")(x, train)

        outs: List[jnp.ndarray] = []
        h = out1
        if self.stride == 2:
            # depthwise stride-2 "avd" on the first branch before conv_1
            h = nn.Conv(
                widths[0], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                feature_group_count=widths[0], use_bias=False,
                dtype=self.dtype, name="avd_conv",
            )(h)
            h = batch_norm(train, name="avd_bn")(h)
        for idx in range(1, self.block_num):
            h = ConvBN(widths[idx], kernel=3, dtype=self.dtype, name=f"conv_{idx}")(h, train)
            outs.append(h)

        if self.stride == 2:
            out1 = avg_pool_torch(out1, 3, 2, 1)
        return jnp.concatenate([out1] + outs, axis=-1)

    @staticmethod
    def _branch_widths(op: int, block_num: int) -> List[int]:
        widths = [op // 2]
        for idx in range(1, block_num):
            if idx == 1 and block_num == 2:
                widths.append(op // 2)
            elif idx == 1 and block_num > 2:
                widths.append(op // 4)
            elif idx < block_num - 1:
                widths.append(op // (2 ** (idx + 1)))
            else:
                widths.append(op // (2 ** idx))
        return widths


class AddBottleneck(nn.Module):
    """Residual-sum variant (reference stdc.py:27-102)."""

    out_planes: int
    block_num: int = 4
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        op = self.out_planes
        widths = CatBottleneck._branch_widths(op, self.block_num)

        outs: List[jnp.ndarray] = []
        h = x
        for idx in range(self.block_num):
            h = ConvBN(
                widths[idx], kernel=1 if idx == 0 else 3, dtype=self.dtype,
                name=f"conv_{idx}",
            )(h, train)
            if idx == 0 and self.stride == 2:
                h = nn.Conv(
                    widths[0], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    feature_group_count=widths[0], use_bias=False,
                    dtype=self.dtype, name="avd_conv",
                )(h)
                h = batch_norm(train, name="avd_bn")(h)
            outs.append(h)

        if self.stride == 2:
            skip = nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                feature_group_count=x.shape[-1], use_bias=False,
                dtype=self.dtype, name="skip_dw",
            )(x)
            skip = batch_norm(train, name="skip_dw_bn")(skip)
            skip = nn.Conv(op, (1, 1), use_bias=False, dtype=self.dtype, name="skip_pw")(skip)
            skip = batch_norm(train, name="skip_pw_bn")(skip)
            x = skip
        return jnp.concatenate(outs, axis=-1) + x


class STDCNet(nn.Module):
    """STDC backbone returning {res2..res5} NHWC maps (reference stdc.py:175-272)."""

    base: int = 64
    layers: Tuple[int, ...] = (4, 5, 3)
    block_num: int = 4
    block_type: str = "cat"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        block_cls = CatBottleneck if self.block_type == "cat" else AddBottleneck
        base = self.base

        # Stem: features[0] (stride 2) -> x2 stage; features[1] (stride 2) -> x4 stage.
        feat = ConvBN(base // 2, kernel=3, stride=2, dtype=self.dtype, name="features_0")(x, train)
        feat = ConvBN(base, kernel=3, stride=2, dtype=self.dtype, name="features_1")(feat, train)
        outs = {"res2": feat}

        # Stages i=0,1,2 with `layers[i]` blocks; first block of each stage strides.
        idx = 2
        stage_to_res = {0: "res3", 1: "res4", 2: "res5"}
        for i, n_blocks in enumerate(self.layers):
            for j in range(n_blocks):
                out_planes = base * (2 ** (i + 2))
                stride = 2 if j == 0 else 1
                feat = block_cls(
                    out_planes, self.block_num, stride, dtype=self.dtype,
                    name=f"features_{idx}",
                )(feat, train)
                idx += 1
            outs[stage_to_res[i]] = feat
        return outs


STDC_VARIANTS = {
    "stdc_1": {"layers": (2, 2, 2)},
    "stdc_2": {"layers": (4, 5, 3)},
}


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in STDC_VARIANTS:
        raise NotImplementedError(f"Unknown STDC variant: {model_name}")
    net = STDCNet(base=64, layers=STDC_VARIANTS[model_name]["layers"], dtype=dtype)
    # Hardcoded channel table, as in reference stdc_wrapper.py:106-111.
    channels = {"res2": 64, "res3": 256, "res4": 512, "res5": 1024}
    return net, channels
