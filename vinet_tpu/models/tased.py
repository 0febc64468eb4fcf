"""TASED_v2: the legacy TASED-Net-style encoder-decoder the reference carries
in model_utils.py:5-126 (unused by its entry points but part of the component
inventory, SURVEY.md §2.1 M13).

Same S3D encoder stages as ViNet; the decoder upsamples with ConvTranspose3d
(1,4,4)/(1,2,2) + BN + ReLU stacks and collapses time with strided (2,1,1)
convs, ending in a sigmoid map. The reference's maxp4 requests pooling
indices and ignores them (model_utils.py:32,103) — plain pooling here.
"""

from __future__ import annotations

import dataclasses

import jax

from vinet_tpu.models.layers import BatchNorm, Composite, Conv3d, MaxPool3d, ReLU, Sigmoid
from vinet_tpu.models.s3d import S3DBackbone
from vinet_tpu.ops.conv import conv_transpose3d


@dataclasses.dataclass(frozen=True)
class ConvTranspose3d:
    in_ch: int
    out_ch: int
    kernel: tuple | int
    stride: tuple | int = 1
    padding: tuple | int = 0
    use_bias: bool = False

    def init(self, key):
        import math

        import jax.numpy as jnp

        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel,) * 3
        # torch ConvTranspose default init uses fan_in = out_ch * prod(k)
        fan_in = self.out_ch * k[0] * k[1] * k[2]
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(key)
        params = {"w": jax.random.uniform(kw, (*k, self.in_ch, self.out_ch), jnp.float32, -bound, bound)}
        if self.use_bias:
            params["b"] = jax.random.uniform(kb, (self.out_ch,), jnp.float32, -bound, bound)
        return params, {}

    def apply(self, params, state, x, *, train=False):
        return conv_transpose3d(x, params["w"], stride=self.stride, padding=self.padding,
                                bias=params.get("b")), state


def _ct_block(in_ch, out_ch, kernel=(1, 4, 4), stride=(1, 2, 2), padding=(0, 1, 1)):
    return (
        ConvTranspose3d(in_ch, out_ch, kernel, stride, padding),
        BatchNorm(out_ch),
        ReLU(),
    )


def _conv_bn_relu(in_ch, out_ch, kernel, stride=1, padding=0):
    return (
        Conv3d(in_ch, out_ch, kernel, stride, padding),
        BatchNorm(out_ch),
        ReLU(),
    )


@dataclasses.dataclass(frozen=True)
class TASEDv2:
    """forward: (B, T, H, W, 3) -> (B, H, W) saliency in [0,1]."""

    @property
    def backbone(self) -> S3DBackbone:
        return S3DBackbone()

    def _decoder(self):
        # reference model_utils.py:38-80
        def seq(*children):
            return Composite(children=tuple((str(i), c) for i, c in enumerate(children)))

        convtsp1 = seq(
            Conv3d(1024, 1024, 1, 1, 0), BatchNorm(1024), ReLU(),
            *_ct_block(1024, 832),
        )
        convtsp2 = seq(*_ct_block(832, 480))
        convtsp3 = seq(*_ct_block(480, 192))
        convtsp4 = seq(
            *_ct_block(192, 64),
            *_conv_bn_relu(64, 64, (2, 1, 1), (2, 1, 1)),
            ConvTranspose3d(64, 4, 1, 1, 0), BatchNorm(4), ReLU(),
            *_conv_bn_relu(4, 4, (2, 1, 1), (2, 1, 1)),
            ConvTranspose3d(4, 4, (1, 4, 4), (1, 2, 2), (0, 1, 1)),
            Conv3d(4, 1, 1, 1, 0, use_bias=True), Sigmoid(),
        )
        return {"convtsp1": convtsp1, "convtsp2": convtsp2,
                "convtsp3": convtsp3, "convtsp4": convtsp4}

    def init(self, key):
        kb, *ks = jax.random.split(key, 5)
        bb_p, bb_s = self.backbone.init(kb)
        params, state = dict(bb_p), dict(bb_s)
        for (name, mod), k in zip(self._decoder().items(), ks):
            p, s = mod.init(k)
            params[name] = p
            if s:
                state[name] = s
        return params, state

    def apply(self, params, state, x, *, train=False):
        bb_params = {k: params[k] for k in ("base1", "base2", "base3", "base4")}
        bb_state = {k: state[k] for k in ("base1", "base2", "base3", "base4") if k in state}
        (y0, _, _, _), new_bb_state = S3DBackbone().apply(bb_params, bb_state, x, train=train)
        z = y0
        new_state = dict(new_bb_state)
        for name, mod in self._decoder().items():
            z, ns = mod.apply(params[name], state.get(name, {}), z, train=train)
            if ns:
                new_state[name] = ns
        return z[:, 0, :, :, 0], new_state
