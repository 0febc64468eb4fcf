"""Minimal functional module system: params/state as pytrees, pure apply fns.

Every module is an immutable spec object with
    init(key)  -> (params, state)           # nested dicts of jnp arrays
    apply(params, state, x, train=False) -> (y, new_state)
Stateless modules use empty dicts. Composite modules key children by the same
string indices torch's nn.Sequential would use, so converting the reference's
checkpoints (e.g. 'base1.0.conv_s.weight') is a mechanical name map
(see vinet_tpu/io/convert.py).

Param key conventions: conv weight 'w' is DHWIO (kT,kH,kW,I,O) / WIO for 1-D,
optional bias 'b'; batchnorm params {'scale','bias'}, state {'mean','var'}.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from vinet_tpu.ops.conv import conv1d as _conv1d
from vinet_tpu.ops.conv import conv3d as _conv3d
from vinet_tpu.ops.conv import maxpool1d as _maxpool1d
from vinet_tpu.ops.conv import maxpool3d as _maxpool3d
from vinet_tpu.ops.norm import batchnorm_apply, batchnorm_train, init_batchnorm


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


def _torch_conv_init(key, shape, fan_in, use_bias):
    """Torch's default conv init: kaiming_uniform(a=sqrt(5)) on the weight and
    uniform(+-1/sqrt(fan_in)) on the bias — both reduce to U(-1/sqrt(fan_in),
    1/sqrt(fan_in)). Matching the reference's init keeps from-scratch training
    comparable."""
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    params = {"w": jax.random.uniform(kw, shape, jnp.float32, -bound, bound)}
    if use_bias:
        params["b"] = jax.random.uniform(kb, (shape[-1],), jnp.float32, -bound, bound)
    return params


@dataclasses.dataclass(frozen=True)
class Conv3d:
    in_ch: int
    out_ch: int
    kernel: tuple | int
    stride: tuple | int = 1
    padding: tuple | int = 0
    use_bias: bool = False

    def init(self, key):
        k = _triple(self.kernel)
        fan_in = self.in_ch * k[0] * k[1] * k[2]
        return _torch_conv_init(key, (*k, self.in_ch, self.out_ch), fan_in, self.use_bias), {}

    def apply(self, params, state, x, *, train=False):
        if "w_q" in params:
            # int8 path (vinet_tpu/ops/quant.py): calibrated activation scale,
            # int8 weights, int32 accumulation
            from vinet_tpu.ops.quant import int8_conv3d

            return int8_conv3d(x, params, stride=self.stride, padding=self.padding), state
        from vinet_tpu.ops import quant

        if quant.calibrating():
            quant.record(params["w"], x)
        y = _conv3d(x, params["w"], stride=self.stride, padding=self.padding,
                    bias=params.get("b"))
        return y, state


@dataclasses.dataclass(frozen=True)
class Conv1d:
    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    def init(self, key):
        fan_in = self.in_ch * self.kernel
        return _torch_conv_init(key, (self.kernel, self.in_ch, self.out_ch), fan_in, self.use_bias), {}

    def apply(self, params, state, x, *, train=False):
        y = _conv1d(x, params["w"], stride=self.stride, padding=self.padding,
                    bias=params.get("b"))
        return y, state


@dataclasses.dataclass(frozen=True)
class BatchNorm:
    """Reference visual-net default: eps=1e-3, momentum=0.001
    (/root/reference/model_utils.py:132); SoundNet uses eps=1e-5, momentum=0.1
    (/root/reference/model.py:752)."""

    channels: int
    eps: float = 1e-3
    momentum: float = 0.001

    def init(self, key):
        return init_batchnorm(self.channels)

    def apply(self, params, state, x, *, train=False):
        if not params:
            # BN was folded into the preceding conv (inference.fold_batchnorms)
            return x, state
        if train:
            return batchnorm_train(params, state, x, eps=self.eps, momentum=self.momentum)
        return batchnorm_apply(params, state, x, eps=self.eps), state


@dataclasses.dataclass(frozen=True)
class MaxPool3d:
    kernel: tuple | int
    stride: tuple | int
    padding: tuple | int = 0

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, *, train=False):
        return _maxpool3d(x, kernel=self.kernel, stride=self.stride, padding=self.padding), state


@dataclasses.dataclass(frozen=True)
class MaxPool1d:
    kernel: int
    stride: int

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, *, train=False):
        return _maxpool1d(x, kernel=self.kernel, stride=self.stride), state


@dataclasses.dataclass(frozen=True)
class ReLU:
    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, *, train=False):
        return jax.nn.relu(x), state


@dataclasses.dataclass(frozen=True)
class Sigmoid:
    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, *, train=False):
        return jax.nn.sigmoid(x), state


def _has_entries(d: dict) -> bool:
    return bool(d)


@dataclasses.dataclass(frozen=True)
class Sequential:
    """Composition keyed by torch-style string indices ('0', '1', ...).
    Children with empty params/state (pools, activations) are omitted from the
    trees, exactly like torch's state_dict omits them."""

    layers: tuple

    def __init__(self, *layers):
        object.__setattr__(self, "layers", tuple(layers))

    def init(self, key):
        params, state = {}, {}
        keys = jax.random.split(key, max(len(self.layers), 1))
        for i, layer in enumerate(self.layers):
            p, s = layer.init(keys[i])
            if _has_entries(p):
                params[str(i)] = p
            if _has_entries(s):
                state[str(i)] = s
        return params, state

    def apply(self, params, state, x, *, train=False):
        new_state = {}
        for i, layer in enumerate(self.layers):
            p = params.get(str(i), {})
            s = state.get(str(i), {})
            x, ns = layer.apply(p, s, x, train=train)
            if _has_entries(ns):
                new_state[str(i)] = ns
        return x, new_state


def basic_conv3d(in_ch: int, out_ch: int, kernel, stride=1, padding=0) -> "Composite":
    """Conv3d(bias=False) -> BN(eps=1e-3, m=0.001) -> ReLU
    (reference BasicConv3d, /root/reference/model_utils.py:128-139).
    Child keys 'conv'/'bn' mirror the torch attribute names."""
    return Composite(
        children=(
            ("conv", Conv3d(in_ch, out_ch, kernel, stride, padding)),
            ("bn", BatchNorm(out_ch)),
            ("relu", ReLU()),
        )
    )


def sep_conv3d(in_ch: int, out_ch: int, kernel: int, stride: int = 1, padding: int = 0) -> "Composite":
    """Factorized 3-D conv: spatial (1,k,k) then temporal (k,1,1), each with
    BN+ReLU (reference SepConv3d, /root/reference/model_utils.py:141-160).
    This factorization is the S3D signature and is MXU-friendly: both convs
    are dense contractions over the channel axis."""
    return Composite(
        children=(
            ("conv_s", Conv3d(in_ch, out_ch, (1, kernel, kernel), (1, stride, stride), (0, padding, padding))),
            ("bn_s", BatchNorm(out_ch)),
            ("relu_s", ReLU()),
            ("conv_t", Conv3d(out_ch, out_ch, (kernel, 1, 1), (stride, 1, 1), (padding, 0, 0))),
            ("bn_t", BatchNorm(out_ch)),
            ("relu_t", ReLU()),
        )
    )


@dataclasses.dataclass(frozen=True)
class Composite:
    """Sequential with named children (mirrors a torch Module's attributes)."""

    children: tuple  # of (name, module)

    def init(self, key):
        params, state = {}, {}
        keys = jax.random.split(key, max(len(self.children), 1))
        for (name, layer), k in zip(self.children, keys):
            p, s = layer.init(k)
            if _has_entries(p):
                params[name] = p
            if _has_entries(s):
                state[name] = s
        return params, state

    def apply(self, params, state, x, *, train=False):
        new_state = {}
        for name, layer in self.children:
            x, ns = layer.apply(params.get(name, {}), state.get(name, {}), x, train=train)
            if _has_entries(ns):
                new_state[name] = ns
        return x, new_state
