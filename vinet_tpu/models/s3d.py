"""S3D (separable-3D Inception) encoder producing a 4-level temporal pyramid.

Capability parity with the reference's BackBoneS3D
(/root/reference/model.py:690-743) and its Mixed_3b..5c Inception blocks
(/root/reference/model_utils.py:162-420), re-expressed NDHWC/functional.

For a (B, 32, 224, 384, 3) clip the pyramid is
    y3: (B, 16, 56, 96, 192)
    y2: (B, 16, 28, 48, 480)
    y1: (B,  8, 14, 24, 832)
    y0: (B,  4,  7, 12, 1024)
(matches SURVEY.md §2.1 M1, transposed to channels-last).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vinet_tpu.models.layers import (
    Composite,
    MaxPool3d,
    Sequential,
    basic_conv3d,
    sep_conv3d,
)

# Inception channel plan: in_ch -> (b0; b1_red->b1; b2_red->b2; pool->b3).
# One table instead of nine near-identical block classes.
MIXED_PLAN = {
    "3b": (192, 64, 96, 128, 16, 32, 32),
    "3c": (256, 128, 128, 192, 32, 96, 64),
    "4b": (480, 192, 96, 208, 16, 48, 64),
    "4c": (512, 160, 112, 224, 24, 64, 64),
    "4d": (512, 128, 128, 256, 24, 64, 64),
    "4e": (512, 112, 144, 288, 32, 64, 64),
    "4f": (528, 256, 160, 320, 32, 128, 128),
    "5b": (832, 256, 160, 320, 32, 128, 128),
    "5c": (832, 384, 192, 384, 48, 128, 128),
}


@dataclasses.dataclass(frozen=True)
class InceptionBlock:
    """4-branch Inception block: 1x1 | 1x1->sep3 | 1x1->sep3 | maxpool->1x1,
    channel-concatenated. Branch children are Sequentials keyed '0','1' to
    mirror the torch layout for checkpoint conversion."""

    in_ch: int
    b0: int
    b1_red: int
    b1: int
    b2_red: int
    b2: int
    b3: int

    def _branches(self):
        return (
            ("branch0", Sequential(basic_conv3d(self.in_ch, self.b0, 1))),
            ("branch1", Sequential(
                basic_conv3d(self.in_ch, self.b1_red, 1),
                sep_conv3d(self.b1_red, self.b1, 3, 1, 1),
            )),
            ("branch2", Sequential(
                basic_conv3d(self.in_ch, self.b2_red, 1),
                sep_conv3d(self.b2_red, self.b2, 3, 1, 1),
            )),
            ("branch3", Sequential(
                MaxPool3d((3, 3, 3), 1, 1),
                basic_conv3d(self.in_ch, self.b3, 1),
            )),
        )

    @property
    def out_ch(self):
        return self.b0 + self.b1 + self.b2 + self.b3

    def init(self, key):
        params, state = {}, {}
        keys = jax.random.split(key, 4)
        for (name, mod), k in zip(self._branches(), keys):
            p, s = mod.init(k)
            params[name] = p
            state[name] = s
        return params, state

    def apply(self, params, state, x, *, train=False):
        outs = []
        new_state = {}
        for name, mod in self._branches():
            y, ns = mod.apply(params[name], state.get(name, {}), x, train=train)
            outs.append(y)
            if ns:
                new_state[name] = ns
        return jnp.concatenate(outs, axis=-1), new_state


def mixed(name: str) -> InceptionBlock:
    return InceptionBlock(*MIXED_PLAN[name])


@dataclasses.dataclass(frozen=True)
class S3DBackbone:
    """Four stages with interleaved pools; forward returns the pyramid
    [y0, y1, y2, y3] (deepest first, matching the reference's ordering)."""

    def _stages(self):
        base1 = Sequential(
            sep_conv3d(3, 64, 7, 2, 3),
            MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            basic_conv3d(64, 64, 1),
            sep_conv3d(64, 192, 3, 1, 1),
        )
        base2 = Sequential(mixed("3b"), mixed("3c"))
        base3 = Sequential(mixed("4b"), mixed("4c"), mixed("4d"), mixed("4e"), mixed("4f"))
        base4 = Sequential(mixed("5b"), mixed("5c"))
        return base1, base2, base3, base4

    def init(self, key):
        base1, base2, base3, base4 = self._stages()
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params, state = {}, {}
        for name, mod, k in (
            ("base1", base1, k1), ("base2", base2, k2),
            ("base3", base3, k3), ("base4", base4, k4),
        ):
            p, s = mod.init(k)
            params[name] = p
            state[name] = s
        return params, state

    def apply(self, params, state, x, *, train=False):
        """x: (B, T, H, W, 3) -> [y0, y1, y2, y3] pyramid."""
        base1, base2, base3, base4 = self._stages()
        new_state = {}

        y3, ns = base1.apply(params["base1"], state.get("base1", {}), x, train=train)
        new_state["base1"] = ns

        y = MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)).apply({}, {}, y3)[0]
        y2, ns = base2.apply(params["base2"], state.get("base2", {}), y, train=train)
        new_state["base2"] = ns

        y = MaxPool3d((3, 3, 3), (2, 2, 2), (1, 1, 1)).apply({}, {}, y2)[0]
        y1, ns = base3.apply(params["base3"], state.get("base3", {}), y, train=train)
        new_state["base3"] = ns

        y = MaxPool3d((2, 1, 1), (2, 1, 1), 0).apply({}, {}, y1)[0]
        y = MaxPool3d((1, 2, 2), (1, 2, 2), 0).apply({}, {}, y)[0]
        y0, ns = base4.apply(params["base4"], state.get("base4", {}), y, train=train)
        new_state["base4"] = ns

        return [y0, y1, y2, y3], new_state
