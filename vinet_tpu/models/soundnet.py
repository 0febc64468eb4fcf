"""SoundNet audio encoder as an NWC 1-D conv stack.

Capability parity with the reference's SoundNet (/root/reference/model.py:746-825),
which phrases 1-D convs as Conv2d with (k,1) kernels over a (B,1,L,1) waveform.
Here the waveform is (B, L, 1) NWC and every conv is a plain 1-D conv — the
natural TPU shape (channel axis last, dense contractions on the MXU).

For the reference's fixed 70560-sample excerpt the output is (B, 3, 1024)
(torch: B x 1024 x 3 x 1). The unused classifier heads conv8_objs/conv8_scns
(/root/reference/model.py:788-791) are kept as parameters so converted
checkpoints round-trip, but are not applied.
"""

from __future__ import annotations

import dataclasses

import jax

from vinet_tpu.models.layers import BatchNorm, Composite, Conv1d, MaxPool1d, ReLU

# (name, out_ch, kernel, stride, padding, maxpool_after)
_SOUNDNET_PLAN = (
    ("conv1", 16, 64, 2, 32, 8),
    ("conv2", 32, 32, 2, 16, 8),
    ("conv3", 64, 16, 2, 8, None),
    ("conv4", 128, 8, 2, 4, None),
    ("conv5", 256, 4, 2, 2, 4),
    ("conv6", 512, 4, 2, 2, None),
    ("conv7", 1024, 4, 2, 2, None),
)


@dataclasses.dataclass(frozen=True)
class SoundNet:
    def _blocks(self):
        blocks = []
        in_ch = 1
        for name, out_ch, k, s, p, pool in _SOUNDNET_PLAN:
            children = [
                (name, Conv1d(in_ch, out_ch, k, s, p, use_bias=True)),
                # SoundNet BN uses torch defaults eps=1e-5, momentum=0.1
                # (/root/reference/model.py:752)
                (name.replace("conv", "batchnorm"), BatchNorm(out_ch, eps=1e-5, momentum=0.1)),
                (name.replace("conv", "relu"), ReLU()),
            ]
            if pool is not None:
                children.append((name.replace("conv", "maxpool"), MaxPool1d(pool, pool)))
            blocks.append(Composite(children=tuple(children)))
            in_ch = out_ch
        return blocks

    def init(self, key):
        params, state = {}, {}
        blocks = self._blocks()
        keys = jax.random.split(key, len(blocks) + 2)
        for block, k in zip(blocks, keys):
            p, s = block.init(k)
            params.update(p)
            state.update(s)
        # dormant classifier heads, for checkpoint round-trip only
        for head, out_ch, k in (("conv8_objs", 1000, keys[-2]), ("conv8_scns", 401, keys[-1])):
            p, _ = Conv1d(1024, out_ch, 8, 2, 0, use_bias=True).init(k)
            params[head] = p
        return params, state

    def apply(self, params, state, x, *, train=False):
        """x: (B, L, 1) waveform -> (B, L', 1024) features (L'=3 for L=70560)."""
        new_state = {}
        for block in self._blocks():
            x, ns = block.apply(params, state, x, train=train)
            new_state.update(ns)
        return x, new_state
