"""ViNet: S3D encoder + hierarchical trilinear-upsampling decoder.

Capability parity with the reference's VideoSaliencyModel
(/root/reference/model.py:72-112): num_hier in {0,1,2,3} and clip_size in
{8,16,32,48} select the decoder plan. Input is an NDHWC clip
(B, T, 224, 384, 3); output a per-clip saliency map (B, 224, 384) in [0, 1].

The reference's `use_upsample=False` path selects an undefined class
(DecoderConvT, model.py:101 — a NameError bug) and is deliberately not
reproduced.
"""

from __future__ import annotations

import dataclasses

import jax

from vinet_tpu.models.decoder import Decoder, decoder_plan
from vinet_tpu.models.s3d import S3DBackbone


@dataclasses.dataclass(frozen=True)
class ViNet:
    num_hier: int = 3
    clip_size: int = 32

    @property
    def backbone(self) -> S3DBackbone:
        return S3DBackbone()

    @property
    def decoder(self) -> Decoder:
        return Decoder(decoder_plan(self.num_hier, self.clip_size))

    def init(self, key):
        kb, kd = jax.random.split(key)
        bb_params, bb_state = self.backbone.init(kb)
        dec_params, dec_state = self.decoder.init(kd)
        params = {"backbone": bb_params, "decoder": dec_params}
        state = {"backbone": bb_state}
        return params, state

    def apply(self, params, state, x, *, train=False):
        """x: (B, T, H, W, 3) normalized clip -> ((B, H, W) map, new_state)."""
        pyramid, bb_state = self.backbone.apply(
            params["backbone"], state.get("backbone", {}), x, train=train
        )
        out, _ = self.decoder.apply(params["decoder"], {}, pyramid, train=train)
        return out, {"backbone": bb_state}
