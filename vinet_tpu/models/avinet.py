"""AViNet: audio-visual saliency via bilinear or transformer fusion.

Capability parity with the reference's VideoAudioSaliencyModel
(/root/reference/model.py:191-249, bilinear join + optional self-attention
refinement) and VideoAudioSaliencyFusionModel (/root/reference/model.py:116-189,
joint 339-token transformer over video+audio tokens).

Unlike the reference, constructors do no file IO (the torch model loads
soundnet8_final.pth inside __init__, model.py:224) — weight loading lives in
vinet_tpu.io. Fusion geometry is fixed by the S3D pyramid: y0 is
(B, 4, 7, 12, 1024) for 32-frame clips.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from vinet_tpu.models.layers import Conv1d, Conv3d
from vinet_tpu.models.s3d import S3DBackbone
from vinet_tpu.models.soundnet import SoundNet
from vinet_tpu.models.transformer import TransformerEncoder
from vinet_tpu.models.vinet import ViNet
from vinet_tpu.ops.conv import maxpool3d

def _y0_geometry(clip_size: int, input_hw: tuple) -> tuple:
    """y0 (T, H, W) from the S3D downsampling plan: T/8, H/32, W/32.
    Defaults (32, (224, 384)) -> (4, 7, 12), the reference's hard-coded
    fusion geometry (model.py:154,183)."""
    return (clip_size // 8, input_hw[0] // 32, input_hw[1] // 32)


def _pooled_len(t_, h_, w_) -> int:
    """Flattened length after MaxPool3d((4,1,1), stride=(2,1,2)): 42 for the
    default geometry (model.py:229)."""
    return ((t_ - 4) // 2 + 1) * h_ * ((w_ - 1) // 2 + 1)


@dataclasses.dataclass(frozen=True)
class Bilinear:
    """torch nn.Bilinear: out[b,c,o] = sum_ij W[o,i,j] x1[b,c,i] x2[b,c,j] + b[o].
    Weight stored (O, I, J) like torch for weight-for-weight conversion; the
    contraction is a single MXU-friendly einsum."""

    in1: int
    in2: int
    out: int

    def init(self, key):
        bound = 1.0 / math.sqrt(self.in1)
        kw, kb = jax.random.split(key)
        params = {
            "w": jax.random.uniform(kw, (self.out, self.in1, self.in2), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (self.out,), jnp.float32, -bound, bound),
        }
        return params, {}

    def apply(self, params, state, x1, x2):
        y = jnp.einsum("bci,oij,bcj->bco", x1, params["w"].astype(x1.dtype), x2,
                       preferred_element_type=jnp.float32)
        return (y + params["b"]).astype(x1.dtype), state


def _tokens_from_ndhwc(y: jax.Array) -> jax.Array:
    """(B, T, H, W, C) -> (B, C, T*H*W) in torch's flatten order."""
    b = y.shape[0]
    return jnp.transpose(y, (0, 4, 1, 2, 3)).reshape(b, y.shape[-1], -1)


def _ndhwc_from_tokens(t: jax.Array, tdhw) -> jax.Array:
    """(B, C, T*H*W) -> (B, T, H, W, C)."""
    b, c, _ = t.shape
    return jnp.transpose(t.reshape(b, c, *tdhw), (0, 2, 3, 4, 1))


@dataclasses.dataclass(frozen=True)
class AViNet:
    """Bilinear-fusion AViNet (reference default): y0 maxpooled to
    (B,1,7,6,1024) -> 42 visual features x 3 audio features -> nn.Bilinear ->
    336 = 4*7*12 fused features per channel, decoded with y1..y3 skips."""

    use_transformer: bool = False
    transformer_in_channel: int = 32
    num_encoder_layers: int = 3
    nhead: int = 4
    num_hier: int = 3
    clip_size: int = 32
    input_hw: tuple = (224, 384)

    @property
    def y0_tdhw(self):
        return _y0_geometry(self.clip_size, self.input_hw)

    @property
    def tokens(self):
        t_, h_, w_ = self.y0_tdhw
        return t_ * h_ * w_

    @property
    def visual(self) -> ViNet:
        return ViNet(self.num_hier, self.clip_size)

    @property
    def audionet(self) -> SoundNet:
        return SoundNet()

    @property
    def bilinear(self) -> Bilinear:
        return Bilinear(_pooled_len(*self.y0_tdhw), 3, self.tokens)

    def _refiner(self):
        c = self.transformer_in_channel
        return (
            Conv3d(1024, c, 1, 1, 0, use_bias=True),
            TransformerEncoder(self.tokens, self.nhead, self.num_encoder_layers,
                               hidden_size=self.tokens, max_len=c),
            Conv3d(c, 1024, 1, 1, 0, use_bias=True),
        )

    def init(self, key):
        kv, ka, kb, k1, k2, k3 = jax.random.split(key, 6)
        vp, vs = self.visual.init(kv)
        ap, as_ = self.audionet.init(ka)
        bp, _ = self.bilinear.init(kb)
        params = {"visual_model": vp, "audionet": ap, "bilinear": bp}
        state = {"visual_model": vs, "audionet": as_}
        if self.use_transformer:
            cin, tr, cout = self._refiner()
            params["conv_in_1x1"] = cin.init(k1)[0]
            params["transformer"] = tr.init(k2)[0]
            params["conv_out_1x1"] = cout.init(k3)[0]
        return params, state

    def apply(self, params, state, x, audio, *, train=False, rng=None):
        """x: (B,T,H,W,3) clip; audio: (B,L,1) waveform -> ((B,H,W), new_state)."""
        a, a_state = self.audionet.apply(params["audionet"], state.get("audionet", {}), audio, train=train)
        pyramid, bb_state = self.visual.backbone.apply(
            params["visual_model"]["backbone"], state.get("visual_model", {}).get("backbone", {}), x, train=train
        )
        y0, y1, y2, y3 = pyramid

        # MaxPool3d((4,1,1), stride=(2,1,2)) (reference model.py:229,235)
        y0p = maxpool3d(y0, kernel=(4, 1, 1), stride=(2, 1, 2), padding=0)
        v = _tokens_from_ndhwc(y0p)  # (B, 1024, 42)
        at = jnp.swapaxes(a, 1, 2)  # (B, 1024, 3)
        fused, _ = self.bilinear.apply(params["bilinear"], {}, v, at)  # (B, 1024, 336)
        fused = _ndhwc_from_tokens(fused, self.y0_tdhw)  # (B, 4, 7, 12, 1024)

        if self.use_transformer:
            cin, tr, cout = self._refiner()
            z, _ = cin.apply(params["conv_in_1x1"], {}, fused)  # (B,4,7,12,C)
            tokens = _tokens_from_ndhwc(z)  # (B, C, 336): channels are tokens
            tokens, _ = tr.apply(params["transformer"], {}, tokens, train=train, rng=rng)
            z = _ndhwc_from_tokens(tokens, self.y0_tdhw)
            fused, _ = cout.apply(params["conv_out_1x1"], {}, z)

        out, _ = self.visual.decoder.apply(
            params["visual_model"]["decoder"], {}, [fused, y1, y2, y3], train=train
        )
        new_state = {"visual_model": {"backbone": bb_state}, "audionet": a_state}
        return out, new_state


@dataclasses.dataclass(frozen=True)
class AViNetFusion:
    """Transformer-fusion AViNet: 336 video tokens + 3 audio tokens (512-d)
    through a joint encoder; audio mean-pooled, broadcast-tiled over (4,7,12)
    and channel-concatenated back to 1024 for the decoder
    (reference model.py:116-189)."""

    transformer_in_channel: int = 512
    num_encoder_layers: int = 3
    nhead: int = 4
    num_hier: int = 3
    clip_size: int = 32
    input_hw: tuple = (224, 384)

    @property
    def y0_tdhw(self):
        return _y0_geometry(self.clip_size, self.input_hw)

    @property
    def tokens(self):
        t_, h_, w_ = self.y0_tdhw
        return t_ * h_ * w_

    @property
    def visual(self) -> ViNet:
        return ViNet(self.num_hier, self.clip_size)

    @property
    def audionet(self) -> SoundNet:
        return SoundNet()

    def _mods(self):
        c = self.transformer_in_channel
        return (
            Conv3d(1024, c, 1, 1, 0, use_bias=True),  # conv_in_1x1
            Conv1d(1024, c, 1, 1, 0, use_bias=True),  # audio_conv_1x1
            TransformerEncoder(c, self.nhead, self.num_encoder_layers,
                               hidden_size=c, max_len=self.tokens + 3),
        )

    def init(self, key):
        kv, ka, k1, k2, k3 = jax.random.split(key, 5)
        vp, vs = self.visual.init(kv)
        ap, as_ = self.audionet.init(ka)
        cin, acin, tr = self._mods()
        params = {
            "visual_model": vp,
            "audionet": ap,
            "conv_in_1x1": cin.init(k1)[0],
            "audio_conv_1x1": acin.init(k2)[0],
            "transformer": tr.init(k3)[0],
        }
        state = {"visual_model": vs, "audionet": as_}
        return params, state

    def apply(self, params, state, x, audio, *, train=False, rng=None):
        cin, acin, tr = self._mods()
        a, a_state = self.audionet.apply(params["audionet"], state.get("audionet", {}), audio, train=train)
        a, _ = acin.apply(params["audio_conv_1x1"], {}, a)  # (B, 3, C)

        pyramid, bb_state = self.visual.backbone.apply(
            params["visual_model"]["backbone"], state.get("visual_model", {}).get("backbone", {}), x, train=train
        )
        y0, y1, y2, y3 = pyramid
        z, _ = cin.apply(params["conv_in_1x1"], {}, y0)  # (B,4,7,12,C)
        vid_tokens = jnp.swapaxes(_tokens_from_ndhwc(z), 1, 2)  # (B, 336, C)
        tokens = jnp.concatenate([vid_tokens, a], axis=1)  # (B, 339, C)

        tokens, _ = tr.apply(params["transformer"], {}, tokens, train=train, rng=rng)

        vid = jnp.swapaxes(tokens[:, : self.tokens, :], 1, 2)  # (B, C, 336)
        aud = jnp.mean(tokens[:, self.tokens :, :], axis=1)  # (B, C)
        vid = _ndhwc_from_tokens(vid, self.y0_tdhw)  # (B,4,7,12,C)
        aud = jnp.broadcast_to(aud[:, None, None, None, :], vid.shape)
        fused = jnp.concatenate([vid, aud], axis=-1)  # (B,4,7,12,2C)

        out, _ = self.visual.decoder.apply(
            params["visual_model"]["decoder"], {}, [fused, y1, y2, y3], train=train
        )
        new_state = {"visual_model": {"backbone": bb_state}, "audionet": a_state}
        return out, new_state
