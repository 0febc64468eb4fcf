"""Saliency decoder family: one module parameterized by a kernel plan.

The reference defines seven near-identical decoder classes — DecoderConvUp /
...Up8/16/48 / ...NoHier/1Hier/2Hier (/root/reference/model.py:251-688) —
differing only in temporal kernel/stride plans and which skip connections are
used. Here the plan is *data* (SURVEY.md §7 hard-part (c)): a single Decoder
walks a DecoderPlan.

Architecture signature (all variants): each stage is Conv3d + ReLU +
trilinear (1,2,2) upsample, and the skip connections concatenate along the
TIME axis (reference torch.cat((z, y1), 2), /root/reference/model.py:290-302)
— axis 1 in NDHWC. Temporal strided convs then collapse T back down so the
final map is (B, H, W).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import os

from vinet_tpu.models.layers import Conv3d
from vinet_tpu.ops.upsample import upsample2x_hw


def _use_pallas_head() -> bool:
    return os.environ.get("VINET_PALLAS_HEAD", "1") != "0"


def _use_phasefold() -> bool:
    return os.environ.get("VINET_PHASEFOLD", "1") != "0"


@dataclasses.dataclass(frozen=True)
class DecoderPlan:
    """Temporal kernel plan. (kt_i, st_i) are the time kernel/stride of stage i;
    spatial part is always k3/s1/p1 for stages 1-5. conv6 is the optional
    temporal-collapse conv (32ch, (kt,1,1)); conv7 is the 1x1x1 + sigmoid head."""

    skips: tuple  # subset of (1, 2, 3): which pyramid levels concat on time
    kt2: int
    st2: int
    kt3: int
    st3: int
    kt4: int
    st4: int
    kt5: int
    st5: int
    conv6: tuple | None  # (kt, st, use_bias) or None


# Plans keyed by (num_hier, clip_size). Reference classes cited per row.
DECODER_PLANS = {
    # DecoderConvUp (model.py:251-311)
    (3, 32): DecoderPlan((1, 2, 3), 3, 3, 5, 5, 5, 5, 2, 2, (2, 2, False)),
    # DecoderConvUp16 (model.py:313-373)
    (3, 16): DecoderPlan((1, 2, 3), 3, 3, 5, 5, 5, 5, 2, 2, None),
    # DecoderConvUp8 (model.py:375-435)
    (3, 8): DecoderPlan((1, 2, 3), 3, 3, 5, 5, 5, 5, 1, 1, None),
    # DecoderConvUp48 (model.py:437-498)
    (3, 48): DecoderPlan((1, 2, 3), 3, 3, 5, 5, 5, 5, 2, 2, (3, 3, True)),
    # DecoderConvUpNoHier (model.py:501-562)
    (0, 32): DecoderPlan((), 1, 1, 1, 1, 1, 1, 2, 2, (2, 2, False)),
    # DecoderConvUp1Hier (model.py:564-625)
    (1, 32): DecoderPlan((1,), 3, 3, 1, 1, 1, 1, 2, 2, (2, 2, False)),
    # DecoderConvUp2Hier (model.py:627-688)
    (2, 32): DecoderPlan((1, 2), 3, 3, 5, 5, 1, 1, 2, 2, (2, 2, False)),
}


def decoder_plan(num_hier: int = 3, clip_size: int = 32) -> DecoderPlan:
    key = (num_hier, clip_size) if num_hier == 3 else (num_hier, 32)
    if key not in DECODER_PLANS:
        raise ValueError(f"no decoder plan for num_hier={num_hier}, clip_size={clip_size}")
    return DECODER_PLANS[key]


@dataclasses.dataclass(frozen=True)
class Decoder:
    plan: DecoderPlan

    def _convs(self):
        p = self.plan
        convs = {
            "conv1": Conv3d(1024, 832, (1, 3, 3), (1, 1, 1), (0, 1, 1)),
            "conv2": Conv3d(832, 480, (p.kt2, 3, 3), (p.st2, 1, 1), (0, 1, 1)),
            "conv3": Conv3d(480, 192, (p.kt3, 3, 3), (p.st3, 1, 1), (0, 1, 1)),
            "conv4": Conv3d(192, 64, (p.kt4, 3, 3), (p.st4, 1, 1), (0, 1, 1)),
            "conv5": Conv3d(64, 32, (p.kt5, 3, 3), (p.st5, 1, 1), (0, 1, 1)),
        }
        if p.conv6 is not None:
            kt, st, use_bias = p.conv6
            convs["conv6"] = Conv3d(32, 32, (kt, 1, 1), (st, 1, 1), 0, use_bias=use_bias)
        convs["conv7"] = Conv3d(32, 1, 1, 1, 0, use_bias=True)
        return convs

    def init(self, key):
        convs = self._convs()
        keys = jax.random.split(key, len(convs))
        params = {name: mod.init(k)[0] for (name, mod), k in zip(convs.items(), keys)}
        return params, {}

    def apply(self, params, state, pyramid, *, train=False):
        """pyramid: [y0, y1, y2, y3] NDHWC feature maps (deeper levels may be
        None when the plan doesn't use them). Returns (B, H, W) in [0, 1]."""
        y0, y1, y2, y3 = pyramid
        p = self.plan
        convs = self._convs()

        def stage(name, z, skip=None):
            z = convs[name].apply(params[name], {}, z)[0]
            z = jax.nn.relu(z)
            z = upsample2x_hw(z)
            if skip is not None:
                z = jnp.concatenate([z, skip.astype(z.dtype)], axis=1)  # time axis
            return z

        z = stage("conv1", y0, y1 if 1 in p.skips else None)
        z = stage("conv2", z, y2 if 2 in p.skips else None)
        z = stage("conv3", z, y3 if 3 in p.skips else None)

        if not train and _use_phasefold():
            # Phase-folded tail (ops/phasefold.py): conv5 absorbs conv4's 2x
            # upsample (one coarse-grid conv with 4x channels), and the
            # conv6/conv7/sigmoid head runs in phase layout at the coarse
            # grid — no upsampled intermediate ever materializes. Exact
            # (tests/test_phasefold.py); inference-only to keep the training
            # graph unchanged.
            z = convs["conv4"].apply(params["conv4"], {}, z)[0]
            z = jax.nn.relu(z)
            from vinet_tpu.ops.phasefold import conv_after_up2x

            z = conv_after_up2x(z, params["conv5"]["w"],
                                params["conv5"].get("b"), stride_t=p.st5)
            z = jax.nn.relu(z)
            return self._phase_tail(params, z), state

        z = stage("conv4", z)
        z = convs["conv5"].apply(params["conv5"], {}, z)[0]
        z = jax.nn.relu(z)
        z = upsample2x_hw(z)
        if "conv6" in convs:
            if not train and _use_pallas_head():
                # fused conv6+relu+conv7+sigmoid at full map resolution
                # (vinet_tpu/ops/pallas_head.py); inference only (no VJP)
                from vinet_tpu.ops.pallas_head import saliency_head

                w6 = params["conv6"]["w"][:, 0, 0]  # (kt, C, C)
                w7 = params["conv7"]["w"][0, 0, 0, :, 0]  # (C,)
                out = saliency_head(z, w6, params["conv6"].get("b"),
                                    w7, params["conv7"]["b"])
                return out.astype(z.dtype), state
            z = convs["conv6"].apply(params["conv6"], {}, z)[0]
            z = jax.nn.relu(z)
        z = convs["conv7"].apply(params["conv7"], {}, z)[0]
        z = jax.nn.sigmoid(z)
        # (B, 1, H, W, 1) -> (B, H, W)
        return z[:, 0, :, :, 0], state

    def _phase_tail(self, params, z5):
        """conv6 (optional) + relu + conv7 + sigmoid, evaluated in the phase
        layout of the final 2x upsample — which is never materialized.

        The upsample is spatially linear and conv6/conv7 are spatially 1x1,
        so conv6(up(z5)) composes into ONE conv over the edge-padded coarse
        grid: weights S[ph,mh]*S[pw,mw]*w6 (phasefold.up_stencil), output
        channels (ph, pw, cout). Edge clamping is exactly the edge padding;
        there is no zero-padding anywhere in the tail, so no corrections are
        needed. relu/sigmoid are elementwise and commute with the phase
        permutation; the final depth-to-space is a reshape. Replaces the
        fine-grid path (1/4 the pixels, 4x the MXU lane utilization — the
        32-channel fine-grid convs wasted 3/4 of the lanes).

        z5: (B, T, H, W, 32) = relu(conv5) at the coarse grid.
        Returns (B, 2H, 2W) in [0, 1].
        """
        from vinet_tpu.ops.phasefold import up_stencil

        p = self.plan
        b_, t, h, w_, c = z5.shape
        s = jnp.asarray(up_stencil())  # (2, 3)
        w7 = params["conv7"]["w"][0, 0, 0, :, 0].astype(jnp.float32)  # (C7,)
        b7 = params["conv7"]["b"].astype(jnp.float32)
        zp = jnp.pad(z5, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

        if p.conv6 is not None:
            kt, st, _ = p.conv6
            cout = params["conv6"]["w"].shape[-1]
            w6 = params["conv6"]["w"][:, 0, 0].astype(jnp.float32)  # (kt, C, Cout)
            # W_eff[t, mh, mw, c, (ph, pw, d)] = S[ph,mh] S[pw,mw] w6[t,c,d]
            weff = jnp.einsum("hm,wn,tcd->tmnchwd", s, s, w6)
            weff = weff.reshape(kt, 3, 3, c, 4 * cout).astype(z5.dtype)
            hd = jax.lax.conv_general_dilated(
                zp, weff, window_strides=(st, 1, 1),
                padding=[(0, 0), (0, 0), (0, 0)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
            if "b" in params["conv6"]:
                hd = hd + jnp.tile(params["conv6"]["b"], 4).astype(hd.dtype)
            hd = jax.nn.relu(hd)  # (B, T', H, W, 4*cout), phase-major
            # conv7 per phase: (4*cout) -> 4
            w7bd = jnp.einsum("pq,d->pdq", jnp.eye(4, dtype=jnp.float32), w7)
            out = jnp.dot(hd, w7bd.reshape(4 * cout, 4),
                          preferred_element_type=jnp.float32) + b7
        else:
            # conv7 directly on the (virtual) upsample: compose with S
            weff = jnp.einsum("hm,wn,c->mnchw", s, s, w7)
            weff = weff.reshape(1, 3, 3, c, 4).astype(z5.dtype)
            out = jax.lax.conv_general_dilated(
                zp, weff, window_strides=(1, 1, 1),
                padding=[(0, 0), (0, 0), (0, 0)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32) + b7

        out = jax.nn.sigmoid(out[:, 0])  # (B, H, W, 4) phases (ph, pw)
        out = out.reshape(b_, h, w_, 2, 2)
        out = jnp.moveaxis(out, 3, 2).reshape(b_, 2 * h, 2 * w_)
        return out.astype(z5.dtype)
