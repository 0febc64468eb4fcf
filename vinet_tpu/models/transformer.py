"""Transformer encoder with torch-checkpoint-compatible parameterization.

Covers the reference's PositionalEncoding + Transformer wrapper
(/root/reference/model.py:8-69) and the nn.TransformerEncoder(Layer) stack it
builds (post-LN, ReLU FFN, packed qkv in_proj — torch defaults), so released
AViNet fusion checkpoints convert weight-for-weight.

TPU-first choices: tokens are batch-first (B, S, E) so attention matmuls are
batched MXU contractions; dropout is optional (pass `rng`) and off in eval.
Param layouts intentionally mirror torch's (weights stored as (out, in);
applied as x @ W.T) to make conversion a pure name-map.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def _linear_init(key, out_dim, in_dim):
    bound = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def _linear(p, x):
    return x @ p["w"].T.astype(x.dtype) + p["b"].astype(x.dtype)


def _layernorm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dropout(x, rate, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def positional_encoding(max_len: int, feat: int) -> jnp.ndarray:
    """Sin/cos table, (max_len, feat) — reference PositionalEncoding
    (/root/reference/model.py:14-18)."""
    pe = np.zeros((max_len, feat), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, feat, 2, dtype=np.float32) * (-math.log(10000.0) / feat))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div[: pe[:, 1::2].shape[1]])
    return jnp.asarray(pe)


@dataclasses.dataclass(frozen=True)
class TransformerEncoderLayer:
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        e = self.d_model
        # torch packs q,k,v into one (3E, E) in_proj initialized with
        # xavier_uniform; out_proj/linear1/linear2 use the default linear init.
        limit = math.sqrt(6.0 / (4 * e))
        params = {
            "self_attn": {
                "in_proj_w": jax.random.uniform(k1, (3 * e, e), jnp.float32, -limit, limit),
                "in_proj_b": jnp.zeros((3 * e,), jnp.float32),
                "out_proj": _linear_init(k2, e, e),
            },
            "linear1": _linear_init(k3, self.dim_feedforward, e),
            "linear2": _linear_init(k4, e, self.dim_feedforward),
            "norm1": {"scale": jnp.ones((e,), jnp.float32), "bias": jnp.zeros((e,), jnp.float32)},
            "norm2": {"scale": jnp.ones((e,), jnp.float32), "bias": jnp.zeros((e,), jnp.float32)},
        }
        return params, {}

    def apply(self, params, state, x, *, train=False, rng=None):
        """x: (B, S, E) -> (B, S, E). Post-LN (torch norm_first=False)."""
        b, s, e = x.shape
        h = self.nhead
        dh = e // h
        ap = params["self_attn"]

        qkv = x @ ap["in_proj_w"].T.astype(x.dtype) + ap["in_proj_b"].astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B,S,E) -> (B,h,S,dh)
            return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(dh)
        attn = jax.nn.softmax(logits, axis=-1)
        r1, r2, r3 = (None, None, None) if rng is None else jax.random.split(rng, 3)
        attn = _dropout(attn, self.dropout if train else 0.0, r1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, e)
        ctx = _linear(ap["out_proj"], ctx)

        x = _layernorm(params["norm1"], x + _dropout(ctx, self.dropout if train else 0.0, r2))
        ff = _linear(params["linear2"], jax.nn.relu(_linear(params["linear1"], x)))
        x = _layernorm(params["norm2"], x + _dropout(ff, self.dropout if train else 0.0, r3))
        return x, state


def _mha(ap, q_in, kv_in, nhead, *, train=False, rng=None, dropout=0.1):
    """Multi-head attention with torch's packed in_proj parameterization.
    q_in: (B,S,E); kv_in: (B,M,E)."""
    b, s, e = q_in.shape
    dh = e // nhead
    wq, wk, wv = jnp.split(ap["in_proj_w"], 3, axis=0)
    bq, bk, bv = jnp.split(ap["in_proj_b"], 3, axis=0)
    q = q_in @ wq.T.astype(q_in.dtype) + bq.astype(q_in.dtype)
    k = kv_in @ wk.T.astype(q_in.dtype) + bk.astype(q_in.dtype)
    v = kv_in @ wv.T.astype(q_in.dtype) + bv.astype(q_in.dtype)

    def heads(t):
        return t.reshape(t.shape[0], t.shape[1], nhead, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits / math.sqrt(dh), axis=-1)
    attn = _dropout(attn, dropout if train else 0.0, rng)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, e)
    return _linear(ap["out_proj"], ctx)


@dataclasses.dataclass(frozen=True)
class TransformerDecoderLayer:
    """torch nn.TransformerDecoderLayer (post-LN): self-attn over targets,
    cross-attn to memory, ReLU FFN. Covers the reference Transformer wrapper's
    query-decoder path (/root/reference/model.py:42-46,60-68)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    def init(self, key):
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        e = self.d_model
        limit = math.sqrt(6.0 / (4 * e))

        def attn(k):
            return {
                "in_proj_w": jax.random.uniform(k, (3 * e, e), jnp.float32, -limit, limit),
                "in_proj_b": jnp.zeros((3 * e,), jnp.float32),
                "out_proj": _linear_init(k2, e, e),
            }

        norm = lambda: {"scale": jnp.ones((e,), jnp.float32), "bias": jnp.zeros((e,), jnp.float32)}
        params = {
            "self_attn": attn(k1),
            "multihead_attn": attn(k3),
            "linear1": _linear_init(k4, self.dim_feedforward, e),
            "linear2": _linear_init(k5, e, self.dim_feedforward),
            "norm1": norm(), "norm2": norm(), "norm3": norm(),
        }
        return params, {}

    def apply(self, params, state, tgt, memory, *, train=False, rng=None):
        r1, r2, r3 = (None, None, None) if rng is None else jax.random.split(rng, 3)
        sa = _mha(params["self_attn"], tgt, tgt, self.nhead, train=train, rng=r1,
                  dropout=self.dropout)
        tgt = _layernorm(params["norm1"], tgt + sa)
        ca = _mha(params["multihead_attn"], tgt, memory, self.nhead, train=train, rng=r2,
                  dropout=self.dropout)
        tgt = _layernorm(params["norm2"], tgt + ca)
        ff = _linear(params["linear2"], jax.nn.relu(_linear(params["linear1"], tgt)))
        tgt = _layernorm(params["norm3"], tgt + _dropout(ff, self.dropout if train else 0.0, r3))
        return tgt, state


@dataclasses.dataclass(frozen=True)
class Seq2SeqTransformer:
    """Functional equivalent of the reference's Transformer wrapper
    (/root/reference/model.py:28-69): additive sin/cos PE, optional spatial
    pre-encoder (attention over the transposed token axis), an encoder stack,
    and an optional query decoder with learned target-position embeddings."""

    feat_size: int
    hidden_size: int = 256
    nhead: int = 4
    num_encoder_layers: int = 3
    max_len: int = 4
    num_decoder_layers: int = -1
    num_queries: int = 4
    spatial_dim: int = -1

    def _enc(self):
        return TransformerEncoder(self.feat_size, self.nhead, self.num_encoder_layers,
                                  hidden_size=self.hidden_size, max_len=self.max_len)

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {"transformer_encoder": self._enc().init(k1)[0]}
        if self.spatial_dim != -1:
            spatial = TransformerEncoder(self.spatial_dim, self.nhead,
                                         self.num_encoder_layers,
                                         hidden_size=self.hidden_size,
                                         max_len=1, add_pe=False)
            params["transformer_encoder_spatial"] = spatial.init(k2)[0]
        if self.num_decoder_layers != -1:
            layer = TransformerDecoderLayer(self.hidden_size, self.nhead, self.hidden_size)
            keys = jax.random.split(k3, self.num_decoder_layers)
            params["transformer_decoder"] = {
                "layers": {str(i): layer.init(keys[i])[0] for i in range(self.num_decoder_layers)},
                "norm": {"scale": jnp.ones((self.hidden_size,), jnp.float32),
                         "bias": jnp.zeros((self.hidden_size,), jnp.float32)},
            }
            params["tgt_pos"] = jax.random.normal(k4, (self.num_queries, self.hidden_size))
        return params, {}

    def apply(self, params, state, x, *, query_idx: int = -1, train=False, rng=None):
        """x: (B, S, E) tokens -> encoder output, or decoder output if the
        query decoder is configured."""
        if self.spatial_dim != -1:
            spatial = TransformerEncoder(self.spatial_dim, self.nhead,
                                         self.num_encoder_layers,
                                         hidden_size=self.hidden_size,
                                         max_len=1, add_pe=False)
            xt = jnp.swapaxes(x, 1, 2)
            xt, _ = spatial.apply(params["transformer_encoder_spatial"], {}, xt,
                                  train=train, rng=rng)
            x = jnp.swapaxes(xt, 1, 2)
        mem, _ = self._enc().apply(params["transformer_encoder"], {}, x, train=train, rng=rng)
        if self.num_decoder_layers == -1:
            return mem, state
        tgt_pos = params["tgt_pos"]
        if query_idx != -1:
            tgt_pos = tgt_pos[query_idx : query_idx + 1]
        tgt = jnp.broadcast_to(tgt_pos[None], (x.shape[0], *tgt_pos.shape)).astype(x.dtype)
        layer = TransformerDecoderLayer(self.hidden_size, self.nhead, self.hidden_size)
        for i in range(self.num_decoder_layers):
            tgt, _ = layer.apply(params["transformer_decoder"]["layers"][str(i)], {},
                                 tgt, mem, train=train, rng=rng)
        tgt = _layernorm(params["transformer_decoder"]["norm"], tgt)
        return tgt, state


@dataclasses.dataclass(frozen=True)
class TransformerEncoder:
    """Stack of encoder layers with the reference's additive sin/cos PE
    (applied before layer 0, reference model.py:58-59; its PE dropout is
    commented out there and omitted here too)."""

    feat_size: int
    nhead: int = 4
    num_layers: int = 3
    hidden_size: int = 256
    max_len: int = 4
    add_pe: bool = True  # the reference's spatial pre-encoder skips PE (model.py:54-55)

    def _layer(self):
        return TransformerEncoderLayer(self.feat_size, self.nhead, self.hidden_size)

    def init(self, key):
        layer = self._layer()
        keys = jax.random.split(key, self.num_layers)
        params = {"layers": {str(i): layer.init(keys[i])[0] for i in range(self.num_layers)}}
        return params, {}

    def apply(self, params, state, x, *, train=False, rng=None):
        """x: (B, S, E) with S <= max_len (when add_pe)."""
        if self.add_pe:
            pe = positional_encoding(self.max_len, self.feat_size)
            x = x + pe[: x.shape[1]].astype(x.dtype)
        layer = self._layer()
        for i in range(self.num_layers):
            ri = None if rng is None else jax.random.fold_in(rng, i)
            x, _ = layer.apply(params["layers"][str(i)], {}, x, train=train, rng=ri)
        return x, state
