"""Checkpoint conversion: released PyTorch weights -> vinet_tpu pytrees.

Ingests the reference's three artifact kinds (SURVEY.md §5 checkpoint):
  * full-model state_dicts (ViNet_*.pt, AViNet_*.pt) saved by train.py:288
  * the S3D Kinetics-400 backbone init with its 'base.N.*' -> 'baseK.M.*'
    name surgery (/root/reference/train.py:141-172, sn_list=[0,5,8,14])
  * soundnet8_final.pth loaded by the AViNet constructors (model.py:224)

Transforms: conv weights OIDHW -> DHWIO (3-D), (O,I,k,1)/(O,I,1,k) -> (k,I,O)
(SoundNet's conv-2d-as-1d), BN weight/bias/running_mean/running_var ->
scale/bias + state mean/var, torch Sequential indices -> our keys. Converted
trees can be cached as .npz.

torch is imported lazily — the library never needs it except here.
"""

from __future__ import annotations

import numpy as np

_BN_RENAME = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}

# torch convtsp4 Sequential conv indices -> our decoder keys, by variant
# (reference model.py:270-284 for clip32; :332-346 clip16; :394-408 clip8;
# :456-470 clip48).
_DEC4_WITH_CONV6 = {"0": "conv4", "3": "conv5", "6": "conv6", "8": "conv7"}
_DEC4_NO_CONV6 = {"0": "conv4", "3": "conv5", "6": "conv7"}


def _convert_conv_weight(w: np.ndarray) -> np.ndarray:
    if w.ndim == 5:  # (O,I,D,H,W) -> (D,H,W,I,O)
        return np.transpose(w, (2, 3, 4, 1, 0))
    if w.ndim == 4:  # SoundNet Conv2d (O,I,k,1) or 1x1 (O,I,1,1) -> (k,I,O)
        assert w.shape[3] == 1 or w.shape[2] == 1, w.shape
        k_axis = 2 if w.shape[3] == 1 else 3
        w = np.squeeze(w, axis=3 if k_axis == 2 else 2)
        return np.transpose(w, (2, 1, 0))
    return w  # linear (O,I) / bilinear (O,I,J): stored torch-layout


def _map_decoder_path(parts: list, has_conv6: bool) -> list | None:
    """['convtsp1','0','weight'] -> ['conv1', leaf]."""
    stage, idx = parts[0], parts[1]
    table = {"convtsp1": {"0": "conv1"}, "convtsp2": {"0": "conv2"},
             "convtsp3": {"0": "conv3"},
             "convtsp4": _DEC4_WITH_CONV6 if has_conv6 else _DEC4_NO_CONV6}
    m = table.get(stage, {})
    if idx not in m:
        return None
    return [m[idx]] + parts[2:]


def _map_transformer_path(parts: list) -> list | None:
    """torch 'transformer.(pos_encoder|transformer_encoder).*' -> ours."""
    if parts[0] == "pos_encoder":
        return None  # fixed sin/cos buffer, recomputed
    if parts[0] == "transformer_encoder" and parts[1] == "layers":
        rest = parts[2:]
        rename = {"in_proj_weight": "in_proj_w", "in_proj_bias": "in_proj_b"}
        rest = [rename.get(p, p) for p in rest]
        if rest[-1] == "weight":
            rest[-1] = "scale" if rest[-2].startswith("norm") else "w"
        elif rest[-1] == "bias" and rest[-2].startswith("norm"):
            rest[-1] = "bias"
        elif rest[-1] == "bias" and rest[-2] not in ("self_attn",):
            rest[-1] = "b"
        return ["layers"] + rest
    return None


def torch_state_dict_to_trees(sd: dict, *, has_conv6: bool = True) -> tuple[dict, dict]:
    """Convert a torch state_dict (name -> tensor/ndarray) into (params, state)
    nested dicts using this package's key conventions."""
    params: dict = {}
    state: dict = {}

    def put(tree, path, leaf_name, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    for name, tensor in sd.items():
        value = np.asarray(getattr(tensor, "numpy", lambda: tensor)())
        parts = name.split(".")
        if parts[0] == "module":  # DataParallel prefix (train.py:147-148)
            parts = parts[1:]
        if parts[-1] == "num_batches_tracked" or parts[-1] == "pe":
            continue

        # transformer subtree (AViNet fusion / refinement)
        if "transformer" in parts:
            ti = parts.index("transformer")
            mapped = _map_transformer_path(parts[ti + 1:])
            if mapped is None:
                continue
            put(params, parts[:ti] + ["transformer"] + mapped[:-1], mapped[-1], value)
            continue

        # decoder subtree: torch Sequential names convtspN.i
        if "decoder" in parts:
            di = parts.index("decoder")
            mapped = _map_decoder_path(parts[di + 1:], has_conv6)
            if mapped is None:
                continue
            leaf = mapped[-1]
            leaf = {"weight": "w", "bias": "b"}[leaf]
            put(params, parts[:di + 1] + mapped[:-1], leaf, _convert_conv_weight(value))
            continue

        leaf = parts[-1]
        path = parts[:-1]
        holder = path[-1] if path else ""
        is_bn = holder.startswith("bn") or holder.startswith("batchnorm") or holder in ("norm1", "norm2")
        if is_bn and leaf in _BN_RENAME:
            new_leaf = _BN_RENAME[leaf]
            if new_leaf in ("mean", "var"):
                put(state, path, new_leaf, value)
            else:
                put(params, path, new_leaf, value)
        elif leaf == "weight":
            put(params, path, "w", _convert_conv_weight(value))
        elif leaf == "bias":
            put(params, path, "b", value)
        else:
            raise KeyError(f"unhandled torch key: {name}")
    return params, state


def s3d_kinetics_remap(sd: dict) -> dict:
    """Reimplementation of the reference's Kinetics-400 name surgery
    (/root/reference/train.py:146-160): 'base.N.rest' -> 'base{K}.{N-sn}.rest'
    with sn_list=[0,5,8,14]."""
    out = {}
    sn_list = [0, 5, 8, 14]
    for name, v in sd.items():
        if name.startswith("module."):
            name = name[len("module."):]
        if name.startswith("base."):
            parts = name.split(".")
            bn = int(parts[1])
            sn = sn_list[0]
            if sn_list[1] <= bn < sn_list[2]:
                sn = sn_list[1]
            elif sn_list[2] <= bn < sn_list[3]:
                sn = sn_list[2]
            elif bn >= sn_list[3]:
                sn = sn_list[3]
            name = "base%d.%d." % (sn_list.index(sn) + 1, bn - sn) + ".".join(parts[2:])
        out[name] = v
    return out


def _check_against_template(tree: dict, template: dict, path="") -> list:
    """Shape-check converted leaves against the model's init tree; returns
    the list of template leaves NOT covered by the conversion."""
    missing = []
    for k, tv in template.items():
        p = f"{path}.{k}" if path else k
        if k not in tree:
            missing.extend(_collect_leaves(tv, p) if isinstance(tv, dict) else [p])
        elif isinstance(tv, dict):
            missing.extend(_check_against_template(tree[k], tv, p))
        else:
            cv = tree[k]
            if tuple(np.shape(cv)) != tuple(np.shape(tv)):
                raise ValueError(f"shape mismatch at {p}: torch {np.shape(cv)} vs model {np.shape(tv)}")
    return missing


def _collect_leaves(tree, path=""):
    out = []
    for k, v in tree.items():
        p = f"{path}.{k}" if path else k
        out.extend(_collect_leaves(v, p) if isinstance(v, dict) else [p])
    return out


def _overlay(template: dict, converted: dict):
    """Template tree with converted values where available (f32 jnp arrays)."""
    import jax.numpy as jnp

    out = {}
    for k, tv in template.items():
        if isinstance(tv, dict):
            out[k] = _overlay(tv, converted.get(k, {})) if isinstance(converted.get(k), dict) else tv
        else:
            cv = converted.get(k)
            out[k] = jnp.asarray(np.asarray(cv), jnp.float32) if cv is not None else tv
    return out


def convert_torch_checkpoint(path: str, model, params, state, *, strict: bool = True):
    """Load a torch .pt/.pth checkpoint into (params, state) templates from
    model.init(). Dispatches on content: S3D Kinetics backbone files get the
    name surgery and land under params['backbone']."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}

    keys = list(sd.keys())
    is_s3d_raw = any(k.startswith(("base.", "module.base.")) for k in keys)
    is_soundnet_only = all(k.split(".")[0].startswith(("conv", "batchnorm")) for k in keys)

    has_conv6 = "conv6" in params.get("decoder", params.get("visual_model", {}).get("decoder", {"conv6": None}))

    if is_s3d_raw:
        sd = s3d_kinetics_remap(sd)
        p, s = torch_state_dict_to_trees(sd)
        target_p = params["backbone"] if "backbone" in params else params["visual_model"]["backbone"]
        target_s = state["backbone"] if "backbone" in state else state["visual_model"]["backbone"]
        missing = _check_against_template(p, target_p) + _check_against_template(s, target_s)
        new_p = dict(params)
        new_s = dict(state)
        if "backbone" in params:
            new_p["backbone"] = _overlay(target_p, p)
            new_s["backbone"] = _overlay(target_s, s)
        else:
            new_p["visual_model"] = dict(params["visual_model"], backbone=_overlay(target_p, p))
            new_s["visual_model"] = dict(state["visual_model"], backbone=_overlay(target_s, s))
        if strict and missing:
            raise ValueError(f"unconverted backbone leaves: {missing[:10]}...")
        return new_p, new_s

    if is_soundnet_only:
        p, s = torch_state_dict_to_trees(sd)
        missing = _check_against_template(p, params["audionet"]) + _check_against_template(s, state["audionet"])
        if strict and missing:
            raise ValueError(f"unconverted soundnet leaves: {missing[:10]}...")
        return (
            dict(params, audionet=_overlay(params["audionet"], p)),
            dict(state, audionet=_overlay(state["audionet"], s)),
        )

    p, s = torch_state_dict_to_trees(sd, has_conv6=has_conv6)
    missing = _check_against_template(p, params) + _check_against_template(s, state)
    if strict and missing:
        raise ValueError(f"unconverted leaves: {missing[:10]}...")
    return _overlay(params, p), _overlay(state, s)


def save_npz_tree(path: str, params: dict, state: dict) -> None:
    flat = {}
    for prefix, tree in (("params", params), ("state", state)):
        for name in _collect_leaves(tree):
            node = tree
            for part in name.split("."):
                node = node[part]
            flat[f"{prefix}/{name}"] = np.asarray(node)
    np.savez(path, **flat)


def load_npz_tree(path: str, params: dict, state: dict):
    import jax.numpy as jnp

    data = np.load(path)
    out_p, out_s = jax_tree_copy(params), jax_tree_copy(state)
    for key in data.files:
        prefix, name = key.split("/", 1)
        node = out_p if prefix == "params" else out_s
        parts = name.split(".")
        for part in parts[:-1]:
            node = node[part]
        arr = data[key]
        if arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
            # bfloat16 round-trips through npz as a 2-byte void: numpy has
            # no native bf16, so np.savez stores the raw ml_dtypes buffer.
            # The only 2-byte void this codebase produces is bf16.
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        node[parts[-1]] = jnp.asarray(arr)
    return out_p, out_s


def jax_tree_copy(tree):
    return {k: jax_tree_copy(v) if isinstance(v, dict) else v for k, v in tree.items()}
