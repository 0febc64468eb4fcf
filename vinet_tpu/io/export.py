"""Checkpoint export: vinet_tpu pytrees -> reference-compatible torch .pt.

The inverse of io/convert.py, closing the interop loop: a model trained or
fine-tuned on TPU can be saved as a state_dict that the reference's torch
classes load directly (naming per /root/reference/model.py; the reference
saves/loads these dicts at train.py:288 / train.py:141-179).

Inverse transforms (each undoing convert.py's import direction):
  * conv3d (D,H,W,I,O) -> (O,I,D,H,W)
  * SoundNet conv-1d (k,I,O) -> Conv2d (O,I,k,1)   [model.py SoundNet]
  * BN params scale/bias + state mean/var ->
    weight/bias/running_mean/running_var, plus the num_batches_tracked
    buffer torch BNs carry (emitted as 0 — torch only reads it when
    momentum=None, which the reference never uses)
  * decoder keys conv1..conv7 -> torch Sequential names convtspN.i
    (reference model.py:270-284 and clip-8/16/48 variants)
  * transformer keys -> transformer_encoder.layers.N.* with the packed
    in_proj naming, plus the synthesized sin/cos 'pos_encoder.pe' buffer
    (reference model.py:8-31 registers it, so strict loads expect it)
  * linear (O,I) / bilinear (O,I,J): stored torch-layout already

torch is imported lazily, only by save-time entry points.
"""

from __future__ import annotations

import numpy as np

# our decoder key -> torch Sequential name, by tail variant (inverse of
# convert.py's _DEC4_WITH_CONV6/_DEC4_NO_CONV6)
_DEC_INV_6 = {"conv1": "convtsp1.0", "conv2": "convtsp2.0", "conv3": "convtsp3.0",
              "conv4": "convtsp4.0", "conv5": "convtsp4.3", "conv6": "convtsp4.6",
              "conv7": "convtsp4.8"}
_DEC_INV_NO6 = {"conv1": "convtsp1.0", "conv2": "convtsp2.0", "conv3": "convtsp3.0",
                "conv4": "convtsp4.0", "conv5": "convtsp4.3", "conv7": "convtsp4.6"}


def _invert_conv_weight(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w)
    if w.ndim == 5:  # (D,H,W,I,O) -> (O,I,D,H,W)
        return np.transpose(w, (4, 3, 0, 1, 2))
    if w.ndim == 3:  # SoundNet (k,I,O) -> Conv2d (O,I,k,1)
        return np.transpose(w, (2, 1, 0))[:, :, :, None]
    return w  # linear (O,I): torch layout already


def _is_bn(p_node: dict, s_node: dict) -> bool:
    return set(p_node) == {"scale", "bias"} and {"mean", "var"} <= set(s_node or {})


def _emit_transformer(out: dict, prefix: str, p_node: dict) -> None:
    """Our transformer subtree -> torch 'transformer.transformer_encoder.*'
    names (inverse of convert.py::_map_transformer_path)."""
    rename = {"in_proj_w": "in_proj_weight", "in_proj_b": "in_proj_bias"}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k])
                continue
            holder = path[-1] if path else ""
            if k in rename:
                leaf = rename[k]
            elif holder.startswith("norm"):
                leaf = {"scale": "weight", "bias": "bias"}[k]
            else:
                leaf = {"w": "weight", "b": "bias"}[k]
            out[".".join([prefix, "transformer_encoder"] + path + [leaf])] = np.asarray(v)

    assert set(p_node) == {"layers"}, sorted(p_node)
    walk(p_node["layers"], ["layers"])


def trees_to_torch_state_dict(params: dict, state: dict, *,
                              pe_tables: dict | None = None) -> dict:
    """Convert (params, state) pytrees into a flat torch-named state_dict of
    numpy arrays. pe_tables maps a transformer subtree's dotted path (e.g.
    'transformer') to its (max_len, 1, feat) sin/cos buffer; use
    export_torch_checkpoint to derive those from the model object."""
    out: dict = {}
    pe_tables = dict(pe_tables or {})

    def walk(p_node: dict, s_node: dict, path: list) -> None:
        prefix = ".".join(path)
        for k in p_node:
            v = p_node[k]
            sv = (s_node or {}).get(k)
            name = f"{prefix}.{k}" if prefix else k
            if k == "decoder" and isinstance(v, dict):
                table = _DEC_INV_6 if "conv6" in v else _DEC_INV_NO6
                assert set(v) <= set(table), sorted(set(v) - set(table))
                for conv, node in v.items():
                    out[f"{name}.{table[conv]}.weight"] = _invert_conv_weight(node["w"])
                    if "b" in node:
                        out[f"{name}.{table[conv]}.bias"] = np.asarray(node["b"])
                continue
            if k == "transformer" and isinstance(v, dict):
                _emit_transformer(out, name, v)
                pe = pe_tables.pop(name, None)
                if pe is not None:
                    out[f"{name}.pos_encoder.pe"] = np.asarray(pe)
                continue
            if isinstance(v, dict):
                if _is_bn(v, sv):
                    out[f"{name}.weight"] = np.asarray(v["scale"])
                    out[f"{name}.bias"] = np.asarray(v["bias"])
                    out[f"{name}.running_mean"] = np.asarray(sv["mean"])
                    out[f"{name}.running_var"] = np.asarray(sv["var"])
                    out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)
                else:
                    walk(v, sv if isinstance(sv, dict) else {}, path + [k])
                continue
            if k == "w":
                # bilinear weights (O,I,J) are stored torch-layout; every
                # other 3-D 'w' is a SoundNet-style conv-1d
                raw = path and path[-1] == "bilinear"
                out[f"{prefix}.weight" if prefix else "weight"] = (
                    np.asarray(v) if raw else _invert_conv_weight(v))
            elif k == "b":
                out[f"{prefix}.bias" if prefix else "bias"] = np.asarray(v)
            else:
                raise KeyError(f"unhandled params leaf: {name}")

    walk(params, state, [])
    assert not pe_tables, f"pe_tables paths not found in params: {sorted(pe_tables)}"
    return out


def _model_pe_tables(model, params: dict) -> dict:
    """Derive the synthesized pos_encoder.pe buffers from the model object:
    AViNet's refinement encoder (feat 336, max_len=C) and AViNetFusion's
    joint encoder (feat C, max_len=339) both live at params['transformer']."""
    from vinet_tpu.models.transformer import positional_encoding

    tr = None
    if getattr(model, "use_transformer", False) and hasattr(model, "_refiner"):
        tr = model._refiner()[1]
    elif hasattr(model, "_mods"):
        tr = model._mods()[2]
    if tr is None or "transformer" not in params:
        return {}
    pe = np.asarray(positional_encoding(tr.max_len, tr.feat_size))
    return {"transformer": pe[:, None, :]}  # (max_len, 1, feat), model.py:19


def export_torch_checkpoint(path: str, model, params: dict, state: dict) -> None:
    """Save (params, state) as a torch .pt state_dict loadable by the
    reference's model classes (strict load, including BN buffers and pe)."""
    import torch

    sd = trees_to_torch_state_dict(
        params, state, pe_tables=_model_pe_tables(model, params))
    # every exported transformer must carry its pos_encoder.pe buffer, or the
    # reference's strict load fails — catches model/checkpoint flag mismatches
    # (e.g. exporting a use_transformer checkpoint through a model built
    # without the flag, where _model_pe_tables synthesizes nothing)
    missing = [pfx for pfx in {k.split(".transformer_encoder.")[0]
                               for k in sd if ".transformer_encoder." in k}
               if f"{pfx}.pos_encoder.pe" not in sd]
    if missing:
        raise ValueError(
            f"no pos_encoder.pe synthesized for transformer(s) {missing}: "
            "the model's flags do not match the checkpoint "
            "(--use_transformer / fusion variant)")
    # np.array forces a writable copy (np.asarray of a jax array is
    # read-only, which torch.from_numpy rejects)
    tsd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    torch.save(tsd, path)
