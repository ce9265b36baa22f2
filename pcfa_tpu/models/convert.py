"""PyTorch-checkpoint → Flax-params converters.

Torch is a converter-only dependency (imported lazily; the TPU compute path
never touches it). Checkpoints handled per SURVEY.md §5 "checkpoint/resume":

* generic state dicts (incl. FlowNet2/PWCNet `{'state_dict': ...}` wrapping,
  `ownutilities.py:134-138,157-158`, and RAFT/GMA `module.` DataParallel
  prefixes, `ownutilities.py:105-124`),
* SpyNet's per-conv-layer weight files
  `spynet_weights/modelL{level}_{model}-{conv}-{weight,bias}.pth.tar`
  (`SpyNet.py:77-81`).

Layout conversions (torch → flax, channels-last):
    conv weight   (O, I, kH, kW) → (kH, kW, I, O)
    linear weight (O, I)         → (I, O)
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def conv_kernel(w: Any) -> np.ndarray:
    """Torch OIHW conv weight → flax HWIO kernel."""
    return np.transpose(_to_numpy(w), (2, 3, 1, 0))


def conv_transpose_kernel(w: Any) -> np.ndarray:
    """Torch IOHW ConvTranspose2d weight → flax HWIO kernel for
    `nn.ConvTranspose` (which convolves, rather than cross-correlates, so the
    spatial taps must be flipped)."""
    k = np.transpose(_to_numpy(w), (2, 3, 0, 1))
    return k[::-1, ::-1].copy()


def linear_kernel(w: Any) -> np.ndarray:
    return np.transpose(_to_numpy(w), (1, 0))


def load_torch_state(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint as a flat numpy state dict, unwrapping
    `{'state_dict': ...}` and stripping `module.` prefixes."""
    import torch

    state = torch.load(path, map_location="cpu")
    if isinstance(state, Mapping) and "state_dict" in state:
        state = state["state_dict"]
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _to_numpy(v)
    return out


def torch_conv(sd: Mapping[str, Any], key: str) -> dict[str, np.ndarray]:
    """{kernel, bias} flax leaf dict for torch conv layer `key`."""
    p = {"kernel": conv_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        p["bias"] = _to_numpy(sd[f"{key}.bias"])
    return p


# ---------------------------------------------------------------- SpyNet ---

def spynet_params_from_arrays(
    levels: list[list[tuple[np.ndarray, np.ndarray]]],
) -> dict:
    """Build SpyNet flax params from per-level conv (weight OIHW, bias) lists.

    `levels[i][j]` is conv j of `Basic` block i (block i handles pyramid
    position i, coarsest first — matching `moduleBasic[intLevel]`)."""
    params: dict = {}
    for lvl, convs in enumerate(levels):
        block = {}
        for j, (w, b) in enumerate(convs):
            block[f"conv{j}"] = {"kernel": conv_kernel(w), "bias": _to_numpy(b)}
        params[f"basic{lvl}"] = block
    return params


def spynet_params_from_files(
    weights_dir: str, strmodel: str = "F", nlevels: int = 6
) -> dict:
    """Read the reference's per-layer SpyNet files (`SpyNet.py:77-81`).

    File naming: `modelL{level+1}_{strmodel}-{conv+1}-{weight,bias}.pth.tar`.
    Chairs models ('3'/'4') reuse level 5 weights for level 6
    (`SpyNet.py:73-75`)."""
    import torch

    levels = []
    for lvl in range(nlevels):
        file_lvl = lvl
        if lvl == 5 and strmodel in ("3", "4"):
            file_lvl = 4
        convs = []
        for j in range(5):
            stem = os.path.join(
                weights_dir, f"modelL{file_lvl + 1}_{strmodel}-{j + 1}-"
            )
            w = torch.load(stem + "weight.pth.tar", map_location="cpu")
            b = torch.load(stem + "bias.pth.tar", map_location="cpu")
            convs.append((_to_numpy(w), _to_numpy(b)))
        levels.append(convs)
    return spynet_params_from_arrays(levels)


# ------------------------------------------------------------------ RAFT ---

def fold_batchnorm(sd: Mapping[str, Any], key: str, eps: float = 1e-5) -> dict:
    """Eval-mode BatchNorm folded to {scale, bias} for `FrozenBatchNorm`."""
    gamma = _to_numpy(sd[f"{key}.weight"])
    beta = _to_numpy(sd[f"{key}.bias"])
    mean = _to_numpy(sd[f"{key}.running_mean"])
    var = _to_numpy(sd[f"{key}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def basic_encoder_params(sd: Mapping[str, Any], prefix: str, norm_fn: str) -> dict:
    """`BasicEncoder` weights (`extractor.py:118-192`) → flax tree.

    Instance norms carry no weights; batch norms are folded."""
    p = {
        "conv1": torch_conv(sd, f"{prefix}.conv1"),
        "conv2": torch_conv(sd, f"{prefix}.conv2"),
    }
    if norm_fn == "batch":
        p["norm1"] = fold_batchnorm(sd, f"{prefix}.norm1")
    for i in (1, 2, 3):
        for j in (0, 1):
            t = f"{prefix}.layer{i}.{j}"
            blk = {
                "conv1": torch_conv(sd, f"{t}.conv1"),
                "conv2": torch_conv(sd, f"{t}.conv2"),
            }
            if norm_fn == "batch":
                blk["norm1"] = fold_batchnorm(sd, f"{t}.norm1")
                blk["norm2"] = fold_batchnorm(sd, f"{t}.norm2")
            if f"{t}.downsample.0.weight" in sd:
                blk["downsample"] = torch_conv(sd, f"{t}.downsample.0")
                if norm_fn == "batch":
                    blk["norm3"] = fold_batchnorm(sd, f"{t}.downsample.1")
            p[f"layer{i}_{j}"] = blk
    return p


def raft_update_block_params(sd: Mapping[str, Any], prefix: str = "update_block") -> dict:
    """`BasicUpdateBlock` weights (`update.py:114-136`) → flax tree."""
    return {
        "encoder": {
            k: torch_conv(sd, f"{prefix}.encoder.{k}")
            for k in ("convc1", "convc2", "convf1", "convf2", "conv")
        },
        "gru": {
            k: torch_conv(sd, f"{prefix}.gru.{k}")
            for k in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")
        },
        "flow_head": {
            "conv1": torch_conv(sd, f"{prefix}.flow_head.conv1"),
            "conv2": torch_conv(sd, f"{prefix}.flow_head.conv2"),
        },
        "mask_conv1": torch_conv(sd, f"{prefix}.mask.0"),
        "mask_conv2": torch_conv(sd, f"{prefix}.mask.2"),
    }


def raft_params_from_state(sd: Mapping[str, Any]) -> dict:
    """Full RAFT state dict (`raft.py:24-56`, `module.` already stripped)."""
    return {
        "fnet": basic_encoder_params(sd, "fnet", "instance"),
        "cnet": basic_encoder_params(sd, "cnet", "batch"),
        "update_block": raft_update_block_params(sd),
    }


def raft_params_from_checkpoint(path: str) -> dict:
    return raft_params_from_state(load_torch_state(path))


# ------------------------------------------------------------------- GMA ---

def gma_params_from_state(sd: Mapping[str, Any], include_pos_emb: bool = False) -> dict:
    """RAFT-GMA state dict (`network.py:26-43`) → flax tree.

    The relative-positional embedding tables (`att.pos_emb.*`) are dead
    weights under the shipped config (content-only attention); they are
    converted anyway when `include_pos_emb` so the `position_only` /
    `position_and_content` variants can load them."""
    update = raft_update_block_params(sd)
    update["aggregator"] = {
        "to_v": {"kernel": conv_kernel(sd["update_block.aggregator.to_v.weight"])},
        "gamma": _to_numpy(sd["update_block.aggregator.gamma"]),
    }
    if "update_block.aggregator.project.weight" in sd:
        update["aggregator"]["project"] = {
            "kernel": conv_kernel(sd["update_block.aggregator.project.weight"])
        }
    att: dict = {"to_qk": {"kernel": conv_kernel(sd["att.to_qk.weight"])}}
    if include_pos_emb and "att.pos_emb.rel_height.weight" in sd:
        att["pos_emb"] = {
            "rel_height": _to_numpy(sd["att.pos_emb.rel_height.weight"]),
            "rel_width": _to_numpy(sd["att.pos_emb.rel_width.weight"]),
        }
    return {
        "fnet": basic_encoder_params(sd, "fnet", "instance"),
        "cnet": basic_encoder_params(sd, "cnet", "batch"),
        "update_block": update,
        "att": att,
    }


def gma_params_from_checkpoint(path: str) -> dict:
    return gma_params_from_state(load_torch_state(path))


# ---------------------------------------------------------------- PWCNet ---

def pwcnet_params_from_state(sd: Mapping[str, Any]) -> dict:
    """`PWCDCNet` state dict (`PWCNet.py:60-164`) → flax tree.

    Key families: `conv*.0.*` (Conv+LeakyReLU Sequentials), `deconv*` /
    `upfeat*` (ConvTranspose2d — kernels flipped for flax), `predict_flow*`
    and `dc_conv7` (bare convs)."""
    params: dict = {}
    for k in sd:
        if not k.endswith(".weight"):
            continue
        base = k[: -len(".weight")]
        if base == "deconv2":
            continue  # created but never used in forward (`PWCNet.py:147`)
        if base.endswith(".0"):
            params[base[:-2]] = {"0": torch_conv(sd, base)}
        elif base.startswith(("deconv", "upfeat")):
            params[base] = {
                "kernel": conv_transpose_kernel(sd[k]),
                "bias": _to_numpy(sd[f"{base}.bias"]),
            }
        else:
            params[base] = torch_conv(sd, base)
    return params


def pwcnet_params_from_checkpoint(path: str) -> dict:
    return pwcnet_params_from_state(load_torch_state(path))


# -------------------------------------------------------------- FlowNet2 ---

def flownet2_params_from_state(sd: Mapping[str, Any]) -> dict:
    """FlowNet2 cascade state dict (`FlowNet2.py:23-96`) → flax tree.

    Key families per sub-net (flownetc / flownets_1 / flownets_2 /
    flownets_d / flownetfusion): `*.0.*` Sequentials (conv / deconv /
    i_conv), bare `predict_flow*` convs, bare `upsampled_flow*`
    ConvTranspose2d. Transposed-conv kernels are flipped for flax."""
    params: dict = {}
    for k in sd:
        if not k.endswith(".weight"):
            continue
        base = k[: -len(".weight")]
        parts = base.split(".")
        net, layer = parts[0], parts[1]
        transposed = layer.startswith(("deconv", "upsampled_flow"))
        leaf = {
            "kernel": conv_transpose_kernel(sd[k]) if transposed
            else conv_kernel(sd[k])
        }
        if f"{base}.bias" in sd:
            leaf["bias"] = _to_numpy(sd[f"{base}.bias"])
        node = params.setdefault(net, {})
        if parts[-1] == "0":
            node.setdefault(layer, {})["0"] = leaf
        else:
            node[layer] = leaf
    return params


def flownet2_params_from_checkpoint(path: str) -> dict:
    return flownet2_params_from_state(load_torch_state(path))


# ------------------------------------------------------------ RAFT-small ---

def small_encoder_params(sd: Mapping[str, Any], prefix: str) -> dict:
    """`SmallEncoder` weights (`extractor.py:195-267`). Instance/none norms
    carry no weights, so only convs are mapped."""
    p = {
        "conv1": torch_conv(sd, f"{prefix}.conv1"),
        "conv2": torch_conv(sd, f"{prefix}.conv2"),
    }
    for i in (1, 2, 3):
        for j in (0, 1):
            t = f"{prefix}.layer{i}.{j}"
            blk = {
                "conv1": torch_conv(sd, f"{t}.conv1"),
                "conv2": torch_conv(sd, f"{t}.conv2"),
                "conv3": torch_conv(sd, f"{t}.conv3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["downsample"] = torch_conv(sd, f"{t}.downsample.0")
            p[f"layer{i}_{j}"] = blk
    return p


def raft_small_params_from_state(sd: Mapping[str, Any]) -> dict:
    """RAFT small=true state dict (`raft.py:48-51`, `update.py:99-112`)."""
    return {
        "fnet": small_encoder_params(sd, "fnet"),
        "cnet": small_encoder_params(sd, "cnet"),
        "update_block": {
            "encoder": {
                k: torch_conv(sd, f"update_block.encoder.{k}")
                for k in ("convc1", "convf1", "convf2", "conv")
            },
            "gru": {
                k: torch_conv(sd, f"update_block.gru.{k}")
                for k in ("convz", "convr", "convq")
            },
            "flow_head_conv1": torch_conv(sd, "update_block.flow_head.conv1"),
            "flow_head_conv2": torch_conv(sd, "update_block.flow_head.conv2"),
        },
    }


def raft_small_params_from_checkpoint(path: str) -> dict:
    return raft_small_params_from_state(load_torch_state(path))
