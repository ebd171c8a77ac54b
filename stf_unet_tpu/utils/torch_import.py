"""One-way PyTorch -> JAX weight importer (SURVEY §5 checkpoint/resume:
"a one-way PyTorch→JAX weight importer for parity testing").

Maps reference state_dicts (ref:src/unet.py, ref:src/stf_lstm_unet.py +
torchvision resnet34 layout) onto this framework's Flax param/batch_stats
trees. Used by the golden-parity tests and for migrating reference
checkpoints (ref:train.py:304-311 torch pickles).

Layout conversions:
  * Conv2d       [out,in,kh,kw] -> HWIO [kh,kw,in,out]
  * ConvTranspose2d [in,out,kh,kw] -> spatial flip -> HWIO (our transposed
    conv stores the equivalent forward-conv kernel, see ops/conv.py)
  * BatchNorm    weight/bias/running_mean/running_var -> scale/bias/mean/var
  * LSTM         weight_ih/hh [4C,C] -> transposed [C,4C]; biases kept
                 separate (b_ih, b_hh) matching models.stf_lstm_unet.PixelLSTM
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def strip_module_prefix(state_dict: Mapping) -> Dict:
    """Drop a leading 'module.' (DataParallel artifact, ref:utils.py:52-62)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_weight_to_hwio(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def convt_weight_to_hwio(w) -> np.ndarray:
    w = _np(w)
    return w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()


def _bn(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _conv(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": conv_weight_to_hwio(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _convt(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": convt_weight_to_hwio(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


# ---------------------------------------------------------------------------
# Vanilla UNet (ref:src/unet.py: enc*/bottleneck/dec* are Sequential with
# conv at .0/.3 and BN at .1/.4; up* are ConvTranspose2d; out_conv 1x1)
# ---------------------------------------------------------------------------

def import_unet_state_dict(state_dict: Mapping) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for models.unet.UNet."""
    sd = strip_module_prefix(state_dict)
    params: Dict = {}
    stats: Dict = {}

    def double_conv(torch_name: str, ours: str):
        p: Dict = {}
        s: Dict = {}
        for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4))):
            branch = f"conv{i + 1}"
            bn_p, bn_s = _bn(sd, f"{torch_name}.{bn_idx}")
            p[branch] = {"conv": _conv(sd, f"{torch_name}.{conv_idx}"),
                         "norm": {"bn": bn_p}}
            s[branch] = {"norm": {"bn": bn_s}}
        params[ours] = p
        stats[ours] = s

    for name in ("enc1", "enc2", "enc3", "enc4", "bottleneck",
                 "dec4", "dec3", "dec2", "dec1"):
        double_conv(name, name)
    for name in ("up4", "up3", "up2", "up1"):
        params[name] = _convt(sd, name)
    params["out_conv"] = _conv(sd, "out_conv")
    return params, stats


# ---------------------------------------------------------------------------
# STF-LSTM-UNet (ref:src/stf_lstm_unet.py + torchvision resnet34 BasicBlocks)
# ---------------------------------------------------------------------------

def _residual_block(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    """ResidualConvBlock (ref:src/stf_lstm_unet.py:7-35): conv_block.{0,1,3,4}
    + optional shortcut.{0,1}."""
    bn1_p, bn1_s = _bn(sd, f"{prefix}.conv_block.1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.conv_block.4")
    p = {"conv1": _conv(sd, f"{prefix}.conv_block.0", bias=False),
         "norm1": {"bn": bn1_p},
         "conv2": _conv(sd, f"{prefix}.conv_block.3", bias=False),
         "norm2": {"bn": bn2_p}}
    s = {"norm1": {"bn": bn1_s}, "norm2": {"bn": bn2_s}}
    if f"{prefix}.shortcut.0.weight" in sd:
        sc_p, sc_s = _bn(sd, f"{prefix}.shortcut.1")
        p["shortcut_conv"] = _conv(sd, f"{prefix}.shortcut.0", bias=False)
        p["shortcut_norm"] = {"bn": sc_p}
        s["shortcut_norm"] = {"bn": sc_s}
    return p, s


def _basic_block(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    """torchvision BasicBlock: conv1/bn1/conv2/bn2 + optional downsample."""
    bn1_p, bn1_s = _bn(sd, f"{prefix}.bn1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.bn2")
    p = {"conv1": _conv(sd, f"{prefix}.conv1", bias=False),
         "bn1": {"bn": bn1_p},
         "conv2": _conv(sd, f"{prefix}.conv2", bias=False),
         "bn2": {"bn": bn2_p}}
    s = {"bn1": {"bn": bn1_s}, "bn2": {"bn": bn2_s}}
    if f"{prefix}.downsample.0.weight" in sd:
        dp, ds = _bn(sd, f"{prefix}.downsample.1")
        p["down_conv"] = _conv(sd, f"{prefix}.downsample.0", bias=False)
        p["down_bn"] = {"bn": dp}
        s["down_bn"] = {"bn": ds}
    return p, s


def _lstm(sd: Mapping, prefix: str) -> Dict:
    return {"w_ih": _np(sd[f"{prefix}.weight_ih_l0"]).T,
            "w_hh": _np(sd[f"{prefix}.weight_hh_l0"]).T,
            "b_ih": _np(sd[f"{prefix}.bias_ih_l0"]),
            "b_hh": _np(sd[f"{prefix}.bias_hh_l0"])}


def _decoder_block(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    """DecoderBlock (ref:src/stf_lstm_unet.py:38-68): up / fusion / res_conv."""
    res_p, res_s = _residual_block(sd, f"{prefix}.res_conv")
    p = {"up": _convt(sd, f"{prefix}.up"),
         "fusion": _conv(sd, f"{prefix}.fusion"),
         "res_conv": res_p}
    return p, {"res_conv": res_s}


_STAGE_SIZES = (3, 4, 6, 3)


def import_stflstm_state_dict(state_dict: Mapping) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for models.stf_lstm_unet.STFLSTMUNet."""
    sd = strip_module_prefix(state_dict)
    params: Dict = {}
    stats: Dict = {}

    enc_p: Dict = {"conv1": _conv(sd, "conv1", bias=False)}
    enc_s: Dict = {}
    bn1_p, bn1_s = _bn(sd, "bn1")
    enc_p["bn1"] = {"bn": bn1_p}
    enc_s["bn1"] = {"bn": bn1_s}
    for stage, blocks in enumerate(_STAGE_SIZES):
        for b in range(blocks):
            name = f"layer{stage + 1}_block{b}"
            bp, bs = _basic_block(sd, f"layer{stage + 1}.{b}")
            enc_p[name] = bp
            enc_s[name] = bs
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    for i in range(1, 5):
        if f"pk_fusion{i}.weight" in sd:
            params[f"pk_fusion{i}"] = _conv(sd, f"pk_fusion{i}")
        params[f"lstm{i}"] = _lstm(sd, f"lstm{i}")

    for i in (4, 3, 2):
        dp, ds = _decoder_block(sd, f"decoder{i}")
        params[f"decoder{i}"] = dp
        stats[f"decoder{i}"] = ds

    params["upconv1"] = _convt(sd, "upconv1")
    fr_p, fr_s = _residual_block(sd, "final_res")
    params["final_res"] = fr_p
    stats["final_res"] = fr_s
    params["final"] = _conv(sd, "final")
    return params, stats


def load_torch_checkpoint(path: str) -> Dict:
    """Read a reference .pth (torch pickle of {model, optimizer, ...} or a
    bare state_dict, ref:train.py:304-311, ref:utils.py:27-50)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        return ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt
