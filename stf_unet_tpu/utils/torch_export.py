"""Reverse weight exporter: this framework's Flax trees -> reference
PyTorch state_dicts (the exact inverse of utils/torch_import.py).

Lets weights trained here run inside the reference stack unchanged — its
test.py/val.py load `torch.load(path)["model"]` state_dicts
(ref:test.py:142-146, ref:train.py:304-311) — closing the interop loop:
torch -> JAX (stf-migrate) AND JAX -> torch (stf-migrate --reverse).

Layout conversions (inverses of torch_import):
  * Conv kernel HWIO [kh,kw,in,out] -> torch [out,in,kh,kw]
  * Transposed conv: HWIO equivalent-forward kernel -> transpose to
    [in,out,kh,kw] -> spatial flip (see ops/conv.py for why ours stores
    the flipped forward form)
  * BatchNorm scale/bias/mean/var -> weight/bias/running_mean/running_var
    (+ a zero num_batches_tracked so strict torch loads succeed)
  * LSTM [C,4C] -> transposed torch [4C,C]; separate b_ih/b_hh kept

Everything returns numpy arrays; callers (cli/migrate --reverse) wrap in
torch tensors.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

_STAGE_SIZES = (3, 4, 6, 3)  # torchvision resnet34


def _np(x) -> np.ndarray:
    return np.asarray(x)


def conv_weight_from_hwio(k) -> np.ndarray:
    """HWIO [kh,kw,in,out] -> torch Conv2d [out,in,kh,kw]."""
    return _np(k).transpose(3, 2, 0, 1).copy()


def convt_weight_from_hwio(k) -> np.ndarray:
    """Inverse of torch_import.convt_weight_to_hwio: HWIO equivalent-
    forward kernel -> torch ConvTranspose2d [in,out,kh,kw]."""
    k = _np(k)
    return k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1].copy()


def _conv(sd: Dict, prefix: str, p: Mapping) -> None:
    sd[f"{prefix}.weight"] = conv_weight_from_hwio(p["kernel"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _convt(sd: Dict, prefix: str, p: Mapping) -> None:
    sd[f"{prefix}.weight"] = convt_weight_from_hwio(p["kernel"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _bn(sd: Dict, prefix: str, p: Mapping, s: Mapping) -> None:
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])
    sd[f"{prefix}.running_mean"] = _np(s["mean"])
    sd[f"{prefix}.running_var"] = _np(s["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


# ---------------------------------------------------------------------------
# Vanilla UNet (inverse of torch_import.import_unet_state_dict)
# ---------------------------------------------------------------------------

def export_unet_state_dict(params: Mapping, batch_stats: Mapping) -> Dict:
    """models.unet.UNet (params, batch_stats) -> reference torch
    state_dict (ref:src/unet.py layout: Sequential conv at .0/.3, BN at
    .1/.4, ConvTranspose up*, 1x1 out_conv)."""
    sd: Dict = {}

    def double_conv(ours: str, torch_name: str) -> None:
        for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4))):
            branch = params[ours][f"conv{i + 1}"]
            stats = batch_stats[ours][f"conv{i + 1}"]
            _conv(sd, f"{torch_name}.{conv_idx}", branch["conv"])
            _bn(sd, f"{torch_name}.{bn_idx}", branch["norm"]["bn"],
                stats["norm"]["bn"])

    for name in ("enc1", "enc2", "enc3", "enc4", "bottleneck",
                 "dec4", "dec3", "dec2", "dec1"):
        double_conv(name, name)
    for name in ("up4", "up3", "up2", "up1"):
        _convt(sd, name, params[name])
    _conv(sd, "out_conv", params["out_conv"])
    return sd


# ---------------------------------------------------------------------------
# STF-LSTM-UNet (inverse of torch_import.import_stflstm_state_dict)
# ---------------------------------------------------------------------------

def _residual_block(sd: Dict, prefix: str, p: Mapping, s: Mapping) -> None:
    _conv(sd, f"{prefix}.conv_block.0", p["conv1"])
    _bn(sd, f"{prefix}.conv_block.1", p["norm1"]["bn"], s["norm1"]["bn"])
    _conv(sd, f"{prefix}.conv_block.3", p["conv2"])
    _bn(sd, f"{prefix}.conv_block.4", p["norm2"]["bn"], s["norm2"]["bn"])
    if "shortcut_conv" in p:
        _conv(sd, f"{prefix}.shortcut.0", p["shortcut_conv"])
        _bn(sd, f"{prefix}.shortcut.1", p["shortcut_norm"]["bn"],
            s["shortcut_norm"]["bn"])


def _basic_block(sd: Dict, prefix: str, p: Mapping, s: Mapping) -> None:
    _conv(sd, f"{prefix}.conv1", p["conv1"])
    _bn(sd, f"{prefix}.bn1", p["bn1"]["bn"], s["bn1"]["bn"])
    _conv(sd, f"{prefix}.conv2", p["conv2"])
    _bn(sd, f"{prefix}.bn2", p["bn2"]["bn"], s["bn2"]["bn"])
    if "down_conv" in p:
        _conv(sd, f"{prefix}.downsample.0", p["down_conv"])
        _bn(sd, f"{prefix}.downsample.1", p["down_bn"]["bn"],
            s["down_bn"]["bn"])


def _lstm(sd: Dict, prefix: str, p: Mapping) -> None:
    sd[f"{prefix}.weight_ih_l0"] = _np(p["w_ih"]).T.copy()
    sd[f"{prefix}.weight_hh_l0"] = _np(p["w_hh"]).T.copy()
    sd[f"{prefix}.bias_ih_l0"] = _np(p["b_ih"])
    sd[f"{prefix}.bias_hh_l0"] = _np(p["b_hh"])


def _decoder_block(sd: Dict, prefix: str, p: Mapping, s: Mapping) -> None:
    _convt(sd, f"{prefix}.up", p["up"])
    _conv(sd, f"{prefix}.fusion", p["fusion"])
    _residual_block(sd, f"{prefix}.res_conv", p["res_conv"], s["res_conv"])


def export_stflstm_state_dict(params: Mapping, batch_stats: Mapping) -> Dict:
    """models.stf_lstm_unet.STFLSTMUNet (params, batch_stats) -> reference
    torch state_dict (ref:src/stf_lstm_unet.py + torchvision resnet34
    BasicBlock layout)."""
    sd: Dict = {}
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    _conv(sd, "conv1", enc_p["conv1"])
    _bn(sd, "bn1", enc_p["bn1"]["bn"], enc_s["bn1"]["bn"])
    for stage, blocks in enumerate(_STAGE_SIZES):
        for b in range(blocks):
            name = f"layer{stage + 1}_block{b}"
            _basic_block(sd, f"layer{stage + 1}.{b}", enc_p[name],
                         enc_s[name])

    for i in range(1, 5):
        if f"pk_fusion{i}" in params:
            _conv(sd, f"pk_fusion{i}", params[f"pk_fusion{i}"])
        _lstm(sd, f"lstm{i}", params[f"lstm{i}"])

    for i in (4, 3, 2):
        _decoder_block(sd, f"decoder{i}", params[f"decoder{i}"],
                       batch_stats[f"decoder{i}"])

    _convt(sd, "upconv1", params["upconv1"])
    _residual_block(sd, "final_res", params["final_res"],
                    batch_stats["final_res"])
    _conv(sd, "final", params["final"])
    return sd


def to_torch(sd: Mapping) -> Dict:
    """numpy state_dict -> torch tensors (float32 weights preserved)."""
    import torch
    # np.array(copy) — jax buffers arrive as non-writable views, which
    # torch.as_tensor would alias with a warning.
    return {k: torch.as_tensor(np.array(v)) for k, v in sd.items()}
