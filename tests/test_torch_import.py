"""Golden parity: the reference's own torch UNet vs our Flax UNet with
imported weights (SURVEY §4 item 2), plus importer round-trip structure
checks for the STF-LSTM tree."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from stf_unet_tpu.models import STFLSTMUNet, UNet
from stf_unet_tpu.utils.torch_import import (import_stflstm_state_dict,
                                             import_unet_state_dict,
                                             strip_module_prefix)

REFERENCE = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_unet_forward_parity_with_reference():
    """Run the ACTUAL reference model (invoked, not copied) and compare."""
    # Load the module file directly: src/__init__ pulls in torchvision,
    # which this image doesn't have.
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_unet", os.path.join(REFERENCE, "src", "unet.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    TorchUNet = mod.UNet

    torch.manual_seed(0)
    ref = TorchUNet(in_channels=8, num_classes=2, base_c=16)
    ref.eval()

    params, batch_stats = import_unet_state_dict(ref.state_dict())
    ours = UNet(num_classes=2, base_c=16)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x).permute(0, 3, 1, 2))["out"]
    got = ours.apply({"params": params, "batch_stats": batch_stats},
                     jnp.asarray(x), train=False)["out"]
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)


def test_strip_module_prefix():
    sd = {"module.a.weight": 1, "b.bias": 2}
    out = strip_module_prefix(sd)
    assert set(out) == {"a.weight", "b.bias"}


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(np.shape(v))
    return out


def _synth_torch_unet_sd(base_c=8, in_c=8, ncls=2):
    """Reference-layout state dict with random values (names/shapes only)."""
    sd = {}
    rng = np.random.default_rng(1)

    def conv(name, ci, co, k):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(size=(co, ci, k, k)).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(size=(co,)).astype(np.float32))

    def bn(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)
        sd[f"{name}.running_mean"] = torch.zeros(c)
        sd[f"{name}.running_var"] = torch.ones(c)

    def block(name, ci, co):
        conv(f"{name}.0", ci, co, 3)
        bn(f"{name}.1", co)
        conv(f"{name}.3", co, co, 3)
        bn(f"{name}.4", co)

    c = base_c
    block("enc1", in_c, c)
    block("enc2", c, c * 2)
    block("enc3", c * 2, c * 4)
    block("enc4", c * 4, c * 8)
    block("bottleneck", c * 8, c * 16)
    for i, mult in ((4, 16), (3, 8), (2, 4), (1, 2)):
        ci, co = c * mult, c * mult // 2
        sd[f"up{i}.weight"] = torch.tensor(
            rng.normal(size=(ci, co, 2, 2)).astype(np.float32))
        sd[f"up{i}.bias"] = torch.zeros(co)
        block(f"dec{i}", ci, co)
    conv("out_conv", c, ncls, 1)
    return sd


def test_unet_import_tree_matches_init():
    sd = _synth_torch_unet_sd()
    params, stats = import_unet_state_dict(sd)
    model = UNet(num_classes=2, base_c=8)
    init = model.init(jax.random.key(0), jnp.ones((1, 32, 32, 8)), train=False)
    assert _tree_shapes(params) == _tree_shapes(init["params"])
    got_stats = _tree_shapes(stats)
    want_stats = _tree_shapes(init["batch_stats"])
    assert got_stats == want_stats


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_stflstm_import_tree_matches_init():
    """Synthesize a reference-layout state dict from OUR init shapes via the
    inverse mapping, then check the importer reproduces the init tree.
    (The real reference model cannot run here: torchvision is absent and its
    decoder stops at half resolution — SURVEY §7.)"""
    model = STFLSTMUNet(num_classes=2, time_steps=2)
    init = model.init(jax.random.key(0), jnp.ones((1, 2, 64, 64, 1)),
                      train=False)
    want_p = _tree_shapes(init["params"])
    want_s = _tree_shapes(init["batch_stats"])

    sd = {}

    def add_conv(torch_name, shape_hwio, bias_shape=None):
        kh, kw, ci, co = shape_hwio
        sd[f"{torch_name}.weight"] = torch.zeros((co, ci, kh, kw))
        if bias_shape is not None:
            sd[f"{torch_name}.bias"] = torch.zeros(bias_shape)

    def add_convt(torch_name, shape_hwio, bias_shape=None):
        kh, kw, ci, co = shape_hwio
        sd[f"{torch_name}.weight"] = torch.zeros((ci, co, kh, kw))
        if bias_shape is not None:
            sd[f"{torch_name}.bias"] = torch.zeros(bias_shape)

    def add_bn(torch_name, c):
        sd[f"{torch_name}.weight"] = torch.ones(c)
        sd[f"{torch_name}.bias"] = torch.zeros(c)
        sd[f"{torch_name}.running_mean"] = torch.zeros(c)
        sd[f"{torch_name}.running_var"] = torch.ones(c)

    p = init["params"]
    enc = p["encoder"]
    add_conv("conv1", enc["conv1"]["kernel"].shape)
    add_bn("bn1", enc["bn1"]["bn"]["scale"].shape[0])
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            ours = enc[f"layer{stage + 1}_block{b}"]
            tname = f"layer{stage + 1}.{b}"
            add_conv(f"{tname}.conv1", ours["conv1"]["kernel"].shape)
            add_bn(f"{tname}.bn1", ours["bn1"]["bn"]["scale"].shape[0])
            add_conv(f"{tname}.conv2", ours["conv2"]["kernel"].shape)
            add_bn(f"{tname}.bn2", ours["bn2"]["bn"]["scale"].shape[0])
            if "down_conv" in ours:
                add_conv(f"{tname}.downsample.0",
                         ours["down_conv"]["kernel"].shape)
                add_bn(f"{tname}.downsample.1",
                       ours["down_bn"]["bn"]["scale"].shape[0])
    for i in range(1, 5):
        ours = p[f"lstm{i}"]
        c = ours["w_ih"].shape[0]
        sd[f"lstm{i}.weight_ih_l0"] = torch.zeros((4 * c, c))
        sd[f"lstm{i}.weight_hh_l0"] = torch.zeros((4 * c, c))
        sd[f"lstm{i}.bias_ih_l0"] = torch.zeros(4 * c)
        sd[f"lstm{i}.bias_hh_l0"] = torch.zeros(4 * c)
    for i in (4, 3, 2):
        ours = p[f"decoder{i}"]
        add_convt(f"decoder{i}.up", ours["up"]["kernel"].shape,
                  ours["up"]["bias"].shape)
        add_conv(f"decoder{i}.fusion", ours["fusion"]["kernel"].shape,
                 ours["fusion"]["bias"].shape)
        res = ours["res_conv"]
        add_conv(f"decoder{i}.res_conv.conv_block.0", res["conv1"]["kernel"].shape)
        add_bn(f"decoder{i}.res_conv.conv_block.1",
               res["norm1"]["bn"]["scale"].shape[0])
        add_conv(f"decoder{i}.res_conv.conv_block.3", res["conv2"]["kernel"].shape)
        add_bn(f"decoder{i}.res_conv.conv_block.4",
               res["norm2"]["bn"]["scale"].shape[0])
    add_convt("upconv1", p["upconv1"]["kernel"].shape, p["upconv1"]["bias"].shape)
    fr = p["final_res"]
    add_conv("final_res.conv_block.0", fr["conv1"]["kernel"].shape)
    add_bn("final_res.conv_block.1", fr["norm1"]["bn"]["scale"].shape[0])
    add_conv("final_res.conv_block.3", fr["conv2"]["kernel"].shape)
    add_bn("final_res.conv_block.4", fr["norm2"]["bn"]["scale"].shape[0])
    add_conv("final", p["final"]["kernel"].shape, p["final"]["bias"].shape)

    got_p, got_s = import_stflstm_state_dict(sd)
    assert _tree_shapes(got_p) == want_p
    assert _tree_shapes(got_s) == want_s


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_migrate_cli_roundtrip(tmp_path):
    """Save a reference-format torch pickle, migrate it, and check the
    restored forward matches the torch model."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_unet2", os.path.join(REFERENCE, "src", "unet.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(1)
    ref = mod.UNet(in_channels=8, num_classes=2, base_c=8)
    ref.eval()
    pth = str(tmp_path / "unet_best_model.pth")
    torch.save({"model": ref.state_dict(), "epoch": 3}, pth)

    from stf_unet_tpu.cli.migrate import migrate
    migrate(pth, "unet", str(tmp_path / "w"), base_c=8)

    import json
    meta = json.load(open(str(tmp_path / "w" / "unet_best_model" / "meta.json")))
    assert meta["epoch"] == 3

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.checkpoint import CheckpointManager
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    cfg = ModelConfig(model="unet", num_classes=1, base_c=8)
    model = create_model(cfg)
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 1, 1))
    template = create_train_state(jax.random.key(0), cfg, optim,
                                  jnp.zeros((1, 8, 32, 32, 1)))
    state, _ = CheckpointManager(str(tmp_path / "w"), "unet").restore(
        "best", template)

    x = np.random.default_rng(2).normal(size=(1, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x).permute(0, 3, 1, 2))["out"]
    got = model.apply(state.variables(), jnp.asarray(x), train=False)["out"]
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)
