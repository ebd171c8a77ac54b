"""Cross-framework END-TO-END parity against the reference's own stack.

The suite already pins op-level and forward parity (tests/test_torch_import.py)
and torch-oracle losses/metrics (tests/test_losses.py, test_metrics.py). What
no unit test covers is the composition: the reference's ACTUAL training stack
(its UNet + criterion + AdamW + LambdaLR warmup-poly schedule + its
ConfusionMatrix/DiceCoefficient eval classes, invoked from /root/reference —
not copied) run end-to-end on the same pixels as ours:

 1. eval-STACK parity: a torch-TRAINED reference UNet (trained here, so BN
    running stats and decision boundaries are real, not random-init), with
    weights imported, must produce the same confusion counts and dice
    through OUR evaluate() as through the reference's own eval classes
    (ref:train_and_eval.py:25-142,316-374).
 2. training-DYNAMICS parity: each framework trained end-to-end with the
    same data, batch order, and hyperparameters (independent inits) must
    reach the same segmentation quality — the measured stand-in for the
    BASELINE.md "Dice parity" claim that real BreaDM would test.

Runs on CPU; sizes are chosen so the torch side stays a few seconds and the
JAX side one small jit.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference absent")

BASE_C = 8
BATCH = 4
EPOCHS = 20  # dice ~0.95 for the reference on this fixture; <=10 underfits
LR = 1e-3


def _load_ref():
    """Import the reference's train_utils.train_and_eval as a real package
    submodule (its criterion does a deferred relative import of
    dice_coefficient_loss) without putting /root/reference on sys.path —
    the reference's top-level module names (transforms, metrics, utils)
    would shadow ours for the rest of the suite."""
    if "ref_train_utils" not in sys.modules:
        pkg = types.ModuleType("ref_train_utils")
        pkg.__path__ = [os.path.join(REFERENCE, "train_utils")]
        sys.modules["ref_train_utils"] = pkg
    tae = importlib.import_module("ref_train_utils.train_and_eval")
    spec = importlib.util.spec_from_file_location(
        "ref_unet_crossfw", os.path.join(REFERENCE, "src", "unet.py"))
    unet_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(unet_mod)
    return tae, unet_mod.UNet


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    """Synthetic BreaDM tree decoded ONCE into normalized f32 arrays both
    frameworks consume verbatim (identical pixels, no augmentation)."""
    from PIL import Image

    from stf_unet_tpu.core.config import DataConfig
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = str(tmp_path_factory.mktemp("crossfw"))
    make_synthetic_breadm(root, patients_per_split=2, slices_per_patient=4,
                          size=64, time_steps=8)
    cfg = DataConfig()

    def split(mode):
        idx = DatasetIndex(root, mode, cfg.resolved_sequence_types)
        xs, ys = [], []
        for rec in idx.records:
            frames = np.stack([np.asarray(Image.open(p).convert("L"))
                               for p in rec.image_paths])
            mask = (np.asarray(Image.open(rec.mask_path).convert("L"))
                    > 127).astype(np.int32)
            xs.append(((frames.astype(np.float32) / 255.0) - cfg.mean)
                      / cfg.std)
            ys.append(mask)
        return np.stack(xs), np.stack(ys)  # [N, T, H, W], [N, H, W]

    return split("train"), split("val")


@pytest.fixture(scope="module")
def ref_trained(data):
    """The reference stack trained end-to-end: its model, criterion
    (CE + dice, ref:train_and_eval.py:299-313), AdamW with the reference
    hyperparameters (ref:train.py:227-237), and its warmup-poly LambdaLR
    stepped per batch (ref:train_and_eval.py:406,414-438)."""
    (xs, ys), _ = data
    tae, TorchUNet = _load_ref()
    torch.manual_seed(0)
    model = TorchUNet(in_channels=8, num_classes=2, base_c=BASE_C)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, betas=(0.9, 0.999),
                            weight_decay=1e-4, eps=1e-8)
    steps = int(np.ceil(len(xs) / BATCH))
    sched = tae.create_lr_scheduler(opt, steps, EPOCHS, warmup=True)
    model.train()
    for _ in range(EPOCHS):
        for i in range(0, len(xs), BATCH):
            x = torch.tensor(xs[i:i + BATCH][:, :, None])  # [B, T, 1, H, W]
            y = torch.tensor(ys[i:i + BATCH]).long()
            out = model(tae.preprocess_input(x, model))
            loss = tae.criterion(out, y, num_classes=2)
            opt.zero_grad()
            loss.backward()
            opt.step()
            sched.step()
    return tae, model


def _eval_reference(tae, model, xs, ys):
    """The reference's eval semantics, batch 1 (ref:train.py:206-211):
    its ConfusionMatrix bincount update + DiceCoefficient running mean."""
    model.eval()
    confmat = tae.ConfusionMatrix(2)
    dice = tae.DiceCoefficient(num_classes=2, ignore_index=255)
    with torch.no_grad():
        for x, y in zip(xs, ys):
            xt = torch.tensor(x[None, :, None])
            yt = torch.tensor(y[None]).long()
            out = model(tae.preprocess_input(xt, model))["out"]
            confmat.update(yt.flatten(), out.argmax(1).flatten())
            dice.update(out, yt)
    return confmat.mat.numpy(), float(dice.value)


def _eval_ours(params, batch_stats, xs, ys):
    from stf_unet_tpu.models import UNet
    from stf_unet_tpu.train.loop import evaluate
    from stf_unet_tpu.train.state import TrainState

    model = UNet(num_classes=2, base_c=BASE_C)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    batches = ((x[None, :, :, :, None], y[None].astype(np.int32))
               for x, y in zip(xs, ys))
    result = evaluate(state, model, batches, 2)
    return np.asarray(result["confusion_matrix"]), float(result["dice"])


def test_eval_stack_parity_with_trained_reference_weights(data, ref_trained):
    """Same trained weights, same pixels: the reference's eval classes and
    our jitted evaluate() must agree — confusion counts to within rare
    argmax boundary flips (f32 conv-order noise), dice to 5e-3."""
    _, (vx, vy) = data
    tae, model = ref_trained
    ref_mat, ref_dice = _eval_reference(tae, model, vx, vy)

    from stf_unet_tpu.utils.torch_import import import_unet_state_dict
    params, batch_stats = import_unet_state_dict(model.state_dict())
    our_mat, our_dice = _eval_ours(params, batch_stats, vx, vy)

    total = ref_mat.sum()
    assert total == vx.shape[0] * vx.shape[2] * vx.shape[3]
    # Confusion counts: integer-equal up to argmax flips at pixels where
    # the two frameworks' f32 logit difference (~1e-5 rel) crosses the
    # decision margin — budget 0.1% of pixels.
    assert np.abs(our_mat - ref_mat).sum() <= max(4, total // 1000), (
        f"confusion diverged:\nref=\n{ref_mat}\nours=\n{our_mat}")
    assert abs(our_dice - ref_dice) < 5e-3


def test_training_dynamics_parity(data, ref_trained):
    """Both frameworks trained end-to-end on identical batches with the
    reference hyperparameters (independent inits) reach the same
    segmentation quality — the synthetic-data stand-in for BASELINE.md's
    Dice-parity north star."""
    (xs, ys), (vx, vy) = data
    tae, ref_model = ref_trained
    _, ref_dice = _eval_reference(tae, ref_model, vx, vy)

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    cfg = ModelConfig(model="unet", num_classes=1, base_c=BASE_C)
    model = create_model(cfg)
    steps = int(np.ceil(len(xs) / BATCH))
    schedule = warmup_poly_schedule(LR, steps, EPOCHS)
    optim = make_optimizer(OptimConfig(), schedule)
    state = create_train_state(jax.random.key(0), cfg, optim,
                               jnp.asarray(xs[:BATCH][..., None]))
    train_step = make_train_step(model, optim, schedule, 2)
    for _ in range(EPOCHS):
        for i in range(0, len(xs), BATCH):
            state, loss, _ = train_step(
                state, jnp.asarray(xs[i:i + BATCH][..., None]),
                jnp.asarray(ys[i:i + BATCH], jnp.int32))

    _, our_dice = _eval_ours(state.params, state.batch_stats, vx, vy)

    assert ref_dice > 0.85, f"reference failed to learn: dice={ref_dice}"
    assert our_dice > 0.85, f"ours failed to learn: dice={our_dice}"
    assert abs(our_dice - ref_dice) < 0.06, (
        f"training quality diverged: ref={ref_dice:.4f} ours={our_dice:.4f}")
