"""Jitted train/eval loops (ref:train_utils/train_and_eval.py:316-411).

The per-step pipeline is: host loader yields raw uint8 batches -> device-side
fused augmentation (data/transforms.py) -> jitted train step with donated
state. Under a data-parallel mesh the batch axis of (images, targets) is
sharded and the state replicated; XLA inserts all gradient/metric/BN-stat
reductions (core/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stf_unet_tpu.core import mesh as mesh_lib
from stf_unet_tpu.core.prng import augment_key
from stf_unet_tpu.data.loader import HostLoader, prefetch_iterator
from stf_unet_tpu.data.transforms import TrainAugment, eval_preprocess
from stf_unet_tpu.losses.criterion import criterion
from stf_unet_tpu.metrics.confusion import (confusion_init,
                                            confusion_report, confusion_update,
                                            format_confusion)
from stf_unet_tpu.metrics.dice import eval_dice_update, eval_dice_value
from stf_unet_tpu.metrics.meters import MetricLogger, SmoothedValue
from stf_unet_tpu.models.registry import preprocess_input
from stf_unet_tpu.train.state import TrainState


def make_train_step(model, optim, schedule, num_classes: int,
                    ignore_index: int = -100,
                    augment: Optional[TrainAugment] = None,
                    ema_decay: float = 0.0,
                    ema_every_k: int = 1,
                    ema_warmup: bool = True,
                    loss_weight=None,
                    rotation_split: bool = False) -> Callable:
    """Build the jitted train step. State is donated (in-place update in HBM).

    With `augment` the device-side augmentation fuses INTO the same compiled
    program — one dispatch per step, signature
    (state, root_key, epoch, step, frames, masks, sizes, [rot_idx,] pk) —
    instead of a separate augmentation launch. The per-step PRNG derivation
    (augment_key's fold_ins) ALSO runs inside the program: epoch/step ride
    as traced int scalars, so the loop dispatches ZERO eager device ops per
    step. Measured r4 on the tunneled chip: each eager op costs ~11 ms of
    host dispatch latency, so the old eager augment_key chain (3 fold_ins)
    taxed every real train step ~33 ms that never appeared in the
    key-precomputed bench rows.

    ema_decay > 0 (with a state created via create_train_state(ema=True))
    folds the EMA weight update into the same program:
    ema = d*ema + (1-d)*params after the optimizer apply. Under
    gradient accumulation pass ema_every_k = the accumulation factor:
    optax.MultiSteps applies the optimizer once per k micro-steps
    (zero-updates in between), and advancing the EMA on every micro-step
    would compound the effective per-apply decay to d^k — so the EMA
    advances only on micro-steps where the apply happens.

    ema_warmup (default True) ramps the effective decay as
    d_eff = min(ema_decay, (1+n)/(10+n)) over the apply count n — the
    EfficientDet/timm scheme. Without it the EMA starts as a copy of the
    INIT weights and with d=0.95 still carries 0.95^n of them after n
    applies: on short epochs val (which evaluates the EMA copy) sits at
    the untrained plateau for dozens of steps and --early-stop-patience
    fires before the average warms up (observed r4: a 4-step/epoch run
    early-stopped at the all-background dice while the raw loss fell
    0.98 -> 0.06). The ramp makes the first applies near-copies
    (d_eff(0)=0.1) and reaches the configured decay by n ~ 200.

    loss_weight: optional per-class CE weights, [num_classes] — the
    criterion's loss_weight argument (the reference accepts it and never
    wires it, ref:train_and_eval.py:299-305); the dice term stays
    unweighted, exactly like the reference's criterion.
    """
    if loss_weight is not None:
        loss_weight = jnp.asarray(loss_weight, jnp.float32)

    def loss_fn(params, batch_stats, images, targets):
        x = preprocess_input(images, model)
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(variables, x, train=True,
                                       mutable=["batch_stats"])
        loss = criterion(outputs, targets, num_classes=num_classes,
                         ignore_index=ignore_index,
                         loss_weight=loss_weight)
        return loss, mutated["batch_stats"]

    def update(state, images, targets):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, targets)
        updates, new_opt = optim.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        lr = schedule(state.step)
        new_ema = state.ema_params
        if ema_decay > 0.0 and new_ema is not None:
            d = jnp.float32(ema_decay)
            if ema_warmup:
                # apply index n (0-based): this is the ((step+1)//k)-th
                # apply; on non-apply micro-steps d is overridden below.
                n = ((state.step + 1) // ema_every_k - 1).astype(jnp.float32)
                d = jnp.minimum(d, (1.0 + n) / (10.0 + n))
            if ema_every_k > 1:  # decay 1.0 == no-op on non-apply steps
                d = jnp.where((state.step + 1) % ema_every_k == 0,
                              d, jnp.float32(1.0))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)),
                new_ema, new_params)
        new_state = TrainState(params=new_params, batch_stats=new_bn,
                               opt_state=new_opt, step=state.step + 1,
                               ema_params=new_ema)
        return new_state, loss, lr

    if augment is None:
        @functools.partial(jax.jit, donate_argnums=0)
        def train_step(state: TrainState, images, targets):
            return update(state, images, targets)
        return train_step

    if rotation_split:
        if not augment.can_rotation_split:
            raise ValueError(
                "rotation_split=True needs shared-frame augmentation, no "
                "elastic field, and 0 < rotate_prob < 1 "
                "(TrainAugment.can_rotation_split)")

        @functools.partial(jax.jit, donate_argnums=0)
        def fused_split_step(state: TrainState, root_key, epoch, step_idx,
                             frames, masks, sizes, rot_idx, pk=None):
            key = augment_key(root_key, epoch, step_idx)
            images, targets = augment.rotation_split_apply(
                key, frames, masks, sizes, rot_idx, pk)
            return update(state, images, targets)

        return fused_split_step

    @functools.partial(jax.jit, donate_argnums=0)
    def fused_train_step(state: TrainState, root_key, epoch, step_idx,
                         frames, masks, sizes, pk=None):
        key = augment_key(root_key, epoch, step_idx)
        images, targets = augment(key, frames, masks, sizes, pk)
        return update(state, images, targets)

    return fused_train_step


def _batch_to_device(batch, mesh):
    """Move one host Batch onto the device (sharded under a mesh).
    Runs on the device-prefetch thread so the H2D transfer of batch N+1
    overlaps step N's compute — without this the transfer serializes with
    dispatch on the main thread (the dominant cost on slow host links)."""
    tree = (batch.frames, batch.masks, batch.sizes) + (
        (batch.pk,) if batch.pk is not None else ())
    if mesh is not None:
        parts = mesh_lib.shard_batch(mesh, tree)
    else:
        parts = tuple(jnp.asarray(x) for x in tree)
    pk = parts[3] if batch.pk is not None else None
    return parts[0], parts[1], parts[2], pk


def train_one_epoch(state: TrainState, train_step: Callable,
                    loader: HostLoader, augment: Optional[TrainAugment],
                    root_key: jax.Array, epoch: int, *,
                    mesh=None, print_freq: int = 10,
                    device_prefetch: int = 2,
                    start_step: int = 0,
                    should_stop: Optional[Callable[[], bool]] = None,
                    rotation_split_augment: Optional[TrainAugment] = None
                    ) -> Tuple[TrainState, float, float, int]:
    """One epoch (ref:train_and_eval.py:377-411). Returns
    (state, mean loss, last lr, steps completed in this epoch).

    augment=None means `train_step` is a fused step (augmentation compiled
    into the same program; see make_train_step). device_prefetch > 0 moves
    the H2D transfer onto a background thread, `device_prefetch` batches
    deep (0 disables: transfer inline, for debugging).

    start_step resumes mid-epoch after a preemption: the first
    `start_step` batches of the seeded shuffle are skipped (undecoded)
    and the per-step PRNG keys continue from that index — identical to
    never having been interrupted. should_stop (train/preempt.py) is
    polled after every completed step; abandoning the loop cancels the
    prefetch threads (prefetch_iterator's finally).

    rotation_split_augment: pass the TrainAugment when `train_step` was
    built with rotation_split=True — each step then routes the batch on
    the host (TrainAugment.rotation_bucket on a CPU-committed key, so no
    device sync) and calls train_step(state, root_key, epoch, step,
    frames, masks, sizes, rot_idx, pk). Single-device path only (the
    bucket combine would cross shards under a mesh)."""
    logger = MetricLogger(delimiter="  ")
    logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"
    step_in_epoch = start_step
    root_cpu = None
    if rotation_split_augment is not None:
        if mesh is not None:
            raise ValueError("rotation_split_augment is single-device only "
                             "(the bucket scatter would cross mesh shards)")
        root_cpu = jax.device_put(root_key, jax.devices("cpu")[0])
    pending = None  # one-step-delayed (loss, lr) fetch: materializing a
    # device value synchronizes the host with the chip, so fetch the
    # PREVIOUS step's scalars while the current step computes.
    device_iter = (_batch_to_device(b, mesh)
                   for b in loader.epoch(epoch, skip_batches=start_step))
    if device_prefetch > 0:
        device_iter = prefetch_iterator(device_iter, device_prefetch)
    for frames, masks, sizes, pk in logger.log_every(
            device_iter, print_freq, header,
            total=len(loader) - start_step):
        if rotation_split_augment is not None:
            rot_idx = rotation_split_augment.rotation_bucket(
                root_cpu, epoch, step_in_epoch, frames.shape[0])
            state, loss, lr = train_step(state, root_key, epoch,
                                         step_in_epoch, frames, masks,
                                         sizes, rot_idx, pk)
        elif augment is None:
            # Fused step: the augment_key fold-ins run INSIDE the program
            # (epoch/step as traced scalars) — zero eager device dispatches
            # per step (each costs ~11 ms over the tunneled chip, r4).
            state, loss, lr = train_step(state, root_key, epoch,
                                         step_in_epoch, frames, masks,
                                         sizes, pk)
        else:
            key = augment_key(root_key, epoch, step_in_epoch)
            images, targets = augment(key, frames, masks, sizes, pk)
            state, loss, lr = train_step(state, images, targets)
        if pending is not None:
            logger.update(loss=float(pending[0]), lr=float(pending[1]))
        pending = (loss, lr)
        step_in_epoch += 1
        if should_stop is not None and should_stop():
            break
    if pending is not None:
        logger.update(loss=float(pending[0]), lr=float(pending[1]))
    last_lr = logger.meters["lr"].value if step_in_epoch > start_step else 0.0
    return (state, logger.meters["loss"].global_avg, float(last_lr),
            step_in_epoch)


class _EvalStepCache:
    """Per-input-shape compiled eval steps. DCE-MRI datasets have a handful
    of slice geometries, so exact-shape compilation beats padding (which
    would perturb predictions near the pad boundary vs the reference).

    uint8 inputs (the transfer-lean eval path, eval_preprocess(raw=True))
    are normalized ON DEVICE inside the same compiled program — the host
    then ships 1 byte/pixel instead of 4 over the host->device link, which
    bounds val-epoch throughput on slow links (PERFORMANCE.md)."""

    def __init__(self, model, num_classes: int, mean: Optional[float] = None,
                 std: Optional[float] = None):
        self.model = model
        self.num_classes = num_classes
        self.mean = mean
        self.std = std
        self._fns: Dict[Tuple, Callable] = {}

    def __call__(self, variables, image, target, conf, dice_cum, dice_count):
        key = (tuple(image.shape), str(image.dtype))
        if key not in self._fns:
            model = self.model
            is_raw = image.dtype == jnp.uint8
            mean, std = self.mean, self.std
            if is_raw and (mean is None or std is None):
                raise ValueError(
                    "evaluate() received raw uint8 eval batches but no "
                    "data_cfg: pass data_cfg=DataConfig(...) so the device "
                    "step can normalize, or preprocess with raw=False.")

            @jax.jit
            def eval_step(variables, image, target, conf, dice_cum, dice_count):
                if is_raw:
                    # Same f32 expression the host path computes
                    # (transforms.eval_preprocess): metrics are identical.
                    from stf_unet_tpu.data.transforms import normalize
                    image = normalize(image, mean, std)
                    target = target.astype(jnp.int32)
                x = preprocess_input(image, model)
                logits = model.apply(variables, x, train=False)["out"]
                conf = confusion_update(conf, target, jnp.argmax(logits, axis=-1))
                dice_cum, dice_count = eval_dice_update(
                    dice_cum, dice_count, logits, target, ignore_index=255)
                return logits, conf, dice_cum, dice_count

            self._fns[key] = eval_step
        return self._fns[key](variables, image, target, conf, dice_cum, dice_count)


# evaluate() used to build a FRESH _EvalStepCache per call, which re-traced
# (and re-deserialized from the persistent compile cache) the eval
# executable on EVERY val epoch — ~8 s/epoch of pure overhead on the
# tunneled chip (measured r4). Steppers are reused across calls, keyed by
# the model object (weakly — a freed model drops its executables) and the
# (num_classes, mean, std) signature that changes the compiled program.
import weakref  # noqa: E402

_EVAL_STEPPERS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _eval_stepper_for(model, num_classes: int, mean, std) -> _EvalStepCache:
    try:
        per_model = _EVAL_STEPPERS.setdefault(model, {})
    except TypeError:  # unhashable / non-weakrefable model: no reuse
        return _EvalStepCache(model, num_classes, mean=mean, std=std)
    key = (num_classes, mean, std)
    if key not in per_model:
        per_model[key] = _EvalStepCache(model, num_classes, mean=mean,
                                        std=std)
    return per_model[key]


def evaluate(state: TrainState, model, eval_batches, num_classes: int, *,
             print_freq: int = 100, collect_outputs: bool = False,
             data_cfg=None, reduce_across_processes: bool = False,
             mesh=None) -> Dict[str, Any]:
    """Validation/test pass (ref:train_and_eval.py:316-374).

    `eval_batches` yields (image [B,T,h,w,1], target [B,h,w]) numpy/JAX
    arrays — either float32 already-normalized images with int32 targets,
    or (the transfer-lean default of eval_batches_from_index) raw uint8
    images + uint8 targets, which the jitted eval step normalizes on
    device; the latter requires `data_cfg` for the mean/std. Returns the
    reference's result dict {dice, confusion_matrix, global_accuracy,
    class_metrics, mean_metrics}; with collect_outputs also "outputs"
    (per-batch logits) and "batches" (the consumed (image, target) pairs,
    so callers rendering artifacts don't re-decode the dataset — note the
    images are raw uint8 scale on the transfer-lean path; both viz helpers
    min-max normalize, so renders are identical).

    reduce_across_processes=True all-reduces the final confusion/dice
    accumulators over jax processes (the reference's
    reduce_from_all_processes, ref:train_and_eval.py:51-57,125-132): use it
    when each host evaluated only its shard of the dataset
    (eval_batches_from_index(host_index=..., num_hosts=...)) — every
    process then returns the same GLOBAL metrics. Leave False when every
    process saw the full set (each already has global metrics).

    mesh: optional 1-D data mesh — each eval batch's sample axis shards
    over the devices (variables/accumulators replicate; GSPMD inserts the
    metric reductions). Batches not divisible by the mesh size (the odd
    bucket remainder) are placed replicated instead — identical metrics
    either way, tested on the simulated 8-device mesh.
    """
    variables = state.variables()
    conf = confusion_init(num_classes)
    dice_cum = jnp.zeros((num_classes,), jnp.float32)
    dice_count = jnp.zeros((), jnp.int32)
    if mesh is not None:
        variables = mesh_lib.replicate(mesh, variables)
        conf, dice_cum, dice_count = mesh_lib.replicate(
            mesh, (conf, dice_cum, dice_count))
    stepper = _eval_stepper_for(
        model, num_classes,
        mean=None if data_cfg is None else data_cfg.mean,
        std=None if data_cfg is None else data_cfg.std)
    logger = MetricLogger(delimiter="  ")
    outputs = []
    batches = []
    # H2D on a background thread (1 deep): batch N+1 transfers while batch
    # N's eval step runs — the eval-side twin of train_one_epoch's
    # device_prefetch.
    def _to_device(img, tgt):
        if (mesh is not None
                and np.shape(img)[0] % mesh.shape[mesh_lib.DATA_AXIS] == 0):
            return mesh_lib.shard_batch(mesh, (jnp.asarray(img),
                                               jnp.asarray(tgt)))
        if mesh is not None:
            return mesh_lib.replicate(mesh, (jnp.asarray(img),
                                             jnp.asarray(tgt)))
        return jnp.asarray(img), jnp.asarray(tgt)

    device_batches = prefetch_iterator(
        (_to_device(img, tgt) for img, tgt in eval_batches), 1)
    for image, target in logger.log_every(device_batches, print_freq, "Test:"):
        logits, conf, dice_cum, dice_count = stepper(
            variables, image, target, conf, dice_cum, dice_count)
        if collect_outputs:
            outputs.append(np.asarray(logits))
            batches.append((np.asarray(image), np.asarray(target)))
    if reduce_across_processes and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        conf = multihost_utils.process_allgather(conf).sum(axis=0)
        dice_cum = multihost_utils.process_allgather(dice_cum).sum(axis=0)
        dice_count = multihost_utils.process_allgather(dice_count).sum(axis=0)
    mat = np.asarray(conf)
    report = confusion_report(mat)
    return {
        "dice": float(eval_dice_value(dice_cum, dice_count)),
        "confusion_matrix": mat,
        "confusion_str": format_confusion(mat),
        "global_accuracy": report["global_accuracy"],
        "class_metrics": report["class_metrics"],
        "mean_metrics": report["mean_metrics"],
        **({"outputs": outputs, "batches": batches} if collect_outputs else {}),
    }


class CachedEvalBatches:
    """Replayable eval batches: the first full iteration decodes/resizes
    (via `factory()`) and caches every (image, target) uint8 batch; later
    iterations replay the cached list byte-identically. The val set is
    re-evaluated EVERY epoch over the same files with the same
    deterministic preprocessing — on few-core hosts that decode is the
    val-epoch floor, paid once here. Partial first iterations (an
    interrupted eval) don't poison the cache: completeness is marked only
    at exhaustion."""

    def __init__(self, factory: Callable):
        self._factory = factory
        self._items: list = []
        self._complete = False

    def __iter__(self):
        if self._complete:
            yield from self._items
            return
        self._items = []
        for batch in self._factory():
            self._items.append(batch)
            yield batch
        self._complete = True


def eval_batches_from_index(index, cfg, *, use_pk_maps: bool = False,
                            batch_size: int = 1, prefetch: int = 2,
                            bucket_by_shape: bool = True, raw: bool = True,
                            host_index: int = 0, num_hosts: int = 1,
                            pack=None):
    """Generator of eval-preprocessed (image, target) batches from a
    DatasetIndex (val/test loaders use batch_size=1, ref:train.py:206-211).

    raw=True (default) yields uint8 images/targets — the PIL-parity resize
    still runs on the host, but normalization moves into the jitted eval
    step (4x fewer transferred bytes; identical metrics — see
    _EvalStepCache). Pass the same `cfg` as `data_cfg=` to evaluate().
    raw=False restores host-side f32 normalization.

    batch_size > 1 groups SAME-SHAPE samples per batch (shape bucketing), so
    batched eval is bitwise-identical to per-sample eval — no 255-pad
    boundary pixels perturbing conv context. bucket_by_shape=False restores
    sequential cat_list 255-padding (ref:my_dataset.py:237-257) for
    comparison. Decode + preprocess run in a background thread
    (`prefetch` batches deep), overlapping host IO with device compute —
    the eval-side counterpart of HostLoader's producer thread.
    """
    from stf_unet_tpu.data.loader import (load_sample_raw_native,
                                          prefetch_iterator)

    # The legacy cat_list mode pads IMAGES with 0 in normalized space
    # (ref:my_dataset.py:237-257 pads after ToTensor+Normalize) — not a
    # representable uint8 value — so it keeps host normalization. The
    # default modes (batch 1 / shape bucketing) never produce pad pixels.
    if not bucket_by_shape and batch_size > 1:
        raw = False

    # Multi-host eval sharding: process i takes records[i::n] (disjoint
    # cover); pair with evaluate(reduce_across_processes=True) for global
    # metrics. Default (0, 1) = every host sees the full set.
    records = index.records[host_index::num_hosts]

    mask_format = getattr(cfg, "mask_format", "binary")

    if pack is not None:  # packed source (data/pack.py): skip decode
        pack.validate(index, mask_format=mask_format,
                      use_pk_maps=use_pk_maps)

    def sample_iter():
        if pack is not None and pack.serves_eval(cfg.crop_size, use_pk_maps):
            # Eval-geometry store: the pack already holds this run's
            # eval_preprocess(raw=True) output — no decode, no resize.
            # raw=False applies the identical normalization expression
            # (frames and PK channels share it, so normalizing the
            # concatenated array matches eval_preprocess exactly).
            for i in range(len(index))[host_index::num_hosts]:
                imgs, mask = pack.eval_sample(i)
                if raw:
                    yield imgs, mask
                else:
                    yield ((imgs.astype(np.float32) / 255.0 - cfg.mean)
                           / cfg.std, mask.astype(np.int32))
            return
        if pack is not None:
            for i in range(len(index))[host_index::num_hosts]:
                frames, mask, pk, _ = pack.sample(i, use_pk_maps=use_pk_maps)
                yield eval_preprocess(frames, mask, cfg, pk, raw=raw)
            return
        for rec in records:
            frames, mask, pk = load_sample_raw_native(rec, use_pk_maps,
                                                      mask_format)
            yield eval_preprocess(frames, mask, cfg, pk, raw=raw)

    def batch_iter():
        if bucket_by_shape and batch_size > 1:
            buckets: Dict[Tuple[int, ...], Tuple[list, list]] = {}
            for img, tgt in sample_iter():
                imgs, tgts = buckets.setdefault(img.shape, ([], []))
                imgs.append(img)
                tgts.append(tgt)
                if len(imgs) == batch_size:
                    yield _collate_eval(imgs, tgts)
                    del buckets[img.shape]
            for imgs, tgts in buckets.values():  # same-shape leftovers
                yield _collate_eval(imgs, tgts)
            return
        buf_img, buf_tgt = [], []
        for img, tgt in sample_iter():
            buf_img.append(img)
            buf_tgt.append(tgt)
            if len(buf_img) == batch_size:
                yield _collate_eval(buf_img, buf_tgt)
                buf_img, buf_tgt = [], []
        if buf_img:
            yield _collate_eval(buf_img, buf_tgt)

    # A plain return (not `yield from`) keeps this function NON-generator:
    # the pack validation above must run at CALL time, not at first
    # iteration — a stale test pack should fail when the run starts, not
    # after N training epochs.
    return prefetch_iterator(batch_iter(), prefetch)


def _collate_eval(imgs, tgts):
    max_h = max(t.shape[0] for t in tgts)
    max_w = max(t.shape[1] for t in tgts)
    b = len(imgs)
    t_steps = imgs[0].shape[0]
    # dtype follows the preprocess mode: uint8 (transfer-lean raw path,
    # image pad 0 == raw black) or float32/int32 (host-normalized path).
    image = np.zeros((b, t_steps, max_h, max_w, 1), dtype=imgs[0].dtype)
    target = np.full((b, max_h, max_w), 255, dtype=tgts[0].dtype)
    for i, (im, tg) in enumerate(zip(imgs, tgts)):
        image[i, :, :im.shape[1], :im.shape[2]] = im
        target[i, :tg.shape[0], :tg.shape[1]] = tg
    return image, target
