"""REAL 2-process multi-host coverage (VERDICT r1 next-step 3, extended per
VERDICT r2 next-step 3): two subprocesses jax.distributed.initialize on
localhost (CPU platform, 2 virtual devices each), run fused train steps
through mesh.shard_batch's make_array_from_process_local_data branch with
host-sharded loaders; the losses must match a single-process 4-device run
over the same global batches — the all-reduce semantics the reference only
gestures at (ref:train_and_eval.py:51-57). The same child then (a) runs
evaluate() over HOST-SHARDED eval batches with the cross-process metric
reduction (ref:train_and_eval.py:51-57,125-132) — global confusion/dice
must equal the single-process full-set run on both processes — and (b)
does a coordinated save_async + both-processes restore roundtrip of the
mesh-replicated trained state.

Extended per VERDICT r3 next-step 5: the same 2-process children also run
the r3-late composition — packed loader (data/pack.py) + EMA + gradient
accumulation (optax.MultiSteps) — and its losses and final EMA/param
checksums must match the single-process oracle; process_count>1 is its own
bug class (the r3 orbax save deadlock was only visible there)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

SEQS = ("VIBRANT+C1", "VIBRANT+C2")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
root, port, pid, outfile = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]

from stf_unet_tpu.core.distributed import host_info, initialize
assert initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 4

import jax.numpy as jnp
from stf_unet_tpu.core import mesh as mesh_lib
from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
from stf_unet_tpu.core.prng import augment_key
from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.data.loader import HostLoader
from stf_unet_tpu.data.transforms import TrainAugment
from stf_unet_tpu.models.registry import create_model
from stf_unet_tpu.train.loop import make_train_step
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import create_train_state, make_optimizer

SEQS = ("VIBRANT+C1", "VIBRANT+C2")
data_cfg = DataConfig(data_path=root, base_size=24, crop_size=16)
index = DatasetIndex(root, "train", SEQS)
hi, hc = host_info()
loader = HostLoader(index, batch_size=2, shuffle=True, seed=0, prefetch=0,
                    use_native=False, host_index=hi, num_hosts=hc)

mesh = mesh_lib.create_mesh(0)  # spans all 4 global devices
mc = ModelConfig(model="unet", num_classes=1, time_steps=2, base_c=4)
model = create_model(mc)
schedule = warmup_poly_schedule(1e-3, 4, 2)
optim = make_optimizer(OptimConfig(), schedule)
augment = TrainAugment(data_cfg)

x0 = jnp.zeros((4, 2, 16, 16, 1), jnp.float32)
state = create_train_state(jax.random.key(0), mc, optim, x0)
state = mesh_lib.replicate(mesh, state)
step_fn = make_train_step(model, optim, schedule, 2, augment=augment)

losses = []
root_key = jax.random.key(42)
for s, batch in enumerate(loader.epoch(0)):
    if s >= 2:
        break
    frames, masks, sizes = mesh_lib.shard_batch(
        mesh, (batch.frames, batch.masks, batch.sizes))
    state, loss, lr = step_fn(state, root_key, 0, s,
                              frames, masks, sizes, None)
    losses.append(float(loss))

# --- host-sharded evaluate with cross-process metric reduction ---------
# Evaluated with a FRESH deterministic-seed state (identical across runs),
# so confusion counts must equal the single-process full-set run EXACTLY.
import numpy as np
from stf_unet_tpu.train.loop import eval_batches_from_index, evaluate

eval_state = create_train_state(jax.random.key(0), mc, optim, x0)
metrics = evaluate(
    eval_state, model,
    eval_batches_from_index(index, data_cfg, host_index=hi, num_hosts=hc),
    2, data_cfg=data_cfg, reduce_across_processes=True)

# --- coordinated checkpoint roundtrip of the trained sharded state -----
import os
from jax.experimental import multihost_utils
from stf_unet_tpu.train.checkpoint import CheckpointManager

ckpt = CheckpointManager(os.path.join(os.path.dirname(outfile), "ckpt"),
                         "unet")
ckpt.save_async("latest", state, epoch=0, best_dice=metrics["dice"])
ckpt.wait()
multihost_utils.sync_global_devices("ckpt_drain")
template = create_train_state(jax.random.key(7), mc, optim, x0)
restored, meta = ckpt.restore("latest", template)
restore_max_diff = max(
    float(jnp.max(jnp.abs(jnp.asarray(a) - b))) for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params)))
assert meta["epoch"] == 0

# --- multi-host stop agreement (train/preempt.py) ----------------------
# A preemption signal lands on ONE host; should_stop() must return the
# globally AGREED decision on every host (otherwise the survivors would
# deadlock inside the coordinated orbax save).
from stf_unet_tpu.train.preempt import PreemptionGuard
guard = PreemptionGuard(num_hosts=2)
stop_none = guard.should_stop()   # nobody wants to stop yet
if pid == 1:
    guard._event.set()            # "SIGTERM" on host 1 only
stop_one = guard.should_stop()    # ...now every host must agree True
guard.uninstall()

# --- r3-late composition: packed loader + EMA + grad accumulation ------
# (VERDICT r3 next-step 5) — the pack was built by the parent; each host
# serves its shard from the memmap, EMA folds into the fused step, and
# MultiSteps applies the optimizer every 2 micro-steps.
from stf_unet_tpu.data.pack import open_split_pack
pack = open_split_pack(root + "/pack", "train")
loader2 = HostLoader(index, batch_size=2, shuffle=True, seed=1, prefetch=0,
                     use_native=False, host_index=hi, num_hosts=hc,
                     pack=pack)
optim2 = make_optimizer(OptimConfig(), schedule, grad_accum=2)
state2 = create_train_state(jax.random.key(0), mc, optim2, x0, ema=True)
state2 = mesh_lib.replicate(mesh, state2)
step2 = make_train_step(model, optim2, schedule, 2, augment=augment,
                        ema_decay=0.5, ema_every_k=2)
losses2 = []
for ep in (0, 1):  # 2 batches/host/epoch -> 4 micro-steps = 2 applies
    for s, batch in enumerate(loader2.epoch(ep)):
        frames, masks, sizes = mesh_lib.shard_batch(
            mesh, (batch.frames, batch.masks, batch.sizes))
        state2, loss, _ = step2(state2, root_key, 10 + ep, s,
                                frames, masks, sizes, None)
        losses2.append(float(loss))
ema_sum = float(sum(jnp.sum(jnp.abs(l)) for l in
                    jax.tree_util.tree_leaves(state2.ema_params)))
param_sum = float(sum(jnp.sum(jnp.abs(l)) for l in
                      jax.tree_util.tree_leaves(state2.params)))

out = {
    "losses": losses,
    "confusion": np.asarray(metrics["confusion_matrix"]).tolist(),
    "dice": metrics["dice"],
    "restore_max_diff": restore_max_diff,
    "restored_step": int(restored.step),
    "stop_none": bool(stop_none),
    "stop_one": bool(stop_one),
    "losses2": losses2,
    "ema_sum": ema_sum,
    "param_sum": param_sum,
}
json.dump(out, open(outfile + f".{pid}", "w"))
if jax.process_index() == 0:
    json.dump(losses, open(outfile, "w"))
print(f"child {pid} ok: {losses}")
"""


@pytest.fixture(scope="module")
def mh_root(tmp_path_factory):
    """8 same-size slices so host-sharded loaders stay in lockstep."""
    root = str(tmp_path_factory.mktemp("mh"))
    rng = np.random.default_rng(1)
    base = os.path.join(root, "seg", "training")
    for k in range(8):
        patient = f"P{k:03d}"
        for seq in SEQS:
            d = os.path.join(base, "images", patient, seq)
            os.makedirs(d, exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (24, 24), dtype=np.uint8)
                            ).save(os.path.join(d, "s0.png"))
        md = os.path.join(base, "labels", patient, SEQS[0])
        os.makedirs(md, exist_ok=True)
        m = np.zeros((24, 24), np.uint8)
        m[6:14, 6:14] = 255
        Image.fromarray(m).save(os.path.join(md, "s0.png"))
    # pack for the composition phase (children open it read-only)
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.pack import write_pack
    write_pack(DatasetIndex(root, "train", SEQS),
               os.path.join(root, "pack", "train"))
    return root


def _single_process_reference(mh_root, n_steps=2):
    """Same global batches on a single-process 4-device mesh: the global
    array device order is [proc0 shard, proc1 shard], i.e. the concat of
    the two host-views of the seeded permutation."""
    import jax
    import jax.numpy as jnp
    from stf_unet_tpu.core import mesh as mesh_lib
    from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
    from stf_unet_tpu.core.prng import augment_key
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.loader import HostLoader
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    data_cfg = DataConfig(data_path=mh_root, base_size=24, crop_size=16)
    index = DatasetIndex(mh_root, "train", SEQS)
    loaders = [HostLoader(index, batch_size=2, shuffle=True, seed=0,
                          prefetch=0, use_native=False, host_index=i,
                          num_hosts=2) for i in range(2)]
    mesh = mesh_lib.create_mesh(4)
    mc = ModelConfig(model="unet", num_classes=1, time_steps=2, base_c=4)
    model = create_model(mc)
    schedule = warmup_poly_schedule(1e-3, 4, 2)
    optim = make_optimizer(OptimConfig(), schedule)
    augment = TrainAugment(data_cfg)
    x0 = jnp.zeros((4, 2, 16, 16, 1), jnp.float32)
    state = create_train_state(jax.random.key(0), mc, optim, x0)
    state = mesh_lib.replicate(mesh, state)
    step_fn = make_train_step(model, optim, schedule, 2, augment=augment)

    losses = []
    root_key = jax.random.key(42)
    for s, (b0, b1) in enumerate(zip(loaders[0].epoch(0),
                                     loaders[1].epoch(0))):
        if s >= n_steps:
            break
        frames = np.concatenate([b0.frames, b1.frames])
        masks = np.concatenate([b0.masks, b1.masks])
        sizes = np.concatenate([b0.sizes, b1.sizes])
        frames, masks, sizes = mesh_lib.shard_batch(mesh,
                                                    (frames, masks, sizes))
        state, loss, lr = step_fn(state, root_key, 0, s,
                                  frames, masks, sizes, None)
        losses.append(float(loss))

    # Full-set eval with the same fresh deterministic-seed state the
    # children use: the global-metric oracle for the host-sharded +
    # reduce_across_processes path.
    from stf_unet_tpu.train.loop import eval_batches_from_index, evaluate
    eval_state = create_train_state(jax.random.key(0), mc, optim, x0)
    metrics = evaluate(eval_state, model,
                       eval_batches_from_index(index, data_cfg),
                       2, data_cfg=data_cfg)

    # r3-late composition oracle: packed loader + EMA + grad accumulation
    # over the same global batches (concat of the two host views).
    from stf_unet_tpu.data.pack import open_split_pack
    pack = open_split_pack(os.path.join(mh_root, "pack"), "train")
    loaders2 = [HostLoader(index, batch_size=2, shuffle=True, seed=1,
                           prefetch=0, use_native=False, host_index=i,
                           num_hosts=2, pack=pack) for i in range(2)]
    optim2 = make_optimizer(OptimConfig(), schedule, grad_accum=2)
    state2 = create_train_state(jax.random.key(0), mc, optim2, x0, ema=True)
    state2 = mesh_lib.replicate(mesh, state2)
    step2 = make_train_step(model, optim2, schedule, 2, augment=augment,
                            ema_decay=0.5, ema_every_k=2)
    losses2 = []
    for ep in (0, 1):
        for s, (b0, b1) in enumerate(zip(loaders2[0].epoch(ep),
                                         loaders2[1].epoch(ep))):
            frames = np.concatenate([b0.frames, b1.frames])
            masks = np.concatenate([b0.masks, b1.masks])
            sizes = np.concatenate([b0.sizes, b1.sizes])
            frames, masks, sizes = mesh_lib.shard_batch(
                mesh, (frames, masks, sizes))
            state2, loss, _ = step2(state2, root_key, 10 + ep, s,
                                    frames, masks, sizes, None)
            losses2.append(float(loss))
    ema_sum = float(sum(jnp.sum(jnp.abs(l)) for l in
                        jax.tree_util.tree_leaves(state2.ema_params)))
    param_sum = float(sum(jnp.sum(jnp.abs(l)) for l in
                          jax.tree_util.tree_leaves(state2.params)))
    return losses, metrics, losses2, ema_sum, param_sum


def test_two_process_training_matches_single_process(mh_root, tmp_path):
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    script = str(tmp_path / "child.py")
    open(script, "w").write(CHILD)
    outfile = str(tmp_path / "losses.json")

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, script, mh_root, str(port), str(i), outfile],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out}"

    multi = json.load(open(outfile))
    assert len(multi) == 2 and all(np.isfinite(multi))

    (single, single_metrics, single_losses2, single_ema_sum,
     single_param_sum) = _single_process_reference(mh_root)
    # identical global batches + identical 4-way GSPMD partitioning -> the
    # losses agree to f32 noise; and step 2's loss depends on step 1's
    # gradient all-reduce, so agreement proves the update path too
    np.testing.assert_allclose(multi, single, rtol=0, atol=1e-5)

    # --- eval + checkpoint coverage (VERDICT r2 next-step 3) -------------
    per_proc = [json.load(open(outfile + f".{i}")) for i in range(2)]
    for i, d in enumerate(per_proc):
        # host-sharded eval + reduce_across_processes reproduces the
        # single-process full-set confusion EXACTLY (identical params,
        # disjoint record shards, integer count all-reduce)...
        np.testing.assert_array_equal(
            np.asarray(d["confusion"]),
            single_metrics["confusion_matrix"],
            err_msg=f"process {i} global confusion")
        # ...and dice to cross-process f32 summation-order noise
        assert d["dice"] == pytest.approx(single_metrics["dice"], abs=1e-6)
        # coordinated save_async -> restore roundtrip returned the trained
        # state bit-for-bit on EVERY process
        assert d["restore_max_diff"] == 0.0
        assert d["restored_step"] == 2
        # stop agreement: quiet -> nobody stops; a signal on ONE host ->
        # EVERY host agrees to stop (train/preempt.py)
        assert d["stop_none"] is False
        assert d["stop_one"] is True
    # both processes computed identical global metrics
    assert per_proc[0]["confusion"] == per_proc[1]["confusion"]
    assert per_proc[0]["dice"] == per_proc[1]["dice"]

    # --- r3-late composition: packed loader + EMA + grad-accum ----------
    # 4 micro-steps (2 optimizer applies) over the pack-served host shards
    # must reproduce the single-process oracle's losses and final
    # EMA/param checksums (VERDICT r3 next-step 5).
    for i, d in enumerate(per_proc):
        assert len(d["losses2"]) == 4, f"process {i} ran {d['losses2']}"
        np.testing.assert_allclose(d["losses2"], single_losses2,
                                   rtol=0, atol=1e-5,
                                   err_msg=f"process {i} composition losses")
        assert d["ema_sum"] == pytest.approx(single_ema_sum, rel=1e-5)
        assert d["param_sum"] == pytest.approx(single_param_sum, rel=1e-5)
    # the replicated composition state is identical on both processes
    assert per_proc[0]["ema_sum"] == pytest.approx(per_proc[1]["ema_sum"],
                                                   rel=1e-7)
