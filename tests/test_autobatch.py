"""--batch-size auto: AOT memory-analysis batch sizing (train/autobatch)."""

import numpy as np
import pytest

from stf_unet_tpu.core.config import (DataConfig, ModelConfig, TrainConfig,
                                      parse_config)
from stf_unet_tpu.train.autobatch import measure_step_memory, pick_batch_size


def _tiny_cfg():
    return TrainConfig(
        model=ModelConfig(model="unet", num_classes=1, base_c=4,
                          time_steps=4),
        data=DataConfig(base_size=40, crop_size=32),
        batch_size=0)


def test_parse_batch_size_auto():
    cfg = parse_config(["--batch-size", "auto"])
    assert cfg.batch_size == 0
    cfg = parse_config(["--batch-size", "8"])
    assert cfg.batch_size == 8
    # PKConfig's batch_size field must not be affected by the auto spelling
    with pytest.raises(SystemExit):
        parse_config(["--pk-batch-size", "auto"])


def test_memory_scales_linearly_in_batch():
    cfg = _tiny_cfg()
    t2, s2 = measure_step_memory(cfg, 4, 2)
    t4, s4 = measure_step_memory(cfg, 4, 4)
    t8, s8 = measure_step_memory(cfg, 4, 8)
    assert s2 == s4 == s8  # state bytes are batch-independent
    per_24 = (t4 - t2) / 2
    per_48 = (t8 - t4) / 4
    assert per_24 > 0
    # linearity within 25% (layout padding wiggles the intercept)
    assert abs(per_48 - per_24) / per_24 < 0.25


def test_pick_batch_size_tracks_budget_and_shards():
    cfg = _tiny_cfg()
    small = pick_batch_size(cfg, 4, budget_bytes=1 << 28)   # 256 MiB
    large = pick_batch_size(cfg, 4, budget_bytes=1 << 31)   # 2 GiB
    assert small >= 1 and large > small
    assert small & (small - 1) == 0 and large & (large - 1) == 0
    sharded = pick_batch_size(cfg, 4, n_shards=8, budget_bytes=1 << 28)
    assert sharded == 8 * small

    with pytest.raises(RuntimeError, match="does not fit"):
        pick_batch_size(cfg, 4, budget_bytes=1 << 20)  # 1 MiB: nothing fits


def test_probe_honors_canvas_and_ema():
    """The probe must measure the REAL program: a larger dataset canvas
    grows the per-sample temp bytes (the warp casts the whole canvas),
    and EMA training grows the batch-independent state bytes by ~one
    f32 params copy."""
    import dataclasses

    from stf_unet_tpu.core.config import OptimConfig

    cfg = _tiny_cfg()
    t_small, s_small = measure_step_memory(cfg, 4, 2, canvas=(40, 40))
    t_big, _ = measure_step_memory(cfg, 4, 2, canvas=(96, 96))
    assert t_big > t_small  # canvas-proportional temps are measured

    ema_cfg = dataclasses.replace(cfg, optim=OptimConfig(ema_decay=0.999))
    _, s_ema = measure_step_memory(ema_cfg, 4, 2, canvas=(40, 40))
    assert s_ema > s_small  # the EMA params copy is budgeted
