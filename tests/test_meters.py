"""Host-side meters/loggers (ref:train_and_eval.py:145-296) + JSONL logger."""

import json

from stf_unet_tpu.metrics.meters import AverageMeter, MetricLogger, SmoothedValue
from stf_unet_tpu.utils.profiling import JsonlLogger


def test_smoothed_value_stats():
    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.value == 4.0
    assert sv.max == 4.0
    assert sv.median == 3.0          # window holds [2,3,4]
    assert abs(sv.avg - 3.0) < 1e-9
    assert abs(sv.global_avg - 2.5) < 1e-9


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.count == 3
    assert abs(m.avg - 2.0) < 1e-9
    m.reset()
    assert m.count == 0


def test_metric_logger_log_every(capsys):
    logger = MetricLogger(delimiter="  ")
    logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    seen = []
    for item in logger.log_every(range(5), print_freq=2, header="Epoch: [0]"):
        logger.update(loss=float(item), lr=0.001)
        seen.append(item)
    assert seen == list(range(5))
    out = capsys.readouterr().out
    assert "Epoch: [0]" in out
    assert "eta:" in out and "Total time:" in out
    assert "loss:" in out and "lr:" in out


def test_metric_logger_getattr():
    logger = MetricLogger()
    logger.update(loss=2.0)
    assert logger.loss.global_avg == 2.0


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = JsonlLogger(path)
    log.log({"epoch": 0, "dice": 0.5})
    log.log({"epoch": 1, "dice": 0.75})
    lines = [json.loads(line) for line in open(path)]
    assert len(lines) == 2
    assert lines[1]["dice"] == 0.75
    assert "ts" in lines[0]


def test_jsonl_logger_disabled():
    JsonlLogger(None).log({"a": 1})  # no-op, no crash


def test_device_peak_memory_mb_none_or_float():
    from stf_unet_tpu.metrics.meters import device_peak_memory_mb
    mem = device_peak_memory_mb()
    assert mem is None or (isinstance(mem, float) and mem >= 0.0)


def test_log_every_prints_max_mem(monkeypatch, capsys):
    """Reference parity: 'max mem' appears in the step line when the device
    reports memory stats (ref:train_and_eval.py:250-285)."""
    from stf_unet_tpu.metrics import meters
    monkeypatch.setattr(meters, "device_peak_memory_mb", lambda: 123.4)
    logger = meters.MetricLogger()
    for _ in logger.log_every(range(3), print_freq=1, header="Test:"):
        logger.update(loss=1.0)
    out = capsys.readouterr().out
    assert "max mem: 123" in out


def test_log_every_omits_max_mem_when_unavailable(monkeypatch, capsys):
    from stf_unet_tpu.metrics import meters
    monkeypatch.setattr(meters, "device_peak_memory_mb", lambda: None)
    logger = meters.MetricLogger()
    for _ in logger.log_every(range(2), print_freq=1):
        pass
    assert "max mem" not in capsys.readouterr().out
