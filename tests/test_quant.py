"""int8 post-training quantization (ops/quant.py, cli/quantize.py).

No reference counterpart — the reference serves/quantizes nothing; these
tests pin the scheme's numerics (symmetric per-channel weights, static
per-tensor activations, s8xs8->s32 accumulation) and its integration
contracts (evaluate(), the serving engine, mesh replication).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_unet_tpu.core.config import DataConfig, ModelConfig
from stf_unet_tpu.models.registry import create_model, preprocess_input
from stf_unet_tpu.ops import quant


def _unet(num_classes=1, base_c=8, time_steps=4):
    return create_model(ModelConfig(model="unet", num_classes=num_classes,
                                    base_c=base_c, time_steps=time_steps))


def _init_unet(model, batch=2, size=32, time_steps=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(batch, time_steps, size, size, 1))
                    .astype(np.float32))
    xin = preprocess_input(x, model)
    variables = model.init(jax.random.key(0), xin, train=False)
    return variables, xin


class TestQuantizedConv:
    @pytest.mark.parametrize("kernel,stride,padding", [
        ((3, 3), 1, 1),      # the UNet/ResNet body conv
        ((3, 3), 2, 1),      # ResNet downsampling conv
        ((7, 7), 2, 3),      # ResNet stem
        ((1, 1), 1, "SAME"),  # fusion / head convs
    ])
    def test_matches_float_within_tolerance(self, kernel, stride, padding):
        import flax.linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(8, kernel, strides=stride, padding=padding,
                               name="c")(x)

        m = M()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        ref = m.apply(v, x)

        scales = quant.calibrate(m, v, [x], apply_kwargs={})
        assert list(scales) == ["c"]
        qv = quant.quantize_variables(v, scales)
        out = quant.QuantizedModel(m).apply(qv, x)
        assert out.shape == ref.shape and out.dtype == ref.dtype
        err = (np.abs(np.asarray(out) - np.asarray(ref)).mean()
               / (np.abs(np.asarray(ref)).mean() + 1e-8))
        assert err < 0.03, err

    def test_kernel_quantization_per_out_channel(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
        w[..., 3] *= 100.0  # one loud channel must not crush the others
        wq, sw = quant.quantize_kernel(jnp.asarray(w))
        assert wq.dtype == jnp.int8 and sw.shape == (8,)
        back = np.asarray(wq, np.float32) * np.asarray(sw)
        for c in range(8):
            denom = np.abs(w[..., c]).max()
            assert np.abs(back[..., c] - w[..., c]).max() / denom < 0.005


class TestModelQuantization:
    def test_unet_calibrate_and_quantize(self):
        model = _unet()
        variables, xin = _init_unet(model)
        scales = quant.calibrate(model, variables, [xin])
        # every nn.Conv in the graph calibrates (UNet: enc/bottleneck/dec
        # DoubleConvs x2 + out head)
        assert len(scales) == 19
        assert all(v > 0 for v in scales.values())

        qvars = quant.quantize_variables(variables, scales)
        ref = np.asarray(model.apply(variables, xin, train=False)["out"])
        out = np.asarray(quant.QuantizedModel(model).apply(
            qvars, xin, train=False)["out"])
        err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
        agree = (np.argmax(out, -1) == np.argmax(ref, -1)).mean()
        assert err < 0.06, err
        assert agree > 0.98, agree

    def test_flagship_stflstm_calibrate_and_quantize(self):
        """The STF-LSTM-UNet quantizes through the folded B*T encoder,
        per-scale LSTM fusion convs, decoder and head — every nn.Conv
        calibrates; the LSTM itself stays float."""
        model = create_model(ModelConfig(model="stflstm", num_classes=1,
                                         base_c=4, time_steps=2))
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 1))
                        .astype(np.float32))
        xin = preprocess_input(x, model)
        variables = model.init(jax.random.key(0), xin, train=False)
        scales = quant.calibrate(model, variables, [xin])
        assert len(scales) == 48
        qvars = quant.quantize_variables(variables, scales)
        ref = np.asarray(model.apply(variables, xin, train=False)["out"])
        out = np.asarray(quant.QuantizedModel(model).apply(
            qvars, xin, train=False)["out"])
        agree = (np.argmax(out, -1) == np.argmax(ref, -1)).mean()
        assert agree > 0.97, agree

    def test_exclude_falls_back_to_exact_float(self):
        model = _unet()
        variables, xin = _init_unet(model)
        scales = quant.calibrate(model, variables, [xin])
        qvars = quant.quantize_variables(variables, scales,
                                         exclude=tuple(scales))
        assert qvars["quant"] == {}
        ref = model.apply(variables, xin, train=False)["out"]
        out = quant.QuantizedModel(model).apply(qvars, xin, train=False)["out"]
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_scales_json_roundtrip(self, tmp_path):
        scales = {"enc1/conv1/conv": 3.25, "out_conv": 0.125}
        path = str(tmp_path / "quant_scales.json")
        quant.save_scales(path, scales)
        assert quant.load_scales(path) == scales
        with pytest.raises(ValueError):
            quant.save_scales(path, scales)  # rewrite ok
            with open(path, "w") as f:
                f.write("{}")
            quant.load_scales(path)

    def test_quantized_model_delegates_attrs(self):
        model = _unet(num_classes=3)
        q = quant.QuantizedModel(model)
        assert q.num_classes == model.num_classes
        assert q.input_format == model.input_format


class TestIntegration:
    def test_quantized_evaluate_under_mesh_matches_unmeshed(self):
        """int8 eval sharded over the 8-device mesh == unmeshed int8 eval
        (the --data-parallel + --dtype int8 serving combination)."""
        from stf_unet_tpu.core.mesh import create_mesh
        from stf_unet_tpu.train.loop import evaluate

        model = _unet()
        variables, xin = _init_unet(model)
        scales = quant.calibrate(model, variables, [xin])
        qvars = quant.quantize_variables(variables, scales)
        qmodel = quant.QuantizedModel(model)

        rng = np.random.default_rng(3)
        img = rng.normal(size=(8, 4, 32, 32, 1)).astype(np.float32)
        tgt = (rng.random((8, 32, 32)) > 0.7).astype(np.int32)

        class S:
            def variables(self):
                return qvars

        r1 = evaluate(S(), qmodel, [(img, tgt)], 2)
        r2 = evaluate(S(), qmodel, [(img, tgt)], 2, mesh=create_mesh(8))
        np.testing.assert_array_equal(r1["confusion_matrix"],
                                      r2["confusion_matrix"])
        assert abs(r1["dice"] - r2["dice"]) < 1e-6

    def test_serving_engine_int8(self):
        """InferenceEngine with a QuantizedModel serves masks that match
        the direct quantized forward (the cli/serve --dtype int8 path)."""
        from stf_unet_tpu.data.transforms import normalize
        from stf_unet_tpu.serve.engine import InferenceEngine

        data_cfg = DataConfig()
        model = _unet()
        variables, xin = _init_unet(model)
        scales = quant.calibrate(model, variables, [xin])
        qvars = quant.quantize_variables(variables, scales)
        qmodel = quant.QuantizedModel(model)

        engine = InferenceEngine(qmodel, qvars, data_cfg.mean, data_cfg.std,
                                 max_batch=4)
        rng = np.random.default_rng(4)
        images = rng.integers(0, 256, (2, 4, 32, 32, 1), dtype=np.uint8)
        masks = engine.predict(images)
        x = normalize(jnp.asarray(images), data_cfg.mean, data_cfg.std)
        logits = qmodel.apply(qvars, preprocess_input(x, model),
                              train=False)["out"]
        np.testing.assert_array_equal(masks,
                                      np.argmax(np.asarray(logits), -1))

    def test_quantize_cli_end_to_end(self, tmp_path):
        """cli/quantize on a trained-for-one-epoch checkpoint: writes the
        scales sidecar and reports a small dice delta; cli/serve's int8
        loading contract (scales_path_for) finds the file."""
        from stf_unet_tpu.cli import quantize as quantize_cli
        from stf_unet_tpu.cli import train as train_cli
        from stf_unet_tpu.core import config as config_lib
        from stf_unet_tpu.data.synthetic import make_synthetic_breadm

        root = str(tmp_path / "data")
        make_synthetic_breadm(root, size=40, time_steps=8)
        cfg = config_lib.parse_config([
            "--data-path", root, "--model", "unet", "--epochs", "1",
            "--batch-size", "2", "--model-base-c", "4",
            "--data-base-size", "40", "--data-crop-size", "32",
            "--save-dir", str(tmp_path / "w"),
            "--output-dir", str(tmp_path / "o")])
        train_cli.main(cfg)

        res = quantize_cli.main([
            "--model", "unet", "--model-dir", str(tmp_path / "w"),
            "--root", root, "--calib-samples", "4", "--batch-size", "2",
            "--threshold-sweep"])
        assert os.path.exists(res["scales_path"])
        assert res["num_convs"] == 19
        assert abs(res["dice_delta"]) < 0.05
        # operating-point shift report (VERDICT r3 #6): both forwards
        # swept, best points carried in the result
        for key in ("best_float", "best_int8"):
            assert 0.0 <= res[key]["threshold"] <= 1.0
            assert 0.0 <= res[key]["dice"] <= 1.0


def test_scales_staleness_warning(tmp_path, capsys):
    """Scales carry the calibrated checkpoint's identity; loading against
    a retrained checkpoint warns loudly (the printed accuracy delta no
    longer applies)."""
    path = str(tmp_path / "quant_scales.json")
    quant.save_scales(path, {"c": 1.0},
                      checkpoint_meta={"epoch": 3, "best_dice": 0.9})
    quant.load_scales(path, checkpoint_meta={"epoch": 3, "best_dice": 0.9})
    assert "WARNING" not in capsys.readouterr().out
    quant.load_scales(path, checkpoint_meta={"epoch": 7, "best_dice": 0.95})
    assert "re-run cli/quantize" in capsys.readouterr().out
    # legacy files without identity load silently
    quant.save_scales(path, {"c": 1.0})
    quant.load_scales(path, checkpoint_meta={"epoch": 7})
    assert "WARNING" not in capsys.readouterr().out
