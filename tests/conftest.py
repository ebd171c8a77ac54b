"""Test harness: CPU-simulated 8-device mesh (SURVEY.md §4 item 3).

Must set env BEFORE importing jax anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the real chip
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Quick tier (`pytest -m quick`): one or two fast tests per subsystem, for
# the edit-verify loop. The FULL suite stays the round gate. Curated here
# (rather than decorating 40 files) so the tier is visible in one place.
# ---------------------------------------------------------------------------
QUICK_TESTS = {
    # data pipeline: index scan semantics + fused device augmentation
    "test_data.py::test_index_warn_and_skip",
    "test_data.py::test_augment_shapes_and_labels",
    "test_data.py::test_affine_warp_rotation_matches_pil",
    # models: shapes/heads for both families
    "test_models.py::test_unet_shapes_and_head",
    "test_models.py::test_stflstm_full_resolution_output",
    # losses / metrics: torch-oracle criterion + confusion/dice quirks
    "test_losses.py::test_criterion_ce_plus_dice",
    "test_metrics.py::test_confusion_update_matches_bincount",
    "test_metrics.py::test_eval_dice_union_zero_gives_one",
    # ops: LSTM scan vs torch oracle
    "test_ops.py::test_lstm_matches_torch",
    # schedule / early stop reference parity
    "test_schedule.py::test_schedule_matches_reference",
    # train orchestration: full train CLI on the synthetic tree
    "test_integration.py::test_train_cli_end_to_end",
    # data parallel: sharded step == single device on the 8-dev CPU mesh
    "test_sharding.py::test_sharded_step_matches_single_device",
    # PK: quadrature forward vs direct-loop oracle + LM recovery
    "test_pk.py::test_quadrature_matches_direct_loop",
    "test_pk.py::test_synthetic_parameter_recovery[lm]",
    # packs, eval batching, preemption/checkpoint
    "test_pack.py::test_pack_train_batches_byte_identical",
    "test_eval_batching.py::test_raw_uint8_eval_path_matches_host_normalized",
    "test_preemption.py::test_loader_skip_batches_matches_tail",
    # serving + quantization
    "test_serve.py::test_engine_matches_direct_forward",
    "test_quant.py::TestModelQuantization::test_unet_calibrate_and_quantize",
    # TTA / patient metrics (EMA is excluded: every test in test_ema.py
    # pays a ~50 s train-step compile on this 1-core host; the full suite
    # and the composition tests cover it)
    "test_tta.py::test_tta_equals_mean_of_flipped_forwards",
    "test_patient_metrics.py::TestHd95Assd::test_translated_square",
    # driver bench wiring: headline line must parse (smoke mode, CPU)
    "test_bench_smoke.py::test_bench_headline_smoke",
    # native loader, viz, doctor, plot, torch import
    "test_native_loader.py::test_decode_matches_pil",
    "test_viz.py::test_save_overlay_and_merge",
    "test_doctor.py::test_clean_tree_is_clean",
    "test_plot.py::test_parse_results_txt",
    "test_torch_import.py::test_strip_module_prefix",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid relative to tests/: "test_data.py::test_..."
        nodeid = item.nodeid.split("/")[-1]
        if nodeid in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    root = tmp_path_factory.mktemp("breadm")
    return make_synthetic_breadm(str(root), size=64, time_steps=8,
                                 patients_per_split=2, slices_per_patient=2)
