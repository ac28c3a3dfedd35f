"""Test harness: force an 8-virtual-device CPU platform before JAX loads.

Multi-chip sharding tests run on a virtual CPU mesh (no TPU needed), per
SURVEY.md §4's consequence notes. Must set the env vars before the first
``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin and pins the platform
# programmatically, so the env var alone is not enough — override via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Fast/slow split (VERDICT r3 weak #7): the full suite takes ~17 min on the
# single CPU core. Tests measured >= ~5 s (pytest --durations, 2026-08-19)
# are auto-marked `slow`; `-m "not slow"` is the quick development gate
# (~5 min), the full run remains the CI gate. New long tests can either be
# added here or carry @pytest.mark.slow directly.
_SLOW_TESTS = {
    "test_window_refit_tightens_in_training_loop",
    "test_flow_step_runs_and_descends",
    "test_flow_loss_forced_pallas_matches_xla_windowed",
    "test_flow_learns_true_flow_on_shift_sequence",
    "test_flow_training_deterministic",
    "test_sr_train_auto_lr_and_batch",
    "test_resample2d_windowed_matches_plain",
    "test_banded_3x3_coupling_matches_xla",
    "test_graft_dryrun_multichip",
    "test_flow_train_writes_bounds_sidecar",
    "test_xlocal_full_pipeline_gradients_match_exact",
    "test_run_scenes_end_to_end",
    "test_flow_step_with_spatial_controller",
    "test_frame_interp_synthesizes_midframe",
    "test_flow_step_2d_domain_pair",
    "test_sr_loss_and_grads_match_torch",
    "test_flow_train_and_test_cli_flow",
    "test_splat_windowed_2d_matches_scatter",
    "test_flow_sp_matches_single_device",
    "test_flow_loss_with_windowed_splat_close_to_exact",
    "test_flow_spatial_controller_step_dp_matches_single",
    "test_resample_region_local_matches_static",
    "test_dense_block_fused_matches_concat_chain",
    "test_conv2d_shift_matches_conv2d",
    "test_flow_epe_against_gt",
    "test_spatial_flow_forward_routes_fused",
    "test_flow_gt_probe_respects_pinned_bounds",
    "test_spatial_progress_gates_low_loss_cells",
    "test_flow_state_checkpoint_roundtrip",
    "test_spatial_grid_paths_match_point_paths",
    "test_flow_train_loop_dp_with_val_epe",
    "test_sr_tp_grads_match_replicated",
    "test_sr_tp4_grads_match_replicated",
    "test_sr_tp_non_dividing_hidden_replicates",
    "test_flow_loss_with_windowed_warps_close_to_exact",
    "test_sr_train_and_test_cli_flow",
    "test_flow_train_profile_trace",
    "test_splat_windowed_fused_backward_matches_autodiff",
    "test_wandb_media_logging",
    "test_small_encoders_match",
    "test_fused_slab_mask_matches_xla",
    "test_flow_loss_auto_bounds_self_resolve",
    "test_spatial_flow_forward_routes_slab",
    "test_flow_step_2d_domain_spatial_controller",
    "test_run_flow_interpolate_writes_video",
    "test_gather_identity_views_preserves_image",
    "test_bench_flow_tuned_defaults_run",
    "test_flow_step_bf16_descends",
    "test_flow_imported_consts_survive_checkpoint_roundtrip",
    "test_gather_denoises_independent_noise",
    "test_flow_train_loop_with_pseudo_gt_producer",
    "test_resample_region_bf16_flow_image_grad",
    "test_fused_matches_xla_forward",
    "test_splat_region_local_matches_exact_scatter",
    "test_flow_loss_local_windows_close_to_exact",
    "test_fused3x3_grad",
    "test_flow_loss_gradients_match_torch",
    "test_splat_windowed_grads_match",
    "test_bench_tpu_step_runs_tiny",
    "test_softsplat_region_with_coverage_matches_xla",
    "test_sr_train_loop_dp_matches_single",
    "test_sr_train_loop_dp_ragged_tcr",
    "test_scene_space_cli_ops_end_to_end",
    "test_upstream_diff_tool_on_synth_artifacts",
    "test_raft_port_matches_committed_replica_golden",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.key(0)
