"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is unit-testable without a pod via
xla_force_host_platform_device_count (SURVEY.md section 4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# oracle tests compare against float64 references; production arrays are
# created explicitly float32, so enabling x64 here does not change them
jax.config.update("jax_enable_x64", True)


# Full-suite process isolation: one process accumulating all ~90 compiled
# programs hit intermittent XLA CPU compiler segfaults late in the session
# (round 2, ~test 68, inside backend_compile_and_load; the same tests pass
# in isolation).  Rather than the round-2 workaround (a module-scope
# jax.clear_caches() fixture), the suite now distributes MODULES across
# worker processes (pytest-xdist loadscope, pyproject addopts), bounding
# each process's live-executable population structurally.  Tests within a
# module still share cached compilations.


# ---- quick tier (`pytest -m quick`, ~minutes) --------------------------
# The full suite is ~85 min on this box (round-5 measured, 123 tests); the
# inner loop needs a fast tier.  Marking is by EXCLUSION: every test is
# `quick` unless its base name is in the measured-slow set below (>= ~60 s
# in the round-5 full-suite --durations run; parametrized variants share
# the base name).  New tests are quick by default — if one turns out slow,
# add its name here.
_SLOW_TESTS = {
    "test_sqp_fused_dz_matches_split",
    "test_pipelined_closed_loop_exit_fidelity_rnorm",
    "test_sharded_full_sqp_fused_matches_single_device",
    "test_batched_fused_sharded_matches_unsharded",
    "test_fused_kkt_schur_matches_xla",
    "test_batched_fused_ondevice_scan_matches_vmap",
    "test_pcg_dz_fused_epilogue_matches_split_kernels",
    "test_pcr_pallas_sqp_path",
    "test_fused_sqp_matches_unfused",
    "test_fused_kkt_schur_launder_path_matches_xla",
    "test_pcr_pallas_matches_xla",
    "test_batched_solver_matches_loop",
    "test_batched_fused_sqp_matches_vmap",
    "test_eisenstat_walker_forcing",
    "test_batched_kkt_schur_matches_unbatched",
    "test_ondevice_sim_adaptive_knot_sharded_matches_single_device",
    "test_stair2_with_pcg_pallas_falls_back_to_xla_pcg",
    "test_ondevice_batched_sim_instance_sharded_matches_unsharded",
    "test_qdldl_host_matches_ondevice_ldl_closed_loop",
    "test_batched_ondevice_sim",
    "test_slab_kernel_matches_full_kernel",
    "test_kkt_pallas_wrap_matches_xla",
    "test_sharded_full_sqp_other_preconditioners",
    "test_pcg_and_ldl_paths_agree",
    "test_matches_xla_build_kkt",
    "test_gspmd_sharded_batched_solve_runs",
    "test_sharded_full_sqp_matches_single_device",
    "test_ondevice_sim_knot_sharded_matches_single_device",
    "test_full_sqp_on_three_link_arm",
    "test_double_precision_solve",
    "test_terminal_eval_quirk",
    "test_two_process_distributed_pcg",
    "test_resume_continues_mpc",
    "test_closed_loop_ldl_matches_pcg_roughly",
    "test_time_budget_ondevice",
    "test_rnorm_exit_criterion_sharded",
    "test_sharded_full_sqp_iter_budget",
    "test_ondevice_sim_matches_host_loop",
    "test_sharded_pcg_pipelined_exit_criteria",
    "test_merit_pallas_wrap_matches_xla",
    "test_ondevice_adaptive_frequency_sim",
    "test_pcr_exact_f64",
    "test_sharded_pcg_matches_single_device",
    "test_pcr_refined_beats_capped_pcg_f32",
    "test_csr_feeds_direct_solver_cross_check",
    "test_sqp_decreases_merit_pcg",
    "test_sqp_near_feasible_start_accepts_small_steps",
    "test_sharded_pcg_pipelined_collective_budget",
    "test_joint_mode_sqp_regulates_to_reference",
    "test_closed_loop_tracking_short",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        base = item.name.split("[")[0]
        if base not in _SLOW_TESTS:
            item.add_marker(_pytest.mark.quick)
