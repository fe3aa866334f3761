"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of "test multi-node without a cluster"
(SURVEY.md §4b): XLA exposes 8 host devices so sharding/collective code paths
are exercised for real, without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# The host image pins JAX_PLATFORMS=axon via sitecustomize; a config update
# after import is the only reliable override.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("PNTPU_TEST_PLATFORM", "cpu"))


# ---------------------------------------------------------------------------
# Smoke subset: one fast test per subsystem, runnable as `pytest -m smoke`
# in <3 min on a 1-CPU box (the full 200+-test suite cannot finish there —
# the failure class that produced an empty BENCH_r02). Centralized here so
# the subset is visible and auditable in one place.
SMOKE = {
    ("test_ops.py", "test_lce_ce_mean_and_sum"),
    ("test_ops.py", "test_margin_mse_matches_torch_reference"),
    ("test_curriculum.py", "test_eta_update_is_jittable_and_matches_manual_grad"),
    ("test_data.py", "test_prompt_assembly_matches_direct_tokenization"),
    ("test_mesh.py", "test_shard_batch_and_replicated"),
    ("test_index.py", "test_dense_index_sharded_matches_single"),
    ("test_eval.py", "test_experiment_paired_comparison"),
    ("test_distill.py", "test_teacher_scores_normalized_and_gt_channel"),
    ("test_train.py", "test_lce_training_with_sampled_negatives"),
    ("test_online.py", "test_online_step_runs_and_trains"),
    ("test_cli.py", "test_load_run_restores_params"),
    ("test_t5_parity.py", "test_jit_and_grad_run"),
    ("test_bm25.py", "test_bm25_native_matches_python_oracle"),
    ("test_porter.py", "test_native_stemmer_matches_python_twin"),
    ("test_resume.py", "test_auto_resume_continues_run"),
}


def pytest_collection_modifyitems(config, items):
    import pytest

    matched = set()
    for item in items:
        name = item.name.split("[")[0]
        fname = item.fspath.basename if hasattr(item, "fspath") else ""
        if (fname, name) in SMOKE:
            item.add_marker(pytest.mark.smoke)
            matched.add((fname, name))
    # When the whole suite is collected, every SMOKE entry must resolve —
    # otherwise a rename silently shrinks the advertised per-subsystem
    # coverage with no signal (fail loudly instead).
    collected_files = {
        item.fspath.basename for item in items if hasattr(item, "fspath")
    }
    stale = {
        pair for pair in SMOKE - matched if pair[0] in collected_files
    }
    if stale:
        raise pytest.UsageError(
            f"smoke subset entries no longer match any test: {sorted(stale)} "
            "— update SMOKE in tests/conftest.py"
        )
