"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before jax is imported (hence module-level, and tests never import
jax before conftest loads).
"""

import os

# Force CPU even if the environment wires up an accelerator plugin (e.g. a
# tunneled TPU that rewrites jax_platforms at import): the suite must be
# hermetic and provide 8 virtual devices for mesh tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module(request):
    """Full-suite stability: with ~200 tests' executables accumulated in
    one process, a later pjit COMPILE segfaults inside XLA:CPU
    (deterministic at test ~164, not reproducible in any file-level
    subset — an upstream compiler issue the suite can only avoid).
    Dropping the in-process caches between modules keeps the live
    executable count bounded; the persistent on-disk cache still
    amortizes recompiles. The smoke tier (-m "not slow", ~115 tests)
    never reaches the threshold and skips the clears (they cost ~15% in
    recompiles). MT_NO_CLEAR_CACHES=1 disables entirely (bisection)."""
    yield
    if os.environ.get("MT_NO_CLEAR_CACHES"):
        return
    if "not slow" in (request.config.option.markexpr or ""):
        return
    jax.clear_caches()


# ---------------------------------------------------------------------------
# Tiered suite (VERDICT r2 item 7): the full suite takes ~12 min of CPU
# compiles; `pytest -m "not slow"` is the <3-min smoke tier. Slow tests are
# centrally registered here by nodeid prefix (measured >=5s each on the 2-vCPU
# dev box) instead of per-file decorators, so the tier stays auditable in one
# place. A whole-file prefix marks every test in that file.
# ---------------------------------------------------------------------------
_SLOW_PREFIXES = (
    "tests/test_sharding.py",          # mesh compiles dominate (~155s)
    "tests/test_paged_sharding.py",    # mesh-sharded serving compiles
    "tests/test_quality_ladder.py",    # trained-checkpoint Δppl rung
    "tests/test_cache.py::TestWideCodes::test_wide_generate_e2e",
    "tests/test_checkpoint.py::test_session_resume_is_bit_identical",
    "tests/test_chunked_prefill.py::test_chunked_prefill_on_mesh_matches_single_device",
    "tests/test_chunked_prefill.py::test_chunked_prefill_opq_matches_flat",
    "tests/test_chunked_prefill.py::test_generate_chunked_prefill_with_mesh",
    "tests/test_chunked_prefill.py::test_generate_with_chunked_prefill",
    "tests/test_chunked_prefill.py::test_multi_chunk_tracks_flat_through_decode",
    "tests/test_cli.py::test_asymmetric_geometry_pipeline",
    "tests/test_cli.py::test_full_pipeline",
    "tests/test_cli.py::test_lm_eval_pipeline",
    "tests/test_cli.py::test_opq_pipeline",
    "tests/test_eval_harnesses.py::test_external_lm_eval_adapter_via_stub",
    "tests/test_eval_harnesses.py::test_hf_tokenizer_path_in_harnesses",
    "tests/test_eval_harnesses.py::test_speedtest_breakdown",
    "tests/test_model.py::test_pallas_mode_matches_ref_mode_dm8",
    "tests/test_paged_cache.py::test_paged_attention_matches_flat",
    "tests/test_paged_cache.py::test_paged_prefill_encodes",
    "tests/test_pallas_kernel.py::test_decode_step_bucketed_matches_full",
    "tests/test_pallas_kernel.py::test_kernel_direct_table_matches_oracle",
    "tests/test_pallas_kernel.py::test_kernel_dm4_direct_matches_oracle",
    "tests/test_pallas_kernel.py::test_kernel_matches_oracle",
    "tests/test_pallas_kernel.py::test_kernel_multiplane_matches_oracle",
    "tests/test_pallas_kernel.py::test_kernel_small_codebook",
    "tests/test_pallas_kernel.py::test_pack_decode_table_layout",
    "tests/test_pq_attention_ref.py::test_causal_attention_matches_loop",
    "tests/test_pq_attention_ref.py::test_pq_attention_matches_oracle",
    "tests/test_pq_core.py::test_opq_preserves_inner_products",
    "tests/test_pq_core.py::test_train_opq_improves_reconstruction",
    "tests/test_scheduler.py::test_scheduler_asymmetric_geometry",
    "tests/test_scheduler.py::test_scheduler_interleaves_different_lengths",
    "tests/test_scheduler.py::test_scheduler_matches_flat_pipeline",
    "tests/test_scheduler.py::test_scheduler_opq_matches_flat_pipeline",
    "tests/test_scheduler.py::test_scheduler_preemption_and_resume",
    "tests/test_scheduler.py::test_scheduler_skip_ahead_admission",
    "tests/test_scheduler.py::test_chunked_admission_matches_oneshot",
    "tests/test_scheduler.py::test_scheduler_long_prompt_chunked_admission",
    "tests/test_pallas_kernel.py::test_kernel_asymmetric_kv_geometry",
    "tests/test_pallas_kernel.py::test_kernel_merge_with_residual_matches_full",
    "tests/test_pallas_kernel.py::test_kernel_outlier_correction_matches_oracle",
    "tests/test_checkpoint.py::test_session_resume_across_flush_and_sampling_rng",
    "tests/test_model.py::test_outlier_mode_pq_vs_pallas_across_flush",
    "tests/test_model.py::test_opq_rotated_cache_matches_unrotated_exactly_in_residual",
    "tests/test_model.py::test_pallas_mode_matches_ref_mode_asymmetric",
    "tests/test_scheduler.py::test_scheduler_preemption_preserves_tokens",
    "tests/test_scheduler.py::test_scheduler_on_demand_paging_beats_worst_case",
    "tests/test_pq_core.py::test_outlier_channels_improve_reconstruction",
    "tests/test_pq_attention_ref.py::test_pq_attention_empty_residual",
    "tests/test_paged_cache.py::test_write_codes_roundtrip",
    # round-5 additions
    "tests/test_cli.py::test_outlier_pipeline",
    "tests/test_chunked_prefill.py::test_chunked_prefill_outlier_channels",
    "tests/test_scheduler.py::test_tick_chain_matches_single_tick",
    "tests/test_scheduler.py::test_tick_chain_eos_mid_chain",
    "tests/test_sharding.py::test_sharded_decode_outlier_channels",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if any(nodeid.startswith(p) for p in _SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)
