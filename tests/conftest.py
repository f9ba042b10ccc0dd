import os
import sys
from pathlib import Path

# Tests validate bit-exactness against the double-precision reference, so they
# run on the CPU backend with x64 enabled (TPU has no f64).  A virtual
# 8-device mesh is exposed for sharding tests.  Note: this environment
# preimports jax and points JAX_PLATFORMS at the axon TPU tunnel via
# sitecustomize, so we must switch platforms through jax.config (env vars are
# read before conftest runs).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# cli.main() re-applies JAX_PLATFORMS from the environment (to undo site-hook
# platform hijacks); pin it to cpu so in-process CLI tests stay on CPU even
# when the session environment points at the axon TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import pytest  # noqa: E402

# Fast tier: `pytest -m "not slow"` must stay under ~3 min so every change
# can gate cheaply; the heavyweights (golden configs, PEAQ quality, full
# encode->decode loopbacks) run in the full suite.  Marked centrally here so
# test modules stay plain.
SLOW_MODULES = {
    "test_quality", "test_mp2_golden", "test_dabplus", "test_sbr",
    "test_ps", "test_aupack", "test_psy4", "test_blockswitch",
    "test_bitres", "test_pns", "test_churn", "test_cli", "test_edi",
    "test_dabplus_pad", "test_mp2_batch", "test_graft",
    "test_native_dabpack", "test_binpack", "test_fast_path",
    "test_framepack", "test_native_pack", "test_polyphase",
}
# individually-slow tests in otherwise-fast modules (measured >60 s, or
# demoted to keep the fast tier under its 3-minute promise; the full suite
# still runs them).  test_overfull_budget_never_overruns stays fast as the
# crash-recovery canary.
SLOW_TESTS = {
    ("test_inputs", "test_cli_restart_on_fault_counts"),
    ("test_inputs", "test_gst_pipeline_input_encodes"),
    ("test_inputs", "test_cli_input_fault_exit5"),
    ("test_recovery", "test_adversarial_stream_recovers_others_unchanged"),
}
# codec-correctness canaries promoted INTO the fast tier (one golden MP2
# config, one device-aupack byte-equivalence case) so the <3-min gate can
# catch a codec regression, not just infra breakage
FAST_OVERRIDES = {
    ("test_mp2_golden", "test_golden[music_48s_128_j_psy1]"),
    ("test_aupack", "test_device_pack_matches_host[False-case0]"),
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        mod = it.module.__name__.rsplit(".", 1)[-1]
        name = getattr(it, "originalname", None) or it.name
        if (mod, it.name) in FAST_OVERRIDES:
            continue
        if mod in SLOW_MODULES or (mod, name) in SLOW_TESTS:
            it.add_marker(pytest.mark.slow)
