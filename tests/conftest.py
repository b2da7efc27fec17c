"""Test configuration: force an 8-device virtual CPU platform.

This emulates a multi-chip TPU mesh on CPU (the TPU-world replacement for a
fake backend), so sharding/collective tests run everywhere. Real-TPU kernel
parity tests live behind the `tpu` marker and are skipped on CPU.

Note: this environment's sitecustomize registers an `axon` TPU PJRT plugin at
interpreter start and force-sets jax_platforms="axon,cpu", so we must override
the config *after* importing jax (env vars alone are ignored) and clear any
initialized backends. Keeping tests on CPU also avoids deadlocking on the
single tunneled TPU chip when a benchmark runs concurrently.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compilation cache, shared by every test AND the CLI
# subprocesses (test_multiprocess_cpu et al. inherit the env var): the
# CLI-shaped tests rebuild identical train-step programs through fresh jit
# closures, so without this each invocation recompiles the same HLO
# (~15-40 s per compile on this 2-core box — the bulk of the suite's wall
# clock). Keyed by HLO hash; stale entries are harmless.
_CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:  # pragma: no cover - defensive: jax internals move
    pass

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    skip_tpu = pytest.mark.skip(reason="no TPU available")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
