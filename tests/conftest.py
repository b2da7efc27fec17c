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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
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
