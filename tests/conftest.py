"""Test harness configuration.

All tests run on CPU with 8 fake XLA devices so multi-device sharding tests
work without TPU hardware (SURVEY.md §5: the flags must be set in-process
BEFORE jax is imported — shell env vars did not take effect in this
environment).  This conftest is imported by pytest before any test module,
which makes it the one reliable place to do that.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

# Build the native host-data-path extension (bin_tpu._fastops) if this
# checkout doesn't have it yet: *.so is never committed, so a fresh clone
# starts without it and test_fastops.py::test_native_extension_built would
# fail.  Building here — before any test imports bin_tpu.data.fastops —
# means the import inside the package sees the freshly built module.
def _ensure_native_extension() -> None:
    import importlib.util
    import subprocess
    import sys

    if importlib.util.find_spec("bin_tpu._fastops") is not None:
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=repo, check=True, capture_output=True, timeout=600)
    except subprocess.CalledProcessError as e:  # surface the compiler error:
        # check=True alone swallows the captured stderr (ADVICE r3)
        raise RuntimeError(
            "building bin_tpu._fastops failed:\n"
            f"{(e.stderr or b'').decode(errors='replace')}") from e
    importlib.invalidate_caches()


_ensure_native_extension()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    d = jax.devices()
    assert len(d) == 8, f"expected 8 fake CPU devices, got {d}"
    return d
