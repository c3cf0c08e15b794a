"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md §7 / driver contract).
"""

import os

# Force CPU: the ambient environment may point JAX at the (single) TPU chip
# via JAX_PLATFORMS=axon; tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize hook force-sets jax_platforms="axon,cpu" at jax
# import; override it back to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Fast tier (`pytest -m fast`): the op/core/tooling unit tests — everything
# that doesn't build a full model graph. CI and pre-commit run this tier;
# the full model-parity suite (~18 min on one CPU) runs before release.
_FAST_MODULES = {
    "test_wts", "test_native_wts", "test_nms", "test_soft_nms",
    "test_preprocess", "test_preprocess_mm", "test_ocr_preprocess",
    "test_ocr_pipeline", "test_fused_stem", "test_gen_wts", "test_quant",
    "test_engine_export", "test_tasks", "test_roi_dcn", "test_pallas_kernels",
    "test_lenet", "test_small_models",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)
