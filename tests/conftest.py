"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import — pytest imports conftest before test modules,
so setting the env vars here is sufficient as long as no test module imports
jax at collection time outside a fixture/test body.
"""

import os

# Hard-set (not setdefault): the image exports JAX_PLATFORMS=axon (the real
# TPU tunnel) and its sitecustomize additionally calls
# jax.config.update("jax_platforms", "axon,cpu") in every interpreter — so
# the env var alone is NOT enough; we must update jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
DATA_PDF = pathlib.Path("/root/reference/data/2308.07633v4-clean.pdf")
DATA_QA = pathlib.Path("/root/reference/data/2308.07633v4-qa.json")


@pytest.fixture(scope="session")
def corpus_pdf() -> pathlib.Path:
    if not DATA_PDF.exists():
        pytest.skip("bundled corpus PDF not available")
    return DATA_PDF


@pytest.fixture(scope="session")
def qa_path() -> pathlib.Path:
    if not DATA_QA.exists():
        pytest.skip("bundled QA set not available")
    return DATA_QA
