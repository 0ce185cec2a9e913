"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding paths
(mic_tpu.parallel / mic_tpu.tpu) are exercised without TPU hardware, per
the project test strategy (SURVEY.md §4, §7).
"""

import os

# Force the virtual 8-device CPU mesh regardless of the ambient
# environment.  TPU runner images pre-register a tunneled TPU plugin via
# sitecustomize and pin jax's platform config to it (plain JAX_PLATFORMS
# env overrides are ignored); tests must not contend for the single TPU,
# so override the jax config directly before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# MIC_TPU_TEST_TPU=1 keeps the real TPU backend so the compiled-kernel
# gate (-m device_compiled, run from benchmarks/tpu_session.py) can
# exercise Mosaic-compiled kernels; everything else runs on the virtual
# CPU mesh.
if os.environ.get("MIC_TPU_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE_TESTDATA = Path("/root/reference/testdata")


def _load_bin(name: str, rows: int, cols: int):
    p = REFERENCE_TESTDATA / name
    if not p.exists():
        pytest.skip(f"missing test data {name}")
    px = np.fromfile(p, dtype="<u2", count=rows * cols)
    return px, rows, cols, int(px.max())


@pytest.fixture(scope="session")
def mr_image():
    """MR 256x256 16-bit (testdata/MR_256_256_image.bin)."""
    return _load_bin("MR_256_256_image.bin", 256, 256)


@pytest.fixture(scope="session")
def ct_image():
    """CT 512x512 16-bit (testdata/CT_512_512_image.bin)."""
    return _load_bin("CT_512_512_image.bin", 512, 512)


@pytest.fixture(scope="session")
def dicom_images():
    """NEMA compsamples greyscale DICOMs present in the snapshot."""
    from mic_tpu.utils.dicom import read_dicom

    ref = REFERENCE_TESTDATA / "compsamples_refanddir" / "IMAGES" / "REF"
    if not ref.exists():
        pytest.skip("missing compsamples")
    out = {}
    for name in ["CT1_UNC", "CT2_UNC", "MR1_UNC", "MR2_UNC", "MR3_UNC",
                 "MR4_UNC", "NM1_UNC", "XA1_UNC"]:
        p = ref / name
        if p.exists():
            try:
                img = read_dicom(str(p))
                if img.samples_per_pixel == 1:
                    out[name] = img
            except Exception:
                pass
    if not out:
        pytest.skip("no parseable DICOMs")
    return out


@pytest.fixture(scope="session")
def rgb_tissue():
    """512x384 interleaved RGB synthetic tissue (testdata/wsi_tissue_512x384.rgb)."""
    p = REFERENCE_TESTDATA / "wsi_tissue_512x384.rgb"
    if not p.exists():
        pytest.skip("missing wsi tissue data")
    data = np.fromfile(p, dtype=np.uint8)
    return data, 512, 384


@pytest.fixture(scope="session")
def rgb_dicom():
    """US1 RGB ultrasound DICOM (NEMA compsamples)."""
    from mic_tpu.utils.dicom import read_dicom

    p = REFERENCE_TESTDATA / "compsamples_refanddir" / "IMAGES" / "REF" / "US1_UNC"
    if not p.exists():
        pytest.skip("missing US1 DICOM")
    img = read_dicom(str(p))
    if img.samples_per_pixel != 3:
        pytest.skip("US1 not RGB?")
    return img


@pytest.fixture()
def rng():
    # Function-scoped with a fixed seed: each test sees the same stream
    # regardless of execution order or new tests being added.
    return np.random.default_rng(1234)
