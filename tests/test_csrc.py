"""Native runtime build test: configure + compile the csrc tree and run the
hardware-free camera/frame-source selftest binary.  Exercises the C++ side
of SURVEY.md §2.2 (PJRT runtime, serve app, camera sources) without a TPU
or a physical camera."""

import shutil
import subprocess

import pytest


@pytest.fixture(scope="session")
def csrc_build(tmp_path_factory):
    if shutil.which("cmake") is None or shutil.which("ninja") is None:
        pytest.skip("cmake/ninja not available")
    build = tmp_path_factory.mktemp("csrc_build")
    subprocess.run(
        ["cmake", "-S", "csrc", "-B", str(build), "-G", "Ninja"],
        check=True, capture_output=True, text=True,
    )
    subprocess.run(
        ["ninja", "-C", str(build)], check=True, capture_output=True, text=True,
    )
    return build


def test_csrc_builds(csrc_build):
    assert (csrc_build / "superpoint_serve").exists()
    assert (csrc_build / "camera_selftest").exists()


def test_camera_selftest(csrc_build):
    out = subprocess.run(
        [str(csrc_build / "camera_selftest")], capture_output=True, text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "camera selftest OK" in out.stdout


def test_serve_usage_and_missing_model(csrc_build):
    """CLI contract: bad flag prints usage (exit 2); a missing model dir is
    a clean fatal error (exit 1), not a crash."""
    usage = subprocess.run(
        [str(csrc_build / "superpoint_serve"), "--bogus"],
        capture_output=True, text=True, timeout=60,
    )
    assert usage.returncode == 2
    assert "--source" in usage.stderr
    missing = subprocess.run(
        [str(csrc_build / "superpoint_serve"), "--model", "/nonexistent"],
        capture_output=True, text=True, timeout=60,
    )
    assert missing.returncode == 1
    assert "FATAL" in missing.stderr
