"""CLI end-to-end: flag surface, profiling stdout contract, exports."""

import os
import re
import subprocess
import sys

import pytest

ASSETS = "/root/reference/assets"
ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "VOXTPU_FORCE_CPU": "1",
    "PYTHONPATH": "/root/repo",
}


def run_cli(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "voxtpu.cli", *args, "--device", "cpu"],
        capture_output=True, text=True, cwd=cwd, env=ENV, timeout=600,
    )


def test_cli_voxelize_export(tmp_path):
    r = run_cli(
        [f"{ASSETS}/sphere.obj", "-n", "32", "-t", "1", "-e",
         "--out-dir", str(tmp_path / "out")],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    # profiling stdout contract: "[Label]: X ms"
    assert re.search(r"\[XlaVox\(sphere\.obj\)\]: [\d.]+ ms", r.stdout), r.stdout
    assert (tmp_path / "out" / "xla_sphere.obj").exists()


def test_cli_csg_and_sdf(tmp_path):
    r = run_cli(
        [f"{ASSETS}/sphere.obj", f"{ASSETS}/torus.obj", "-n", "32", "-t", "1",
         "-p", "1", "-s", "-e", "-o", "merged.obj",
         "--out-dir", str(tmp_path / "out")],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert re.search(r"\[XlaCSG\]: [\d.]+ ms", r.stdout)
    assert re.search(r"\[XlaJFA\]: [\d.]+ ms", r.stdout)
    assert (tmp_path / "out" / "csg_vox_xla_merged.obj").exists()
    assert (tmp_path / "out" / "sdf_xla_merged.obj").exists()
    assert (tmp_path / "out" / "sdf_point_cloud_xla_merged.obj").exists()


def test_cli_benchmark_mode(tmp_path):
    r = run_cli(
        [f"{ASSETS}/d20.obj", "-n", "32", "-t", "1", "-m", "3", "-p", "1"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    # 3 iterations -> 3 main vox lines
    assert len(re.findall(r"\[XlaVox\(d20\.obj\)\]", r.stdout)) == 3


def test_cli_reference_backend(tmp_path):
    r = run_cli(
        [f"{ASSETS}/d20.obj", "-n", "32", "-t", "0"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert re.search(r"\[RefVox\(d20\.obj\)\]", r.stdout)


def test_cli_errors(tmp_path):
    r = run_cli([], cwd=str(tmp_path))
    assert r.returncode != 0
    r = run_cli([f"{ASSETS}/d20.obj", "-b", "17"], cwd=str(tmp_path))
    assert r.returncode != 0
    assert "multiple of 16" in r.stderr
