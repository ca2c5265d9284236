"""The runnable demos stay runnable (tiny configs; seconds each)."""

import runpy
import sys

import pytest


def _run(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        with pytest.raises(SystemExit) as e:
            runpy.run_path(path, run_name="__main__")
        assert e.value.code in (0, None), f"{path} exited {e.value.code}"
    finally:
        sys.argv = old


def test_fit_vertices_example(capsys):
    _run("examples/fit_vertices.py",
         ["--n", "32", "--steps", "12", "--noise", "0.01"])
    out = capsys.readouterr().out
    assert "soft-IoU loss" in out


def test_csg_fit_parts_example(capsys):
    _run("examples/csg_fit_parts.py", ["--n", "32", "--steps", "16"])
    out = capsys.readouterr().out
    assert "improved" in out and "NOT improved" not in out
