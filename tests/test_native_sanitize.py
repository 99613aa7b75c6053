"""Sanitizer build of the native C++ annealer (SURVEY §5 commitment).

Compiles the annealer plus a standalone exercise harness with
-fsanitize=address,undefined and runs it; any heap overflow, leak-on-
error-path, or undefined behavior fails the test.
"""

import os
import shutil
import subprocess
import sys

import pytest

_NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "safelife_tpu", "native")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
@pytest.mark.slow  # sanitizer rebuild of the C++ annealer (~40s)
def test_annealer_under_asan_ubsan(tmp_path):
    binary = str(tmp_path / "sanitize_check")
    build = subprocess.run(
        ["g++", "-g", "-O1", "-std=c++17",
         "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
         "-o", binary, os.path.join(_NATIVE, "sanitize_main.cpp")],
        capture_output=True, text=True)
    assert build.returncode == 0, build.stderr[-3000:]
    run = subprocess.run([binary], capture_output=True, text=True,
                         timeout=300)
    sys.stderr.write(run.stderr[-2000:])
    assert run.returncode == 0, run.stdout + run.stderr[-3000:]
    assert "SANITIZE_OK" in run.stdout
