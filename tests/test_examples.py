"""Every example runs end-to-end at small scale (the reference runs all
examples in CI with GROUP=examples, reference: test/runtests.jl:48-69)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = [
    "exact_time_inference.py",
    "exact_time_learning.py",
    "exact_space_time_inference.py",
    "exact_space_time_learning.py",
    "approx_space_time_inference.py",
    "approx_space_time_learning.py",
    "augmented_inference.py",
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", EXAMPLES)
def test_example(script):
    env = dict(os.environ)
    env["TGPS_SCALE"] = "small"
    env["TGPS_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script)],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.join(ROOT, "examples"),
        timeout=900,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
    assert "ok" in out.stdout
