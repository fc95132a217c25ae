"""Run tests/test_pallas_step.py in a FRESH interpreter.

The fused-step kernel's interpret-mode compile is the largest XLA:CPU
program in the suite, and LLVM segfaults on it nondeterministically
when the compile happens late in a long-lived suite process on this
image (same crash site twice, always green standalone; the image's
XLA:CPU AOT kernels warn about mismatched host features at load).
tests/conftest.py therefore excludes test_pallas_step.py from in-process
collection and this delegator runs it in a subprocess, preserving full
coverage with process isolation.
"""

import os
import subprocess
import sys


def test_pallas_step_module_in_fresh_interpreter():
    path = os.path.join(os.path.dirname(__file__), "test_pallas_step.py")
    env = dict(os.environ, OBGC_PALLAS_STEP_SUBPROC="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", path],
        env=env, capture_output=True, text=True, timeout=1700,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, (
        "test_pallas_step.py failed in its subprocess:\n"
        + r.stdout[-4000:] + "\n" + r.stderr[-2000:])
