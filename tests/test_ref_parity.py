"""Differential parity vs the compiled reference WASM (requires node).

Skipped automatically when node or the reference artifacts are absent;
the frozen goldens in test_kernel_goldens.py still pin behavior then.
"""

import os
import shutil
import subprocess
import sys

import pytest

NODE = shutil.which("node")
REF_WASM = "/root/reference/lib/sax-wasm.wasm"

pytestmark = pytest.mark.skipif(
    NODE is None or not os.path.exists(REF_WASM),
    reason="node or reference wasm not available",
)


def test_unsplit_parity():
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/diff_ref.py"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "PARITY OK" in r.stdout
