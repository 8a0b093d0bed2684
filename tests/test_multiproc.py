"""In-suite multi-process `jax.distributed` parity check (SURVEY §2.3/§4).

Promotes `scripts/multiproc_sweep_check.py` from script-only evidence into
the suite: the same randomized sweep runs once as 1 process × 8 virtual
devices and once as 2 processes × 4 devices with a localhost coordinator
and in-graph cross-process statistic reductions; published statistics must
match.  Skipped when the coordinator port is unavailable (e.g. another
instance running) — the script remains runnable standalone.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multiproc_sweep_check.py")
PORT = 45689


def _port_free(port: int) -> bool:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        try:
            s.bind(("127.0.0.1", port))
            return True
        except OSError:
            return False


def test_two_process_sweep_matches_single_process():
    if not _port_free(PORT):
        pytest.skip(f"coordinator port {PORT} unavailable")
    env = dict(os.environ, MULTIPROC_CHECK_PORT=str(PORT))
    # Children manage their own XLA device counts; drop the suite's flag.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--n", "4", "--steps", "10"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "MULTIPROC SWEEP PARITY OK" in proc.stdout, proc.stdout[-2000:]
