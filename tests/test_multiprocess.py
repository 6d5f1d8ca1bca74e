"""Two-process jax.distributed runtime test (VERDICT.md round-2 next #7).

Spawns 2 real processes (2 CPU devices each -> a 4-device global mesh)
running tests/_mp_worker.py, which covers the multi-host DataLoader
batch-assembly branch and the checkpoint marker/restore contract —
paths that process_count()==1 tests can never reach.
"""

import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    ckdir = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers provision their own devices
    # Hermetic import: the workers run as scripts (script dir on
    # sys.path, not cwd), so make the repo root importable regardless
    # of whether the package is pip-installed in this environment.
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(_ROOT, "tests", "_mp_worker.py"),
                str(pid),
                "2",
                coord,
                ckdir,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=_ROOT,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process workers timed out\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        assert "WORKER_OK" in out
