"""Multi-host execution: two real jax.distributed processes on CPU.

Covers what the in-process 8-device mesh can't: cross-process collectives,
`jax.make_array_from_process_local_data` batch assembly, broadcast of
replicated entries, and the Executor._joined even-stepping guarantee with
UNEVEN per-host batch counts (the reference's `model.join` analog,
`wenet/utils/executor.py:47-52`) — this deadlocked before _joined existed.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_uneven_batches():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device split
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i}: steps=2 OK" in out
        assert f"proc{i}: decode OK" in out
    # Both processes must materialize the IDENTICAL full decode results
    # (the sharded-decode pod contract: every host holds every utterance).
    fps = [[ln for ln in out.splitlines() if ln.startswith("decode_fp ")]
           for out in outs]
    assert fps[0] and fps[0] == fps[1], fps
