"""Two-program coupling transport (reference: ServerCoupling.py:28-41
Open_port/Accept/Connect + per-timestep array exchange)."""

import os
import subprocess
import sys
import threading

import numpy as np
import pytest

from fvm_tpu.parallel.coupling import CouplingClient, CouplingServer


def test_coupling_roundtrip():
    """Named-array frames survive the pipe bit-exactly, both directions,
    multiple messages, mixed dtypes/shapes."""
    srv = CouplingServer()
    host, port = srv.address
    result = {}

    def server_side():
        srv.accept(timeout=30)
        m = srv.recv()
        srv.send(echo=m["a"] * 2, tag=np.int32(7))
        result["got"] = m

    t = threading.Thread(target=server_side)
    t.start()
    cli = CouplingClient(host, port)
    a = np.random.default_rng(0).standard_normal((37, 3))
    b = np.arange(5, dtype=np.int64)
    cli.send(a=a, b=b)
    back = cli.recv()
    t.join(timeout=30)
    np.testing.assert_array_equal(result["got"]["a"], a)
    np.testing.assert_array_equal(result["got"]["b"], b)
    np.testing.assert_array_equal(back["echo"], a * 2)
    assert back["tag"] == 7
    cli.close()
    srv.close()


def test_coupling_peer_close_raises():
    srv = CouplingServer()
    host, port = srv.address

    def server_side():
        srv.accept(timeout=30)
        srv.close()

    t = threading.Thread(target=server_side)
    t.start()
    cli = CouplingClient(host, port)
    t.join(timeout=30)
    with pytest.raises(ConnectionError):
        cli.recv()
    cli.close()


def test_two_program_fsi_demo():
    """The full fluid-client / solid-server demo runs as two separate
    processes and converges (reference: the two-mpirun-job FSI mode)."""
    demo = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "demos",
        "fsi_two_program.py",
    )
    env = dict(os.environ, FVM_DEMO_CPU="1")
    out = subprocess.run(
        [sys.executable, demo, "--cpu", "--n", "12"],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "two-program coupling converged" in out.stdout
