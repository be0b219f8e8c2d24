"""Two-program coupling transport: socket-based array exchange.

TPU-native counterpart of the reference's multi-code FSI plumbing
(reference: scripts/ServerCoupling.py:28-41 — MPI.Open_port /
COMM_WORLD.Accept on the solid job, Comm.Connect on the fluid job,
boundary coords/velocities/forces exchanged by Allreduce on the
intercommunicator; MPMCoupling.h:38-39 uses the same dynamic-process
machinery).

JAX programs are single-controller per job, so the MPI dynamic-process
inventory reduces to a point-to-point array pipe between two processes:

  server = CouplingServer()          # Open_port  (bind + listen)
  addr = server.address              # port name to hand to the peer
  server.accept()                    # Comm.Accept
  client = CouplingClient(*addr)     # Comm.Connect

Both ends then exchange named numpy arrays with ``send(**arrays)`` /
``recv()`` — length-prefixed ``.npz`` frames, no pickle.  Each side runs
its own device mesh/models; only small boundary-sized arrays cross the
wire, exactly like the reference's per-timestep force/displacement
exchange (ServerCoupling.py:51-80).
"""

from __future__ import annotations

import io
import socket
import struct

import numpy as np

_HDR = struct.Struct("!Q")


class _Pipe:
    """Length-prefixed npz frames over a connected socket."""

    def __init__(self, sock: socket.socket):
        self._sock = sock

    def send(self, **arrays) -> None:
        buf = io.BytesIO()
        np.savez(buf, **{k: np.asarray(v) for k, v in arrays.items()})
        payload = buf.getvalue()
        self._sock.sendall(_HDR.pack(len(payload)) + payload)

    def _recv_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self._sock.recv(min(n, 1 << 20))
            if not c:
                raise ConnectionError("coupling peer closed the connection")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def recv(self) -> dict:
        (ln,) = _HDR.unpack(self._recv_exact(_HDR.size))
        data = np.load(io.BytesIO(self._recv_exact(ln)))
        return {k: data[k] for k in data.files}

    def close(self) -> None:
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class CouplingServer(_Pipe):
    """The reference's Open_port/Accept side (the solid job)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(1)
        self.address = self._listener.getsockname()  # (host, port) "port name"
        self._sock = None

    def accept(self, timeout: float | None = 60.0) -> "CouplingServer":
        self._listener.settimeout(timeout)
        sock, _ = self._listener.accept()
        self._listener.close()
        super().__init__(sock)
        return self


class CouplingClient(_Pipe):
    """The reference's Connect side (the fluid job)."""

    def __init__(self, host: str, port: int, timeout: float = 60.0):
        sock = socket.create_connection((host, port), timeout=timeout)
        sock.settimeout(None)
        super().__init__(sock)
