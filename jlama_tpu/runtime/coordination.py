"""Cross-process step coordination for multi-host serving.

The TPU-native analog of the reference's Coordinator token loop
(/root/reference/jlama-net/src/main/java/com/github/tjake/jlama/net/
Coordinator.java:147-226 and net/grpc/JlamaService.java:378-442): host 0 owns
the continuous-batching scheduler and the HTTP server; every other process
runs a follower loop. Under SPMD, every jitted call on globally-sharded
arrays must be issued by ALL processes with identical inputs — so before each
device call host 0 broadcasts a tiny step descriptor (op + numpy inputs +
static args, a few KB) over a TCP fan-out channel, and followers replay the
identical call on their own handles to the same global arrays.

Where the reference streams raw activation tensors over gRPC (1 GiB cap),
here only the *step program* crosses the wire — activations and the TP
all-reduce ride the ICI inside the jitted program (GSPMD psum), which is the
whole point of the redesign.

Wire format: 4-byte big-endian length + pickled dict. The channel is
host-0 -> followers only; followers never send (the device collectives are
the synchronization).
"""

from __future__ import annotations

import pickle
import socket
import struct
import time


class StepChannel:
    """Fan-out broadcast channel: host 0 publishes, followers receive."""

    def __init__(self, socks: list[socket.socket], is_server: bool):
        self._socks = socks
        self._is_server = is_server
        # publish is called from the scheduler loop AND from public session
        # ops (drop_session/suspend_session) that future callers may invoke
        # off-thread; a lock keeps frames from interleaving (ADVICE r4)
        import threading

        self._pub_lock = threading.Lock()

    # -- construction --------------------------------------------------

    @classmethod
    def serve(cls, port: int, n_followers: int, host: str = "0.0.0.0",
              timeout: float = 300.0) -> "StepChannel":
        """Host 0: accept exactly n_followers connections."""
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(n_followers)
        srv.settimeout(timeout)
        socks = []
        try:
            for _ in range(n_followers):
                conn, _ = srv.accept()
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                socks.append(conn)
        finally:
            srv.close()
        return cls(socks, is_server=True)

    @classmethod
    def connect(cls, host: str, port: int, timeout: float = 300.0) -> "StepChannel":
        """Follower: connect (with retry while host 0 is still loading).

        The receive side gets a liveness timeout (JLAMA_STEP_TIMEOUT seconds,
        default 900, 0 disables): the leader heartbeats {"op": "ping"} while
        idle, so a silent leader for that long means it is gone — next()
        raises instead of hanging the follower forever. The default is
        generous because a leader-side first-compile legitimately goes quiet
        for minutes."""
        import os

        recv_timeout = float(os.environ.get("JLAMA_STEP_TIMEOUT", "900")) or None
        deadline = time.time() + timeout
        last_err: Exception | None = None
        while time.time() < deadline:
            try:
                s = socket.create_connection((host, port), timeout=10)
                s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                s.settimeout(recv_timeout)
                return cls([s], is_server=False)
            except OSError as e:  # noqa: PERF203
                last_err = e
                time.sleep(0.2)
        raise TimeoutError(f"could not reach step coordinator {host}:{port}: {last_err}")

    # -- wire ----------------------------------------------------------

    def publish(self, msg: dict) -> None:
        assert self._is_server, "only host 0 publishes"
        blob = pickle.dumps(msg, protocol=pickle.HIGHEST_PROTOCOL)
        frame = struct.pack(">I", len(blob)) + blob
        with self._pub_lock:
            self._publish_frame(frame)

    def _publish_frame(self, frame: bytes) -> None:
        for i, s in enumerate(self._socks):
            try:
                s.sendall(frame)
            except OSError as e:
                # a dead follower would otherwise hang the next SPMD
                # collective forever; fail fast with the process identified
                raise ConnectionError(
                    f"step follower {i + 1} lost ({e}); the cluster is "
                    "degraded — restart all processes to recover"
                ) from e

    def next(self) -> dict:
        assert not self._is_server, "host 0 does not receive"
        s = self._socks[0]
        try:
            hdr = self._read_exact(s, 4)
            (n,) = struct.unpack(">I", hdr)
            return pickle.loads(self._read_exact(s, n))
        except TimeoutError as e:
            raise ConnectionError(
                "no step or heartbeat from the coordinator within "
                "JLAMA_STEP_TIMEOUT — leader presumed dead"
            ) from e

    @staticmethod
    def _read_exact(s: socket.socket, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = s.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("step channel closed")
            buf.extend(chunk)
        return bytes(buf)

    def close(self) -> None:
        if self._is_server:
            try:
                self.publish({"op": "stop"})
            except OSError:
                pass
        for s in self._socks:
            try:
                s.close()
            except OSError:
                pass


def default_step_port(coordinator_address: str | None) -> int:
    """Step-channel port derived from the jax.distributed coordinator port."""
    import os

    if os.environ.get("JLAMA_STEP_PORT"):
        return int(os.environ["JLAMA_STEP_PORT"])
    if coordinator_address and ":" in coordinator_address:
        return int(coordinator_address.rsplit(":", 1)[1]) + 1000
    return 8477


def coordinator_host(coordinator_address: str | None) -> str:
    if coordinator_address and ":" in coordinator_address:
        return coordinator_address.rsplit(":", 1)[0]
    return "127.0.0.1"
