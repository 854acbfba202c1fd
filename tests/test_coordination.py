"""StepChannel wire protocol: framing, fan-out, ordering, stop."""

import socket
import threading

import numpy as np

from jlama_tpu.runtime.coordination import (
    StepChannel,
    coordinator_host,
    default_step_port,
)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_fanout_ordering_and_framing():
    port = _free_port()
    n_followers = 3
    received = [[] for _ in range(n_followers)]

    def follower(i):
        ch = StepChannel.connect("127.0.0.1", port, timeout=30)
        while True:
            msg = ch.next()
            if msg["op"] == "stop":
                return
            received[i].append(msg)

    threads = [
        threading.Thread(target=follower, args=(i,)) for i in range(n_followers)
    ]
    for t in threads:
        t.start()
    srv = StepChannel.serve(port, n_followers, host="127.0.0.1", timeout=30)
    msgs = [
        {"op": "decode", "tokens": np.arange(8, dtype=np.int32).reshape(2, 4),
         "win": 128, "depth": k}
        for k in range(20)
    ]
    for m in msgs:
        srv.publish(m)
    srv.close()  # publishes stop
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive()
    for r in received:
        assert len(r) == 20
        assert [m["depth"] for m in r] == list(range(20))
        np.testing.assert_array_equal(r[7]["tokens"], msgs[7]["tokens"])


def test_closed_channel_raises():
    port = _free_port()
    got = {}

    def follower():
        ch = StepChannel.connect("127.0.0.1", port, timeout=30)
        try:
            ch.next()
        except ConnectionError:
            got["err"] = True

    t = threading.Thread(target=follower)
    t.start()
    srv = StepChannel.serve(port, 1, host="127.0.0.1", timeout=30)
    for s in srv._socks:  # hard close without the stop message
        s.close()
    t.join(timeout=30)
    assert got.get("err"), "follower did not see the closed channel"


def test_address_helpers():
    assert default_step_port("10.0.0.5:8476") == 9476
    assert coordinator_host("10.0.0.5:8476") == "10.0.0.5"
    assert coordinator_host(None) == "127.0.0.1"


def test_heartbeat_timeout_raises(monkeypatch):
    """A silent leader past JLAMA_STEP_TIMEOUT is presumed dead: next()
    raises instead of blocking the follower forever."""
    monkeypatch.setenv("JLAMA_STEP_TIMEOUT", "0.3")
    port = _free_port()
    got = {}

    def follower():
        ch = StepChannel.connect("127.0.0.1", port, timeout=30)
        try:
            ch.next()
        except ConnectionError as e:
            got["err"] = str(e)

    t = threading.Thread(target=follower)
    t.start()
    srv = StepChannel.serve(port, 1, host="127.0.0.1", timeout=30)
    t.join(timeout=30)  # leader stays silent — no publish at all
    assert "leader presumed dead" in got.get("err", ""), got
    srv.close()


def test_publish_to_dead_follower_raises():
    """Losing a follower must fail the publish fast (a hung collective would
    otherwise freeze every surviving process)."""
    import pytest

    port = _free_port()
    follower_ch = {}

    def follower():
        follower_ch["ch"] = StepChannel.connect("127.0.0.1", port, timeout=30)

    t = threading.Thread(target=follower)
    t.start()
    srv = StepChannel.serve(port, 1, host="127.0.0.1", timeout=30)
    t.join(timeout=30)
    follower_ch["ch"].close()  # follower dies
    with pytest.raises(ConnectionError, match="follower 1 lost"):
        # first sends may land in socket buffers; the RST surfaces within a
        # few frames of a closed peer
        for _ in range(1000):
            srv.publish({"op": "ping", "pad": b"x" * 4096})
