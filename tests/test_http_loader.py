"""HTTP safetensors loader against a local Range-supporting server."""

import asyncio
import threading

import numpy as np
import pytest

from jlama_tpu.quant import blockq
from jlama_tpu.st import SafeTensorWriter
from jlama_tpu.st.http_loader import HTTPSafeTensorLoader


@pytest.fixture(scope="module")
def served_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("http_model")
    rng = np.random.default_rng(0)
    a = rng.standard_normal((16, 64)).astype(np.float32)
    qx = rng.standard_normal((8, 64)).astype(np.float32)
    packed, scales = blockq.q4_quantize_np(qx)
    w = SafeTensorWriter()
    w.add("a", a)
    w.add_q4("q", packed, scales)
    w.write(tmp / "model.safetensors")

    from aiohttp import web

    app = web.Application()
    app.router.add_static("/files", tmp)  # aiohttp static supports Range

    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)
    port_holder = {}

    async def start():
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port_holder["port"] = runner.addresses[0][1]

    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(start(), loop).result(10)
    url = f"http://127.0.0.1:{port_holder['port']}/files/model.safetensors"
    yield url, a, packed, scales
    asyncio.run_coroutine_threadsafe(runner.cleanup(), loop).result(10)
    loop.call_soon_threadsafe(loop.stop)


def test_lazy_load_full_and_rows(served_model, tmp_path):
    url, a, packed, scales = served_model
    ld = HTTPSafeTensorLoader(url, cache_dir=tmp_path / "cache")
    assert set(ld.names()) == {"a", "q", "q.qb"}
    np.testing.assert_array_equal(ld.load("a"), a)
    np.testing.assert_array_equal(ld.load("a", row_range=(4, 12)), a[4:12])

    data, sc, dtype = ld.load_quantized("q", row_range=(2, 6))
    assert dtype == "Q4"
    np.testing.assert_array_equal(data, packed[2:6])
    np.testing.assert_array_equal(sc, scales[2:6])

    # cached parts are reused (second loader, same cache, no server needed
    # for already-fetched ranges)
    ld2 = HTTPSafeTensorLoader(url, cache_dir=tmp_path / "cache")
    np.testing.assert_array_equal(ld2.load("a", row_range=(4, 12)), a[4:12])
