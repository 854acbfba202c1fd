"""CLI end-to-end via subprocess (chat with piped stdin, list/rm, model home)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REPO = str(Path(__file__).resolve().parent.parent)


def _run_cli(args, home, input_text=None, timeout=240):
    env = dict(os.environ)
    env.update(
        JLAMA_MODEL_HOME=str(home),
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    boot = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import jlama_tpu.cli as c; import sys; c.main(sys.argv[1:])"
    )
    return subprocess.run(
        [sys.executable, "-c", boot, *args],
        input=input_text, capture_output=True, text=True, env=env,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def model_home(tmp_path_factory):
    home = tmp_path_factory.mktemp("model_home")
    from tests.helpers import make_tiny_chat_model

    make_tiny_chat_model(home / "tinychat")
    return home


def test_cli_list(model_home):
    r = _run_cli(["list"], model_home)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "tinychat" in r.stdout


def test_cli_chat_piped(model_home):
    r = _run_cli(
        ["chat", "tinychat", "--max-tokens", "4", "--working-dtype", "f32",
         "--context", "64"],
        model_home,
        input_text="hello\n",
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "Chatting" in r.stdout
    assert "tokens," in r.stdout  # per-turn stats line


def test_cli_rm(model_home, tmp_path_factory):
    home = tmp_path_factory.mktemp("model_home_rm")
    from tests.helpers import make_tiny_chat_model

    make_tiny_chat_model(home / "victim")
    r = _run_cli(["rm", "victim"], home)
    assert r.returncode == 0, r.stderr[-800:]
    assert not (home / "victim").exists()
    r2 = _run_cli(["rm", "victim"], home)
    assert r2.returncode != 0  # already gone -> clean error
