"""jlama-tpu CLI.

Parity with the reference's picocli surface
(/root/reference/jlama-cli/.../JlamaCli.java:47-65): chat, complete, serve
(restapi), download, quantize, list, rm, version — plus TPU-specific flags
(mesh shape, dtypes). `JLAMA_MODEL_HOME` selects the model directory root.

Usage: python -m jlama_tpu.cli <command> [options]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import uuid
from pathlib import Path


def _resolve_model(name: str, args=None) -> Path:
    from .hub import default_model_home, model_dir_name

    p = Path(name)
    if p.exists():
        return p
    home = default_model_home()
    for cand in (home / name, home / model_dir_name(name)):
        if cand.exists():
            return cand
    if args is not None and getattr(args, "auto_download", False):
        from .hub import maybe_download_model

        print(f"downloading {name} from the Hub ...")
        try:
            return maybe_download_model(
                name, branch=getattr(args, "branch", "main"),
                token=getattr(args, "auth_token", None),
            )
        except FileNotFoundError:
            pass  # not a repo id: fall through to the clean error
    raise SystemExit(f"model not found: {name} (looked in {home})")


def _enable_compile_cache() -> None:
    import os

    from .utils.xla_cache import enable_persistent_cache

    enable_persistent_cache(
        os.environ.get("JLAMA_COMPILE_CACHE", "~/.cache/jlama_tpu/xla")
    )
    # honor JAX_PLATFORMS even on machines whose sitecustomize force-selects
    # an accelerator platform after env parsing (e.g. the axon TPU relay)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def _pallas_enabled(args) -> bool:
    """Quantized weights repack to the fused-kernel layout by default on TPU
    backends — `serve` on a JQ4 dir must hit the Pallas kernel with no flag
    (the XLA dequant path costs ~4x the HBM reads per decode step)."""
    mode = getattr(args, "pallas", "auto")
    if mode in ("on", "off", "w8a8"):
        return mode == "on"
    import jax

    return jax.default_backend() == "tpu"


def _maybe_repack_pallas(params, args):
    if _pallas_enabled(args):
        from .ops.pallas_q4 import prepare_params_for_pallas

        params = prepare_params_for_pallas(params)
    return params


def _load_engine(args, for_serving: bool = False):
    _enable_compile_cache()
    import jax.numpy as jnp

    from .models.loader import load_params
    from .tokenizers import load_tokenizer

    model_dir = _resolve_model(args.model, args)
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[args.working_dtype]
    params, cfg = load_params(model_dir, float_dtype=dtype)
    if not for_serving:
        # serving defers the q4k repack to the scheduler (see cmd_serve)
        params = _maybe_repack_pallas(params, args)
    tokenizer = load_tokenizer(model_dir)
    return params, cfg, tokenizer, model_dir


def cmd_chat(args) -> None:
    from .prompt import PromptBuilder
    from .runtime.engine import Engine

    params, cfg, tokenizer, _ = _load_engine(args)
    eng = Engine(params, cfg, tokenizer, max_seq_len=args.context,
                 layer_mode=args.layer_mode)
    session = str(uuid.uuid4())
    print("Chatting (ctrl-d to exit)")
    first = True
    while True:
        try:
            user = input("> ")
        except EOFError:
            break
        if not user.strip():
            continue
        b = PromptBuilder(tokenizer.spec)
        if first and args.system:
            b.add_system(args.system)
        b.add_user(user)
        prompt = b.build().prompt
        ids = tokenizer.encode(prompt)
        out: list[str] = []

        def stream(tok, ms):
            text = tokenizer.decode([tok])
            out.append(text)
            print(text, end="", flush=True)

        resp = eng.generate_tokens(
            ids,
            max_new_tokens=args.max_tokens,
            temperature=args.temperature,
            top_p=args.top_p,
            session_id=session,
            on_token=stream,
        )
        print(
            f"\n[{resp.generated_tokens} tokens, "
            f"{resp.generate_time_ms / max(resp.generated_tokens, 1):.0f} ms/token]"
        )
        first = False


def cmd_complete(args) -> None:
    from .runtime.engine import Engine

    params, cfg, tokenizer, _ = _load_engine(args)
    eng = Engine(params, cfg, tokenizer, max_seq_len=args.context,
                 layer_mode=args.layer_mode)
    ids = tokenizer.encode(args.prompt)
    resp = eng.generate_tokens(
        ids,
        max_new_tokens=args.max_tokens,
        temperature=args.temperature,
        top_p=args.top_p,
    )
    print(args.prompt + resp.response_text)
    print(
        f"\n[prompt {resp.prompt_tokens} tok {resp.prompt_time_ms:.0f} ms; "
        f"generated {resp.generated_tokens} tok "
        f"{resp.generate_time_ms:.0f} ms]",
        file=sys.stderr,
    )


def cmd_serve(args) -> None:
    from .runtime.scheduler import BatchScheduler
    from .server.openai_api import OpenAIServer

    # multi-host / multi-chip: join the cluster before touching devices
    # (replaces the reference's cluster-coordinator/cluster-worker commands;
    # every host runs the same `serve` with its process id)
    if args.coordinator:
        from .parallel.distributed import initialize_cluster

        initialize_cluster(
            args.coordinator, args.num_processes, args.process_id
        )

    _enable_compile_cache()  # also applies the JAX_PLATFORMS guard
    import jax

    from .parallel.mesh import make_mesh, plan_mesh

    mesh = None
    n_dev = len(jax.devices())
    if args.mesh and args.mesh != "auto":
        dp, pp, tp = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(jax.devices(), dp=dp, pp=pp, tp=tp)
    elif args.mesh == "auto" or n_dev > 1:
        # auto shard planner (cf. JlamaService.java:79-126): size the mesh
        # from the device count, head counts, and checkpoint bytes
        model_dir = _resolve_model(args.model, args)
        from .config import load_config

        cfg_probe = load_config(model_dir)
        wbytes = sum(f.stat().st_size for f in model_dir.glob("*.safetensors"))
        mesh = plan_mesh(cfg_probe, jax.devices(), weight_bytes=wbytes or None)
        print(
            f"auto mesh over {n_dev} devices: "
            f"dp={mesh.shape['dp']} pp={mesh.shape['pp']} tp={mesh.shape['tp']}"
        )

    if mesh is not None:
        # shard-local load: each host reads only its devices' byte ranges
        # (cf. Weights.java:99-117 / HTTPSafeTensorLoader.java:114-213)
        _enable_compile_cache()
        import jax.numpy as jnp

        from .parallel.distributed import load_params_sharded
        from .tokenizers import load_tokenizer

        model_dir = _resolve_model(args.model, args)
        params, cfg = load_params_sharded(model_dir, None, mesh)
        tokenizer = load_tokenizer(model_dir)
    else:
        params, cfg, tokenizer, model_dir = _load_engine(
            args, for_serving=True
        )

    import jax.numpy as _jnp

    kv_dtype = {"bf16": _jnp.bfloat16, "f32": _jnp.float32, "q8": "q8"}[
        args.kv_dtype
    ]
    # multi-host step coordination: host 0 owns the scheduler + HTTP server
    # and broadcasts every device-step's inputs; other processes replay them
    # in a follower loop (runtime/coordination.py; cf. Coordinator.java's
    # token loop driving workers, net/Coordinator.java:147-226)
    step_channel = None
    if jax.process_count() > 1:
        from .runtime.coordination import (
            StepChannel, coordinator_host, default_step_port,
        )

        sport = getattr(args, "step_port", None) or default_step_port(
            args.coordinator
        )
        if jax.process_index() == 0:
            print(f"step coordinator on :{sport} "
                  f"({jax.process_count() - 1} followers)")
            step_channel = StepChannel.serve(sport, jax.process_count() - 1)
        else:
            step_channel = StepChannel.connect(
                coordinator_host(args.coordinator), sport
            )
    # serving does NOT pre-repack to q4k here: the scheduler must perform
    # the repack itself (weight_format="q4k") so the shard_map tp path can
    # apply the per-shard CHUNKED layout to row-parallel weights — a
    # globally-permuted q4k sliced over tp shards would contract mismatched
    # features (silent garbage). chat/complete (Engine, no shard_map) keep
    # the global pre-repack in _load_engine.
    wfmt = "q4s" if args.pallas == "w8a8" else (
        "q4k" if _pallas_enabled(args) else None
    )
    if (
        mesh is not None
        and mesh.shape["pp"] > 1
        and not args.no_pp_pipeline
    ):
        # multi-host: every process builds the same PipelinedScheduler; tick
        # windows broadcast over the step channel ("ptick") and followers
        # replay them in run_follower — the ring spans processes just like
        # the reference's gRPC worker ring (JlamaService.proto:85-87)
        # decode through the pp ring (ppermute microbatching) instead of
        # serializing over the layer-sharded weights — the reference's
        # worker ring IS its serving path (Worker.java:226-248)
        from .runtime.pipelined import PipelinedScheduler

        slots = args.batch_slots
        if slots % mesh.shape["pp"]:
            slots = mesh.shape["pp"] * max(1, slots // mesh.shape["pp"])
            print(f"batch-slots rounded to {slots} (divisible by pp)")
        print(f"pp={mesh.shape['pp']} pipeline decode enabled "
              f"({slots // mesh.shape['pp']} rows/microbatch)")
        sched = PipelinedScheduler(
            params, cfg, tokenizer, mesh=mesh, n_slots=slots,
            n_pages=args.kv_pages, page_size=args.page_size,
            max_seq_len=args.context, kv_dtype=kv_dtype,
            weight_format=wfmt, step_channel=step_channel,
        )
        if args.prefill_fair_rows:
            sched.prefill_fair_rows = args.prefill_fair_rows
        if args.itl_budget_ms:
            # the pp PipelinedScheduler has no async window depth to budget
            print(
                "warning: --itl-budget-ms is ignored on the pp pipeline "
                "path (fixed tick window); use --no-pp-pipeline for the "
                "budgeted scheduler", file=sys.stderr,
            )
    else:
        sched = BatchScheduler(
            params,
            cfg,
            tokenizer,
            n_slots=args.batch_slots,
            n_pages=args.kv_pages,
            page_size=args.page_size,
            max_seq_len=args.context,
            kv_dtype=kv_dtype,
            mesh=mesh,
            layer_mode=args.layer_mode,
            weight_format=wfmt,
            step_channel=step_channel,
        )
        if args.itl_budget_ms:
            sched.itl_budget_ms = args.itl_budget_ms
        if args.prefill_fair_rows:
            sched.prefill_fair_rows = args.prefill_fair_rows
    # HBM hygiene: exactly ONE copy of the layer weights stays live — the
    # scheduler's fused tree. The embeddings/classification Engine shares it
    # (fuse=False: already fused), and the pre-fuse tree is dropped here
    # (8B-JQ4 would otherwise hold ~3 copies of wqkv/w13 and not fit a v5e).
    del params

    # embeddings/classify Engine shares the scheduler's fused tree; in
    # multi-host mode its device calls ride the step channel too (leader
    # publishes, followers replay in run_follower)
    from .runtime.engine import Engine

    sched.embed_engine = Engine(
        sched.params, sched.cfg, tokenizer, max_seq_len=args.context, mesh=None,
        fuse=False, moe_ragged=False, step_channel=step_channel,
        input_mesh=mesh,
    )

    if jax.process_count() > 1 and jax.process_index() > 0:
        # follower: replay host 0's broadcast steps until it shuts down
        # (includes any warmup steps the leader broadcasts)
        print(f"follower {jax.process_index()} ready")
        try:
            sched.run_follower()
        except ConnectionError as e:
            # leader gone (channel closed or heartbeat timeout): exit
            # non-zero so the orchestrator restarts the whole replica set
            raise SystemExit(f"follower {jax.process_index()}: {e}") from e
        return

    if args.prewarm:
        import time as _time

        t0 = _time.perf_counter()
        print(f"pre-warming jit variants to {args.prewarm} tokens ...")
        sched.warmup(max_context=args.prewarm)
        print(f"pre-warm done in {_time.perf_counter() - t0:.1f}s")

    server = OpenAIServer(sched, tokenizer, model_name=model_dir.name)
    print(f"Serving {model_dir.name} on http://{args.host}:{args.port}")
    try:
        server.run(host=args.host, port=args.port)
    finally:
        if step_channel is not None:
            step_channel.close()  # publishes "stop" to the followers


def cmd_download(args) -> None:
    from .hub import download_model

    def progress(name, done, total):
        # files download in parallel threads: only completion lines print
        # (interleaved \r-rewrites from 4 threads would garble one line)
        if total > 0 and done >= total:
            print(f"{name}: done ({total // (1 << 20)} MiB)", flush=True)

    out = download_model(
        args.model, branch=args.branch, token=args.auth_token, progress=progress
    )
    print(f"\nDownloaded to {out}")


def cmd_quantize(args) -> None:
    from .quant.quantizer import quantize_model

    model_dir = _resolve_model(args.model)

    def progress(name, i, n):
        print(f"\r[{i}/{n}] {name[:60]:60s}", end="", flush=True)

    out = quantize_model(
        model_dir,
        out_dir=args.output,
        quantize_to=args.quantize_to,
        skip_prefixes=tuple(args.skip_prefix or ()),
        drop_prefixes=tuple(args.drop_prefix or ()),
        progress=progress,
    )
    print(f"\nQuantized model written to {out}")


def cmd_list(args) -> None:
    from .hub import default_model_home, list_models

    for name in list_models():
        print(name)
    if not list_models():
        print(f"(no models in {default_model_home()})", file=sys.stderr)


def cmd_rm(args) -> None:
    from .hub import default_model_home, model_dir_name

    home = default_model_home()
    for cand in (home / args.model, home / model_dir_name(args.model)):
        if cand.exists():
            shutil.rmtree(cand)
            print(f"Removed {cand}")
            return
    raise SystemExit(f"model not found: {args.model}")


def cmd_version(args) -> None:
    from . import __version__

    print(f"jlama-tpu {__version__}")


def _add_model_opts(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="model directory or HF id (under model home)")
    p.add_argument("--working-dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--context", type=int, default=4096)
    p.add_argument("--pallas", choices=["auto", "on", "off", "w8a8"],
                   default="auto",
                   help="fused Pallas q4 kernels for quantized weights "
                   "(auto: on for TPU backends, off elsewhere). w8a8 "
                   "selects the q4s two-level int8 format: on the current "
                   "TPU toolchain its kernel is Mosaic-blocked, so it "
                   "serves via an XLA dequant fallback that reads MORE "
                   "bytes than the default q4k kernel — use only for "
                   "format testing (ops/pallas_w8a8.py:40-57)")
    p.add_argument("--layer-mode", choices=["scan", "unrolled"], default="scan",
                   help="unrolled: ~2x decode throughput, slow compile")
    p.add_argument("--auto-download", action="store_true",
                   help="fetch the model from the HF Hub when the name is a "
                        "repo id not present locally (parallel ranged "
                        "download; cf. the reference's --auto-download)")
    p.add_argument("--branch", default="main")
    p.add_argument("--auth-token", default=None)


def _add_gen_opts(p: argparse.ArgumentParser) -> None:
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--max-tokens", type=int, default=512)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="jlama-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("chat", help="interactive chat with KV session reuse")
    _add_model_opts(p)
    _add_gen_opts(p)
    p.add_argument("--system", default=None)
    p.set_defaults(fn=cmd_chat)

    p = sub.add_parser("complete", help="one-shot text completion")
    _add_model_opts(p)
    _add_gen_opts(p)
    p.add_argument("prompt")
    p.set_defaults(fn=cmd_complete)

    p = sub.add_parser("serve", help="OpenAI-compatible REST API server")
    _add_model_opts(p)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    # default from the measured throughput curve (BENCH_SERVING_CURVE_r04):
    # 8B-JQ4 gives 359/450/525 tok/s at 8/16/32 slots with inter-token p95
    # 92/148/254 ms — 16 is the throughput/latency balance point
    p.add_argument("--batch-slots", type=int, default=16)
    p.add_argument("--kv-pages", type=int, default=512)
    p.add_argument("--page-size", type=int, default=64)
    p.add_argument(
        "--kv-dtype",
        choices=["bf16", "f32", "q8"],
        default="bf16",
        help="KV cache storage dtype; q8 halves HBM per cached token "
        "(block-32 int8, dequantized in attention)",
    )
    p.add_argument("--mesh", default=None, metavar="DP,PP,TP",
                   help="shard the model over a device mesh, e.g. 1,1,4")
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address (multi-host)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--step-port", type=int, default=None,
                   help="TCP port for the multi-host step-broadcast channel "
                        "(default: coordinator port + 1000)")
    p.add_argument("--no-pp-pipeline", action="store_true",
                   help="with pp>1: storage-shard layers only instead of "
                        "decoding through the microbatched ppermute ring")
    p.add_argument("--prewarm", type=int, default=0, metavar="TOKENS",
                   help="pre-compile every jit variant serving will hit up "
                        "to this many context tokens before accepting "
                        "requests (one-time with the persistent cache)")
    p.add_argument("--itl-budget-ms", type=float, default=0.0,
                   help="inter-token latency budget: auto-tunes the async "
                        "decode window depth so token delivery intervals "
                        "stay under this many ms (0 = throughput-first)")
    p.add_argument("--prefill-fair-rows", type=int, default=0,
                   help="cap how many requests each batched prefill call "
                        "advances (FIFO): burst arrivals stop waiting for "
                        "the whole prompt backlog, bounding TTFT at high "
                        "concurrency for some prefill-throughput cost "
                        "(0 = unlimited batching)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("download", help="download a model from HuggingFace")
    p.add_argument("model")
    p.add_argument("--branch", default="main")
    p.add_argument("--auth-token", default=None)
    p.set_defaults(fn=cmd_download)

    p = sub.add_parser("quantize", help="offline quantization to JQ4/I8")
    p.add_argument("model")
    p.add_argument("--output", default=None)
    p.add_argument("--quantize-to", choices=["q4", "i8"], default="q4")
    p.add_argument("--skip-prefix", action="append")
    p.add_argument("--drop-prefix", action="append")
    p.set_defaults(fn=cmd_quantize)

    p = sub.add_parser("list", help="list downloaded models")
    p.set_defaults(fn=cmd_list)

    p = sub.add_parser("rm", help="remove a downloaded model")
    p.add_argument("model")
    p.set_defaults(fn=cmd_rm)

    p = sub.add_parser("version", help="print version")
    p.set_defaults(fn=cmd_version)
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
