"""Serving daemon CLI: ``python -m dgq_tpu.serve ENGINE_CKPT [flags]``.

Starts the JSON-lines TCP server (serving/server.py) over a
ContinuousBatcher loaded straight from a ``save_engine`` checkpoint.
The reference has no serving entry point at all (SURVEY §0).

Example:
    python -m dgq_tpu.entry /models/llama-7b ptb --wt_fun search --w4w8 \
        --kvquant --smoothquant --save_safetensors q.st
    python - <<'PY'   # one-time engine conversion
    from dgq_tpu.utils.checkpoint import load_quantized, save_engine
    from dgq_tpu.models.engine import from_ptq
    params, cfg, qcfg, kv = load_quantized("q.st")
    save_engine("eng.st", from_ptq(params, kv, cfg), cfg, arch="llama")
    PY
    python -m dgq_tpu.serve eng.st --port 8471 --slots 8 --spec-k 4
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="dgq_tpu serving daemon")
    p.add_argument("checkpoint", help="engine checkpoint (save_engine output)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8471)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--prefill-chunk", type=int, default=512,
                   help="chunked prefill size (bounds head-of-line latency)")
    p.add_argument("--prefill-pad", type=int, default=128,
                   help="prompt padding granularity (<= max-len)")
    p.add_argument("--admit-batch", type=int, default=4)
    p.add_argument("--decode-steps", type=int, default=1)
    p.add_argument("--spec-k", type=int, default=0,
                   help="prompt-lookup speculative decoding draft length")
    p.add_argument("--prefix", type=str, default=None, action="append",
                   help="path to a shared-prompt token-id file (json list or "
                        "whitespace-separated ints): prefilled once, every "
                        "matching request reuses the cached prefix KV; "
                        "repeatable (longest match wins)")
    p.add_argument("--metrics-interval", type=float, default=30.0,
                   help="seconds between metrics log lines (0 disables)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel shards: serve over a (dp=1, tp) "
                        "device mesh (packed weights column/row-sharded, KV "
                        "over kv heads; parallel/sharded_serving.py)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel serving replicas: dp independent "
                        "batchers on disjoint device groups (each of size "
                        "--tp), requests routed to the least-loaded replica; "
                        "throughput scales with dp for replica-sized models")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages over a ('pp','tp') mesh: "
                        "layers + KV cache sharded over pp, decode runs the "
                        "slots as GPipe microbatches (parallel/pp_serving.py); "
                        "composes with --tp/--spec-k/--admit-batch/--paged "
                        "(the page pool layer-shards per stage)")
    p.add_argument("--paged", action="store_true",
                   help="paged KV cache (serving/paged.py): memory scales "
                        "with tokens in flight, prefixes share pool pages; "
                        "composes with --tp and --prefill-chunk (page-"
                        "aligned); ignores --admit-batch/--spec-k")
    p.add_argument("--page-size", type=int, default=128,
                   help="tokens per KV page (paged mode)")
    p.add_argument("--num-pages", type=int, default=0,
                   help="KV pool pages incl. the null page (paged mode); "
                        "0 = dense-equivalent capacity (slots x max-len)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (XLA fallback engine paths)")
    p.add_argument("--kv-bits", type=int, default=8, choices=[4, 8],
                   help="KV-cache precision: 8 (INT8, reference parity) or "
                        "4 (packed INT4 — half the cache memory, XLA "
                        "attention; dense batcher only)")
    return p


def build_server(args):
    import json as _json

    from dgq_tpu.serving.scheduler import ContinuousBatcher
    from dgq_tpu.serving.server import BatcherServer

    with open(args.checkpoint + ".json") as f:
        arch = _json.load(f).get("arch", "llama")
    if arch != "llama":
        # non-LLaMA families ride the fns-based scheduler (family_batch_
        # engine); llama-only features are rejected up front
        if (args.paged or args.tp > 1 or args.spec_k or args.admit_batch > 1
                or args.dp > 1 or args.pp > 1):
            raise SystemExit(
                f"--paged/--tp/--pp/--dp/--spec-k/--admit-batch are "
                f"LLaMA-only; checkpoint is {arch}"
            )
        from dgq_tpu.serving.family_batch_engine import batcher_from_checkpoint

        _, batcher = batcher_from_checkpoint(
            args.checkpoint, num_slots=args.slots, max_len=args.max_len,
            prefill_pad=min(args.prefill_pad, args.max_len),
            prefill_chunk=args.prefill_chunk, decode_steps=args.decode_steps,
        )
        for path in args.prefix or ():
            with open(path) as f:
                text = f.read().strip()
            ids = (_json.loads(text) if text.startswith("[")
                   else [int(t) for t in text.split()])
            batcher.register_prefix(ids)
            print(f"[dgq_tpu.serve] prefix cached: {len(ids)} tokens", flush=True)
        return BatcherServer(batcher, host=args.host, port=args.port)

    if args.pp > 1:
        if args.dp > 1:
            raise SystemExit("--pp with --dp is not supported (run one "
                             "daemon per dp replica behind a router)")
        import jax as _jax

        from dgq_tpu.models.engine import EngineConfig
        from dgq_tpu.parallel.pipeline import make_pp_mesh, pp_shard_engine_params
        from dgq_tpu.utils.checkpoint import load_engine_any

        eng, cfg = load_engine_any(args.checkpoint)
        mesh = make_pp_mesh(args.pp, args.tp)
        ecfg = EngineConfig(cfg=cfg,
                            use_kernel=_jax.default_backend() not in ("cpu",))
        eng_pp = pp_shard_engine_params(eng, mesh)
        if args.paged:
            from dgq_tpu.parallel.pp_serving import pp_paged_serving_fns
            from dgq_tpu.serving.paged import PagedBatcher

            chunk = (args.prefill_chunk // args.page_size) * args.page_size
            batcher = PagedBatcher(
                ecfg, eng_pp, fns=pp_paged_serving_fns(mesh),
                num_slots=args.slots, max_len=args.max_len,
                page_size=args.page_size,
                num_pages=args.num_pages or None,
                decode_steps=args.decode_steps, prefill_chunk=chunk,
            )
        else:
            from dgq_tpu.parallel.pp_serving import pp_serving_fns

            batcher = ContinuousBatcher(
                ecfg, eng_pp, fns=pp_serving_fns(mesh),
                num_slots=args.slots, max_len=args.max_len,
                prefill_pad=min(args.prefill_pad, args.max_len),
                prefill_chunk=args.prefill_chunk, decode_steps=args.decode_steps,
                spec_k=args.spec_k, admit_batch=args.admit_batch,
            )
        for path in args.prefix or ():
            with open(path) as f:
                text = f.read().strip()
            ids = (_json.loads(text) if text.startswith("[")
                   else [int(t) for t in text.split()])
            batcher.register_prefix(ids)
            print(f"[dgq_tpu.serve] prefix cached: {len(ids)} tokens", flush=True)
        return BatcherServer(batcher, host=args.host, port=args.port)

    import jax as _jax

    from dgq_tpu.models.engine import EngineConfig
    from dgq_tpu.parallel.mesh import make_mesh
    from dgq_tpu.utils.checkpoint import load_engine_any

    chunk = args.prefill_chunk
    if args.paged and chunk % args.page_size != 0:
        chunk = (chunk // args.page_size) * args.page_size  # page-align

    def build_one(mesh):
        if args.paged:
            from dgq_tpu.serving.paged import PagedBatcher

            return PagedBatcher(
                ecfg, eng, num_slots=args.slots, max_len=args.max_len,
                page_size=args.page_size, num_pages=args.num_pages or None,
                decode_steps=args.decode_steps, mesh=mesh, prefill_chunk=chunk,
            )
        return ContinuousBatcher(
            ecfg, eng, num_slots=args.slots, max_len=args.max_len,
            prefill_pad=min(args.prefill_pad, args.max_len),
            prefill_chunk=args.prefill_chunk, admit_batch=args.admit_batch,
            decode_steps=args.decode_steps, spec_k=args.spec_k, mesh=mesh,
        )

    eng, cfg = load_engine_any(args.checkpoint)
    ecfg = EngineConfig(cfg=cfg, use_kernel=_jax.default_backend() not in ("cpu",),
                        kv_bits=args.kv_bits)
    if args.dp > 1:
        # data-parallel serving scale-out: one full batcher replica per
        # disjoint device group (each its own tp submesh + scheduler loop);
        # BatcherServer routes requests to the least-loaded replica
        devices = _jax.devices()
        need = args.dp * args.tp
        if need > len(devices):
            raise SystemExit(f"--dp {args.dp} x --tp {args.tp} needs {need} "
                             f"devices, have {len(devices)}")
        batchers = [
            build_one(make_mesh(dp=1, tp=args.tp,
                                devices=devices[r * args.tp:(r + 1) * args.tp]))
            for r in range(args.dp)
        ]
    else:
        mesh = make_mesh(dp=1, tp=args.tp) if args.tp > 1 else None
        batchers = [build_one(mesh)]
    for path in args.prefix or ():
        import json as _json

        with open(path) as f:
            text = f.read().strip()
        ids = (_json.loads(text) if text.startswith("[")
               else [int(t) for t in text.split()])
        for b in batchers:
            b.register_prefix(ids)
        print(f"[dgq_tpu.serve] prefix cached: {len(ids)} tokens", flush=True)
    return BatcherServer(batchers if len(batchers) > 1 else batchers[0],
                         host=args.host, port=args.port)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    srv = build_server(args)
    print(f"[dgq_tpu.serve] listening on {srv.host}:{srv.port} "
          f"(slots={args.slots}, max_len={args.max_len}, spec_k={args.spec_k})",
          flush=True)
    try:
        import time

        while True:
            time.sleep(args.metrics_interval or 3600)
            if args.metrics_interval:
                print(f"[dgq_tpu.serve] {srv.metrics()}", flush=True)
    except KeyboardInterrupt:
        print("[dgq_tpu.serve] shutting down")
        srv.close()


if __name__ == "__main__":
    main()
