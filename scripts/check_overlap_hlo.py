"""Scripted collective/compute overlap evidence (BASELINE config 5 exit
criterion; SURVEY §2.3 collective/compute overlap).

No multi-chip hardware exists in this environment, but the REAL TPU
compiler + scheduler run host-side: we AOT-compile production steps
against a virtual v5e:2x4 topology (jax.experimental.topologies) and
analyze the SCHEDULED optimized HLO.  Two legs:

1. **Ring-attention SP prefill** (parallel/sequence.py) — the pass/fail
   leg.  Its kv-block rotation ppermutes must be scheduled as async
   ``collective-permute-start``/``done`` pairs with independent compute
   (the current block's attention/GEMM fusions) between them.  Ops between
   start and done in a scheduled module are by construction independent of
   the collective, so counting them IS the overlap: they execute while the
   permute is in flight on ICI.  This is exactly ring attention's design
   intent, verified on the real TPU scheduler.

2. **TP engine step** — informational.  Probed finding (2026-08-19): the
   v5e compiler keeps ``all-reduce`` SYNCHRONOUS at HLO level even with
   provably independent work available and
   ``xla_tpu_enable_async_collective_fusion`` on; its latency hiding
   happens BELOW HLO in the collective emitter (backend_config shows
   ``RotatedPincerShortEmitter``/``StrategyRing`` with multistep/phase
   machinery).  The leg asserts the all-reduces lower to that ICI ring
   emitter; HLO-level async pairs are not expected for all-reduce, and a
   decoder's psums are on the critical path anyway (every op after them
   consumes them).

Run: python scripts/check_overlap_hlo.py            (exit 0 = overlap verified)
Writes the scheduled HLO to --dump-dir (default /tmp) for human inspection.

Used by __graft_entry__.dryrun_multichip (subprocess) so MULTICHIP_r{N}
records overlap-verified.
"""
import argparse
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Array construction must NOT touch the tunneled TPU backend (a wedged
# tunnel hangs even trivial device work, and the axon plugin re-pins
# jax_platforms); the TPU topology AOT compile below is host-side and
# backend-independent, so the whole check runs tunnel-free on CPU arrays.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def build_and_compile(topology: str = "v5e:2x4", tp: int = 4, dp: int = 2):
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from dgq_tpu.models.engine import EngineConfig, engine_forward, init_kv_cache
    from dgq_tpu.parallel.sharded_engine import engine_param_specs, kv_cache_specs

    topo = topologies.get_topology_desc(platform="tpu", topology_name=topology)
    devs = topo.devices
    assert len(devs) == dp * tp, (len(devs), dp, tp)
    mesh = Mesh(
        __import__("numpy").asarray(devs).reshape(dp, tp), ("dp", "tp")
    )

    cfg = g._small_cfg(tp=tp)
    eng = g._build_engine(cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=True, interpret=False,
                        bm_prefill=128, bm_decode=128)
    ecfg_local = dataclasses.replace(ecfg, tp_axis="tp")
    pspecs = engine_param_specs(eng)
    cspecs = kv_cache_specs()

    def local_step(params_l, ids_l, cache_l):
        return engine_forward(ecfg_local, params_l, ids_l, cache_l)

    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspecs),
        out_specs=(P("dp", None, None), cspecs), check_vma=False,
    )

    batch = 2 * dp
    cache = init_kv_cache(cfg, batch, 32)
    ids = jnp.zeros((batch, 8), jnp.int32)

    def shaped(tree, specs):
        return jax.tree_util.tree_map(
            lambda a, s: jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=NamedSharding(mesh, s)),
            tree, specs)

    args = (shaped(eng, pspecs),
            jax.ShapeDtypeStruct(ids.shape, ids.dtype,
                                 sharding=NamedSharding(mesh, P("dp", None))),
            shaped(cache, cspecs))
    return jax.jit(fn).lower(*args).compile()


def build_and_compile_sp(topology: str = "v5e:2x4", sp: int = 8):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from dgq_tpu.models.engine import EngineConfig
    from dgq_tpu.parallel.sequence import make_sp_mesh, sp_prefill_fn

    topo = topologies.get_topology_desc(platform="tpu", topology_name=topology)
    mesh = make_sp_mesh(sp, devices=np.asarray(topo.devices))

    cfg = g._small_cfg(tp=1)
    eng = g._build_engine(cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=True, interpret=False,
                        bm_prefill=128, bm_decode=128)
    s = 2 * sp * 8  # 2 blocks of 8 per rank
    fn = sp_prefill_fn(ecfg, eng, mesh, s)

    rspec = jax.tree_util.tree_map(lambda _: P(), eng)
    shaped = jax.tree_util.tree_map(
        lambda a, sp_: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                            sharding=NamedSharding(mesh, sp_)),
        eng, rspec)
    ids = jax.ShapeDtypeStruct((2, s), jnp.int32,
                               sharding=NamedSharding(mesh, P(None, "sp")))
    return jax.jit(fn).lower(shaped, ids).compile()


def analyze_schedule(hlo_text: str, start_op: str, done_op: str):
    """Per {start_op}/{done_op} pair: how much independent work the TPU
    scheduler placed between them (scheduled modules list instructions in
    execution order; anything between start and done is independent of the
    collective and runs while it is in flight)."""
    assert "is_scheduled=true" in hlo_text, "optimized HLO is not scheduled"
    pairs = []
    # walk computations; track open starts by result name.  NB: match the
    # op NAME as `<space>op(` — shape/layout strings like T(2,128) contain
    # parens, so naive "first (" splitting misparses
    compute_re = re.compile(r"\s(fusion|dot|custom-call|convolution)\(")
    for comp in hlo_text.split("\n\n"):
        lines = [l.strip() for l in comp.splitlines() if "=" in l]
        open_pairs = {}  # name -> (line idx, [independent ops])
        for idx, line in enumerate(lines):
            lhs = line.split("=", 1)[0].strip().lstrip("%")
            if f"{start_op}(" in line:
                open_pairs[lhs] = (idx, [])
            elif f"{done_op}(" in line:
                m = re.search(done_op + r"\(\s*%?([\w.\-]+)", line)
                src = m.group(1) if m else None
                for name, (sidx, ops) in list(open_pairs.items()):
                    if src is None or name == src:
                        pairs.append({"start": name, "n_between": len(ops),
                                      "ops": ops[:8]})
                        open_pairs.pop(name, None)
            else:
                for st in open_pairs.values():
                    m = compute_re.search(" " + line.split("=", 1)[1])
                    if m:
                        st[1].append(m.group(1))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--dump-dir", default="/tmp")
    args = ap.parse_args()

    # ---- leg 1 (pass/fail): ring-attention SP — async ppermute overlap ----
    sp_txt = build_and_compile_sp(args.topology).as_text()
    sp_dump = os.path.join(args.dump_dir, "sp_prefill_tpu_hlo.txt")
    with open(sp_dump, "w") as f:
        f.write(sp_txt)
    pairs = analyze_schedule(sp_txt, "collective-permute-start",
                             "collective-permute-done")
    overlapped = [p for p in pairs if p["n_between"] > 0]
    print(f"[sp] scheduled HLO: {len(pairs)} async collective-permute "
          f"pair(s), dump={sp_dump}", flush=True)
    for p in pairs:
        print(f"  [sp] start={p['start']}: {p['n_between']} independent "
              f"compute op(s) in flight {p['ops']}", flush=True)

    # ---- leg 2 (informational): TP step all-reduce lowering ----
    tp_txt = build_and_compile(args.topology).as_text()
    tp_dump = os.path.join(args.dump_dir, "tp_step_tpu_hlo.txt")
    with open(tp_dump, "w") as f:
        f.write(tp_txt)
    n_sync = tp_txt.count(" all-reduce(")
    ring = tp_txt.count("StrategyRing")
    print(f"[tp] {n_sync} all-reduce(s), {ring} lowered to the ICI ring "
          f"emitter (overlap below HLO level — see module docstring), "
          f"dump={tp_dump}", flush=True)

    if not pairs:
        print("FAIL: no async collective-permute pairs in the SP module",
              flush=True)
        sys.exit(1)
    if not overlapped:
        print("FAIL: async pairs exist but retire immediately (no overlap)",
              flush=True)
        sys.exit(1)
    if n_sync and ring == 0:
        print("FAIL: TP all-reduces did not lower to the ICI ring emitter",
              flush=True)
        sys.exit(1)
    print(f"OVERLAP VERIFIED: {len(overlapped)}/{len(pairs)} ring-attention "
          f"permutes ride under independent compute; TP all-reduces on the "
          f"ICI ring emitter", flush=True)


if __name__ == "__main__":
    main()
