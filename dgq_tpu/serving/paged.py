"""Paged INT8 KV cache serving (vLLM-style, TPU-native).

The reference allocates a contiguous KV region per sequence
(llama_a8w4.py:117-120 concatenates onto a dense cache); the slot-based
serving layer here (serving/batch_engine.py) likewise reserves
``num_slots x max_len`` whether or not the tokens exist.  This module
replaces that with a **page pool**: KV lives in fixed-size pages
(default 128 tokens) shared by all slots, a per-slot page table maps
logical pages to pool pages, and memory scales with TOKENS IN FLIGHT, not
slots x max_len.  Prompt-prefix caching becomes true sharing: slots
admitted under a registered prefix point their tables at the SAME pool
pages (refcounted host-side) instead of copying the prefix KV per slot.

TPU-first design decisions:
  * the page table is a (B, NP) int32 array passed to every device call
    and scalar-prefetched into the Pallas decode kernel
    (ops/attention.int8_paged_decode_attention) — BlockSpec index maps
    dereference it, so the kernel body is the proven chunked-flash body;
  * pool page 0 is the reserved NULL page: unallocated table entries and
    inactive slots read/write it harmlessly (reads are masked by length);
  * page allocation/free/refcounting is host-side in PagedBatcher —
    the device programs stay branchless with static shapes;
  * appends are XLA scatters at (page, offset) computed from lengths, so
    decode remains ONE jitted program per step (or one per N steps with
    decode_steps > 1).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.engine import EngineConfig, EngineParams, _block, _requant
from dgq_tpu.models.llama import rms_norm, rope_cos_sin, rotate_half

NULL_PAGE = 0


class PagedKVCache(NamedTuple):
    """Device state of the paged pool.  The page table is NOT part of this
    tuple — it is host-owned (PagedBatcher) and passed per call."""

    kt: jax.Array  # (L, P, Hkv, Dh, ps) int8 — K transposed within the page
    v: jax.Array  # (L, P, Hkv, ps, Dh) int8
    lengths: jax.Array  # (B,) int32 per-slot token counts


def init_paged_cache(cfg, batch: int, num_pages: int, page_size: int = 128,
                     kv_bits: int = 8) -> PagedKVCache:
    """``num_pages`` INCLUDES the reserved null page 0; usable pages are
    1..num_pages-1.  ``kv_bits=4`` packs two values per byte along Dh
    (ops/kv4.py layout) — the page pool and the INT4 cache multiply:
    4x the contexts per HBM byte vs a dense INT8 cache."""
    L = cfg.num_hidden_layers
    hk = cfg.num_key_value_heads
    dh = cfg.head_dim if kv_bits == 8 else cfg.head_dim // 2
    return PagedKVCache(
        kt=jnp.zeros((L, num_pages, hk, dh, page_size), jnp.int8),
        v=jnp.zeros((L, num_pages, hk, page_size, dh), jnp.int8),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


@partial(jax.jit, static_argnames=("ecfg", "write_slot"))
def paged_prefill(
    ecfg: EngineConfig,
    params: EngineParams,
    slot_idx: jax.Array,  # () int32 (ignored when write_slot=False)
    input_ids: jax.Array,  # (S,) int32, S a multiple of the page size
    prompt_len: jax.Array,  # () int32
    pages: jax.Array,  # (S // ps,) int32 — distinct pool pages to fill
    cache: PagedKVCache,
    write_slot: bool = True,
) -> Tuple[jax.Array, PagedKVCache]:
    """Prefill a prompt from position 0 and scatter its K/V into ``pages``.

    Runs the exact engine block stack (models/engine._block) on a dense
    scratch cache sized to the padded prompt, then reshapes the result into
    pages — prefill numerics are the engine's by construction.
    ``write_slot=False`` fills pages without touching any slot's length
    (prefix-template computation for register_prefix)."""
    cfg = ecfg.cfg
    s = input_ids.shape[0]
    L = cfg.num_hidden_layers
    # head count from the POOL, not the config: under shard_map each shard
    # sees its local kv heads (parallel/sharded_serving.paged_serving_fns)
    hk, dh = cache.kt.shape[2], cache.kt.shape[3]
    ps = cache.kt.shape[4]
    npg = s // ps
    x = params.embed_tokens[input_ids[None, :]].astype(jnp.float32)  # (1, S, D)

    pos_cos, pos_sin = rope_cos_sin(jnp.arange(s), cfg.head_dim, cfg.rope_theta, jnp.float32)
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    mask = jnp.where((j <= i) & (j < prompt_len), 0.0, jnp.finfo(jnp.float32).min)

    k_scr = jnp.zeros((L, 1, hk, dh, s), jnp.int8)
    v_scr = jnp.zeros((L, 1, hk, s, dh), jnp.int8)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _block(
            ecfg, layer, xc, k_c, v_c, jnp.int32(0), pos_cos, pos_sin, mask,
            ecfg.bm_prefill,
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_scr, v_scr))

    # page-ify: (L, 1, hk, dh, s) -> (L, npg, hk, dh, ps)
    pk = new_k[:, 0].reshape(L, hk, dh, npg, ps).transpose(0, 3, 1, 2, 4)
    pv = new_v[:, 0].reshape(L, hk, npg, ps, dh).transpose(0, 2, 1, 3, 4)
    new_cache = PagedKVCache(
        kt=cache.kt.at[:, pages].set(pk),
        v=cache.v.at[:, pages].set(pv),
        lengths=cache.lengths.at[slot_idx].set(prompt_len) if write_slot else cache.lengths,
    )

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    last = x[0, prompt_len - 1]
    logits = params.lm_head.astype(x.dtype) @ last
    return logits, new_cache


@partial(jax.jit, static_argnames=("ecfg",))
def paged_prefill_chunk(
    ecfg: EngineConfig,
    params: EngineParams,
    slot_idx: jax.Array,  # () int32
    chunk_ids: jax.Array,  # (C,) int32
    start: jax.Array,  # () int32 — cache position the chunk begins at
    valid: jax.Array,  # () int32 — real tokens in the chunk
    table_row: jax.Array,  # (NP,) int32 — the slot's page table row
    cache: PagedKVCache,
) -> Tuple[jax.Array, PagedKVCache]:
    """Prefill one chunk at position ``start`` of a slot whose earlier
    positions already live in pages (prefix-shared admission, chunked long
    prompts).

    Mechanism: gather the slot's pages into a dense scratch, run the engine
    block stack (which appends the chunk at ``start`` and attends over the
    dense view), then scatter every page back.  Shared pages are written
    back with identical bytes (the block only modifies [start, start+C)),
    so sharing is preserved; the null-page duplicates in ``table_row``
    scatter identical values.  Traffic is one slot's dense cache per chunk
    — the admission-time cost of keeping decode fully paged."""
    cfg = ecfg.cfg
    c = chunk_ids.shape[0]
    L = cfg.num_hidden_layers
    hk, dh = cache.kt.shape[2], cache.kt.shape[3]  # local under shard_map
    ps = cache.kt.shape[4]
    npg = table_row.shape[0]
    smax = npg * ps
    x = params.embed_tokens[chunk_ids[None, :]].astype(jnp.float32)

    positions = start + jnp.arange(c)
    pos_cos, pos_sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, jnp.float32)
    i = positions[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

    # densify the slot: (L, NP, hk, dh, ps) -> (L, 1, hk, dh, NP*ps)
    k_dense = jnp.take(cache.kt, table_row, axis=1).transpose(0, 2, 3, 1, 4).reshape(
        L, 1, hk, dh, smax
    )
    v_dense = jnp.take(cache.v, table_row, axis=1).transpose(0, 2, 1, 3, 4).reshape(
        L, 1, hk, smax, dh
    )

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _block(
            ecfg, layer, xc, k_c, v_c, start, pos_cos, pos_sin, mask,
            ecfg.bm_prefill,
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_dense, v_dense))

    pk = new_k[:, 0].reshape(L, hk, dh, npg, ps).transpose(0, 3, 1, 2, 4)
    pv = new_v[:, 0].reshape(L, hk, npg, ps, dh).transpose(0, 2, 1, 3, 4)
    new_cache = PagedKVCache(
        kt=cache.kt.at[:, table_row].set(pk),
        v=cache.v.at[:, table_row].set(pv),
        lengths=cache.lengths.at[slot_idx].set(start + valid),
    )

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    last = x[0, valid - 1]
    logits = params.lm_head.astype(x.dtype) @ last
    return logits, new_cache


def _paged_decode_block(ecfg, layer, x, kt_pool, v_pool, table, lengths,
                        active, pos_cos, pos_sin):
    """One decoder block, one decode token per slot, paged pool.

    Mirrors serving/batch_engine._decode_block_batched exactly except for
    the append (a page scatter) and the attention (the paged kernel)."""
    cfg = ecfg.cfg
    b = x.shape[0]
    dh = cfg.head_dim
    ps = kt_pool.shape[3]

    from dgq_tpu.models.engine import _block_tail, _qkv_rows, _use_fused_rows

    fused = _use_fused_rows(ecfg, layer, b, 1)
    qkv = _qkv_rows(ecfg, layer, x, ecfg.bm_decode, fused)
    rep = cfg.num_attention_heads // cfg.num_key_value_heads
    hk = qkv.shape[-1] // dh // (rep + 2)
    h = rep * hk
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)

    q = q.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)

    cos = pos_cos[:, None, :, :]
    sin = pos_sin[:, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    q_s8 = _requant(q, layer.q_scale)

    # append: each slot writes its token at (page, offset); inactive slots
    # are pinned to the null page so a freed slot can never corrupt a page
    # that was reallocated to someone else
    bi = jnp.arange(b)
    phys = jnp.where(active, table[bi, lengths // ps], NULL_PAGE)
    off = lengths % ps

    if ecfg.kv_bits == 4:
        # INT4 nibble pages (VERDICT r2 #4: paged x kv4 compose): pack two
        # values/byte along Dh (ops/kv4.py layout), append packed, attend
        # over the unpacked per-layer pool with scale4 folded in.  The
        # unpack is transient (one layer's pool, freed after the einsum);
        # resident HBM is the packed pool — half the INT8 pool's bytes.
        from dgq_tpu.ops.kv4 import KV4_RATIO, pack_nibbles, quantize_kv4, unpack_nibbles

        k4 = pack_nibbles(quantize_kv4(k, layer.k_scale), axis=-1)  # (B,hk,1,Dh/2)
        v4 = pack_nibbles(quantize_kv4(v, layer.v_scale), axis=-1)
        kt_pool = kt_pool.at[phys, :, :, off].set(
            k4.transpose(0, 1, 3, 2)[:, :, :, 0])
        v_pool = v_pool.at[phys, :, off, :].set(v4[:, :, 0, :])
        if ecfg.use_kernel:
            # nibble pages stream PACKED into VMEM — half the page bytes
            # of the INT8 kernel (ops/attention.int4_paged_decode_attention)
            from dgq_tpu.ops.attention import int4_paged_decode_attention

            ctx = int4_paged_decode_attention(
                q_s8[:, :, 0, :], kt_pool, v_pool, table, lengths + 1,
                layer.q_scale, layer.k_scale * KV4_RATIO,
                layer.v_scale * KV4_RATIO, interpret=ecfg.interpret,
            ).reshape(b, 1, h * dh)
        else:
            from dgq_tpu.ops.attention import int8_paged_decode_attention_xla

            ctx = int8_paged_decode_attention_xla(
                q_s8[:, :, 0, :], unpack_nibbles(kt_pool, axis=2),
                unpack_nibbles(v_pool, axis=-1), table, lengths + 1,
                layer.q_scale, layer.k_scale * KV4_RATIO,
                layer.v_scale * KV4_RATIO,
                # NO quant_pv: INT4-KV paths keep fp p @ V everywhere (the
                # dense kv4 decode in batch_engine and models/engine is fp,
                # and the kv4 paged KERNEL is fp) — quant_pv is kv8-scoped
            ).reshape(b, 1, h * dh)
        x = _block_tail(ecfg, layer, x, ctx, ecfg.bm_decode, fused)
        return x, kt_pool, v_pool

    k_s8 = _requant(k, layer.k_scale)
    v_s8 = _requant(v, layer.v_scale)
    kt_pool = kt_pool.at[phys, :, :, off].set(k_s8[:, :, 0, :])
    v_pool = v_pool.at[phys, :, off, :].set(v_s8[:, :, 0, :])

    if ecfg.use_kernel:
        from dgq_tpu.ops.attention import int8_paged_decode_attention

        ctx = int8_paged_decode_attention(
            q_s8[:, :, 0, :], kt_pool, v_pool, table, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
            interpret=ecfg.interpret, quant_pv=ecfg.quant_pv,
        ).reshape(b, 1, h * dh)
    else:
        from dgq_tpu.ops.attention import int8_paged_decode_attention_xla

        ctx = int8_paged_decode_attention_xla(
            q_s8[:, :, 0, :], kt_pool, v_pool, table, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
            quant_pv=ecfg.quant_pv,
        ).reshape(b, 1, h * dh)

    x = _block_tail(ecfg, layer, x, ctx, ecfg.bm_decode, fused)
    return x, kt_pool, v_pool


@partial(jax.jit, static_argnames=("ecfg",))
def paged_decode_batched(
    ecfg: EngineConfig,
    params: EngineParams,
    tokens: jax.Array,  # (B,) int32
    cache: PagedKVCache,
    table: jax.Array,  # (B, NP) int32
    active: jax.Array,  # (B,) bool
) -> Tuple[jax.Array, PagedKVCache]:
    """One decode step for every slot over the paged pool -> (logits (B, V),
    updated cache).  The caller guarantees each active slot's table has a
    page allocated for position lengths[slot]."""
    cfg = ecfg.cfg
    x = params.embed_tokens[tokens[:, None]].astype(jnp.float32)

    pos_cos, pos_sin = jax.vmap(
        lambda p: rope_cos_sin(p[None], cfg.head_dim, cfg.rope_theta, jnp.float32)
    )(cache.lengths)

    def scan_body(xc, layer_and_pool):
        layer, kt_l, v_l = layer_and_pool
        xc, kt_l, v_l = _paged_decode_block(
            ecfg, layer, xc, kt_l, v_l, table, cache.lengths, active,
            pos_cos, pos_sin,
        )
        return xc, (kt_l, v_l)

    x, (new_kt, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.kt, cache.v))

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    logits = jnp.einsum("bd,vd->bv", x[:, 0], params.lm_head.astype(x.dtype))
    adv = active.astype(jnp.int32)
    return logits, PagedKVCache(kt=new_kt, v=new_v, lengths=cache.lengths + adv)


@partial(jax.jit, static_argnames=("ecfg", "steps"))
def paged_decode_multi(
    ecfg: EngineConfig,
    params: EngineParams,
    tokens: jax.Array,  # (B,) int32
    cache: PagedKVCache,
    table: jax.Array,  # (B, NP) int32
    active: jax.Array,  # (B,) bool
    steps: int,
) -> Tuple[jax.Array, PagedKVCache]:
    """``steps`` greedy decode steps in ONE device program (dispatch
    amortization, same contract as engine_decode_multi).  The caller
    pre-allocates pages covering lengths..lengths+steps-1 per active slot."""

    def body(carry, _):
        t, c = carry
        logits, c = paged_decode_batched(ecfg, params, t, c, table, active)
        nt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nt = jnp.where(active, nt, t)
        return (nt, c), nt

    (_, cache), toks = jax.lax.scan(body, (tokens, cache), None, length=steps)
    return toks, cache


@partial(jax.jit, donate_argnames=("cache",))
def copy_page(cache: PagedKVCache, src: jax.Array, dst: jax.Array) -> PagedKVCache:
    """Copy pool page ``src`` -> ``dst`` across all layers (copy-on-write of
    a partial prefix tail page at admission)."""
    return PagedKVCache(
        kt=cache.kt.at[:, dst].set(cache.kt[:, src]),
        v=cache.v.at[:, dst].set(cache.v[:, src]),
        lengths=cache.lengths,
    )


# -- host-side batcher --------------------------------------------------------


class PagedBatcher:
    """Continuous batching over the paged pool.

    Same public surface as serving.scheduler.ContinuousBatcher
    (add_request / step / run / metrics / register_prefix) with page-pool
    semantics:

      * memory = ``num_pages`` x page bytes, independent of num_slots x
        max_len — size the pool to expected tokens in flight;
      * registered prefixes are SHARED: admitted slots point at the prefix's
        pool pages (refcounted); only a partial tail page is copied;
      * pool exhaustion preempts the youngest slot (its request re-queues
        with its generated tokens and resumes by re-prefill — recompute
        preemption, the standard paged-serving policy).

    Requests, sampling, and metrics structure are reused from the scheduler
    module.  Speculative decoding and chunked prefill are dense-batcher
    features; here prompts prefill whole (padded to the page size) and
    decode runs 1 or ``decode_steps`` tokens per dispatch."""

    def __init__(
        self,
        ecfg: EngineConfig,
        params: EngineParams,
        *,
        num_slots: int = 8,
        max_len: int = 2048,
        page_size: int = 128,
        num_pages: Optional[int] = None,
        decode_steps: int = 1,
        mesh=None,
        fns=None,
        max_recoveries: int = 3,
        prefill_chunk: int = 0,
    ):
        if max_len % page_size != 0:
            raise ValueError(f"max_len {max_len} must be a multiple of page_size {page_size}")
        if getattr(ecfg, "kv_bits", 8) not in (8, 4):
            raise ValueError(f"kv_bits must be 8 or 4, got {ecfg.kv_bits}")
        if prefill_chunk and prefill_chunk % page_size != 0:
            raise ValueError(
                f"prefill_chunk {prefill_chunk} must be a multiple of "
                f"page_size {page_size} (chunk boundaries are page boundaries)"
            )
        self.ecfg = ecfg
        self._mesh = mesh
        if mesh is not None and fns is not None:
            raise ValueError("mesh and fns are mutually exclusive")
        if mesh is not None:
            # tensor-sharded paged serving: params TP-placed, pool kv heads
            # sharded, every device call under shard_map
            # (parallel/sharded_serving.paged_serving_fns)
            from dgq_tpu.parallel.sharded_engine import shard_engine_params
            from dgq_tpu.parallel.sharded_serving import paged_serving_fns

            params = shard_engine_params(params, mesh)
            self._f = paged_serving_fns(mesh)
        else:
            # ``fns`` swaps in an alternative device-fn namespace (e.g.
            # parallel/pp_serving.pp_paged_serving_fns for pipeline
            # parallelism; params must already be placed to match)
            self._f = fns
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.ps = page_size
        self.np_per_slot = max_len // page_size
        # default pool: dense-equivalent capacity + the null page
        self.num_pages = num_pages if num_pages else 1 + num_slots * self.np_per_slot
        if self.num_pages < 2:
            raise ValueError("num_pages must be >= 2 (null page + 1)")
        self.decode_steps = max(1, decode_steps)

        self.cache = self._fn("init_paged_cache")(
            ecfg.cfg, num_slots, self.num_pages, page_size,
            kv_bits=ecfg.kv_bits,
        )
        # host-side allocator state
        self.free: List[int] = list(range(self.num_pages - 1, 0, -1))  # stack; 0 reserved
        self.refs = np.zeros((self.num_pages,), np.int32)
        self.table = np.zeros((num_slots, self.np_per_slot), np.int32)
        self.n_pages = np.zeros((num_slots,), np.int32)  # allocated logical pages per slot
        # host-side mirror of cache.lengths — the scheduler never reads the
        # device array (a dispatch+fetch round trip per read; see
        # serving/scheduler.py lengths_h for the r2 measurement)
        self.lengths_h = np.zeros((num_slots,), np.int32)

        from collections import deque

        self.queue = deque()
        self.slots: List[Optional[object]] = [None] * num_slots
        self.next_tokens = np.zeros((num_slots,), np.int32)
        self.finished: List[object] = []
        self._finished_count = 0
        self._finished_tokens = 0
        self._prefix: Optional[list] = None
        self.prefix_hits = 0
        self.preemptions = 0
        self.prefill_chunk = prefill_chunk
        # slot -> in-progress chunked prefill {"padded", "pos", "n", "resume"}
        self.pending: dict = {}
        self.max_recoveries = max_recoveries
        self._recoveries = 0
        self._seed = 0
        from collections import deque as _dq

        self._lat = _dq(maxlen=512)  # (ttft_s, e2e_s) samples
        import time as _time

        self._t0 = _time.time()

    @classmethod
    def from_checkpoint(cls, path: str, *, use_kernel: Optional[bool] = None, **kw):
        """Serving startup straight from a ``save_engine`` checkpoint
        (mirror of ContinuousBatcher.from_checkpoint)."""
        from dgq_tpu.models.llama import LlamaConfig
        from dgq_tpu.utils.checkpoint import load_engine_any

        eng, cfg = load_engine_any(path, mesh=kw.get("mesh"))
        if not isinstance(cfg, LlamaConfig):
            raise ValueError(
                f"PagedBatcher serves the LLaMA engine; checkpoint is {type(cfg).__name__}"
            )
        if use_kernel is None:
            use_kernel = jax.default_backend() not in ("cpu",)
        return cls(EngineConfig(cfg=cfg, use_kernel=use_kernel), eng, **kw)

    def _fn(self, name: str):
        """Device entry point by name: the shard_map-wrapped variant when
        serving tensor-sharded, else this module's global."""
        if self._f is not None:
            return getattr(self._f, name)
        return globals()[name]

    # -- allocator ----------------------------------------------------------

    def _alloc(self, n: int) -> Optional[List[int]]:
        if len(self.free) < n:
            return None
        pages = [self.free.pop() for _ in range(n)]
        for p in pages:
            self.refs[p] = 1
        return pages

    def _release(self, pages) -> None:
        for p in pages:
            p = int(p)
            if p == NULL_PAGE:
                continue
            self.refs[p] -= 1
            assert self.refs[p] >= 0, f"page {p} refcount underflow"
            if self.refs[p] == 0:
                self.free.append(p)

    def _free_slot(self, slot: int) -> None:
        n = int(self.n_pages[slot])
        self._release(self.table[slot, :n])
        self.table[slot, :] = NULL_PAGE
        self.n_pages[slot] = 0
        self.slots[slot] = None

    def pages_in_use(self) -> int:
        return self.num_pages - 1 - len(self.free)

    @property
    def kv_bytes_per_token(self) -> int:
        """Resident pool bytes per cached token (K + V, all layers) — the
        driver-visible contexts-per-HBM-byte stat.  INT8: L*Hkv*Dh*2;
        kv_bits=4 halves it (nibble pages)."""
        L, _, hk, dh_stored, _ = self.cache.kt.shape
        return int(2 * L * hk * dh_stored)

    # -- public API ----------------------------------------------------------

    def add_request(self, req) -> None:
        n = len(req.prompt_ids)
        if n == 0:
            raise ValueError("empty prompt")
        padded = -(-n // self.ps) * self.ps
        if padded > self.max_len or n + 1 > self.max_len:
            raise ValueError(
                f"prompt of {n} tokens (padded {padded}) does not fit "
                f"max_len={self.max_len} (page_size={self.ps})"
            )
        if req.max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        if getattr(req, "t_submit", None) is None:
            import time as _time

            req.t_submit = _time.time()
        self.queue.append(req)

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slots)

    def cancel(self, uid: int) -> bool:
        """Cancel a request by uid (queued, mid-prefill, or decoding); its
        pages release back to the pool immediately.  Same contract as
        ContinuousBatcher.cancel."""
        for i, r in enumerate(self.queue):
            if r.uid == uid:
                del self.queue[i]
                return self._finish_cancelled(r)
        for s, r in enumerate(self.slots):
            if r is not None and r.uid == uid:
                self.pending.pop(s, None)
                self._free_slot(s)
                self.lengths_h[s] = 0
                return self._finish_cancelled(r)
        return False

    def _finish_cancelled(self, req) -> bool:
        req.cancelled = True
        self._finish_req(req)
        return True

    def _finish_req(self, req):
        """Single point for completion bookkeeping (mirrors
        ContinuousBatcher._finish_req)."""
        import time as _time

        now = _time.time()
        req.done = True
        if getattr(req, "t_first", None) is None and req.output_ids:
            req.t_first = now
        if getattr(req, "t_done", None) is None:
            req.t_done = now
        self.finished.append(req)
        self._finished_count += 1
        self._finished_tokens += len(req.output_ids)
        if getattr(req, "t_submit", None) is not None:
            self._lat.append((
                (req.t_first - req.t_submit) if req.t_first else None,
                req.t_done - req.t_submit,
            ))

    def register_prefix(self, prefix_ids) -> None:
        """Prefill ``prefix_ids`` ONCE into pool pages; admitted prompts
        starting with it share those pages (full pages by reference, the
        partial tail page by copy)."""
        ids = np.asarray(prefix_ids, np.int32)
        if len(ids) == 0:
            raise ValueError("empty prefix")
        padded = -(-len(ids) // self.ps) * self.ps
        if len(ids) + 1 >= self.max_len or padded > self.max_len:
            raise ValueError(
                f"prefix of {len(ids)} tokens leaves no room in max_len={self.max_len}"
            )
        npg = padded // self.ps
        pages = self._alloc(npg)
        if pages is None:
            raise RuntimeError(
                f"pool exhausted: prefix needs {npg} pages, {len(self.free)} free"
            )
        buf = np.zeros((padded,), np.int32)
        buf[: len(ids)] = ids
        _, self.cache = self._fn("paged_prefill")(
            self.ecfg, self.params, jnp.asarray(0, jnp.int32), jnp.asarray(buf),
            jnp.asarray(len(ids), jnp.int32), jnp.asarray(pages, jnp.int32),
            self.cache, write_slot=False,
        )
        # the _alloc refcount of 1 is the registry's pin: it is never
        # released (no unregister), so prefix pages outlive every slot
        if self._prefix is None:
            self._prefix = []
        self._prefix.append({"ids": ids, "pages": pages, "len": len(ids)})
        self._prefix.sort(key=lambda d: -d["len"])

    def metrics(self) -> dict:
        import time as _time

        now = _time.time()
        gen = self._finished_tokens + sum(
            len(r.output_ids) for r in self.slots if r is not None
        )
        occ = sum(r is not None for r in self.slots)
        out = {
            "wall_s": round(now - self._t0, 3),
            "tokens_generated": gen,
            "tokens_per_s": round(gen / max(now - self._t0, 1e-9), 2),
            "requests_finished": self._finished_count,
            "requests_queued": len(self.queue),
            "slots_active": occ,
            "slot_occupancy": round(occ / self.num_slots, 3),
            "pages_total": self.num_pages - 1,
            "pages_in_use": self.pages_in_use(),
            "kv_bits": self.ecfg.kv_bits,
            "kv_bytes_per_token": self.kv_bytes_per_token,
            "tokens_per_hbm_gib": int((1 << 30) // self.kv_bytes_per_token),
            "page_utilization": round(self.pages_in_use() / (self.num_pages - 1), 3),
            "preemptions": self.preemptions,
            "prefills_pending": len(self.pending),
        }
        if self._lat:
            e2e = sorted(s[1] for s in self._lat)
            out["e2e_ms_p50"] = round(e2e[len(e2e) // 2] * 1e3, 1)
            out["e2e_ms_p95"] = round(e2e[min(len(e2e) - 1, int(len(e2e) * 0.95))] * 1e3, 1)
            ttft = sorted(s[0] for s in self._lat if s[0] is not None)
            if ttft:
                out["ttft_ms_p50"] = round(ttft[len(ttft) // 2] * 1e3, 1)
                out["ttft_ms_p95"] = round(
                    ttft[min(len(ttft) - 1, int(len(ttft) * 0.95))] * 1e3, 1)
        if self._prefix is not None:
            out["prefix_hits"] = self.prefix_hits
        return out

    def step(self) -> None:
        """One admit + decode pass.  Device failures (backend resets,
        preemptions) are recovered like the dense batcher: the pool is
        rebuilt, prefixes re-registered, and every live slot re-prefilled
        from its request's host-side history, then the step retries."""
        try:
            self._step_inner()
        except Exception:  # noqa: BLE001 — backend errors are not typed
            self._recoveries += 1
            if self._recoveries > self.max_recoveries:
                raise
            self._recover()
            self._step_inner()

    def _step_inner(self) -> None:
        self._admit()
        self._advance_pending()
        if any(r is not None and s not in self.pending
               for s, r in enumerate(self.slots)):
            self._decode()

    def _recover(self) -> None:
        """Rebuild device state from host history: fresh pool + allocator,
        prefixes re-prefilled, every live slot re-admitted at its exact
        position (prompt + consumed tokens; the pending next token is
        host-side).  The page-table/refcount state is host-owned, so it is
        reset wholesale and rebuilt through the normal admission path."""
        for s_ in list(self.pending):
            req = self.slots[s_]
            self.slots[s_] = None
            self.queue.appendleft(req)
        self.pending.clear()
        live = [(s_, r) for s_, r in enumerate(self.slots) if r is not None]
        prefixes = [p["ids"] for p in (self._prefix or [])]
        self.cache = self._fn("init_paged_cache")(
            self.ecfg.cfg, self.num_slots, self.num_pages, self.ps,
            kv_bits=self.ecfg.kv_bits,
        )
        self.free = list(range(self.num_pages - 1, 0, -1))
        self.refs[:] = 0
        self.table[:, :] = NULL_PAGE
        self.n_pages[:] = 0
        self.lengths_h[:] = 0
        self.slots = [None] * self.num_slots
        self._prefix = None
        for ids in prefixes:
            self.register_prefix(ids)
        for s_, req in live:
            assert req.output_ids, "live slot must have emitted a token"
            req._preempt_hist = np.concatenate([
                np.asarray(req.prompt_ids, np.int32),
                np.asarray(req.output_ids[:-1], np.int32),
            ])
            req._preempt_next = int(self.next_tokens[s_])
            if not self._admit_one(s_, req):
                # pool can't fit the resume right now: back to the queue
                req_hist = req
                self.queue.appendleft(req_hist)

    def run(self) -> List[object]:
        while self.has_work:
            self.step()
        return self.finished

    # -- internals -----------------------------------------------------------

    def _match_prefix(self, p: np.ndarray):
        for pre in self._prefix or ():
            n = pre["len"]
            if len(p) > n and np.array_equal(p[:n], pre["ids"]):
                return pre
        return None

    def _admit(self) -> None:
        free_slots = [s for s in range(self.num_slots) if self.slots[s] is None]
        while free_slots and self.queue:
            req = self.queue[0]
            slot = free_slots[0]
            if not self._admit_one(slot, req):
                break  # pool exhausted: stop admitting, decode drains pages
            self.queue.popleft()
            free_slots.pop(0)

    def _admit_one(self, slot: int, req) -> bool:
        """Prefill ``req`` into ``slot``.  Returns False (leaving req queued)
        when the pool can't supply the pages."""
        hist = np.asarray(req.prompt_ids, np.int32)
        resume_token = None
        if getattr(req, "_preempt_hist", None) is not None:
            hist = req._preempt_hist
            resume_token = req._preempt_next
        pre = None if resume_token is not None else self._match_prefix(hist)
        if pre is not None and self._admit_prefix(slot, req, pre):
            return True
        c = self.prefill_chunk
        if c and len(hist) > c and -(-len(hist) // c) * c <= self.max_len:
            # long prompt: one chunk per scheduler step (head-of-line bound),
            # pages allocated lazily per chunk in _advance_pending; re-pad to
            # a chunk multiple so every chunk holds >= 1 real token
            padded_c = np.zeros((-(-len(hist) // c) * c,), np.int32)
            padded_c[: len(hist)] = hist
            self.slots[slot] = req
            self.pending[slot] = {"padded": padded_c, "pos": 0,
                                  "n": len(hist), "resume": resume_token}
            return True
        padded = -(-len(hist) // self.ps) * self.ps
        npg = padded // self.ps
        pages = self._alloc(npg)
        if pages is None:
            return False
        buf = np.zeros((padded,), np.int32)
        buf[: len(hist)] = hist
        logits, self.cache = self._fn("paged_prefill")(
            self.ecfg, self.params, jnp.asarray(slot, jnp.int32), jnp.asarray(buf),
            jnp.asarray(len(hist), jnp.int32), jnp.asarray(pages, jnp.int32),
            self.cache,
        )
        self.table[slot, :npg] = pages
        self.n_pages[slot] = npg
        self.slots[slot] = req
        self.lengths_h[slot] = len(hist)
        if resume_token is not None:
            req._preempt_hist = None
            req._preempt_next = None
            self.next_tokens[slot] = resume_token
        else:
            tok = self._pick_token(req, logits[None, :])
            req.output_ids.append(tok)
            self.next_tokens[slot] = tok
            self._maybe_finish(slot)
        return True

    def _admit_prefix(self, slot: int, req, pre) -> bool:
        """Admission under a registered prefix: share full pages, copy the
        partial tail page, prefill only the remainder."""
        n = pre["len"]
        full = n // self.ps  # whole shared pages
        tail_used = n % self.ps
        p = np.asarray(req.prompt_ids, np.int32)
        rem = p[n:]
        rem_padded = -(-len(rem) // self.ps) * self.ps
        # pages the slot needs beyond the shared ones: a copied tail page
        # (if partial) + pages covering the remainder beyond the tail
        tail_cap = (self.ps - tail_used) % self.ps
        over = max(0, len(rem) - tail_cap)
        n_new = (1 if tail_used else 0) + (-(-over // self.ps) if over else 0)
        total_lp = -(-(n + len(rem)) // self.ps)
        if total_lp > self.np_per_slot:
            return False  # doesn't fit a slot; caller falls back (will also not fit plain)
        new_pages = self._alloc(n_new) if n_new else []
        if new_pages is None:
            return False
        # share the full pages
        for i in range(full):
            src = pre["pages"][i]
            self.table[slot, i] = src
            self.refs[src] += 1
        li = full
        if tail_used:
            dst = new_pages[0]
            self.cache = self._fn("copy_page")(
                self.cache, jnp.asarray(pre["pages"][full], jnp.int32),
                jnp.asarray(dst, jnp.int32),
            )
            self.table[slot, li] = dst
            li += 1
        for pg in new_pages[(1 if tail_used else 0):]:
            self.table[slot, li] = pg
            li += 1
        self.n_pages[slot] = li
        # the remainder prefills at position n over the slot's paged view
        buf = np.zeros((rem_padded,), np.int32)
        buf[: len(rem)] = rem
        logits, self.cache = self._fn("paged_prefill_chunk")(
            self.ecfg, self.params, jnp.asarray(slot, jnp.int32), jnp.asarray(buf),
            jnp.asarray(n, jnp.int32), jnp.asarray(len(rem), jnp.int32),
            jnp.asarray(self.table[slot].copy(), jnp.int32), self.cache,
        )
        self.slots[slot] = req
        self.lengths_h[slot] = n + len(rem)
        tok = self._pick_token(req, logits[None, :])
        req.output_ids.append(tok)
        self.next_tokens[slot] = tok
        self.prefix_hits += 1
        self._maybe_finish(slot)
        return True

    def _advance_pending(self) -> None:
        """Advance ONE chunked prefill by one chunk (pages allocated for
        exactly that chunk — the paged analogue of the dense batcher's
        head-of-line bound)."""
        if not self.pending:
            return
        slot = next(iter(self.pending))
        st = self.pending[slot]
        req = self.slots[slot]
        c = self.prefill_chunk
        padded, pos = st["padded"], st["pos"]
        end = min(pos + c, len(padded))
        need_lp = -(-end // self.ps)  # logical pages covering [0, end)
        add = need_lp - int(self.n_pages[slot])
        if add > 0:
            pages = self._alloc(add)
            if pages is None:
                if not self._preempt_one(exclude=slot):
                    if not any(r is not None and s_ != slot
                               for s_, r in enumerate(self.slots)):
                        raise RuntimeError(
                            f"pool of {self.num_pages - 1} pages cannot hold "
                            f"one {self.prefill_chunk}-token prefill chunk"
                        )
                    return  # wait for decode to drain pages
                pages = self._alloc(add)
                if pages is None:
                    return
            np_s = int(self.n_pages[slot])
            self.table[slot, np_s : np_s + add] = pages
            self.n_pages[slot] = np_s + add
        chunk = np.zeros((c,), np.int32)
        chunk[: end - pos] = padded[pos:end]
        valid = min(st["n"], end) - pos
        assert valid >= 1, (pos, end, st["n"])
        logits, self.cache = self._fn("paged_prefill_chunk")(
            self.ecfg, self.params, jnp.asarray(slot, jnp.int32),
            jnp.asarray(chunk), jnp.asarray(pos, jnp.int32),
            jnp.asarray(valid, jnp.int32),
            jnp.asarray(self.table[slot].copy(), jnp.int32), self.cache,
        )
        st["pos"] = end
        self.lengths_h[slot] = min(st["n"], end)  # == pos + valid
        if end >= len(padded):
            del self.pending[slot]
            if st["resume"] is not None:
                req._preempt_hist = None
                req._preempt_next = None
                self.next_tokens[slot] = st["resume"]
            else:
                tok = self._pick_token(req, logits[None, :])
                req.output_ids.append(tok)
                self.next_tokens[slot] = tok
                self._maybe_finish(slot)

    def _ensure_decode_pages(self, steps: int) -> bool:
        """Allocate pages so every active slot can append ``steps`` tokens.
        Preempts the youngest slot on exhaustion.  Returns False if nothing
        is active afterwards."""
        while True:
            lens = self.lengths_h
            need: List[Tuple[int, int]] = []  # (slot, pages to add)
            for s, r in enumerate(self.slots):
                if r is None or s in self.pending:
                    continue
                last_lp = (int(lens[s]) + steps - 1) // self.ps
                if last_lp >= self.np_per_slot:
                    continue  # capacity finish will trigger in _maybe_finish
                add = last_lp + 1 - int(self.n_pages[s])
                if add > 0:
                    need.append((s, add))
            total = sum(a for _, a in need)
            if total <= len(self.free):
                for s, add in need:
                    pages = self._alloc(add)
                    np_s = int(self.n_pages[s])
                    self.table[s, np_s : np_s + add] = pages
                    self.n_pages[s] = np_s + add
                return any(r is not None for r in self.slots)
            if not self._preempt_one():
                return any(r is not None for r in self.slots)

    def _preempt_one(self, exclude: int = -1) -> bool:
        """Evict the youngest active slot (fewest generated tokens): its
        pages free, its request re-queues carrying generation so far and
        resumes by re-prefill (recompute preemption).  Mid-chunked-prefill
        slots restart from scratch (no generation to preserve)."""
        cands = [s for s, r in enumerate(self.slots)
                 if r is not None and s != exclude]
        if not cands or (exclude < 0 and len(cands) <= 1):
            return False  # never preempt the last slot: it can't make progress otherwise
        s = min(cands, key=lambda i: len(self.slots[i].output_ids))
        req = self.slots[s]
        req._preempt_hist = np.concatenate([
            np.asarray(req.prompt_ids, np.int32),
            np.asarray(req.output_ids[:-1], np.int32),
        ]) if req.output_ids else np.asarray(req.prompt_ids, np.int32)
        req._preempt_next = int(self.next_tokens[s]) if req.output_ids else None
        if req._preempt_next is None:
            req._preempt_hist = None
        self.pending.pop(s, None)
        self._free_slot(s)
        self.lengths_h[s] = 0
        self.cache = self.cache._replace(
            lengths=self.cache.lengths.at[s].set(0)
        )
        self.queue.appendleft(req)
        self.preemptions += 1
        return True

    def _decode(self) -> None:
        steps = self.decode_steps
        if steps > 1:
            active = [r for s, r in enumerate(self.slots)
                      if r is not None and s not in self.pending]
            lens = self.lengths_h
            if (
                self.pending
                or any(r.sampling is not None and not r.sampling.greedy for r in active)
                # every step's append position must stay < max_len: past it,
                # lengths // ps would index beyond the table (out-of-bounds
                # gather clamps and would CORRUPT another slot's last page)
                or any(
                    int(lens[s]) + steps >= self.max_len
                    for s, r in enumerate(self.slots) if r is not None
                )
            ):
                steps = 1
            elif self.queue and any(
                r.eos_token_id is not None or r.stop_sequences for r in active
            ):
                # queued work + stop-capable requests: bound the admission
                # delay an early stop causes (same policy as the dense
                # scheduler's _multi_window_steps; max_new overshoot is
                # discarded host-side and costs no extra dispatch)
                steps = min(steps, 4)
        if not self._ensure_decode_pages(steps):
            return
        active_mask = np.asarray(
            [r is not None and s not in self.pending
             for s, r in enumerate(self.slots)]
        )
        # attention cost tracks ALLOCATED pages, not max_len: slice the table
        # to the widest slot, bucketed to powers of two so the device program
        # count stays log2(NP) (the dense cache always pays Smax here)
        tw = 1
        peak = int(self.n_pages.max()) if len(self.n_pages) else 1
        while tw < peak:
            tw *= 2
        tw = min(tw, self.np_per_slot)
        table_dev = jnp.asarray(self.table[:, :tw].copy())
        if steps > 1:
            toks, self.cache = self._fn("paged_decode_multi")(
                self.ecfg, self.params, jnp.asarray(self.next_tokens.copy()), self.cache,
                table_dev, jnp.asarray(active_mask), steps,
            )
            self.lengths_h += np.where(active_mask, steps, 0).astype(np.int32)
            toks = np.asarray(toks)  # (steps, B)
            for slot in range(self.num_slots):
                req = self.slots[slot]
                if req is None or slot in self.pending:
                    continue
                for i in range(steps):
                    if req.done:
                        break
                    tok = int(toks[i, slot])
                    req.output_ids.append(tok)
                    self.next_tokens[slot] = tok
                    self._maybe_finish(slot)
            return
        logits, self.cache = self._fn("paged_decode_batched")(
            self.ecfg, self.params, jnp.asarray(self.next_tokens.copy()), self.cache,
            table_dev, jnp.asarray(active_mask),
        )
        self.lengths_h += active_mask.astype(np.int32)
        greedy = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        for slot, req in enumerate(self.slots):
            if req is None or slot in self.pending:
                continue
            if req.sampling is None or req.sampling.greedy:
                tok = int(greedy[slot])
            else:
                tok = self._pick_token(req, logits[slot][None, :])
            req.output_ids.append(tok)
            self.next_tokens[slot] = tok
            self._maybe_finish(slot)

    def _pick_token(self, req, logits_row) -> int:
        from dgq_tpu.serving.sampling import SamplingParams, sample_logits

        sp = req.sampling or SamplingParams()
        if sp.greedy:
            return int(jnp.argmax(logits_row))
        if not hasattr(self, "_key"):
            self._key = jax.random.PRNGKey(self._seed)
        self._key, sub = jax.random.split(self._key)
        return int(sample_logits(jnp.asarray(logits_row), sp, sub)[0])

    def _maybe_finish(self, slot: int) -> None:
        req = self.slots[slot]
        if req is None:
            return
        if getattr(req, "t_first", None) is None and req.output_ids:
            import time as _time

            req.t_first = _time.time()
        from dgq_tpu.serving.scheduler import _hit_stop

        hit_eos = _hit_stop(req)
        hit_max = len(req.output_ids) >= req.max_new_tokens
        hit_cap = int(self.lengths_h[slot]) + 1 >= self.max_len
        if hit_eos or hit_max or hit_cap:
            self._finish_req(req)
            self._free_slot(slot)
            self.lengths_h[slot] = 0
            self.cache = self.cache._replace(
                lengths=self.cache.lengths.at[slot].set(0)
            )
