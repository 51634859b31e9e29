"""Layer-sequential PTQ calibration driver (architecture-generic).

The functional re-design of the reference's PTQ loop
(reference: dgq/quant/quant_sequence.py:17-115).  Hooks and Catcher modules
become explicit dataflow (SURVEY §7 design translation):

  * the Catcher's raised-ValueError input capture -> run the embedding
    explicitly; the calibration loop owns the activations,
  * forward hooks -> the block apply returns a stats dict,
  * three replays per block, in the reference's exact order:
      pass 1 (fp)        LN-output absmax (max/batch), late-linear input
                         absmax (max/batch), q/k/v absmax (min/batch)
      -> mean_bias, smoothing (weight rewrites), kv scale freeze
      pass 2 (fp + kv fake-quant active, like the reference after kvquant())
                         per-linear input absmax (min/batch), last-sample
                         inputs (inp1), Hessians for GPTQ
      -> per-linear search/gptq/naive quantize + pack
      pass 3 (quantized) outputs feed the next block
        (quant_sequence.py:107-115).

Activation clamp: amax = inp_absmax.max() — max over channels of the
min-over-batches per-channel absmax (quant_sequence.py:101-104).

Architecture specifics (paths, smoothing wiring, kv placement) live in
dgq_tpu/quant/arch.py adapters.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dgq_tpu.config import QuantConfig
from dgq_tpu.models.llama import KVQuantState, LlamaConfig, QuantState
from dgq_tpu.quant.arch import get_adapter
from dgq_tpu.quant.gptq import gptq_quantize, init_hessian, update_hessian
from dgq_tpu.quant.packing import pack_linear, pack_linear_w4w8
from dgq_tpu.quant.search import naive_quantize, search_quantize
from dgq_tpu.quant.smooth import mean_ln_fcs

# backwards-compatible path map (used by tests and docs)
LLAMA_LINEARS = {
    "q_proj": (("self_attn", "q_proj"), "qkv_inp"),
    "k_proj": (("self_attn", "k_proj"), "qkv_inp"),
    "v_proj": (("self_attn", "v_proj"), "qkv_inp"),
    "o_proj": (("self_attn", "o_proj"), "o_proj_inp"),
    "gate_proj": (("mlp", "gate_proj"), "gate_up_inp"),
    "up_proj": (("mlp", "up_proj"), "gate_up_inp"),
    "down_proj": (("mlp", "down_proj"), "down_proj_inp"),
}


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    if len(path) == 1:
        tree[path[0]] = value
    else:
        _set(tree[path[0]], path[1:], value)


def _channel_absmax(x: jax.Array) -> jax.Array:
    flat = x.reshape(-1, x.shape[-1])
    return jnp.max(jnp.abs(flat), axis=0).astype(jnp.float32)


def _per_sample_channel_absmax(x: jax.Array) -> jax.Array:
    """(B, ..., D) -> (B, D): per-sample per-channel absmax.  Min-over-batch
    statistics (reference: quantizer_helper.py:37-47 — each calib sample is
    one 'batch') must reduce per-sample FIRST so a chunked/dp-sharded pass
    computes exactly what the sequential one does."""
    red = tuple(range(1, x.ndim - 1))
    return jnp.max(jnp.abs(x), axis=red).astype(jnp.float32)


def _channel_max(x):
    return jnp.max(x.reshape(-1, x.shape[-1]), axis=0).astype(jnp.float32)


def _channel_min(x):
    return jnp.min(x.reshape(-1, x.shape[-1]), axis=0).astype(jnp.float32)


class _Pass1State(NamedTuple):
    max_absmax: Dict[str, jax.Array]  # running max of channel absmax
    kv_absmax: Dict[str, jax.Array]  # running min (sta_batch_qkv)
    ch_max: Dict[str, jax.Array]  # running channel max (meanact)
    ch_min: Dict[str, jax.Array]


def _merge_pass1(adapter, collect, st: Optional[_Pass1State], meanact: bool) -> _Pass1State:
    # max stats are associative (chunk-of-B == B sequential merges); the kv
    # min-over-batch stats reduce per-sample first (see _per_sample_channel_absmax)
    mx = {k: _channel_absmax(collect[k]) for k in adapter.max_absmax_keys}
    kv = {k: jnp.min(_per_sample_channel_absmax(collect[k]), axis=0)
          for k in adapter.kv_keys}
    cmx = {k: _channel_max(collect[k]) for k in adapter.minmax_keys} if meanact else {}
    cmn = {k: _channel_min(collect[k]) for k in adapter.minmax_keys} if meanact else {}
    if st is None:
        return _Pass1State(mx, kv, cmx, cmn)
    return _Pass1State(
        {k: jnp.maximum(st.max_absmax[k], v) for k, v in mx.items()},
        {k: jnp.minimum(st.kv_absmax[k], v) for k, v in kv.items()},
        {k: jnp.maximum(st.ch_max[k], v) for k, v in cmx.items()},
        {k: jnp.minimum(st.ch_min[k], v) for k, v in cmn.items()},
    )


def apply_meanact_llama(layer_params: Dict, stats_max: Dict, stats_min: Dict) -> Dict:
    """--meanact for LLaMA: fold LN-output mean into fc biases
    (reference: smooth.py:317-349, LLaMA branch)."""
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    med1 = (stats_max["attn_ln_out"] + stats_min["attn_ln_out"]) / 2.0
    qkv_ws = [p["self_attn"][k]["weight"] for k in ("q_proj", "k_proj", "v_proj")]
    qkv_bs = [p["self_attn"][k].get("bias") for k in ("q_proj", "k_proj", "v_proj")]
    ln_b, new_bs = mean_ln_fcs(p["input_layernorm"]["weight"], None, qkv_ws, qkv_bs, med1)
    p["input_layernorm"] = {**p["input_layernorm"], "bias": ln_b}
    for name, b in zip(("q_proj", "k_proj", "v_proj"), new_bs):
        p["self_attn"][name] = {**p["self_attn"][name], "bias": b}
    med2 = (stats_max["mlp_ln_out"] + stats_min["mlp_ln_out"]) / 2.0
    gu_ws = [p["mlp"][k]["weight"] for k in ("gate_proj", "up_proj")]
    gu_bs = [p["mlp"][k].get("bias") for k in ("gate_proj", "up_proj")]
    ln_b2, new_bs2 = mean_ln_fcs(
        p["post_attention_layernorm"]["weight"], None, gu_ws, gu_bs, med2
    )
    p["post_attention_layernorm"] = {**p["post_attention_layernorm"], "bias": ln_b2}
    for name, b in zip(("gate_proj", "up_proj"), new_bs2):
        p["mlp"][name] = {**p["mlp"][name], "bias": b}
    return p


def _quantize_linear(lin, inp1, hessian, qcfg: QuantConfig, amax):
    """Quantize + pack one linear (reference: quant_sequence.py:88-106)."""
    w = lin["weight"].astype(jnp.float32)
    bias = lin.get("bias")
    wq = qcfg.wt_quant
    groupsize = qcfg.groupsize_for(w.shape[1])
    act_method = qcfg.act_quant.method if qcfg.act_quant else None

    if wq.method == "search":
        if wq.w4w8 and wq.w4w8_fallback_ratio is not None:
            # w4w8 fallback (BASELINE config 3): compare layer-output error
            # of the dual-grained result vs plain fp-group-scale
            # quantization; fall back when the int8-scale constraint costs
            # more than the allowed factor.  ONE search — stage 1 is shared
            # and both errors come out of the same call (VERDICT r3 #8).
            res, res_plain, err_w4w8, err_plain = search_quantize(
                w, inp1, bits=wq.bits, groupsize=groupsize, w4w8=True,
                with_fallback=True,
            )
            if float(err_w4w8) > wq.w4w8_fallback_ratio * max(float(err_plain), 1e-30):
                return pack_linear(
                    res_plain.qweight_fp,
                    res_plain.scale.reshape(-1), res_plain.zero.reshape(-1),
                    groupsize, bias=bias, amax=amax, act_method=act_method,
                    bits=wq.bits,
                )
            return pack_linear_w4w8(
                res.qweight_fp, res.scale, res.zero, res.scale8, groupsize,
                bias=bias, amax=amax, act_method=act_method,
            )
        res = search_quantize(w, inp1, bits=wq.bits, groupsize=groupsize, w4w8=wq.w4w8)
        if wq.w4w8:
            return pack_linear_w4w8(
                res.qweight_fp, res.scale, res.zero, res.scale8, groupsize,
                bias=bias, amax=amax, act_method=act_method,
            )
        return pack_linear(
            res.qweight_fp, res.scale.reshape(-1), res.zero.reshape(-1), groupsize,
            bias=bias, amax=amax, act_method=act_method, bits=wq.bits,
        )
    if wq.method == "gptq":
        H, _ = hessian
        res = gptq_quantize(
            w, H, bits=wq.bits, groupsize=groupsize,
            percdamp=wq.percdamp, act_order=wq.act_order,
        )
        return pack_linear(
            res.qweight_fp, res.scale.reshape(-1), res.zero.reshape(-1), groupsize,
            bias=bias, amax=amax, act_method=act_method, bits=wq.bits,
        )
    if wq.method == "naive":
        scale, zero, wq_fp = naive_quantize(w, bits=wq.bits, groupsize=groupsize)
        return pack_linear(
            wq_fp, scale.reshape(-1), zero.reshape(-1), groupsize,
            bias=bias, amax=amax, act_method=act_method, bits=wq.bits,
        )
    raise NotImplementedError(wq.method)


class PTQResult(NamedTuple):
    params: Any
    kv_scales: List[Optional[KVQuantState]]


def ptq(
    params,
    cfg,
    calib_ids: jax.Array,  # (nsamples, seqlen) int32
    qcfg: QuantConfig,
    *,
    arch: str = "llama",
    verbose: bool = True,
    report=None,  # Optional[dgq_tpu.utils.metrics.QuantReport]
    offload: bool = False,
    resume_dir: Optional[str] = None,
    mesh=None,  # Optional[jax.sharding.Mesh] with a data-parallel axis
    dp_axis: str = "dp",
) -> PTQResult:
    """Quantize a params pytree layer-sequentially (any supported arch).

    With ``offload=True``, params may live in host memory (numpy leaves);
    each layer is device_put for its three passes and the packed result is
    fetched back to host — the TPU-side counterpart of the reference's
    layer-wise CPU<->GPU swapping (reference: quant_sequence.py:53-57,110),
    letting a single chip calibrate models larger than HBM.

    With ``resume_dir``, per-layer state (packed layer + kv scales + the
    running activations) is checkpointed after each block and a crashed run
    resumes from the last completed layer — capability the reference lacks
    (SURVEY §5: "No mid-calibration resume").

    With ``mesh`` (an axis named ``dp_axis``), calibration is data-parallel:
    the three replay passes run ``dp`` samples per call with the batch axis
    sharded over the mesh (layer weights replicated), and each search grid
    runs with the weight's output-channel axis sharded when divisible.  The
    per-sample stat reductions make the result mathematically identical to
    the sequential run — the reference has no counterpart (single "cuda:0",
    SURVEY §2.3); this is what makes 30B+ calibration practical on a pod
    slice.  Works with the virtual CPU mesh for testing.
    """
    adapter = get_adapter(arch, cfg)
    nsamples, seqlen = calib_ids.shape

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        dp = mesh.shape[dp_axis]
        _batch_sh = NamedSharding(mesh, PartitionSpec(dp_axis))
        _repl_sh = NamedSharding(mesh, PartitionSpec())
        _row_sh = NamedSharding(mesh, PartitionSpec(dp_axis))
    else:
        dp = 1
        _batch_sh = _repl_sh = _row_sh = None

    def sample_chunks():
        j = 0
        while j < nsamples:
            g = dp if j + dp <= nsamples else nsamples - j
            yield j, g
            j += g

    def place_chunk(x):
        # full chunks are batch-sharded; the remainder chunk runs unsharded
        if _batch_sh is not None and x.shape[0] == dp > 1:
            return jax.device_put(x, _batch_sh)
        return x

    def place_replicated(tree):
        if _repl_sh is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), _repl_sh), tree
        )

    def shard_weight_rows(lin):
        # shard the search grid over output channels: search_quantize is
        # per-row decomposable, so GSPMD parallelizes the jitted grid with
        # no code change (the TPU analog of sharding GPTQ/search over dp)
        if _row_sh is None or lin["weight"].shape[0] % dp != 0 or dp == 1:
            return lin
        return {**lin, "weight": jax.device_put(lin["weight"], _row_sh)}

    def to_dev(tree):
        return jax.tree_util.tree_map(jnp.asarray, tree)

    def to_host(tree):
        import numpy as _np

        return jax.tree_util.tree_map(
            lambda x: _np.asarray(x) if hasattr(x, "shape") else x, tree
        )

    if offload:
        # embed on device only long enough to produce block-0 inputs
        embed_params = {
            k: to_dev(v) for k, v in params.items() if k != "layers"
        }
        inps = adapter.embed({**embed_params, "layers": []}, calib_ids)
        del embed_params
    else:
        inps = adapter.embed(params, calib_ids)  # (nsamples, S, D)

    dtype = inps.dtype
    aux = adapter.make_aux(seqlen, dtype)

    fp_qs = QuantState(actq=False, wtq=False, kv=False)
    kv_on_qs = QuantState(actq=False, wtq=False, kv=True)
    quant_qs = QuantState(actq=qcfg.actq, wtq=qcfg.wtq, kv=True)
    need_hessian = qcfg.wtq and qcfg.wt_quant.method == "gptq"

    block_stats = jax.jit(
        lambda layer, x, qs, kv: adapter.block(layer, x, aux, qs, kv, collect_stats=True),
        static_argnames=("qs",),
    )
    block_plain = jax.jit(
        lambda layer, x, qs, kv: adapter.block(layer, x, aux, qs, kv),
        static_argnames=("qs",),
    )

    new_layers = []
    kv_scales_all: List[Optional[KVQuantState]] = []

    start_layer = 0
    if resume_dir is not None:
        from dgq_tpu.quant.resume import load_ptq_state

        state = load_ptq_state(resume_dir)
        if state is not None:
            start_layer, new_layers, kv_scales_all, inps = state
            if verbose:
                print(f"[ptq:{arch}] resuming from layer {start_layer}")

    for li, layer in enumerate(adapter.layers(params)):
        if li < start_layer:
            continue
        if verbose:
            print(f"[ptq:{arch}] layer {li}")
        if offload:
            layer = to_dev(layer)
        if mesh is not None:
            layer = place_replicated(layer)
        # ---- pass 1: stats ----
        st: Optional[_Pass1State] = None
        for j, g in sample_chunks():
            _, collect = block_stats(layer, place_chunk(inps[j:j + g]), fp_qs, None)
            st = _merge_pass1(adapter, collect, st, qcfg.meanact)

        # ---- transforms ----
        if qcfg.meanact:
            layer = adapter.meanact(layer, st.ch_max, st.ch_min)
        if qcfg.smoothquant:
            layer = adapter.smooth(layer, st.max_absmax)
        kv_scales = adapter.kv_state(st.kv_absmax) if qcfg.kvquant else None
        kv_scales_all.append(kv_scales)

        # ---- pass 2: per-linear absmax (+Hessian), kv fake-quant live ----
        absmaxes: Dict[str, jax.Array] = {}
        hessians: Dict[str, Any] = {}
        last_inputs = None
        for j, g in sample_chunks():
            _, collect = block_stats(layer, place_chunk(inps[j:j + g]), kv_on_qs, kv_scales)
            for name, (_, fam) in adapter.linears.items():
                # min-over-batch of per-SAMPLE channel absmax (reference:
                # quantizer_helper.py:37-47) — per-sample reduce first so
                # chunked == sequential
                am = jnp.min(_per_sample_channel_absmax(collect[fam]), axis=0)
                prev = absmaxes.get(name)
                absmaxes[name] = am if prev is None else jnp.minimum(prev, am)
            if need_hessian:
                for fam in adapter.hessian_fams:
                    if fam not in hessians:
                        hessians[fam] = init_hessian(collect[fam].shape[-1])
                    hessians[fam] = update_hessian(*hessians[fam], collect[fam], batches=g)
            # the reference keeps only the LAST sample's inputs as inp1
            # (quantizer_helper.py:52)
            last_inputs = {fam: collect[fam][-1:] for fam in adapter.hessian_fams}

        # ---- quantize + pack each linear ----
        layer = jax.tree_util.tree_map(lambda x: x, layer)
        for name, (path, fam) in adapter.linears.items():
            # row-shard the weight so GSPMD splits the jitted search/GPTQ
            # grid over the dp axis (rows are independent in every method)
            lin = shard_weight_rows(_get(layer, path))
            inp1 = last_inputs[fam].reshape(-1, last_inputs[fam].shape[-1])
            amax = jnp.max(absmaxes[name]) if qcfg.actq else None
            t0 = time.time()
            packed = _quantize_linear(lin, inp1, hessians.get(fam), qcfg, amax)
            if report is not None:
                from dgq_tpu.quant.packing import dequantize_linear
                from dgq_tpu.utils.metrics import LinearQuantRecord, weight_quant_metrics

                w_q = dequantize_linear(packed).T  # (N, K)
                wsnr, osnr = weight_quant_metrics(
                    lin["weight"].astype(jnp.float32), w_q, inp1
                )
                report.add(
                    LinearQuantRecord(
                        layer=li, name=name,
                        weight_error=float(jnp.mean((w_q - lin["weight"]) ** 2)),
                        weight_snr=wsnr, output_snr=osnr,
                        amax=None if amax is None else float(amax),
                        time_s=time.time() - t0,
                    ),
                    verbose=verbose,
                )
            _set(layer, path, packed)

        # ---- pass 3: quantized re-forward feeds the next block ----
        outs = []
        for j, g in sample_chunks():
            out = block_plain(layer, place_chunk(inps[j:j + g]), quant_qs, kv_scales)
            outs.append(out)
        inps = jnp.concatenate(outs, axis=0)

        new_layers.append(to_host(layer) if offload else layer)

        if resume_dir is not None:
            from dgq_tpu.quant.resume import save_ptq_state

            save_ptq_state(resume_dir, li + 1, new_layers, kv_scales_all, inps)

    return PTQResult(params=adapter.rebuild(params, new_layers), kv_scales=kv_scales_all)


def ptq_llama(params, cfg: LlamaConfig, calib_ids, qcfg: QuantConfig, *, verbose: bool = True) -> PTQResult:
    """LLaMA entry point (kept for API stability)."""
    return ptq(params, cfg, calib_ids, qcfg, arch="llama", verbose=verbose)
