"""BLOOM / MPT / Falcon / Mixtral continuous batching via the
family-generic scheduler (serving/family_batch_engine.py): all six
families served."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.serving.family_batch_engine import family_batcher
from dgq_tpu.serving.scheduler import Request
from dgq_tpu.utils.datautils import synthetic_stream


def _qcfg():
    return QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       smoothquant=True, kvquant=True)


@pytest.fixture(scope="module")
def bloom_setup():
    from dgq_tpu.models.bloom import init_bloom_params, tiny_bloom_config
    from dgq_tpu.models.bloom_engine import (
        BloomEngineConfig, bloom_engine_forward, from_ptq_bloom, init_bloom_kv_cache,
    )

    cfg = tiny_bloom_config(hidden_size=256, num_attention_heads=4)
    params = init_bloom_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    res = ptq(params, cfg, calib, _qcfg(), arch="bloom", verbose=False)
    eng = from_ptq_bloom(res.params, res.kv_scales, cfg)
    return (cfg, eng, BloomEngineConfig(cfg=cfg, use_kernel=False),
            bloom_engine_forward, init_bloom_kv_cache)


@pytest.fixture(scope="module")
def mpt_setup():
    from dgq_tpu.models.mpt import init_mpt_params, tiny_mpt_config
    from dgq_tpu.models.mpt_engine import (
        MPTEngineConfig, from_ptq_mpt, init_mpt_kv_cache, mpt_engine_forward,
    )

    cfg = tiny_mpt_config(d_model=256, n_heads=4)
    params = init_mpt_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    res = ptq(params, cfg, calib, _qcfg(), arch="mpt", verbose=False)
    eng = from_ptq_mpt(res.params, res.kv_scales, cfg)
    return (cfg, eng, MPTEngineConfig(cfg=cfg, use_kernel=False),
            mpt_engine_forward, init_mpt_kv_cache)


@pytest.fixture(scope="module")
def falcon_setup():
    from dgq_tpu.models.falcon import init_falcon_params, tiny_falcon_config
    from dgq_tpu.models.falcon_engine import (
        FalconEngineConfig, falcon_engine_forward, from_ptq_falcon, init_falcon_kv_cache,
    )

    cfg = tiny_falcon_config(hidden_size=256, num_attention_heads=4, num_kv_heads=2)
    params = init_falcon_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    res = ptq(params, cfg, calib, _qcfg(), arch="falcon", verbose=False)
    eng = from_ptq_falcon(res.params, res.kv_scales, cfg)
    return (cfg, eng, FalconEngineConfig(cfg=cfg, use_kernel=False),
            falcon_engine_forward, init_falcon_kv_cache)


@pytest.fixture(scope="module")
def mixtral_setup():
    from dgq_tpu.models.mixtral import init_mixtral_params, tiny_mixtral_config
    from dgq_tpu.models.mixtral_engine import (
        MixtralEngineConfig, from_ptq_mixtral, init_mixtral_kv_cache,
        mixtral_engine_forward,
    )

    cfg = tiny_mixtral_config(hidden_size=256, intermediate_size=512,
                              num_attention_heads=4, num_key_value_heads=2)
    params = init_mixtral_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    res = ptq(params, cfg, calib, _qcfg(), arch="mixtral", verbose=False)
    eng = from_ptq_mixtral(res.params, res.kv_scales, cfg)
    return (cfg, eng, MixtralEngineConfig(cfg=cfg, use_kernel=False),
            mixtral_engine_forward, init_mixtral_kv_cache)


def _sequential_greedy(cfg, eng, ecfg, fwd, init_cache, prompt, n_new, max_len=64):
    cache = init_cache(cfg, 1, max_len)
    logits, cache = fwd(ecfg, eng, jnp.asarray(prompt[None]), cache)
    out = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(n_new - 1):
        logits, cache = fwd(ecfg, eng, jnp.asarray([[out[-1]]], jnp.int32), cache)
        out.append(int(jnp.argmax(logits[0, -1])))
    return out


def _check_family(arch, setup):
    cfg, eng, ecfg, fwd, init_cache = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).astype(np.int32)
               for n in (6, 9, 4)]
    want = {i: _sequential_greedy(cfg, eng, ecfg, fwd, init_cache, p, 4)
            for i, p in enumerate(prompts)}

    b = family_batcher(arch, ecfg, eng, num_slots=2, max_len=64, prefill_pad=8)
    for i, p in enumerate(prompts):
        b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
    got = {r.uid: r.output_ids for r in b.run()}
    assert got == want, (arch, got, want)


def test_bloom_batcher_matches_sequential(bloom_setup):
    _check_family("bloom", bloom_setup)


def test_mpt_batcher_matches_sequential(mpt_setup):
    _check_family("mpt", mpt_setup)


def test_falcon_batcher_matches_sequential(falcon_setup):
    _check_family("falcon", falcon_setup)


def test_mixtral_batcher_matches_sequential(mixtral_setup):
    _check_family("mixtral", mixtral_setup)


def test_mixtral_batcher_prefix_chunk_multi(mixtral_setup):
    """Prefix cache, chunked prefill, and multi-step decode ride the
    generic scheduler machinery for the sparse-MoE family too — routing
    is per-token, so a prefix template copied into a slot must reproduce
    the same routed experts and hence the same tokens."""
    cfg, eng, ecfg, fwd, init_cache = mixtral_setup
    rng = np.random.default_rng(7)
    prefix = rng.integers(0, cfg.vocab_size, size=10).astype(np.int32)
    prompts = [
        np.concatenate([prefix, rng.integers(0, cfg.vocab_size, size=4).astype(np.int32)]),
        rng.integers(0, cfg.vocab_size, size=18).astype(np.int32),
    ]

    def run(**kw):
        b = family_batcher("mixtral", ecfg, eng, num_slots=2, max_len=64,
                           prefill_pad=8, **kw)
        b.register_prefix(prefix)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=5))
        out = {r.uid: r.output_ids for r in b.run()}
        assert b.prefix_hits == 1
        return out

    base = run()
    assert run(decode_steps=3) == base
    assert run(prefill_chunk=8) == base


def test_mixtral_kernel_decode_matches_xla(mixtral_setup):
    """GQA + MoE decode through the batcher with interpret-mode kernels
    matches the XLA path."""
    import dataclasses

    cfg, eng, ecfg, fwd, init_cache = mixtral_setup
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, cfg.vocab_size, size=6).astype(np.int32)

    def run(cfg_run):
        b = family_batcher("mixtral", cfg_run, eng, num_slots=1, max_len=32,
                           prefill_pad=8)
        b.add_request(Request(uid=0, prompt_ids=prompt, max_new_tokens=4))
        return b.run()[0].output_ids

    xla = run(ecfg)
    kern = run(dataclasses.replace(ecfg, use_kernel=True, interpret=True))
    assert xla == kern, (xla, kern)


def test_bloom_batcher_prefix_chunk_multi(bloom_setup):
    """Scheduler features (prefix cache, chunked prefill, multi-step
    decode) ride the generic machinery for ALiBi families too."""
    cfg, eng, ecfg, fwd, init_cache = bloom_setup
    rng = np.random.default_rng(7)
    prefix = rng.integers(0, cfg.vocab_size, size=10).astype(np.int32)
    prompts = [
        np.concatenate([prefix, rng.integers(0, cfg.vocab_size, size=4).astype(np.int32)]),
        rng.integers(0, cfg.vocab_size, size=18).astype(np.int32),
    ]

    def run(**kw):
        b = family_batcher("bloom", ecfg, eng, num_slots=2, max_len=64,
                           prefill_pad=8, **kw)
        b.register_prefix(prefix)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=5))
        out = {r.uid: r.output_ids for r in b.run()}
        assert b.prefix_hits == 1
        return out

    base = run()
    assert run(decode_steps=3) == base
    assert run(prefill_chunk=8) == base


def test_falcon_kernel_decode_matches_xla(falcon_setup):
    """The GQA decode path through the batcher with interpret-mode kernels
    matches the XLA path (falcon is the only MQA/GQA non-llama family)."""
    import dataclasses

    cfg, eng, ecfg, fwd, init_cache = falcon_setup
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, size=6).astype(np.int32)]

    def run(cfg_run):
        b = family_batcher("falcon", cfg_run, eng, num_slots=1, max_len=32,
                           prefill_pad=8)
        b.add_request(Request(uid=0, prompt_ids=prompts[0], max_new_tokens=4))
        return b.run()[0].output_ids

    xla = run(ecfg)
    kern = run(dataclasses.replace(ecfg, use_kernel=True, interpret=True))
    assert xla == kern, (xla, kern)


def test_family_batcher_validation(bloom_setup):
    cfg, eng, ecfg, *_ = bloom_setup
    with pytest.raises(ValueError):
        family_batcher("bloom", ecfg, eng, spec_k=2)
    with pytest.raises(ValueError):
        family_batcher("gpt-j", ecfg, eng)


def test_serve_cli_any_family(mpt_setup, tmp_path):
    """python -m dgq_tpu.serve with a non-LLaMA checkpoint: arch read from
    the manifest, served over the fns scheduler."""
    import json
    import socket

    from dgq_tpu.serve import build_parser, build_server
    from dgq_tpu.utils.checkpoint import save_engine

    cfg, eng, ecfg, fwd, init_cache = mpt_setup
    ckpt = str(tmp_path / "mpt.safetensors")
    save_engine(ckpt, eng, cfg, arch="mpt")

    args = build_parser().parse_args(
        [ckpt, "--port", "0", "--slots", "2", "--max-len", "64",
         "--prefill-pad", "8", "--prefill-chunk", "0", "--admit-batch", "1",
         "--spec-k", "0"]
    )
    with build_server(args) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=120) as s:
            f = s.makefile("r")
            s.sendall((json.dumps({"prompt_ids": [3, 5, 3, 5], "max_new_tokens": 5}) + "\n").encode())
            resp = json.loads(f.readline())
            assert resp["done"] and len(resp["output_ids"]) == 5

    # llama-only flags rejected with a clear message
    args = build_parser().parse_args([ckpt, "--port", "0", "--paged"])
    with pytest.raises(SystemExit):
        build_server(args)
