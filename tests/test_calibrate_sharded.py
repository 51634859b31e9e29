"""Data-parallel (dp-sharded) calibration == sequential calibration.

The reference calibrates on a single "cuda:0" with CPU offload
(reference: quant_sequence.py:21,53-57); here the three replay passes run
``dp`` samples per call with the batch axis sharded over a mesh, and the
search grids run with weight rows sharded.  The per-sample stat reductions
(min-over-batch absmax, Hessian running average with ``batches=g``) are
constructed to make the chunked run mathematically identical to the
sequential one — these tests pin that equivalence on the virtual 8-CPU
mesh, remainder chunks included.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.parallel.mesh import make_mesh
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.quant.packing import PackedLinear
from dgq_tpu.utils.datautils import synthetic_stream

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_llama_config(hidden_size=64, intermediate_size=128, num_hidden_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    # 6 samples with dp=4: one full sharded chunk + a remainder chunk of 2
    calib = synthetic_stream(cfg.vocab_size, 6 * 64 + 1, seed=0)[: 6 * 64].reshape(6, 64)
    return cfg, params, jnp.asarray(calib)


def _qcfg(method="search", **kw):
    return QuantConfig(
        act_quant=ActQuantConfig(bits=8, method="static"),
        wt_quant=WtQuantConfig(bits=4, method=method, groupsize=32, w4w8=(method == "search")),
        smoothquant=True,
        kvquant=True,
        **kw,
    )


def _packed_linears(params):
    out = {}
    for li, layer in enumerate(params["layers"]):
        for mod, names in (("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
                           ("mlp", ("gate_proj", "up_proj", "down_proj"))):
            for nm in names:
                lin = layer[mod][nm]
                assert isinstance(lin, PackedLinear)
                out[(li, nm)] = lin
    return out


def test_dp_sharded_search_matches_sequential(tiny_setup):
    cfg, params, calib = tiny_setup
    qcfg = _qcfg("search")
    seq = ptq(params, cfg, calib, qcfg, arch="llama", verbose=False)
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    shd = ptq(params, cfg, calib, qcfg, arch="llama", verbose=False, mesh=mesh)

    ls, lh = _packed_linears(seq.params), _packed_linears(shd.params)
    for key in ls:
        a, b = ls[key], lh[key]
        # integer packed codes must agree exactly; fp scales to fp tolerance
        np.testing.assert_array_equal(np.asarray(a.qweight), np.asarray(b.qweight), err_msg=str(key))
        np.testing.assert_allclose(np.asarray(a.wscales, np.float32),
                                   np.asarray(b.wscales, np.float32), rtol=0, atol=0)
        np.testing.assert_allclose(float(a.amax), float(b.amax), rtol=1e-6)
    for kv_a, kv_b in zip(seq.kv_scales, shd.kv_scales):
        np.testing.assert_allclose(float(kv_a.k_scale), float(kv_b.k_scale), rtol=1e-6)
        np.testing.assert_allclose(float(kv_a.v_scale), float(kv_b.v_scale), rtol=1e-6)


def test_dp_sharded_gptq_matches_sequential(tiny_setup):
    cfg, params, calib = tiny_setup
    qcfg = _qcfg("gptq")
    seq = ptq(params, cfg, calib, qcfg, arch="llama", verbose=False)
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    shd = ptq(params, cfg, calib, qcfg, arch="llama", verbose=False, mesh=mesh)

    ls, lh = _packed_linears(seq.params), _packed_linears(shd.params)
    for key in ls:
        # the chunked Hessian running average is mathematically the
        # sequential one but sums in a different order; codes can differ
        # only where a rounding boundary is crossed — compare dequantized
        # weights, not codes
        from dgq_tpu.quant.packing import dequantize_linear

        wa = np.asarray(dequantize_linear(ls[key]), np.float32)
        wb = np.asarray(dequantize_linear(lh[key]), np.float32)
        scale = np.maximum(np.abs(wa).max(), 1e-8)
        np.testing.assert_allclose(wa / scale, wb / scale, atol=5e-3, err_msg=str(key))


def test_dp_sharded_divisible_samples(tiny_setup):
    """nsamples divisible by dp: no remainder path at all."""
    cfg, params, calib = tiny_setup
    qcfg = _qcfg("search")
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    seq = ptq(params, cfg, calib[:4], qcfg, arch="llama", verbose=False)
    shd = ptq(params, cfg, calib[:4], qcfg, arch="llama", verbose=False, mesh=mesh)
    ls, lh = _packed_linears(seq.params), _packed_linears(shd.params)
    for key in ls:
        np.testing.assert_array_equal(np.asarray(ls[key].qweight), np.asarray(lh[key].qweight))
