"""Config validation and CLI parsing (the reference's quirky flag handling,
fixed — SURVEY §5 config row)."""

import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig, default_w4a8_config
from dgq_tpu.entry import build_parser, generate_qconfig

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


def test_config_validation():
    with pytest.raises(ValueError):
        ActQuantConfig(method="bogus")
    with pytest.raises(ValueError):
        WtQuantConfig(bits=5)
    with pytest.raises(ValueError):
        WtQuantConfig(bits=8, w4w8=True)  # dual-grained requires 4-bit
    with pytest.raises(ValueError):
        WtQuantConfig(groupsize=0)
    cfg = default_w4a8_config()
    assert cfg.actq and cfg.wtq and cfg.wt_quant.w4w8


def test_groupsize_minus_one_means_full_row():
    cfg = QuantConfig(wt_quant=WtQuantConfig(groupsize=-1, w4w8=False))
    assert cfg.groupsize_for(4096) == 4096


def test_cli_reference_flag_set_parses():
    # the canonical reference invocation (llama7b.sh:2)
    p = build_parser()
    args = p.parse_args(
        "model.dir ptb --wt_fun search --act_fun static --groupsize 128 "
        "--wbits 4 --kvquant --w4w8 --smoothquant --save_safetensors out.st".split()
    )
    q = generate_qconfig(args)
    assert q.wt_quant.method == "search" and q.wt_quant.w4w8
    assert q.act_quant.method == "static"
    assert q.smoothquant and q.kvquant and not q.meanact


def test_cli_gptq_knobs_wired():
    # the reference's gptq path crashes on missing qconfig keys
    # (quant_sequence.py:90 vs entry.py:50-73); here they flow through
    p = build_parser()
    args = p.parse_args(
        "m wikitext2 --wt_fun gptq --act-order --percdamp 0.02".split()
    )
    q = generate_qconfig(args)
    assert q.wt_quant.method == "gptq"
    assert q.wt_quant.act_order is True
    assert q.wt_quant.percdamp == 0.02


def test_cli_inert_reference_flags_accepted():
    p = build_parser()
    args = p.parse_args(
        "m c4 --benchmark --check --sym --true-sequential --observe --nearest".split()
    )
    assert args.benchmark and args.sym  # parsed, documented no-ops


def test_cli_no_quant_modes():
    p = build_parser()
    args = p.parse_args("m wikitext2 --wt_fun no --act_fun no".split())
    q = generate_qconfig(args)
    assert q.act_quant is None and q.wt_quant is None
    assert not q.actq and not q.wtq


def test_cli_save_engine_sharded_then_serve(tmp_path):
    """Full CLI pipeline: tiny fixture -> PTQ -> --inference_mod ->
    --save_engine_sharded DIR, then serving starts from the orbax dir via
    the same from_checkpoint entry point as safetensors checkpoints."""
    import numpy as np

    from dgq_tpu.entry import main
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    d = str(tmp_path / "eng_orbax")
    main(
        f"tiny:llama synthetic --wt_fun search --w4w8 --kvquant --groupsize 32 "
        f"--nsamples 2 --inference_mod --save_engine_sharded {d}".split()
    )
    b = ContinuousBatcher.from_checkpoint(d, use_kernel=False, num_slots=2,
                                          max_len=64, prefill_pad=16)
    b.add_request(Request(uid=0, prompt_ids=np.asarray([3, 5, 3, 5], np.int32),
                          max_new_tokens=4))
    out = b.run()[0].output_ids
    assert len(out) == 4
