"""JSON-lines serving daemon (serving/server.py) over a tiny engine."""

import json
import socket

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import EngineConfig, from_ptq
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.serving.scheduler import ContinuousBatcher, Request
from dgq_tpu.serving.server import BatcherServer
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    return cfg, from_ptq(res.params, res.kv_scales, cfg)


def _batcher(cfg, eng, **kw):
    return ContinuousBatcher(EngineConfig(cfg=cfg, use_kernel=False), eng,
                             num_slots=2, max_len=64, prefill_pad=16, **kw)


def _rpc(sock_file, sock, obj):
    sock.sendall((json.dumps(obj) + "\n").encode())
    return json.loads(sock_file.readline())


def test_server_round_trip_matches_direct(engine):
    cfg, eng = engine
    prompt = [3, 5, 3, 5, 3, 5]

    # direct batcher reference output
    ref_b = _batcher(cfg, eng)
    ref_b.add_request(Request(uid=0, prompt_ids=np.asarray(prompt, np.int32),
                              max_new_tokens=8))
    ref = ref_b.run()[0].output_ids

    with BatcherServer(_batcher(cfg, eng)) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=60) as s:
            f = s.makefile("r")
            resp = _rpc(f, s, {"prompt_ids": prompt, "max_new_tokens": 8})
            assert resp["done"] and resp["output_ids"] == ref
            m = _rpc(f, s, {"op": "metrics"})
            assert m["requests_finished"] == 1 and m["tokens_generated"] == 8


def test_server_pipelined_and_sampled(engine):
    cfg, eng = engine
    with BatcherServer(_batcher(cfg, eng)) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=120) as s:
            f = s.makefile("r")
            # two pipelined requests: one greedy, one sampled
            s.sendall((json.dumps({"prompt_ids": [3, 5, 3, 5], "max_new_tokens": 6}) + "\n").encode())
            s.sendall((json.dumps({"prompt_ids": [7, 7, 2, 7], "max_new_tokens": 6,
                                   "temperature": 0.8, "top_k": 8}) + "\n").encode())
            got = [json.loads(f.readline()), json.loads(f.readline())]
            uids = sorted(r["uid"] for r in got)
            assert uids == [0, 1]
            assert all(len(r["output_ids"]) == 6 for r in got)


def test_serve_cli_from_checkpoint(engine, tmp_path):
    """python -m dgq_tpu.serve path: checkpoint -> live socket end-to-end."""
    from dgq_tpu.serve import build_parser, build_server
    from dgq_tpu.utils.checkpoint import save_engine

    cfg, eng = engine
    ckpt = str(tmp_path / "eng.safetensors")
    save_engine(ckpt, eng, cfg, arch="llama")

    args = build_parser().parse_args(
        [ckpt, "--port", "0", "--slots", "2", "--max-len", "64",
         "--prefill-pad", "16", "--prefill-chunk", "0", "--spec-k", "3"]
    )
    with build_server(args) as srv:
        # from_checkpoint picks use_kernel by backend; tests run on CPU
        assert not srv.batcher.ecfg.use_kernel
        with socket.create_connection((srv.host, srv.port), timeout=120) as s:
            f = s.makefile("r")
            resp = _rpc(f, s, {"prompt_ids": [3, 5, 3, 5], "max_new_tokens": 6})
            assert resp["done"] and len(resp["output_ids"]) == 6


def test_server_bad_request(engine):
    cfg, eng = engine
    with BatcherServer(_batcher(cfg, eng)) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=30) as s:
            f = s.makefile("r")
            assert "error" in _rpc(f, s, {"max_new_tokens": 4})
            s.sendall(b"not json\n")
            assert "error" in json.loads(f.readline())
            # deterministically-unservable requests get an error REPLY —
            # they must not poison the serving loop (review finding: a
            # too-long prompt used to death-spiral through _recover)
            assert "error" in _rpc(f, s, {"prompt_ids": [1] * 100,
                                          "max_new_tokens": 4})
            assert "error" in _rpc(f, s, {"prompt_ids": [], "max_new_tokens": 4})
            assert "error" in _rpc(f, s, {"prompt_ids": ["a"], "max_new_tokens": 4})
            # and the loop is still alive afterwards
            ok = _rpc(f, s, {"prompt_ids": [3, 5, 3, 5], "max_new_tokens": 4})
            assert ok.get("done") and len(ok["output_ids"]) == 4


def test_serve_cli_prefix_flag(engine, tmp_path):
    from dgq_tpu.serve import build_parser, build_server
    from dgq_tpu.utils.checkpoint import save_engine

    cfg, eng = engine
    ckpt = str(tmp_path / "eng.safetensors")
    save_engine(ckpt, eng, cfg, arch="llama")
    pf = tmp_path / "prefix.json"
    pf.write_text("[9, 4, 2, 7]")
    args = build_parser().parse_args(
        [ckpt, "--port", "0", "--slots", "2", "--max-len", "64",
         "--prefill-pad", "16", "--prefill-chunk", "0", "--prefix", str(pf)]
    )
    with build_server(args) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=120) as s:
            f = s.makefile("r")
            resp = _rpc(f, s, {"prompt_ids": [9, 4, 2, 7, 3, 5], "max_new_tokens": 6})
            assert resp["done"] and len(resp["output_ids"]) == 6
        assert srv.batcher.prefix_hits == 1


def test_batcher_rejects_oversized_prompt(engine):
    cfg, eng = engine
    b = _batcher(cfg, eng)  # max_len=64, prefill_pad=16
    with pytest.raises(ValueError):
        b.add_request(Request(uid=0, prompt_ids=np.zeros(100, np.int32),
                              max_new_tokens=4))
    with pytest.raises(ValueError):
        b.add_request(Request(uid=1, prompt_ids=np.zeros(0, np.int32),
                              max_new_tokens=4))


def test_serve_cli_paged(engine, tmp_path):
    """--paged serves through the PagedBatcher: same wire protocol, page
    metrics exposed, prefix pages shared."""
    from dgq_tpu.serve import build_parser, build_server
    from dgq_tpu.utils.checkpoint import save_engine

    cfg, eng = engine
    ckpt = str(tmp_path / "eng.safetensors")
    save_engine(ckpt, eng, cfg, arch="llama")
    pf = tmp_path / "prefix.json"
    pf.write_text(json.dumps(list(range(9, 29))))  # 20 tokens = 1.25 pages
    args = build_parser().parse_args(
        [ckpt, "--port", "0", "--slots", "2", "--max-len", "64",
         "--paged", "--page-size", "16", "--prefix", str(pf)]
    )
    with build_server(args) as srv:
        from dgq_tpu.serving.paged import PagedBatcher

        assert isinstance(srv.batcher, PagedBatcher)
        with socket.create_connection((srv.host, srv.port), timeout=120) as s:
            f = s.makefile("r")
            resp = _rpc(f, s, {"prompt_ids": list(range(9, 29)) + [3, 5],
                               "max_new_tokens": 6})
            assert resp["done"] and len(resp["output_ids"]) == 6
            m = _rpc(f, s, {"op": "metrics"})
            assert m["pages_total"] > 0 and m["prefix_hits"] == 1


def test_server_streaming(engine):
    """stream:true delivers partial token lines whose concatenation equals
    the non-streamed greedy output."""
    cfg, eng = engine
    prompt = [3, 5, 3, 5, 3, 5]
    ref_b = _batcher(cfg, eng)
    ref_b.add_request(Request(uid=0, prompt_ids=np.asarray(prompt, np.int32),
                              max_new_tokens=8))
    ref = ref_b.run()[0].output_ids

    with BatcherServer(_batcher(cfg, eng)) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=60) as s:
            f = s.makefile("r")
            s.sendall((json.dumps({"prompt_ids": prompt, "max_new_tokens": 8,
                                   "stream": True}) + "\n").encode())
            partial, lines = [], []
            while True:
                msg = json.loads(f.readline())
                lines.append(msg)
                partial.extend(msg.get("token_ids", []))
                if msg["done"]:
                    break
            assert partial == ref, (partial, ref)
            assert lines[-1]["output_ids"] == ref
            assert any(not m["done"] for m in lines)  # actually streamed


def test_server_cancel(engine):
    """op:cancel finishes an in-flight request early with cancelled:true."""
    cfg, eng = engine
    with BatcherServer(_batcher(cfg, eng)) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=60) as s:
            f = s.makefile("r")
            s.sendall((json.dumps({"prompt_ids": [3, 5, 3, 5],
                                   "max_new_tokens": 50,
                                   "stream": True}) + "\n").encode())
            first = json.loads(f.readline())  # at least one token decoded
            assert not first["done"]
            s.sendall((json.dumps({"op": "cancel", "uid": first["uid"]})
                       + "\n").encode())
            got_ack = got_final = None
            while got_ack is None or got_final is None:
                msg = json.loads(f.readline())
                if "cancelled_ok" in msg:
                    got_ack = msg
                elif msg.get("done"):
                    got_final = msg
            assert got_ack["cancelled_ok"] is True
            assert got_final["cancelled"] is True
            assert len(got_final["output_ids"]) < 50
            # unknown uid cancel is a clean no-op
            resp = _rpc(f, s, {"op": "cancel", "uid": 12345})
            assert resp["cancelled_ok"] is False


def test_server_dp_replicas(engine):
    """Two batcher replicas behind one server: outputs identical to the
    single-replica server per request, and both replicas take work."""
    cfg, eng = engine
    prompts = [[3, 5, 3, 5], [7, 7, 2, 7], [1, 2, 3, 4], [9, 9, 9, 9]]

    # single-replica reference
    refs = {}
    with BatcherServer(_batcher(cfg, eng)) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=120) as s:
            f = s.makefile("r")
            for p in prompts:
                s.sendall((json.dumps({"prompt_ids": p, "max_new_tokens": 6})
                           + "\n").encode())
            for _ in prompts:
                m = json.loads(f.readline())
                refs[m["uid"]] = m["output_ids"]

    with BatcherServer([_batcher(cfg, eng), _batcher(cfg, eng)]) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=120) as s:
            f = s.makefile("r")
            for p in prompts:
                s.sendall((json.dumps({"prompt_ids": p, "max_new_tokens": 6})
                           + "\n").encode())
            got = {}
            for _ in prompts:
                m = json.loads(f.readline())
                got[m["uid"]] = m["output_ids"]
            assert got == refs, (got, refs)
            metrics = _rpc(f, s, {"op": "metrics"})
    assert metrics["num_replicas"] == 2
    assert metrics["requests_finished"] == 4
    # least-loaded routing spread the requests over both replicas
    per = [m["requests_finished"] for m in metrics["replicas"]]
    assert all(n > 0 for n in per), per


def test_replica_failover_migrates_requests(engine):
    """A replica whose loop dies beyond the batcher's own recovery hands
    its unfinished requests to the survivors; outputs (including already-
    generated prefixes) are byte-identical to a healthy run (SURVEY §5
    failure detection / elastic)."""
    cfg, eng = engine
    prompt_a = np.asarray([3, 5, 3, 5], np.int32)
    prompt_b = np.asarray([7, 7, 2, 7], np.int32)

    # ground truth: a healthy single batcher
    ref = _batcher(cfg, eng)
    ref.add_request(Request(uid=0, prompt_ids=prompt_a.copy(), max_new_tokens=6))
    ref.add_request(Request(uid=1, prompt_ids=prompt_b.copy(), max_new_tokens=6))
    want = {r.uid: r.output_ids for r in ref.run()}

    b0, b1 = _batcher(cfg, eng), _batcher(cfg, eng)
    # sabotage replica 0: every step dies (and the batcher's internal
    # recovery is exhausted immediately)
    def boom():
        raise RuntimeError("injected replica failure")
    b0.step = boom
    with BatcherServer([b0, b1]) as srv:
        u0 = srv.submit(prompt_a, 6)   # least-loaded routing -> replica 0
        u1 = srv.submit(prompt_b, 6)   # -> replica 1
        r0 = srv.wait(u0, timeout=120)
        r1 = srv.wait(u1, timeout=120)
        assert r0.output_ids == want[0], (r0.output_ids, want[0])
        assert r1.output_ids == want[1]
        m = srv.metrics()
        assert m["replicas_dead"] == 1
        # the surviving replica still serves new work
        u2 = srv.submit(prompt_a, 6)
        assert srv.wait(u2, timeout=120).output_ids == want[0]
