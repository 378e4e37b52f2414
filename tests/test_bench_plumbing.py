"""bench.py plumbing tests (VERDICT r4 item 1b).

Round 4's official BENCH record crashed because `bench.run_prefill` drifted
out of sync with `inference.chunked_prefill`'s signature and nothing ran the
bench code under test. These tests:

  1. exercise `run_prefill` / `run_decode` FOR REAL on a tiny CPU model, so
     any future signature drift in inference.py breaks the suite loudly;
  2. run `main()`'s full suite plumbing (emit ordering, dedup, budget skip,
     sub-bench parsing) with the device-touching fns monkeypatched out.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from vibevoice_tpu.configs import tiny_config


@pytest.fixture()
def tiny_model():
    import jax
    import jax.numpy as jnp
    from vibevoice_tpu.models import vibevoice as vv

    cfg = tiny_config()
    # bfloat16: run_decode builds a bf16 DecodeCarry (the bench's real dtype)
    params = vv.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    return cfg, params


def test_run_prefill_signature_real(tiny_model):
    """The exact call path that silently died for two rounds (bench.py:186)."""
    cfg, params = tiny_model
    wall = bench.run_prefill(cfg, params, prompt_len=16, max_len=64, chunk=8)
    assert wall > 0


def test_run_decode_signature_real(tiny_model):
    cfg, params = tiny_model
    rtf, step_time = bench.run_decode(
        cfg, params, batch=1, max_len=64, ddpm_steps=2, frames_per_dispatch=4, steps=8
    )
    assert rtf > 0 and step_time > 0


def _fake_main_env(monkeypatch, sub_lines):
    """Monkeypatch every device-touching fn main() reaches; record sub-bench
    invocation order in the returned list."""
    from vibevoice_tpu.models import vibevoice as vv
    from vibevoice_tpu.utils import compile_cache

    order = []
    monkeypatch.setattr(bench, "_load", lambda *a, **k: ("CFG", {"p": 1}))
    monkeypatch.setattr(
        bench, "run_decode",
        lambda cfg, params, *, batch, **kw: (25.0 * batch, 0.005),
    )
    monkeypatch.setattr(bench, "run_prefill", lambda *a, **k: 0.31)
    monkeypatch.setattr(vv, "quantize_for_inference", lambda p, **k: p)
    monkeypatch.setattr(vv, "fuse_for_serving", lambda p, cfg, **k: p)
    monkeypatch.setattr(compile_cache, "enable", lambda: None)

    def fake_sub(script, env_extra, timeout):
        tag = ("sessions" if env_extra.get("BENCH_SESSIONS")
               else "steady" if env_extra.get("BENCH_FRAMES") else "")
        key = (script, tag)
        order.append(key)
        return sub_lines.get(key, [])

    monkeypatch.setattr(bench, "_run_sub_bench", fake_sub)
    # emit() writes _BENCH_EMITTED via os.environ directly; setenv registers
    # a teardown that removes whatever main() leaves behind
    monkeypatch.setenv("_BENCH_EMITTED", "")
    for var in ("BENCH_BATCH", "BENCH_SUITE", "BENCH_BUDGET_S",
                "BENCH_QUICK", "BENCH_CONFIG", "BENCH_BF16"):
        monkeypatch.delenv(var, raising=False)
    return order


def _emitted(capsys):
    out = capsys.readouterr().out
    return [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]


def test_suite_order_and_full_record(monkeypatch, capsys):
    sub = {
        ("bench_streaming.py", ""): [
            {"metric": "TTFA_streaming_0.5B_p50", "value": 35.0, "unit": "ms"}],
        ("bench_serving.py", ""): [
            {"metric": "serving_aggregate_rtf_8slots", "value": 78.0, "unit": "x"}],
        ("bench_streaming.py", "sessions"): [
            {"metric": "streaming_realtime_sessions_max", "value": 24, "unit": "n"}],
        ("bench_serving.py", "steady"): [
            {"metric": "SERVE_1.5B_16slot_steady", "value": 107.0, "unit": "x"}],
    }
    order = _fake_main_env(monkeypatch, sub)
    bench.main()
    lines = _emitted(capsys)
    metrics = [l["metric"] for l in lines]
    # headline first, then bs4, longform; serving BEFORE the session sweep;
    # the 16-slot steady-state line LAST (clip casualty by design)
    assert metrics[0] == "RTF_1.5B_decode_bs1"
    assert metrics[1] == "RTF_1.5B_decode_bs4"
    assert metrics[2].startswith("RTF_1.5B_longform_8192tok_prompt_65536cache")
    assert metrics[3:] == [
        "TTFA_streaming_0.5B_p50",
        "serving_aggregate_rtf_8slots",
        "streaming_realtime_sessions_max",
        "SERVE_1.5B_16slot_steady",
    ]
    assert order == [
        ("bench_streaming.py", ""),
        ("bench_serving.py", ""),
        ("bench_streaming.py", "sessions"),
        ("bench_serving.py", "steady"),
    ]
    # every line the driver parses carries value+unit
    assert all("value" in l and "unit" in l for l in lines)


def test_emit_dedup(monkeypatch, capsys):
    # a sub-bench echoing an already-emitted metric must not double-print
    sub = {
        ("bench_streaming.py", ""): [
            {"metric": "RTF_1.5B_decode_bs1", "value": 1.0, "unit": "x"},
            {"metric": "TTFA_streaming_0.5B_p50", "value": 35.0, "unit": "ms"}],
    }
    _fake_main_env(monkeypatch, sub)
    bench.main()
    metrics = [l["metric"] for l in _emitted(capsys)]
    assert metrics.count("RTF_1.5B_decode_bs1") == 1
    assert "TTFA_streaming_0.5B_p50" in metrics


def test_budget_skips_tail_keeps_headline(monkeypatch, capsys):
    order = _fake_main_env(monkeypatch, {})
    monkeypatch.setenv("BENCH_BUDGET_S", "0")
    bench.main()
    lines = _emitted(capsys)
    metrics = [l["metric"] for l in lines]
    assert metrics[0] == "RTF_1.5B_decode_bs1"  # headline always survives
    assert order == []  # no sub-bench attempted with zero budget


def test_quick_mode_suppresses_suite(monkeypatch, capsys):
    order = _fake_main_env(monkeypatch, {})
    monkeypatch.setenv("BENCH_QUICK", "1")
    bench.main()
    metrics = [l["metric"] for l in _emitted(capsys)]
    assert metrics == ["RTF_1.5B_decode_bs1"]
    assert order == []


def test_sub_bench_parses_json_and_tolerates_failure(tmp_path, monkeypatch):
    good = tmp_path / "good.py"
    good.write_text(
        "import json\n"
        "print('noise line')\n"
        "print(json.dumps({'metric': 'm1', 'value': 1, 'unit': 'u'}))\n"
        "print('{not json')\n"
    )
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(3)\n")
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    lines = bench._run_sub_bench("good.py", {}, timeout=60)
    assert lines == [{"metric": "m1", "value": 1, "unit": "u"}]
    assert bench._run_sub_bench("bad.py", {}, timeout=60) == []
