"""Multi-session streaming engine: N concurrent 0.5B sessions batched into
one device program (the reference hard-caps streaming at batch 1, reference
modeling_vibevoice_streaming_inference.py:511 — this is a beyond-reference
capability). Exactness is proven against solo batch-1 `streaming.generate`
runs via injected per-session noise banks (the same RNG-injection harness the
e2e fidelity tests use)."""

import time

import numpy as np
import jax
import pytest

from vibevoice_tpu.configs import (
    AcousticTokenizerConfig,
    DiffusionHeadConfig,
    Qwen2Config,
    VibeVoiceStreamingConfig,
)
from vibevoice_tpu.models import streaming as st
from vibevoice_tpu.models.inference import GenerateOptions
from vibevoice_tpu.serving.streaming_sessions import StreamingSessionEngine

CFG = VibeVoiceStreamingConfig(
    acoustic_tokenizer_config=AcousticTokenizerConfig(
        vae_dim=16,
        encoder_n_filters=4,
        encoder_ratios=(4, 2),
        encoder_depths=(1, 1, 2),
        decoder_n_filters=4,
    ),
    decoder_config=Qwen2Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=1024,
        rope_theta=10_000.0,
    ),
    diffusion_head_config=DiffusionHeadConfig(hidden_size=64, head_layers=2, latent_size=16),
    tts_backbone_num_hidden_layers=2,
)
HOP = 8
OPTS = GenerateOptions(cfg_scale=1.5, ddpm_steps=3, kv_int8=False)


@pytest.fixture(scope="module")
def params():
    return st.init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def presets(params):
    """Two DIFFERENT voices (different prompt lengths exercise per-slot
    cache-length bookkeeping)."""
    p1 = st.build_voice_preset(
        CFG, params, np.random.RandomState(0).randint(10, 200, (1, 12)),
        neg_prompt_id=3, max_len=256,
    )
    p2 = st.build_voice_preset(
        CFG, params, np.random.RandomState(1).randint(10, 200, (1, 19)),
        neg_prompt_id=3, max_len=256,
    )
    return p1, p2


def _bank(seed, n_frames=120):
    rng = np.random.RandomState(seed)
    return {"init": rng.randn(n_frames, 1, CFG.acoustic_vae_dim).astype(np.float32)}


def _solo(params, preset, text, bank, max_len=256):
    out = st.generate(
        CFG, params,
        tts_text_ids=np.asarray(text).reshape(1, -1),
        preset=preset, opts=OPTS, max_len=max_len, seed=0,
        noise_bank=bank,
    )
    return out.speech_outputs[0]


def _assert_audio_match(got, ref):
    """Batched rows are mathematically identical to solo runs, but XLA's
    gemm tiling at batch N rounds differently from batch 1 at the ~1e-13
    level (same effect CLAUDE.md documents for speech-length bucketing), so
    audio compares by tolerance; LENGTH must match exactly — the EOS
    decisions (sigmoid > 0.5) must be identical."""
    assert len(got) == len(ref), f"frame count differs: {len(got)} vs {len(ref)}"
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-10)


def test_concurrent_sessions_match_solo(params, presets):
    """Two sessions with different voices + scripts, admitted together,
    produce EXACTLY the audio of their solo batch-1 runs."""
    p1, p2 = presets
    t1 = np.random.RandomState(2).randint(10, 200, (9,))
    t2 = np.random.RandomState(3).randint(10, 200, (14,))
    b1, b2 = _bank(10), _bank(11)

    ref1 = _solo(params, p1, t1, b1)
    ref2 = _solo(params, p2, t2, b2)

    eng = StreamingSessionEngine(
        CFG, params, n_slots=2, max_len=256, opts=OPTS, inject=True
    )
    try:
        h1 = eng.submit(t1, p1, noise_bank=b1)
        h2 = eng.submit(t2, p2, noise_bank=b2)
        got1 = h1.result(timeout=120)
        got2 = h2.result(timeout=120)
    finally:
        eng.shutdown(drain=False)

    _assert_audio_match(got1, ref1)
    _assert_audio_match(got2, ref2)
    assert h1.ttfa_ms is not None and h2.ttfa_ms is not None
    st_snap = eng.stats()
    assert st_snap["submitted"] == 2 and st_snap["completed"] == 2
    assert st_snap["ttfa_p50_ms"] is not None and st_snap["windows_run"] >= 1
    assert st_snap["frames_emitted"] == (len(got1) + len(got2)) // HOP


@pytest.mark.parametrize(
    "quantum", [6, pytest.param(1, marks=pytest.mark.slow)]
)
def test_quantum_variants_match_solo(params, presets, quantum):
    """The admission quantum (default 3, covered by every other test here)
    only changes host dispatch cadence: quantum=6 (the round-4 one-dispatch-
    per-window loop) and quantum=1 (finest admission) must both reproduce
    the solo run exactly."""
    p1, _ = presets
    t = np.random.RandomState(20).randint(10, 200, (11,))
    b = _bank(60)
    ref = _solo(params, p1, t, b)
    eng = StreamingSessionEngine(
        CFG, params, n_slots=2, max_len=256, opts=OPTS, inject=True,
        quantum=quantum,
    )
    try:
        got = eng.submit(t, p1, noise_bank=b).result(timeout=120)
    finally:
        eng.shutdown(drain=False)
    _assert_audio_match(got, ref)


@pytest.mark.slow
def test_kv_int8_sessions_match_solo_int8(params, presets):
    """int8-KV multi-session (the long-context memory knob): the admit
    splice quantizes preset rows with the same rounding as the solo
    init_stream_state path, decode quantizes-on-write — a batched session
    must reproduce its solo batch-1 int8 run."""
    p1, p2 = presets
    opts8 = GenerateOptions(cfg_scale=1.5, ddpm_steps=3, kv_int8=True)
    t1 = np.random.RandomState(30).randint(10, 200, (9,))
    t2 = np.random.RandomState(31).randint(10, 200, (13,))
    b1, b2 = _bank(70), _bank(71)

    def solo8(preset, text, bank):
        out = st.generate(
            CFG, params, tts_text_ids=np.asarray(text).reshape(1, -1),
            preset=preset, opts=opts8, max_len=256, seed=0, noise_bank=bank,
        )
        return out.speech_outputs[0]

    ref1, ref2 = solo8(p1, t1, b1), solo8(p2, t2, b2)
    eng = StreamingSessionEngine(
        CFG, params, n_slots=2, max_len=256, opts=opts8, inject=True
    )
    try:
        assert eng._state.tts_cache.quantized  # int8 actually in effect
        h1 = eng.submit(t1, p1, noise_bank=b1)
        h2 = eng.submit(t2, p2, noise_bank=b2)
        got1 = h1.result(timeout=120)
        got2 = h2.result(timeout=120)
    finally:
        eng.shutdown(drain=False)
    _assert_audio_match(got1, ref1)
    _assert_audio_match(got2, ref2)


def test_session_priority_express_slot(params, presets):
    """Sessions are long-lived: with every bulk slot busy, a new listener
    waits for a hang-up. reserved_slots keeps express slots only
    submit(priority=True) may take — the priority session starts while bulk
    sessions are still queued. (ignore_eos + frame caps give deterministic
    lifetimes: random tiny weights EOS within 1-2 frames otherwise; the
    priority path's solo fidelity is covered by the other inject tests.)"""
    p1, _ = presets
    long_t = np.random.RandomState(40).randint(10, 200, (60,))
    pri_t = np.random.RandomState(41).randint(10, 200, (6,))

    eng = StreamingSessionEngine(
        CFG, params, n_slots=2, max_len=512, opts=OPTS, inject=True,
        reserved_slots=1, ignore_eos=True,
    )
    try:
        # two long bulk sessions: one occupies the single bulk slot, the
        # second queues; the express slot must stay empty
        hb1 = eng.submit(long_t, p1, noise_bank=_bank(80, 300), max_new_frames=90)
        hb2 = eng.submit(long_t, p1, noise_bank=_bank(82, 300), max_new_frames=90)
        next(hb1.frames(timeout=120))
        assert eng.slots[0] is None, "express slot must never hold bulk work"
        assert eng.slots[1] is not None and eng.slots[1].handle is hb1

        hp = eng.submit(
            pri_t, p1, noise_bank=_bank(81), priority=True, max_new_frames=6
        )
        got = hp.result(timeout=120)
        assert len(got) > 0 and hp.first_audio_t is not None
        # the queued bulk session must not have started before the priority
        # one (bulk slot is still held by hb1's 90-frame run)
        assert hb2.first_audio_t is None or hb2.first_audio_t > hp.first_audio_t
        hb1.cancel()
        hb2.cancel()
        assert hb1.done.wait(60) and hb2.done.wait(60)
    finally:
        eng.shutdown(drain=False)


def test_session_reserved_slots_validation(params):
    with pytest.raises(ValueError, match="reserved_slots"):
        StreamingSessionEngine(
            CFG, params, n_slots=2, max_len=256, opts=OPTS, reserved_slots=2,
        )


def test_quantum_must_divide_window(params, presets):
    with pytest.raises(ValueError, match="quantum"):
        StreamingSessionEngine(
            CFG, params, n_slots=1, max_len=256, opts=OPTS, quantum=4,
        )


@pytest.mark.slow
def test_staggered_admit_matches_solo(params, presets):
    """A session admitted while another is mid-stream still reproduces its
    solo run exactly (slot splice does not disturb the resident session)."""
    p1, p2 = presets
    t1 = np.random.RandomState(4).randint(10, 200, (40,))  # long script
    t2 = np.random.RandomState(5).randint(10, 200, (6,))
    b1, b2 = _bank(12), _bank(13)

    ref1 = _solo(params, p1, t1, b1)
    ref2 = _solo(params, p2, t2, b2)

    eng = StreamingSessionEngine(
        CFG, params, n_slots=2, max_len=256, opts=OPTS, inject=True
    )
    try:
        h1 = eng.submit(t1, p1, noise_bank=b1)
        # wait until session 1 has produced audio before admitting session 2
        first = next(h1.frames(timeout=120))
        h2 = eng.submit(t2, p2, noise_bank=b2)
        rest1 = list(h1.frames(timeout=120))
        got1 = np.concatenate([first] + rest1) if rest1 else first
        got2 = h2.result(timeout=120)
    finally:
        eng.shutdown(drain=False)

    _assert_audio_match(got1, ref1)
    _assert_audio_match(got2, ref2)


@pytest.mark.slow
def test_queueing_beyond_slots(params, presets):
    """3 sessions on 2 slots: the third queues, joins when a slot frees, and
    still matches its solo run."""
    p1, _ = presets
    texts = [np.random.RandomState(s).randint(10, 200, (5 + 3 * s,)) for s in (6, 7, 8)]
    banks = [_bank(20 + s) for s in range(3)]
    refs = [_solo(params, p1, t, b) for t, b in zip(texts, banks)]

    eng = StreamingSessionEngine(
        CFG, params, n_slots=2, max_len=256, opts=OPTS, inject=True
    )
    try:
        handles = [eng.submit(t, p1, noise_bank=b) for t, b in zip(texts, banks)]
        got = [h.result(timeout=180) for h in handles]
    finally:
        eng.shutdown(drain=False)

    for g, r in zip(got, refs):
        _assert_audio_match(g, r)


def test_cancel_frees_slot(params, presets):
    p1, _ = presets
    t = np.random.RandomState(9).randint(10, 200, (60,))
    eng = StreamingSessionEngine(
        CFG, params, n_slots=1, max_len=512, opts=OPTS, inject=True
    )
    try:
        h1 = eng.submit(t, p1, noise_bank=_bank(30, 200))
        next(h1.frames(timeout=120))  # it is running
        h1.cancel()
        h2 = eng.submit(
            np.random.RandomState(10).randint(10, 200, (4,)), p1, noise_bank=_bank(31)
        )
        got2 = h2.result(timeout=120)
        assert h1.done.wait(timeout=60)
    finally:
        eng.shutdown(drain=False)
    ref2 = _solo(params, p1, np.random.RandomState(10).randint(10, 200, (4,)), _bank(31))
    _assert_audio_match(got2, ref2)


@pytest.mark.slow
def test_capacity_stop(params, presets):
    """A session whose caches would overflow max_len stops cleanly with
    reach_max_step (mirrors streaming.generate:448)."""
    p1, _ = presets
    t = np.random.RandomState(11).randint(10, 200, (200,))
    eng = StreamingSessionEngine(
        CFG, params, n_slots=1, max_len=64, opts=OPTS, inject=True
    )
    try:
        h = eng.submit(t, p1, noise_bank=_bank(40, 400))
        audio = h.result(timeout=120)
    finally:
        eng.shutdown(drain=False)
    assert h.reach_max_step or len(audio) > 0
    # per-slot budget: steps never exceed max_len - preset_len
    assert len(audio) // HOP <= 64


def test_max_new_frames(params, presets):
    p1, _ = presets
    t = np.random.RandomState(12).randint(10, 200, (80,))
    eng = StreamingSessionEngine(
        CFG, params, n_slots=1, max_len=512, opts=OPTS, inject=True
    )
    try:
        h = eng.submit(t, p1, noise_bank=_bank(41, 300), max_new_frames=12)
        audio = h.result(timeout=120)
    finally:
        eng.shutdown(drain=False)
    # cap is enforced at window granularity: <= cap rounded up to a window
    assert len(audio) // HOP <= 12 + 6


def test_live_session_full_text_matches_solo(params, presets):
    """A live session whose text all arrives up front (submit + immediate
    end_text) must reproduce the non-live run exactly — the live plumbing
    (text lock, park bookkeeping) must not perturb the default path. Even if
    the model's EOS races the end_text call, the parked slot retires with
    the same frames a direct retire would have pushed."""
    p1, _ = presets
    t = np.random.RandomState(50).randint(10, 200, (11,))
    b = _bank(80)
    ref = _solo(params, p1, t, b)
    eng = StreamingSessionEngine(
        CFG, params, n_slots=2, max_len=256, opts=OPTS, inject=True
    )
    try:
        h = eng.submit(t, p1, noise_bank=b, live=True)
        h.end_text()
        got = h.result(timeout=120)
    finally:
        eng.shutdown(drain=False)
    _assert_audio_match(got, ref)


def test_live_session_park_resume_on_append(params, presets):
    """The LLM->TTS live loop: a session parks when the model's EOS fires
    with the text stream open, resumes on append_text (producing more
    audio), and ends normally after end_text. Tiny random weights EOS
    within a frame or two, so the park happens fast."""
    import time as _time

    p1, _ = presets
    eng = StreamingSessionEngine(
        CFG, params, n_slots=1, max_len=512, opts=OPTS, inject=True
    )
    try:
        h = eng.submit(
            np.random.RandomState(51).randint(10, 200, (5,)), p1,
            noise_bank=_bank(81, 300), live=True,
        )
        assert h.parked.wait(timeout=120), "session never parked on EOS"
        frames_at_park = h.n_frames
        assert frames_at_park >= 1  # EOS frame itself was delivered
        st_snap = eng.stats()
        assert st_snap["parked"] == 1 and st_snap["active"] == 1

        h.append_text(np.random.RandomState(52).randint(10, 200, (9,)))
        deadline = _time.monotonic() + 120
        while h.n_frames <= frames_at_park and _time.monotonic() < deadline:
            if h.parked.wait(timeout=0.5) and h.n_frames > frames_at_park:
                break
        assert h.n_frames > frames_at_park, "no audio after append_text"

        h.end_text()
        got = h.result(timeout=120)
        assert h.done.is_set() and h.error is None
        assert len(got) == h.n_frames * HOP
        assert h.rec["outcome"] == "completed"
    finally:
        eng.shutdown(drain=False)


def test_live_session_append_validation(params, presets):
    p1, _ = presets
    eng = StreamingSessionEngine(
        CFG, params, n_slots=1, max_len=256, opts=OPTS, inject=True
    )
    try:
        h0 = eng.submit(
            np.random.RandomState(53).randint(10, 200, (4,)), p1, noise_bank=_bank(82)
        )
        with pytest.raises(RuntimeError, match="non-live"):
            h0.append_text(np.array([1, 2]))
        h0.result(timeout=120)

        h1 = eng.submit(
            np.random.RandomState(54).randint(10, 200, (4,)), p1,
            noise_bank=_bank(83), live=True,
        )
        h1.end_text()
        with pytest.raises(RuntimeError, match="end_text"):
            h1.append_text(np.array([1, 2]))
        h1.result(timeout=120)
    finally:
        eng.shutdown(drain=False)


def test_live_session_drain_closes_stream(params, presets):
    """shutdown(drain=True) implicitly end_text()s live sessions: a parked
    session retires promptly instead of holding the drain to its timeout."""
    p1, _ = presets
    eng = StreamingSessionEngine(
        CFG, params, n_slots=1, max_len=512, opts=OPTS, inject=True
    )
    h = eng.submit(
        np.random.RandomState(55).randint(10, 200, (5,)), p1,
        noise_bank=_bank(84, 300), live=True,
    )
    assert h.parked.wait(timeout=120)
    t0 = __import__("time").monotonic()
    eng.shutdown(drain=True, timeout=60)
    assert __import__("time").monotonic() - t0 < 30
    assert h.done.is_set() and h.error is None
    assert h.rec["outcome"] == "completed"


@pytest.mark.slow
def test_colocated_with_bulk_serving(params, presets):
    """Co-located deployment (the `serve.py --rt_sessions N` / bench_colocate.py
    shape): a bulk ServingEngine wave and an rt session run CONCURRENTLY in
    one process. The session's audio must be exactly its solo run (separate
    params + programs — co-location may add latency, never perturb outputs),
    and every bulk request must complete (no cross-engine deadlock: both
    engines dispatch to the same device from their own decode threads)."""
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import vibevoice as vv
    from vibevoice_tpu.serving import Request, ServingEngine

    p1, _ = presets
    t = np.random.RandomState(40).randint(10, 200, (18,))
    b = _bank(90, n_frames=200)
    ref = _solo(params, p1, t, b, max_len=512)

    bcfg = tiny_config()
    btok = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)
    bparams = vv.init(jax.random.PRNGKey(3), bcfg)
    beng = ServingEngine(
        bcfg, bparams, tokens=btok,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
        max_batch=2, max_len=128,
    )
    seng = StreamingSessionEngine(
        CFG, params, n_slots=1, max_len=512, opts=OPTS, inject=True
    )
    try:
        bulk = []
        for i in range(3):
            ids = np.random.RandomState(100 + i).randint(10, 100, (1, 10)).astype(np.int64)
            ids[0, -1] = btok.speech_start
            bulk.append(beng.submit(Request(
                input_ids=ids, valid_mask=np.ones((1, 10), bool), seed=i
            )))
        h = seng.submit(t, p1, noise_bank=b)
        got = h.result(timeout=240)
        bulk_audio = [hb.result(timeout=240) for hb in bulk]
    finally:
        seng.shutdown(drain=False)
        beng.shutdown()

    _assert_audio_match(got, ref)
    for a in bulk_audio:
        assert a.dtype == np.float32 and len(a) % HOP == 0


def test_drain_shutdown(params, presets):
    p1, _ = presets
    eng = StreamingSessionEngine(
        CFG, params, n_slots=2, max_len=256, opts=OPTS, inject=True
    )
    h = eng.submit(
        np.random.RandomState(13).randint(10, 200, (5,)), p1, noise_bank=_bank(50)
    )
    eng.shutdown(drain=True, timeout=180)
    assert h.done.is_set()
    with pytest.raises(RuntimeError):
        eng.submit(np.array([1, 2, 3]), p1, noise_bank=_bank(51))


@pytest.mark.slow
def test_http_concurrent_rt_streams():
    """demo/serve.py --rt_sessions 2: two concurrent POST /tts/rt requests
    are served by the batched session engine (one device program), both
    delivering valid chunked WAV. Engine-level concurrency/exactness is
    proven above; here we pin the HTTP wiring (submit_text path, chunked
    delivery, cancel-on-close)."""
    import http.client
    import json
    import threading
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from demo.serve import build_server

    class A:
        model_path = None
        host = "127.0.0.1"
        port = 0
        max_batch = 2
        max_len = 96
        cfg_scale = 1.3
        ddpm_steps = 2
        int8 = False
        kv_int8 = False
        voices_dir = "/nonexistent"
        request_timeout = 300.0
        verbose = False
        warmup = False
        warmup_tokens = 8
        speech_bucket_s = 0.0
        streaming_model_path = "smoke"
        streaming_voice = None
        streaming_max_len = 256
        streaming_ddpm_steps = 2
        rt_sessions = 2

    server = build_server(A)
    assert server.rt_engine is not None and server.rt_engine.n_slots == 2
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    results = {}

    def post(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = json.dumps({"text": f"concurrent session number {i}"}).encode()
        conn.request("POST", "/tts/rt", body, {"Content-Type": "application/json"})
        r = conn.getresponse()
        results[i] = (r.status, r.getheader("Transfer-Encoding"), r.read())
        conn.close()

    try:
        threads = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        for i in range(2):
            status, te, wav = results[i]
            assert status == 200 and te == "chunked"
            assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
            assert len(wav) > 44 and len(wav[44:]) % 2 == 0
        assert server.rt_engine.windows_run >= 1
        # /stats carries the session-engine observability section
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/stats")
        st_body = json.loads(conn.getresponse().read())
        conn.close()
        rt_st = st_body["rt_sessions"]
        assert rt_st["n_slots"] == 2 and rt_st["submitted"] >= 2
        assert rt_st["windows_run"] >= 1
    finally:
        server.shutdown()
        server.engine.shutdown()
        server.rt_engine.shutdown(drain=False)


@pytest.mark.slow
def test_http_live_session_append_end():
    """POST /tts/rt {"live": true}: the LLM->TTS HTTP surface. The audio
    response carries X-Session-Id; /tts/rt/append feeds more text on a second
    connection (resuming a session parked on EOS, visible via /stats
    "parked"); /tts/rt/end closes the stream and the chunked response
    terminates; appends after the stream closed 404."""
    import http.client
    import json
    import threading
    import time as _time
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from demo.serve import build_server

    class A:
        model_path = None
        host = "127.0.0.1"
        port = 0
        max_batch = 2
        max_len = 96
        cfg_scale = 1.3
        ddpm_steps = 2
        int8 = False
        kv_int8 = False
        voices_dir = "/nonexistent"
        request_timeout = 300.0
        verbose = False
        warmup = False
        warmup_tokens = 8
        speech_bucket_s = 0.0
        streaming_model_path = "smoke"
        streaming_voice = None
        streaming_max_len = 512
        streaming_ddpm_steps = 2
        rt_sessions = 2

    server = build_server(A)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post_json(path, payload, timeout=60):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
        conn.request("POST", path, json.dumps(payload).encode(),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        body = r.read()
        conn.close()
        return r.status, body

    def parked_count():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        conn.close()
        return st["rt_sessions"]["parked"]

    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/tts/rt",
                     json.dumps({"text": "hello there", "live": True}).encode(),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        sid = r.getheader("X-Session-Id")
        assert sid, "live response must carry X-Session-Id"
        wav_box = {}
        reader = threading.Thread(target=lambda: wav_box.update(wav=r.read()),
                                  daemon=True)
        reader.start()

        deadline = _time.monotonic() + 120
        while parked_count() == 0 and _time.monotonic() < deadline:
            _time.sleep(0.1)
        assert parked_count() == 1, "live session never parked on EOS"

        status, body = post_json("/tts/rt/append",
                                 {"session": sid, "text": "and some more words"})
        assert status == 200 and json.loads(body)["appended_tokens"] > 0

        status, body = post_json("/tts/rt/end", {"session": sid})
        assert status == 200 and json.loads(body)["ended"] is True

        reader.join(timeout=120)
        assert not reader.is_alive(), "audio stream did not terminate after end"
        wav = wav_box["wav"]
        assert wav[:4] == b"RIFF" and len(wav) > 44
        conn.close()

        status, _ = post_json("/tts/rt/append", {"session": sid, "text": "x"})
        assert status == 404  # the session is gone once its stream closed
    finally:
        server.shutdown()
        server.engine.shutdown()
        server.rt_engine.shutdown(drain=False)
