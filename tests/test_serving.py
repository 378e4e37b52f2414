"""Continuous-batching serving engine tests (tiny model, CPU)."""

import numpy as np
import pytest

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import inference as inf
from vibevoice_tpu.models import vibevoice as vv
from vibevoice_tpu.serving import Request, ServingEngine

CFG = tiny_config()
HOP = 8
TOKENS = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)


@pytest.fixture(scope="module")
def engine():
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        CFG,
        params,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
        max_batch=2,
        max_len=128,
    )
    yield eng
    eng.shutdown()


def _make_request(seed, n=10):
    ids = np.random.RandomState(seed).randint(10, 100, (1, n)).astype(np.int64)
    ids[0, -1] = TOKENS.speech_start
    return Request(input_ids=ids, valid_mask=np.ones((1, n), bool), seed=seed)


def test_single_request_completes(engine):
    h = engine.submit(_make_request(0))
    audio = h.result(timeout=120)
    assert audio.dtype == np.float32
    assert len(audio) % HOP == 0


def test_concurrent_requests(engine):
    handles = [engine.submit(_make_request(i, n=8 + i)) for i in range(4)]
    results = [h.result(timeout=240) for h in handles]
    assert len(results) == 4
    for r in results:
        assert len(r) % HOP == 0


def test_streaming_consumption(engine):
    h = engine.submit(_make_request(9))
    chunks = list(h.stream())
    total = h.result(timeout=60)
    assert sum(len(c) for c in chunks) == len(total)


def test_prefill_does_not_stall_active_streams(engine, monkeypatch):
    """Head-of-line blocking regression: while a second request's prefill is
    (artificially) slow, an already-active stream must keep stepping
    (prefill runs on its own thread; the decode loop never waits on it)."""
    import threading
    import time

    real_prefill = inf.prefill_fn
    slow_started = threading.Event()

    def slow_prefill(*a, **kw):
        slow_started.set()
        time.sleep(1.2)  # emulate a first-shape compile stall
        return real_prefill(*a, **kw)

    # long prompt -> long generation for the active stream (random tiny
    # weights emit speech_start until the per-request max-step cap)
    h1 = engine.submit(_make_request(20, n=40))
    assert engine.wait_for_state(
        lambda: any(s is h1 for s in engine.slots), 60
    ), "stream 1 never started"
    slot = engine.slots.index(h1)
    assert engine.wait_for_state(lambda: engine.slot_steps[slot] >= 2, 60)

    monkeypatch.setattr(inf, "prefill_fn", slow_prefill)
    h2 = engine.submit(_make_request(21, n=8))
    assert slow_started.wait(timeout=30)

    # while h2's prefill sleeps, h1's decode must keep advancing
    start_steps = int(engine.slot_steps[slot])
    time.sleep(0.8)
    gained = int(engine.slot_steps[slot]) - start_steps
    monkeypatch.setattr(inf, "prefill_fn", real_prefill)
    assert engine.slots[slot] is h1 or gained > 0  # h1 may legitimately finish
    assert gained >= 2 or engine.slots[slot] is not h1, (
        f"active stream starved during prefill (advanced {gained} steps)"
    )
    h1.result(timeout=120)
    h2.result(timeout=120)


def test_bad_request_surfaces_error(engine):
    # speech masks inconsistent with tokenizer hop -> error delivered, engine
    # stays alive
    bad = Request(
        input_ids=np.full((1, 4), 20, np.int64),
        valid_mask=np.ones((1, 4), bool),
        speech_tensors=np.zeros((1, 64), np.float32),
        speech_frame_valid=np.ones((1, 3), bool),  # wrong frame count (64/8=8)
        speech_input_mask=np.zeros((1, 4), bool),
    )
    h = engine.submit(bad)
    with pytest.raises(Exception):
        h.result(timeout=60)
    # engine still serves
    ok = engine.submit(_make_request(3))
    ok.result(timeout=120)


def test_http_server_whole_and_chunked_stream():
    """demo/serve.py endpoints: whole-WAV POST /tts and chunked-transfer
    POST /tts/stream both deliver valid 16-bit PCM WAV from the tiny model."""
    import http.client
    import json
    import struct
    import threading
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from demo.serve import build_server

    class A:  # argparse stand-in
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
        warmup = True  # exercises build_server's startup-warmup wiring
        warmup_tokens = 8
        speech_bucket_s = 0.0

    server = build_server(A)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"text": "Speaker 1: hello world"}).encode()

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/tts", body, {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        wav = r.read()
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        n_samples = struct.unpack("<I", wav[40:44])[0] // 2
        assert len(wav) == 44 + n_samples * 2

        conn.request("POST", "/tts/stream", body, {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Transfer-Encoding") == "chunked"
        stream = r.read()  # http.client de-chunks
        assert stream[:4] == b"RIFF" and stream[8:12] == b"WAVE"
        pcm = stream[44:]
        assert len(pcm) % 2 == 0
        conn.close()
    finally:
        server.shutdown()
        server.engine.shutdown()


def test_http_openai_audio_speech_endpoint():
    """POST /v1/audio/speech (OpenAI-compatible): bare `input` text is
    accepted (script prefix added server-side), response_format wav and pcm
    both deliver, and errors come back as OpenAI-shaped JSON."""
    import http.client
    import json
    import struct
    import threading
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from demo.serve import build_server

    class A:  # argparse stand-in
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
        speech_bucket_s = 0.0

    server = build_server(A)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)

        body = json.dumps({"model": "vibevoice", "input": "hello world"}).encode()
        conn.request("POST", "/v1/audio/speech", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200 and r.getheader("Content-Type") == "audio/wav"
        wav = r.read()
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        n_samples = struct.unpack("<I", wav[40:44])[0] // 2

        body = json.dumps({"input": "hello world", "response_format": "pcm",
                           "seed": 0}).encode()
        conn.request("POST", "/v1/audio/speech", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200 and r.getheader("Content-Type") == "audio/pcm"
        pcm = r.read()
        # raw s16le, no container (frame counts may differ between requests:
        # decode noise is the engine's shared stream)
        assert len(pcm) % 2 == 0
        assert len(wav) == 44 + n_samples * 2

        # unsupported format -> OpenAI-shaped 400
        body = json.dumps({"input": "x", "response_format": "opus"}).encode()
        conn.request("POST", "/v1/audio/speech", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        err = json.loads(r.read())
        assert "error" in err and "opus" in err["error"]["message"]

        # missing `input` -> OpenAI-shaped 400
        conn.request("POST", "/v1/audio/speech", b"{}",
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400 and "error" in json.loads(r.read())

        # unknown voice with no presets dir -> OpenAI-shaped 400, not a 500
        body = json.dumps({"input": "x", "voice": "alloy"}).encode()
        conn.request("POST", "/v1/audio/speech", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400 and "error" in json.loads(r.read())
        conn.close()
    finally:
        server.shutdown()
        server.engine.shutdown()


def _forced_diffusion_engine(params, k, max_len=128):
    """Engine whose step fn forces speech_diffusion every frame (inject-mode
    step with a constant forced script), so requests actually produce audio
    with random tiny weights and finish via the max-step cap — exercising the
    per-frame audio push / ext-finish paths."""
    import jax.numpy as jnp

    opts = inf.GenerateOptions(ddpm_steps=2, max_length=max_len)
    eng = ServingEngine(
        CFG, params, tokens=TOKENS, opts=opts,
        max_batch=2, max_len=max_len, frames_per_dispatch=k,
    )
    rng = np.random.RandomState(0)
    init = jnp.asarray(rng.randn(256, 2, CFG.acoustic_vae_dim).astype(np.float32))
    if k > 1:
        real = inf.make_multi_step_fn(CFG, TOKENS, opts, k, inject=True)
        forced = jnp.full((k, 2), TOKENS.speech_diffusion, jnp.int32)
    else:
        real = inf.make_step_fn(CFG, TOKENS, opts, inject=True)
        forced = jnp.full((2,), TOKENS.speech_diffusion, jnp.int32)
    eng.step_fn = lambda p, c, key, ext: real(p, c, key, ext, {"forced": forced, "init": init})
    return eng


def test_engine_frames_per_dispatch():
    """K-frame dispatch (frames_per_dispatch=4): audio arrives in K-frame
    chunks, the max-step cap is honoured at sub-dispatch granularity (the
    per-frame ext matrix), and total audio length matches the K=1 engine."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    lengths = {}
    for k in (1, 4):
        eng = _forced_diffusion_engine(params, k)
        try:
            handles = [eng.submit(_make_request(i, n=8 + 3 * i)) for i in range(3)]
            lens = []
            for h in handles:
                audio = h.result(timeout=240)
                assert len(audio) > 0 and len(audio) % HOP == 0
                assert np.isfinite(audio).all()
                lens.append(len(audio))
            lengths[k] = lens
            assert all(s is None for s in eng.slots)
        finally:
            eng.shutdown()
    # same requests -> same number of frames regardless of dispatch width
    assert lengths[1] == lengths[4], lengths


def test_engine_pipelined_slot_reuse_stress():
    """Stress the pipelined decode loop's slot bookkeeping: many requests of
    varying lengths churn through 2 slots (finish -> free -> re-admit while a
    stale dispatch is still in flight), with K=3 frames per dispatch and an
    int8 KV cache. Forced diffusion makes every request's audio length
    deterministic: exactly its max-step cap of frames — any lost window,
    double delivery, or cross-request contamination breaks the count."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    max_len = 128
    opts = inf.GenerateOptions(ddpm_steps=2, max_length=max_len, kv_int8=True)
    eng = ServingEngine(
        CFG, params, tokens=TOKENS, opts=opts,
        max_batch=2, max_len=max_len, frames_per_dispatch=3,
    )
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    init = jnp.asarray(rng.randn(256, 2, CFG.acoustic_vae_dim).astype(np.float32))
    real = inf.make_multi_step_fn(CFG, TOKENS, opts, 3, inject=True)
    forced = jnp.full((3, 2), TOKENS.speech_diffusion, jnp.int32)
    eng.step_fn = lambda p, c, key, ext: real(p, c, key, ext, {"forced": forced, "init": init})
    try:
        lens = [7, 12, 9, 21, 8, 15, 10, 11]
        handles = []
        for i, n in enumerate(lens):
            handles.append(eng.submit(_make_request(100 + i, n=n)))
        for h, n in zip(handles, lens):
            audio = h.result(timeout=300)
            # engine cap: min(max_len - n, 2.0 * n) frames of forced diffusion
            expect = min(max_len - n, int(2.0 * n))
            assert len(audio) == expect * HOP, (n, len(audio) // HOP, expect)
            assert np.isfinite(audio).all()
        assert all(s is None for s in eng.slots)
    finally:
        eng.shutdown()


def test_engine_kv_int8():
    """The engine runs with an int8 KV cache (quantized make_cache, scale
    splicing in _join_slot) and serves concurrent requests to completion."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        CFG,
        params,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128, kv_int8=True),
        max_batch=2,
        max_len=128,
    )
    try:
        import jax.numpy as jnp

        assert eng.carry.cache.k[0].dtype == jnp.int8
        handles = [eng.submit(_make_request(i)) for i in range(3)]
        for h in handles:
            audio = h.result(timeout=240)
            assert len(audio) % HOP == 0
            assert np.isfinite(audio).all()
    finally:
        eng.shutdown()


def test_request_cancellation():
    """handle.cancel(): a queued request finishes empty without prefilling;
    an active stream stops within ~2 dispatches and keeps the audio already
    delivered; other streams are unaffected."""
    import time
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = _forced_diffusion_engine(params, 2)
    try:
        # long-running active stream (forced diffusion, large cap)
        h1 = eng.submit(_make_request(50, n=30))
        h2 = eng.submit(_make_request(51, n=30))
        assert eng.wait_for_state(lambda: any(s is h1 for s in eng.slots), 120)
        assert eng.wait_for_state(lambda: len(h1._audio) > 0, 120)
        h1.cancel()
        a1 = h1.result(timeout=120)
        assert len(a1) > 0  # audio produced before the cancel is kept
        full_frames = min(128 - 30, 60)
        assert len(a1) < full_frames * HOP  # actually stopped early

        # queued-cancel: cancel before the prefill thread reaches it
        h3 = eng.submit(_make_request(52))
        h3.cancel()
        a3 = h3.result(timeout=120)
        # either cancelled pre-prefill (empty) or within the first dispatches
        assert len(a3) <= 3 * 2 * HOP

        # the sibling stream still runs to its full cap
        a2 = h2.result(timeout=240)
        assert len(a2) == full_frames * HOP
    finally:
        eng.shutdown()


def test_cancel_queued_while_slots_full():
    """A request that has PREFILLED but can't be admitted (every decode slot
    busy with long generations) must still finish promptly on cancel() —
    _admit drains the ready queue even with no free slot (a gated check used
    to leave the waiter blocked and the bounded ready queue occupied)."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    # long cap so both slots stay busy for the whole staged-cancel window
    eng = _forced_diffusion_engine(params, 2, max_len=4096)
    try:
        # occupy both slots with effectively-unbounded generations: ~3900
        # frames of cap, so neither can hit it during the staging window
        # even on a heavily loaded machine (the round-2 flake: the old 60-
        # frame cap let a slot finish mid-wait)
        r1, r2 = _make_request(60, n=30), _make_request(61, n=30)
        r1.max_length_times = r2.max_length_times = 130.0
        h1 = eng.submit(r1)
        h2 = eng.submit(r2)
        assert eng.wait_for_state(
            lambda: any(s is h1 for s in eng.slots) and any(s is h2 for s in eng.slots), 300
        )
        # third request: wait until its prefill is staged (ready queue or the
        # decode thread's local staging list), with both slots still busy
        h3 = eng.submit(_make_request(62, n=30))
        assert eng.wait_for_state(lambda: eng.ready.qsize() > 0 or eng._ready_local, 300)
        assert all(s is not None for s in eng.slots)  # still no free slot
        h3.cancel()
        a3 = h3.result(timeout=30)  # must NOT block until a slot frees
        assert len(a3) == 0
        assert all(s is not None for s in eng.slots)  # siblings still running
    finally:
        eng.shutdown()  # force-finishes the two long streams


def test_engine_stats_and_deadline():
    """EngineStats counts outcomes and TTFA; a request with an already-expired
    deadline finishes promptly (cancel semantics) and is counted as
    deadline_expired."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = _forced_diffusion_engine(params, 2)
    try:
        h = eng.submit(_make_request(41))
        audio = h.result(timeout=120)
        assert len(audio) > 0
        st = eng.stats()
        assert st.submitted == 1 and st.completed == 1
        assert st.frames_emitted >= len(audio) // HOP
        assert st.audio_seconds_emitted > 0
        assert st.ttfa_p50_ms is not None and st.ttfa_p50_ms > 0
        assert st.ttfa_p95_ms >= st.ttfa_p50_ms
        assert st.uptime_s > 0

        r = _make_request(42)
        r.deadline_s = 0.0  # expired at submit
        h2 = eng.submit(r)
        out = h2.result(timeout=60)  # finishes (possibly with partial audio)
        assert h2.error is None
        assert h2.deadline_expired
        assert eng.stats().deadline_expired == 1
        assert isinstance(out, np.ndarray)
    finally:
        eng.shutdown()


def test_decode_loop_crash_drains_all_requests():
    """Failure isolation: if the decode loop dies (device error), every
    active and queued request is finished with that error instead of
    stranding its consumer threads forever."""
    import time
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = _forced_diffusion_engine(params, 2)
    try:
        real = eng.step_fn
        calls = {"n": 0}

        def exploding(p, c, key, ext):
            calls["n"] += 1
            if calls["n"] > 2:
                raise RuntimeError("injected device fault")
            return real(p, c, key, ext)

        eng.step_fn = exploding
        h1 = eng.submit(_make_request(70, n=20))
        h2 = eng.submit(_make_request(71, n=20))
        for h in (h1, h2):
            with pytest.raises(RuntimeError, match="injected device fault"):
                h.result(timeout=60)
        st = eng.stats()
        assert st.failed == 2
        # a request submitted after the crash must fail fast too (engine
        # stopped; prefill thread exits); give the stop flag a moment
        time.sleep(0.1)
        assert eng._stop.is_set()
        h3 = eng.submit(_make_request(72))
        with pytest.raises(RuntimeError, match="engine is stopped"):
            h3.result(timeout=10)
    finally:
        eng.shutdown()


def test_prefill_thread_crash_fails_queued_requests():
    """Failure isolation for the PREFILL worker: a worker-level fault (not a
    per-request prefill error, which _prefill_one already surfaces on the
    handle) must stop the engine and fail queued requests promptly instead of
    stranding submitters. (Round-4 regression guard: a NameError after
    placement killed the thread silently and every later submit hung.)"""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        CFG,
        params,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
        max_batch=1,
        max_len=128,
    )
    try:
        def worker_fault(handle):
            raise RuntimeError("injected prefill-worker fault")

        eng._prefill_one = worker_fault
        h1 = eng.submit(_make_request(80))
        h2 = eng.submit(_make_request(81))
        # whichever the worker picked up raises through _prefill_loop and
        # kills it; the crash handler must fail the still-queued one too.
        # (The queued one may instead be finished by the decode thread's
        # final drain or rejected at submit — any prompt error is correct;
        # a timeout here is the regression.)
        for h in (h1, h2):
            with pytest.raises(
                RuntimeError,
                match="prefill-worker fault|engine is stopped|engine shut down",
            ):
                h.result(timeout=60)
        assert eng._stop.is_set()
    finally:
        eng.shutdown()


def test_priority_lane_express_slot():
    """VERDICT r4 item 4: with reserved_slots=1, bulk requests queue for the
    non-reserved slots while a Request(priority=True) jumps the prefill queue
    and takes the express slot immediately — its TTFA under full bulk load is
    admission-bound, not queue-for-slot-bound."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        CFG,
        params,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
        max_batch=2,
        max_len=128,
        reserved_slots=1,
    )
    try:
        # three long bulk requests: one active in the bulk slot, two queued
        bulk = [eng.submit(_make_request(60 + i, n=24)) for i in range(3)]
        assert eng.wait_for_state(lambda: eng.slots[1] is not None, 120)
        # the express slot never holds bulk work, even with a deep bulk queue
        assert eng.slots[0] is None

        pr = _make_request(70, n=8)
        pr.priority = True
        hp = eng.submit(pr)
        assert eng.wait_for_state(lambda: eng.slots[0] is hp, 120), (
            "priority request never reached the express slot"
        )
        hp.result(timeout=120)
        for h in bulk:
            h.result(timeout=300)
        assert all(h.rec["outcome"] == "completed" for h in bulk + [hp])
        st = eng.stats()
        assert st.priority_submitted == 1
        # tiny random weights may emit zero diffusion frames for this prompt;
        # the TTFA split is only defined once first audio was delivered
        if hp.first_audio_time is not None:
            assert st.priority_ttfa_p50_ms is not None
    finally:
        eng.shutdown()


def test_reserved_slots_validation():
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="reserved_slots"):
        ServingEngine(
            CFG, params, tokens=TOKENS,
            opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
            max_batch=2, max_len=128, reserved_slots=2,
        )


def test_submit_put_races_stop_drain():
    """ADVICE r4: a submit() that passes the front _stop check just before a
    crash/shutdown sets _stop can land its pending.put AFTER every one-shot
    drain has swept the queue. The post-put re-check must settle the handle
    itself — a forever-blocked result() is the regression."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        CFG,
        params,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
        max_batch=1,
        max_len=128,
    )
    try:
        orig_put = eng.pending.put

        def racing_put(h, *a, **k):
            # the crash handler fires between submit's front check and the
            # put: _stop set, both drains already ran over an empty queue
            eng._stop.set()
            orig_put(h, *a, **k)

        eng.pending.put = racing_put
        h = eng.submit(_make_request(90))
        with pytest.raises(RuntimeError, match="engine is stopped|engine shut down"):
            h.result(timeout=30)
    finally:
        eng.pending.put = orig_put
        eng.shutdown()


def test_retiring_handle_fails_on_decode_crash():
    """A slot freed at DISPATCH time (predicted step-cap finish) leaves its
    handle in _retiring until the final in-flight window is fetched. If the
    device faults in that gap, _drain must fail the retiring handle too —
    otherwise its consumer blocks forever (the final window is lost with the
    fault; partial audio stays available)."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = _forced_diffusion_engine(params, 2)
    try:
        real = eng.step_fn

        def exploding(p, c, key, ext):
            # fires on the first dispatch issued while a predicted-finish
            # handle awaits its final window fetch (decode-thread local state,
            # no race) — deterministically the dispatch AFTER h1's cap window
            if eng._retiring:
                raise RuntimeError("injected device fault")
            return real(p, c, key, ext)

        eng.step_fn = exploding
        h1 = eng.submit(_make_request(80, n=8))  # cap 16 frames: retires first
        h2 = eng.submit(_make_request(81, n=30))  # cap 60: keeps dispatching
        for h in (h1, h2):
            with pytest.raises(RuntimeError, match="injected device fault"):
                h.result(timeout=120)
        assert eng.stats().failed == 2
        assert not eng._retiring
    finally:
        eng.shutdown()


def test_engine_tp_sharded():
    """ServingEngine(mesh=tp-mesh): the engine serves with TP-sharded params
    and a KV cache sharded over KV heads — the multi-chip (7B bf16 @ 32K)
    serving configuration, on the virtual CPU mesh. Requests complete with
    the same audio lengths as the single-device engine."""
    import jax
    from vibevoice_tpu.parallel import mesh as pmesh

    params = vv.init(jax.random.PRNGKey(0), CFG)

    lengths = {}
    for mesh in (None, pmesh.make_mesh(dp=1, tp=2)):
        eng = _forced_diffusion_engine(params, 2)
        if mesh is not None:
            eng.shutdown()
            eng = ServingEngine(
                CFG, params, tokens=TOKENS,
                opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
                max_batch=2, max_len=128, frames_per_dispatch=2, mesh=mesh,
            )
            import jax.numpy as jnp
            rng = np.random.RandomState(0)
            init = jnp.asarray(rng.randn(256, 2, CFG.acoustic_vae_dim).astype(np.float32))
            real = inf.make_multi_step_fn(CFG, TOKENS, inf.GenerateOptions(ddpm_steps=2, max_length=128), 2, inject=True)
            forced = jnp.full((2, 2), TOKENS.speech_diffusion, jnp.int32)
            eng.step_fn = lambda p, c, key, ext: real(p, c, key, ext, {"forced": forced, "init": init})
            # KV cache is head-sharded over tp
            spec = eng.carry.cache.k[0].sharding.spec
            assert any(e == "tp" for e in spec), spec
            q = eng.params["lm"]["layers"][0]["attn"]["q"]["w"]
            assert any(e == "tp" for e in (q.sharding.spec or ())), q.sharding
        try:
            hs = [eng.submit(_make_request(i, n=8 + 3 * i)) for i in range(2)]
            lengths[mesh is None] = [len(h.result(timeout=240)) for h in hs]
        finally:
            eng.shutdown()
    assert lengths[True] == lengths[False]
    assert all(l > 0 for l in lengths[True])


@pytest.mark.slow
def test_http_rt_streaming_endpoint():
    """POST /tts/rt: the 0.5B streaming model behind chunked-transfer WAV
    (smoke model + synthetic preset). Valid live-stream WAV with PCM that is
    a whole number of hop-sized frames."""
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
        streaming_model_path = "smoke"
        streaming_voice = None
        streaming_max_len = 512
        streaming_ddpm_steps = 2

    server = build_server(A)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"text": "hello streaming world"}).encode()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/tts/rt", body, {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Transfer-Encoding") == "chunked"
        stream = r.read()
        assert stream[:4] == b"RIFF" and stream[8:12] == b"WAVE"
        pcm = stream[44:]
        assert len(pcm) % 2 == 0
        conn.close()
    finally:
        server.shutdown()
        server.engine.shutdown()


def _make_voice_request(seed, samples=27, n=12):
    """A voice-clone request: waveform of a NON-hop-multiple length (exercises
    the ceil frame count) spliced at `frames` masked prompt positions."""
    rng = np.random.RandomState(seed)
    ids = rng.randint(10, 100, (1, n)).astype(np.int64)
    ids[0, -1] = TOKENS.speech_start
    frames = -(-samples // HOP)
    mask = np.zeros((1, n), bool)
    mask[0, 2 : 2 + frames] = True
    return Request(
        input_ids=ids,
        valid_mask=np.ones((1, n), bool),
        speech_tensors=(rng.randn(1, samples) * 0.1).astype(np.float32),
        speech_frame_valid=np.ones((1, frames), bool),
        speech_input_mask=mask,
        seed=seed,
    )


def test_request_seed_drives_prefill_noise():
    """Request.seed must reach the voice-clone VAE draw with the SAME key
    derivation as inference.generate(seed=...): PRNGKey(seed) + 3-way split.
    (Round-4 fix: the engine used to advance a shared prefill key and ignore
    the seed entirely, despite serve.py documenting {"seed": int}.)"""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        CFG,
        params,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
        max_batch=1,
        max_len=128,
    )
    seen = {}
    orig = eng._prefill
    try:
        def spy(r, vk):
            seen[r.seed] = np.asarray(vk)
            return orig(r, vk)

        eng._prefill = spy
        for s in (3, 11):
            h = eng.submit(_make_voice_request(s))
            h.result(timeout=240)
        for s in (3, 11):
            expect = jax.random.split(jax.random.PRNGKey(s), 3)[2]
            np.testing.assert_array_equal(seen[s], np.asarray(expect))
    finally:
        eng.shutdown()


def test_speech_bucket_prefill_is_exact():
    """Voice-length bucketing (pad the waveform to a sample bucket, pad the
    frame-valid mask with False) must not change the prefilled carry: the
    encoder is causal, the splice is rank-matched over valid frames, and the
    single clip's VAE noise draw is a prefix of the padded-shape draw.
    Compared at the prefill output (not end-to-end audio: XLA convs at a
    different input length round differently at ~1e-7, which an
    autoregressive loop amplifies into different token choices)."""
    import jax
    import jax.numpy as jnp

    params = vv.init(jax.random.PRNGKey(0), CFG)
    vk = jax.random.PRNGKey(1234)
    singles = []
    for bucket in (0, 64):
        eng = ServingEngine(
            CFG,
            params,
            tokens=TOKENS,
            opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
            max_batch=1,
            max_len=128,
            speech_bucket=bucket,
        )
        try:
            single, max_steps = eng._prefill(_make_voice_request(7), vk)
            singles.append(jax.device_get(single))
        finally:
            eng.shutdown()
    a, b = singles
    np.testing.assert_array_equal(a.cache.length, b.cache.length)
    n = int(a.cache.length[0])
    for ka, kb, va_, vb_ in zip(a.cache.k, b.cache.k, a.cache.v, b.cache.v):
        np.testing.assert_allclose(ka[:, :, :n], kb[:, :, :n], atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(va_[:, :, :n], vb_[:, :, :n], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a.h_pos, b.h_pos, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a.h_neg, b.h_neg, atol=2e-5, rtol=1e-5)


def test_warmup_primes_and_stays_out_of_stats():
    """warmup() runs a synthetic request through prefill -> splice -> decode
    (priming the compiles) and leaves the stats registry untouched."""
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        CFG,
        params,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
        max_batch=2,
        max_len=128,
        speech_bucket=64,
    )
    try:
        assert eng.warmup(prompt_tokens=8, timeout=240) > 0
        assert eng.warmup(prompt_tokens=8, voice_samples=64, timeout=240) > 0
        s = eng.stats()
        assert s.submitted == 0 and s.active == 0
        audio = eng.submit(_make_request(3)).result(timeout=240)
        assert len(audio) % HOP == 0
        assert eng.stats().submitted == 1
    finally:
        eng.shutdown()


def test_graceful_drain_shutdown():
    """shutdown(drain=True): in-flight requests complete with audio; new
    submissions fail fast with 'engine is draining'."""
    import threading
    import jax

    params = vv.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        CFG,
        params,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128),
        max_batch=2,
        max_len=128,
    )
    h = eng.submit(_make_request(11))
    done = threading.Event()
    t = threading.Thread(target=lambda: (eng.shutdown(timeout=240, drain=True), done.set()))
    t.start()
    audio = h.result(timeout=240)  # completes despite the drain
    assert len(audio) % HOP == 0 and h.error is None
    # once draining, new work is rejected promptly with a clear error
    assert eng._draining.wait(60)
    h2 = eng.submit(_make_request(12))
    with pytest.raises(RuntimeError):
        h2.result(timeout=10)
    done.wait(240)
    t.join(10)
    assert eng._stop.is_set()
