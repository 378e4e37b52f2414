"""Multi-session real-time streaming engine for the 0.5B model.

The reference hard-caps streaming inference at batch 1 (reference
modeling_vibevoice_streaming_inference.py:511 "only support batch size 1");
every concurrent listener needs its own GPU. This engine batches N
independent sessions into ONE device program: the windowed loop
(5-text/6-speech, reference :41-42) is already pure functional state over
right-padded per-sample lengths, so concurrent sessions are just batch rows

* each slot carries its own voice preset (spliced in via
  `streaming.admit_session` — an in-place dynamic-update on the donated
  caches), its own script position, and its own EOS/capacity bookkeeping;
* slots out of text feed all-invalid text windows (no-ops for that row);
* finished/free slots still compute (batch rows are independent) but commit
  nothing: their cache lengths stop advancing (`active` gating in
  streaming.speech_frame) and their outputs are dropped on the host;
* sessions join at window boundaries: admission cost is one in-place splice,
  so TTFA for a late joiner is ~one in-flight window + one text window + the
  first frames of its own speech window.

Throughput economics: one 6-frame speech window produces 6*3200/24000 = 0.8 s
of audio per active session; the device step scales sublinearly in batch
(flash grid + conv batch terms), so a single v5e chip sustains many
real-time listeners where the reference sustains one.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import streaming as st
from ..models.inference import GenerateOptions, resolve_kv_int8

HOP_FRAMES = st.TTS_SPEECH_WINDOW_SIZE  # 6 speech frames / window
TEXT_W = st.TTS_TEXT_WINDOW_SIZE  # 5 text tokens / window


class StreamSessionHandle:
    """One live session: frames arrive on an internal queue as the engine's
    loop produces them; `frames()` iterates them, `result()` concatenates."""

    def __init__(self, text_ids: np.ndarray, admit_kwargs: Dict, *,
                 noise_bank=None, max_new_frames: Optional[int] = None,
                 live: bool = False):
        self.text_ids = np.asarray(text_ids, np.int64).reshape(-1)
        self.admit_kwargs = admit_kwargs
        self.noise_bank = noise_bank
        self.max_new_frames = max_new_frames
        # live session (LLM->TTS pipelines): the text stream stays OPEN —
        # more tokens may arrive via append_text() while audio streams out.
        # When the model's EOS fires with the stream still open, the slot
        # PARKS (keeps its caches, stops stepping) instead of retiring, and
        # resumes on the next append; end_text() closes the stream so the
        # next EOS (or an EOS already parked on) ends the session normally.
        self.live = live
        self.text_open = live
        self.parked = threading.Event()  # observability: EOS hit, awaiting text
        self._text_lock = threading.Lock()
        self._engine = None  # set by engine.submit: append wakes the loop
        self.q: "queue.Queue" = queue.Queue()
        self.done = threading.Event()
        self.cancelled = threading.Event()
        self.error: Optional[BaseException] = None
        self.reach_max_step = False
        self.submitted_t = time.monotonic()
        self.first_audio_t: Optional[float] = None
        self.n_frames = 0
        self.priority = False  # set by engine.submit(priority=True)
        # scalar observability record the engine keeps after the handle is
        # gone (stats() must not pin session audio in host RAM)
        self.rec = {"ttfa_ms": None, "frames": 0, "outcome": None}

    # -- consumer side ------------------------------------------------------

    def frames(self, timeout: Optional[float] = None) -> Iterator[np.ndarray]:
        """Yield float32 hop-sized audio frames until the session ends."""
        while True:
            try:
                item = self.q.get(timeout=timeout)
            except queue.Empty:
                if self.done.is_set() and self.q.empty():
                    break
                raise TimeoutError("no frame within timeout")
            if item is None:
                break
            yield item
        if self.error is not None:
            raise self.error

    def result(self, timeout: Optional[float] = None) -> np.ndarray:
        chunks = list(self.frames(timeout=timeout))
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    def cancel(self) -> None:
        self.cancelled.set()

    def append_text(self, ids: np.ndarray) -> None:
        """Live sessions only: append tokens to the open text stream. The
        engine feeds them at the slot's next 5-token text window; a session
        parked on EOS resumes. Raises on non-live / closed / ended sessions."""
        ids = np.asarray(ids, np.int64).reshape(-1)
        with self._text_lock:
            if not self.live:
                raise RuntimeError("append_text on a non-live session "
                                   "(submit with live=True)")
            if not self.text_open:
                raise RuntimeError("append_text after end_text")
            if self.done.is_set():
                raise RuntimeError("session has already ended")
            self.text_ids = np.concatenate([self.text_ids, ids])
        eng = self._engine
        if eng is not None:  # wake a loop idling on all-parked slots
            with eng._cv:
                eng._cv.notify_all()

    def end_text(self) -> None:
        """Close a live session's text stream: no more appends; the session
        ends at its next model EOS (immediately, if it is already parked)."""
        with self._text_lock:
            self.text_open = False
        eng = self._engine
        if eng is not None:
            with eng._cv:
                eng._cv.notify_all()

    @property
    def ttfa_ms(self) -> Optional[float]:
        if self.first_audio_t is None:
            return None
        return (self.first_audio_t - self.submitted_t) * 1000.0

    # -- engine side --------------------------------------------------------

    def _push(self, frame: np.ndarray) -> None:
        if self.first_audio_t is None:
            self.first_audio_t = time.monotonic()
            self.rec["ttfa_ms"] = self.ttfa_ms
        self.n_frames += 1
        self.rec["frames"] = self.n_frames
        self.q.put(frame)

    def _finish(self, error: Optional[BaseException] = None) -> None:
        self.error = error
        self.rec["outcome"] = (
            "failed" if error is not None
            else "cancelled" if self.cancelled.is_set()
            else "completed"
        )
        self.done.set()
        self.q.put(None)


@dataclass
class _Slot:
    handle: StreamSessionHandle
    text_pos: int = 0
    steps: int = 0
    max_steps: int = 0
    frame_counter: int = 0  # noise-bank rows consumed (inject mode)
    cycle_pos: int = 0  # frames into the current 6-frame speech window
    parked: bool = False  # live session: EOS hit with text stream open


class StreamingSessionEngine:
    """Batch N concurrent 0.5B streaming sessions onto one device program.

    Args:
      cfg/params: the streaming model (bf16 on TPU).
      n_slots: static batch size of the device program (sessions beyond it
        queue and join as slots free).
      max_len: per-slot KV capacity (window cadence stops a session before
        its caches would clamp-write, mirroring streaming.generate).
      opts: GenerateOptions (cfg_scale/ddpm_steps/sde). kv_int8 (tri-state:
        None = auto vs max_len) halves per-slot KV HBM — the long-context /
        high-slot-count memory knob; admit quantizes preset rows in-kernel.
      default_preset: voice used when submit() gets none.
      inject: test mode — every submit must carry a noise_bank
        ({"init": (E, 1, D)[, "sde": (E, S, 1, D)]}, same schema as
        streaming.generate) and frames consume rows per-slot in order, which
        makes a batched session bit-comparable to its solo batch-1 run.
    """

    def __init__(
        self,
        cfg,
        params,
        *,
        n_slots: int = 4,
        max_len: int = 2048,
        opts: Optional[GenerateOptions] = None,
        default_preset: Optional[st.VoicePreset] = None,
        processor=None,
        inject: bool = False,
        seed: int = 0,
        preset_bucket: int = 128,
        idle_poll_s: float = 0.05,
        ignore_eos: bool = False,
        quantum: int = 3,
        reserved_slots: int = 0,
    ):
        self.cfg = cfg
        self.params = params
        self.n_slots = n_slots
        self.max_len = max_len
        opts = opts or GenerateOptions(cfg_scale=1.5, ddpm_steps=5)
        # tri-state auto policy vs THIS engine's per-slot capacity: int8 KV
        # (admit quantizes preset rows in-kernel, decode quantizes-on-write)
        # halves the 3 lane-padded caches that bound sessions-per-chip at
        # long max_len; short-context serving stays bf16 (quantize-on-write
        # costs ~10-25% TTFA at low fill, round-3 ledger)
        opts = resolve_kv_int8(opts, max_len)
        self.opts = opts
        self.inject = inject
        self.processor = processor
        self.default_preset = default_preset
        self.preset_bucket = preset_bucket
        self._idle_poll_s = idle_poll_s
        if HOP_FRAMES % quantum != 0:
            raise ValueError(f"quantum must divide {HOP_FRAMES}, got {quantum}")
        # admission quantum: frames per device dispatch. The model's
        # 5-text/6-speech window cadence is kept PER SLOT (text feeds when a
        # slot's cycle_pos wraps), so each row computes exactly its solo
        # sequence; a sub-window quantum (default 3) only shortens how long a
        # joiner waits for admission + first audio — the join-TTFA knee that
        # capped round-4 capacity at 24 sessions. quantum=6 restores the
        # one-dispatch-per-window loop (max throughput, slower joins).
        self.quantum = quantum
        # express session slots (same latency-lane semantics as
        # ServingEngine.reserved_slots): sessions are LONG-lived, so with
        # every slot busy a new listener waits for someone to hang up —
        # priority sessions instead take a reserved slot immediately
        if not (0 <= reserved_slots < n_slots):
            raise ValueError(
                f"reserved_slots must be in [0, n_slots); got {reserved_slots}"
            )
        self.reserved_slots = reserved_slots

        self._text_fn, self._speech_fn = st.make_session_fns(cfg, opts, inject, quantum=quantum)
        self._admit_fn = jax.jit(st.admit_session, donate_argnums=(0,), static_argnums=())
        self._state = st.init_session_state(
            cfg, params, n_slots, max_len, kv_int8=bool(opts.kv_int8)
        )
        self._lane = self._state.tts_cache.k[0].shape[-1]
        self._key = jax.random.PRNGKey(seed)
        self._vae_dim = cfg.acoustic_vae_dim
        self._sde_steps = opts.ddpm_steps

        # device-resident admit arrays per voice: re-transferring the ~20 MB
        # preset KV each admit costs 130-280 ms host->device on the remote
        # tunnel vs ~40 ms with the arrays already on device; sessions
        # overwhelmingly reuse a handful of voices. Strong preset refs keep
        # id() stable; FIFO-evicted beyond _PRESET_CACHE_MAX.
        self._preset_cache: Dict[int, tuple] = {}

        self.slots: List[Optional[_Slot]] = [None] * n_slots
        # (0|1, seq, handle): priority sessions admit before bulk ones
        # (FIFO within each class; handles are not orderable)
        import itertools

        self._submit_seq = itertools.count()
        self.pending: "queue.PriorityQueue" = queue.PriorityQueue()
        self._cv = threading.Condition()
        self._running = True
        self._draining = False
        self.windows_run = 0
        self.last_window_s: Optional[float] = None
        self.window_times: List[float] = []  # recent window wall times (bench)
        import collections

        self._recs: "collections.deque" = collections.deque(maxlen=2048)
        self._recs_lock = threading.Lock()
        self.ignore_eos = ignore_eos  # bench/testing: random-weight EOS noise
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    # Submission
    # ------------------------------------------------------------------

    def submit(
        self,
        text_ids: np.ndarray,
        preset: Optional[st.VoicePreset] = None,
        *,
        noise_bank=None,
        max_new_frames: Optional[int] = None,
        priority: bool = False,
        live: bool = False,
    ) -> StreamSessionHandle:
        if self._draining or not self._running:
            raise RuntimeError("engine is draining")
        preset = preset or self.default_preset
        if preset is None:
            raise ValueError("no preset given and no default_preset configured")
        if self.inject and noise_bank is None:
            raise ValueError("inject engine: every submit needs a noise_bank")
        admit_kwargs, tts_len = self._device_preset(preset)
        h = StreamSessionHandle(
            text_ids, admit_kwargs, noise_bank=noise_bank,
            max_new_frames=max_new_frames, live=live,
        )
        h._engine = self
        h.priority = priority
        with self._recs_lock:
            self._recs.append(h.rec)
        # capacity bookkeeping mirrors streaming.generate:438
        h._max_steps = self.max_len - tts_len
        self.pending.put((0 if priority else 1, next(self._submit_seq), h))
        with self._cv:
            self._cv.notify_all()
        return h

    _PRESET_CACHE_MAX = 32

    def _device_preset(self, preset: st.VoicePreset):
        """(admit kwargs with device-resident arrays, preset tts length).
        KV/h arrays are pre-cast to the cache dtype (bit-identical — the
        admit splice casts on write anyway) so a cache miss transfers half
        the bytes, and hits transfer nothing."""
        ent = self._preset_cache.get(id(preset))
        if ent is not None:
            return ent[1], ent[2]
        host = st.preset_admit_arrays(
            preset, self._lane, self.preset_bucket, max_len=self.max_len
        )
        dt = self._state.tts_cache.k[0].dtype
        if dt == jnp.int8:
            # int8 KV: the admit splice quantizes f32 rows in-kernel with the
            # same rounding as the solo init_stream_state path — keep the
            # host arrays f32 (a bf16 pre-cast would perturb the int8 LSBs)
            dt = jnp.float32
        dev = {}
        for k, v in host.items():
            arr = np.asarray(v)
            if arr.dtype == np.float32:
                arr = jnp.asarray(arr, dt)
            dev[k] = jax.device_put(arr)
        tts_len = int(host["tts_len"])
        if len(self._preset_cache) >= self._PRESET_CACHE_MAX:
            self._preset_cache.pop(next(iter(self._preset_cache)))
        self._preset_cache[id(preset)] = (preset, dev, tts_len)
        return dev, tts_len

    def submit_text(self, text: str, preset: Optional[st.VoicePreset] = None,
                    **kw) -> StreamSessionHandle:
        if self.processor is None:
            raise RuntimeError("engine built without a processor")
        preset = preset or self.default_preset
        out = self.processor.process_input_with_cached_prompt(text, preset)
        return self.submit(out.tts_text_ids, preset, **kw)

    # ------------------------------------------------------------------
    # Loop
    # ------------------------------------------------------------------

    def _admit_pending(self) -> None:
        free = [b for b in range(self.n_slots) if self.slots[b] is None]
        while free:
            try:
                cls, _seq, h = self.pending.get_nowait()
            except queue.Empty:
                return
            if h.cancelled.is_set():
                h._finish()
                continue
            if cls == 0:  # priority: prefer an express slot, else any free
                b = next((x for x in free if x < self.reserved_slots), free[0])
            else:
                # bulk never occupies express slots; the PriorityQueue head
                # being bulk means no priority session is queued behind it
                b = next((x for x in free if x >= self.reserved_slots), None)
                if b is None:
                    self.pending.put((cls, _seq, h))
                    return
            free.remove(b)
            try:
                self._state = self._admit_fn(self._state, b, **{
                    k: v for k, v in h.admit_kwargs.items()
                })
            except BaseException as e:
                # a bad preset must fail ITS handle, not hang the waiter or
                # kill the loop for the resident sessions
                h._finish(e)
                free.append(b)
                continue
            self.slots[b] = _Slot(handle=h, max_steps=h._max_steps)

    def _retire(self, b: int, *, reach_max_step: bool = False) -> None:
        slot = self.slots[b]
        self.slots[b] = None
        if slot is not None:
            slot.handle.reach_max_step = reach_max_step
            slot.handle._finish()

    def _loop(self) -> None:
        try:
            while self._running:
                self._admit_pending()
                occupied = [b for b in range(self.n_slots) if self.slots[b] is not None]
                if not occupied:
                    with self._cv:
                        if self.pending.empty():
                            self._cv.wait(timeout=self._idle_poll_s)
                    if self._draining and self.pending.empty():
                        break
                    continue

                t0 = time.monotonic()
                # per-slot cancellation / frame-cap gate, every quantum; the
                # capacity gate (streaming.generate:448) only at a window
                # boundary — mid-window slots already cleared it at the
                # window's start, exactly like the solo loop
                for b in list(occupied):
                    slot = self.slots[b]
                    if slot.handle.cancelled.is_set():
                        self._retire(b)
                    elif (slot.cycle_pos == 0
                          and slot.steps + TEXT_W + HOP_FRAMES > slot.max_steps):
                        self._retire(b, reach_max_step=True)
                    elif (slot.handle.max_new_frames is not None
                          and slot.handle.n_frames >= slot.handle.max_new_frames):
                        self._retire(b, reach_max_step=True)
                occupied = [b for b in range(self.n_slots) if self.slots[b] is not None]
                if not occupied:
                    continue

                # ---- live sessions: unpark a slot whose text stream grew
                # (it resumes with a fresh text window below), retire one
                # whose stream closed while parked (its EOS already fired)
                for b in list(occupied):
                    slot = self.slots[b]
                    if not slot.parked:
                        continue
                    h = slot.handle
                    with h._text_lock:
                        has_text = slot.text_pos < h.text_ids.size
                        open_ = h.text_open
                    if has_text:
                        slot.parked = False
                        h.parked.clear()
                    elif not open_:
                        self._retire(b)
                occupied = [b for b in range(self.n_slots) if self.slots[b] is not None]
                stepping = [b for b in occupied if not self.slots[b].parked]
                if not stepping:
                    # every resident session is parked awaiting text: idle
                    # (append_text/end_text notify the cv) instead of
                    # dispatching an all-inactive quantum
                    with self._cv:
                        if self.pending.empty():
                            self._cv.wait(timeout=self._idle_poll_s)
                    continue

                # ---- text window: only slots STARTING a 5-text/6-speech
                # window this quantum (cycle_pos 0 — freshly admitted or just
                # wrapped); other rows are all-invalid no-ops. Per-slot
                # cadence is therefore exactly the solo 5/6 interleave even
                # when slots joined mid-window of one another.
                ids = np.zeros((self.n_slots, TEXT_W), np.int32)
                valid = np.zeros((self.n_slots, TEXT_W), bool)
                any_text = False
                for b in stepping:
                    slot = self.slots[b]
                    if slot.cycle_pos != 0:
                        continue
                    with slot.handle._text_lock:  # live appends grow text_ids
                        rem = slot.handle.text_ids[slot.text_pos : slot.text_pos + TEXT_W]
                    if rem.size:
                        ids[b, : rem.size] = rem
                        valid[b, : rem.size] = True
                        slot.text_pos += rem.size
                        slot.steps += rem.size
                        any_text = True
                if any_text:
                    self._state = self._text_fn(
                        self.params, self._state, jnp.asarray(ids), jnp.asarray(valid)
                    )

                # ---- speech quantum (parked rows stay inactive: their
                # caches hold, their noise-bank cursor does not advance)
                active = np.zeros((self.n_slots,), bool)
                for b in stepping:
                    active[b] = True
                self._key, sk = jax.random.split(self._key)
                if self.inject:
                    noise = self._gather_noise(stepping)
                    self._state, audio, eos = self._speech_fn(
                        self.params, self._state, sk, jnp.asarray(active), noise
                    )
                else:
                    self._state, audio, eos = self._speech_fn(
                        self.params, self._state, sk, jnp.asarray(active)
                    )
                for b in stepping:
                    slot = self.slots[b]
                    slot.steps += self.quantum
                    slot.frame_counter += self.quantum
                    slot.cycle_pos = (slot.cycle_pos + self.quantum) % HOP_FRAMES

                # late-arrival admission point: dispatch admit splices for
                # already-free slots NOW, while the device still runs the
                # quantum (the splice queues behind it) — a joiner arriving
                # mid-quantum starts its first window next iteration instead
                # of after the fetch+route of this one
                self._admit_pending()

                # one transport round-trip per quantum (separate fetches cost
                # ~25 ms each on the remote tunnel)
                audio_np, eos_np = jax.device_get((audio, eos))
                self.windows_run += 1
                self.last_window_s = time.monotonic() - t0
                self.window_times.append(self.last_window_s)
                if len(self.window_times) > 2048:
                    del self.window_times[:1024]

                # ---- route frames / EOS per slot
                for b in stepping:
                    slot = self.slots[b]
                    if slot is None or slot.handle.cancelled.is_set():
                        continue
                    keep = self.quantum
                    hit = np.nonzero(eos_np[:, b] > 0.5)[0]
                    if hit.size and self.ignore_eos:
                        hit = np.zeros(0, np.int64)
                    if hit.size:
                        keep = int(hit[0]) + 1
                    for f in range(keep):
                        slot.handle._push(audio_np[f, b, :, 0])
                    if hit.size:
                        h = slot.handle
                        with h._text_lock:
                            live_open = h.live and h.text_open
                        if live_open:
                            # EOS with the text stream still open: PARK —
                            # keep the slot + caches, stop stepping, resume
                            # on the next append_text (end_text retires it)
                            slot.parked = True
                            slot.cycle_pos = 0
                            h.parked.set()
                        else:
                            self._retire(b)
            # drain epilogue: anything still queued is refused; any session
            # still resident (e.g. a PARKED live session at shutdown) is
            # failed loudly rather than hanging its waiter forever
            for b in range(self.n_slots):
                if self.slots[b] is not None:
                    self.slots[b].handle._finish(
                        RuntimeError("engine shut down while the session was live")
                    )
                    self.slots[b] = None
            while True:
                try:
                    self.pending.get_nowait()[2]._finish(
                        RuntimeError("engine shut down before the session started")
                    )
                except queue.Empty:
                    break
        except BaseException as e:  # deliver the failure to every waiter
            for b in range(self.n_slots):
                if self.slots[b] is not None:
                    self.slots[b].handle._finish(e)
                    self.slots[b] = None
            while True:
                try:
                    self.pending.get_nowait()[2]._finish(e)
                except queue.Empty:
                    break
            if self._running:
                raise

    def _gather_noise(self, occupied) -> Dict:
        q = self.quantum
        init = np.zeros((q, self.n_slots, self._vae_dim), np.float32)
        sde = (
            np.zeros((q, self._sde_steps, self.n_slots, self._vae_dim), np.float32)
            if self.opts.sde
            else None
        )
        for b in occupied:
            slot = self.slots[b]
            bank = slot.handle.noise_bank
            c = slot.frame_counter
            rows = bank["init"][c : c + q]
            if rows.shape[0] < q:
                raise ValueError(
                    f"noise_bank['init'] exhausted at frame {c} (slot {b}); enlarge the bank"
                )
            init[:, b] = rows[:, 0]
            if sde is not None:
                srows = bank["sde"][c : c + q]
                sde[:, :, b] = srows[:, :, 0]
        noise = {"init": jnp.asarray(init)}
        if sde is not None:
            noise["sde"] = jnp.asarray(sde)
        return noise

    # ------------------------------------------------------------------
    # Lifecycle / introspection
    # ------------------------------------------------------------------

    def active_sessions(self) -> int:
        return sum(s is not None for s in self.slots)

    def stats(self) -> Dict:
        """Observability snapshot (JSON-ready; the rt-engine analog of
        ServingEngine.stats): session outcomes, join-TTFA percentiles, and
        recent dispatch-quantum wall times against the real-time budget."""
        with self._recs_lock:
            recs = list(self._recs)
        ttfa = sorted(r["ttfa_ms"] for r in recs if r["ttfa_ms"] is not None)[-256:]
        wt = sorted(self.window_times[-512:])
        pct = lambda xs, q: (xs[min(len(xs) - 1, int(q * len(xs)))] if xs else None)
        return {
            "n_slots": self.n_slots,
            "quantum_frames": self.quantum,
            "active": self.active_sessions(),
            # live sessions idling on EOS, awaiting append_text
            "parked": sum(1 for s in self.slots if s is not None and s.parked),
            "queued": self.pending.qsize(),
            "submitted": len(recs),
            "completed": sum(r["outcome"] == "completed" for r in recs),
            "failed": sum(r["outcome"] == "failed" for r in recs),
            "cancelled": sum(r["outcome"] == "cancelled" for r in recs),
            "windows_run": self.windows_run,
            "window_p50_ms": round(pct(wt, 0.50) * 1e3, 1) if wt else None,
            "window_p95_ms": round(pct(wt, 0.95) * 1e3, 1) if wt else None,
            "window_budget_ms": round(self.quantum * 3200 / 24.0, 1),
            "ttfa_p50_ms": round(pct(ttfa, 0.50), 1) if ttfa else None,
            "ttfa_p95_ms": round(pct(ttfa, 0.95), 1) if ttfa else None,
            "frames_emitted": sum(r["frames"] for r in recs),
        }

    def shutdown(self, drain: bool = True, timeout: float = 120.0) -> None:
        self._draining = True
        if drain:
            # graceful-drain a live session: close its text stream so a
            # parked slot retires now and a speaking one ends at its next
            # EOS, instead of holding the drain open for the full timeout
            for s in list(self.slots):
                if s is not None and s.handle.live:
                    s.handle.end_text()
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                if self.active_sessions() == 0 and self.pending.empty():
                    break
                time.sleep(0.02)
        self._running = False
        with self._cv:
            self._cv.notify_all()
        self._thread.join(timeout=timeout)
