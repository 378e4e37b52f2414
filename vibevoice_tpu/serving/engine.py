"""Continuous-batching TTS serving engine.

The reference serves one request at a time (Gradio queue concurrency 1,
reference demo/gradio_demo.py:1143-1146). Decode on TPU is weight-bandwidth
bound, so batching concurrent requests into one fused decode step is nearly
free throughput (bench: bs1 12x -> bs4 32x realtime). This engine keeps a
fixed-capacity DecodeCarry hot on device and:

* prefills each arriving request into a batch-1 carry on a DEDICATED worker
  thread, so prefill tracing/compilation (minutes for a first-seen prompt
  bucket on this TPU) and host work never stall active audio streams,
* the decode thread splices completed prefills into free slots between
  decode dispatches (per-layer dynamic_update_slice on the batch axis — the
  per-sample-length cache design makes slot state fully independent),
* steps all active slots together, routing each slot's audio frames to its
  request's queue,
* frees slots on EOS / per-request max length.

The decode thread owns the carry; the prefill thread only touches its own
batch-1 outputs (device execution itself is serialized by the TPU stream,
which bounds the decode-step delay to one prefill-chunk dispatch).
Submissions and consumers are thread-safe.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import VibeVoiceConfig
from ..models import inference as inf
from ..models import qwen2
from ..models import tokenizer as tok


@partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def _join_slot(carry: inf.DecodeCarry, single: inf.DecodeCarry, slot, batch: int):
    """Insert a prefilled batch-1 carry into `slot` (and its negative row at
    `batch + slot`)."""

    def put_row(buf, row, at):
        return jax.lax.dynamic_update_slice_in_dim(buf, row, at, axis=0)

    b1 = 1
    k = tuple(
        put_row(put_row(ck, sk[:b1], slot), sk[b1:], batch + slot)
        for ck, sk in zip(carry.cache.k, single.cache.k)
    )
    v = tuple(
        put_row(put_row(cv, sv[:b1], slot), sv[b1:], batch + slot)
        for cv, sv in zip(carry.cache.v, single.cache.v)
    )
    length = carry.cache.length.at[slot].set(single.cache.length[0])
    length = length.at[batch + slot].set(single.cache.length[1])
    ks = vs = None
    if carry.cache.k_scale is not None:  # int8 cache: splice the row scales too
        ks = tuple(
            put_row(put_row(cs, ss[:b1], slot), ss[b1:], batch + slot)
            for cs, ss in zip(carry.cache.k_scale, single.cache.k_scale)
        )
        vs = tuple(
            put_row(put_row(cs, ss[:b1], slot), ss[b1:], batch + slot)
            for cs, ss in zip(carry.cache.v_scale, single.cache.v_scale)
        )
    dec_state = jax.tree.map(lambda c, s: put_row(c, s, slot), carry.dec_state, single.dec_state)
    sem_state = jax.tree.map(lambda c, s: put_row(c, s, slot), carry.sem_state, single.sem_state)
    return inf.DecodeCarry(
        cache=qwen2.KVCache(k=k, v=v, length=length, k_scale=ks, v_scale=vs),
        dec_state=dec_state,
        sem_state=sem_state,
        h_pos=put_row(carry.h_pos, single.h_pos, slot),
        h_neg=put_row(carry.h_neg, single.h_neg, slot),
        finished=carry.finished.at[slot].set(False),
        n_diff=carry.n_diff.at[slot].set(0),
    )


@dataclass
class Request:
    input_ids: np.ndarray  # (1, T)
    valid_mask: np.ndarray
    speech_tensors: Optional[np.ndarray] = None
    speech_frame_valid: Optional[np.ndarray] = None
    speech_input_mask: Optional[np.ndarray] = None
    # Seeds the voice-clone VAE noise draw with the same key derivation as
    # inference.generate(seed=...) — deterministic per request, independent
    # of arrival order. Frame-level diffusion noise comes from the engine's
    # shared decode RNG (continuous batching fuses unrelated requests into
    # one device step); fully deterministic audio needs the offline API.
    seed: int = 0
    max_length_times: float = 2.0
    # wall-clock budget from submit(); an expired request is finished like a
    # cancel (audio already produced stays available) and counts as
    # `deadline_expired` in EngineStats
    deadline_s: Optional[float] = None
    # latency lane: a priority request jumps the prefill queue and may take
    # ANY free slot — including the engine's `reserved_slots` express slots
    # that bulk requests never occupy — so its TTFA under a full bulk queue
    # is ~the unloaded single-stream TTFA instead of a queue-for-slot wait
    priority: bool = False


@dataclass
class EngineStats:
    """Point-in-time engine observability snapshot (engine.stats())."""

    submitted: int
    completed: int
    failed: int
    cancelled: int
    deadline_expired: int
    active: int  # slots decoding right now
    queued: int  # waiting for prefill or a free slot
    frames_emitted: int
    audio_seconds_emitted: float
    ttfa_p50_ms: Optional[float]  # over the last 256 finished-first-audio requests
    ttfa_p95_ms: Optional[float]
    uptime_s: float
    # latency-lane split (None when no priority traffic was seen): operators
    # watch this to verify the express lane is delivering its SLO
    priority_ttfa_p50_ms: Optional[float] = None
    priority_submitted: int = 0


class RequestHandle:
    _END = object()

    def __init__(self, request: Request):
        self.request = request
        self.chunks: "queue.Queue" = queue.Queue()
        self._audio: List[np.ndarray] = []
        self._done = threading.Event()
        self.error: Optional[BaseException] = None
        self.cancelled = threading.Event()
        self.submit_time = time.monotonic()
        self.first_audio_time: Optional[float] = None  # set on first frame
        self.deadline_expired = False
        # scalar observability record the engine keeps after this handle is
        # gone (stats() must not pin request audio in host RAM)
        self.rec = {"submit": self.submit_time, "ttfa_ms": None, "outcome": None,
                    "priority": request.priority}

    def _deadline_exceeded(self) -> bool:
        d = self.request.deadline_s
        return d is not None and (time.monotonic() - self.submit_time) > d

    def cancel(self):
        """Stop this request (the reference's stop-button semantics): a
        pending request is failed at admission; an active one is finished via
        the next dispatch's ext-finish row. Audio already produced remains
        available from result()/stream()."""
        self.cancelled.set()

    def stream(self):
        """Iterate audio frames (each `hop` samples) as they are produced."""
        while True:
            c = self.chunks.get()
            if c is self._END:
                return
            yield c

    def result(self, timeout: Optional[float] = None) -> np.ndarray:
        """Block until generation finishes; returns the full waveform."""
        if not self._done.wait(timeout):
            raise TimeoutError("generation not finished")
        if self.error is not None:
            raise self.error
        return np.concatenate(self._audio) if self._audio else np.zeros(0, np.float32)

    # engine-side
    def _push(self, audio: np.ndarray):
        if self.first_audio_time is None:
            self.first_audio_time = time.monotonic()
            self.rec["ttfa_ms"] = (self.first_audio_time - self.submit_time) * 1e3
        self._audio.append(audio)
        self.chunks.put(audio)

    def _finish(self, err: Optional[BaseException] = None):
        self.error = err
        if self.deadline_expired:
            self.rec["outcome"] = "deadline_expired"
        elif self.cancelled.is_set():
            self.rec["outcome"] = "cancelled"
        elif err is not None:
            self.rec["outcome"] = "failed"
        else:
            self.rec["outcome"] = "completed"
        self.chunks.put(self._END)
        self._done.set()


class ServingEngine:
    def __init__(
        self,
        cfg: VibeVoiceConfig,
        params,
        *,
        tokens: inf.SpecialTokens = inf.SpecialTokens(),
        opts: inf.GenerateOptions = inf.GenerateOptions(),
        max_batch: int = 4,
        max_len: int = 4096,
        idle_sleep: float = 0.002,
        frames_per_dispatch: Optional[int] = None,  # None -> opts.frames_per_dispatch
        pipeline: bool = True,
        mesh=None,  # jax.sharding.Mesh with a "tp" axis: TP-sharded serving
        reserved_slots: int = 0,  # express slots only Request(priority=True)
        # may occupy (throughput cost ≈ dropping to max_batch - reserved
        # slots for bulk traffic; see bench_serving.py BENCH_PRIORITY)
        speech_bucket: int = 0,  # pad voice-clone waveforms to a multiple of
        # this many samples (0 = off). Prompt token lengths are already
        # bucketed (PROMPT_BUCKET), but every distinct voice-sample length is
        # otherwise a fresh prefill_fn compile (1-3 min first time on this
        # TPU). Exact: the acoustic encoder is causal, so trailing zero
        # samples never change earlier latent frames, and the padded frames
        # carry speech_frame_valid=False so the splice ignores them. (The
        # σ-VAE sample noise is drawn at the padded shape: bit-identical to
        # the unbucketed run for one voice clip — threefry fills row-major,
        # so the first clip's draw is a prefix — and a fresh but identically
        # distributed draw for later clips, exactly like changing the seed.)
    ):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            # Tensor-parallel serving (the 7B-bf16 @ 32K config needs tp>=2
            # on 16 GB chips): params shard per the Megatron TP plan and the
            # KV cache over KV heads; activations replicate. prefill_fn and
            # the fused step inherit the layouts through jit — the same
            # path validated at 7B geometry in __graft_entry__'s dryrun.
            if any("w8" in l["attn"]["q"] or "qkv" in l["attn"] for l in params["lm"]["layers"]):
                raise ValueError(
                    "TP serving shards dense ('w') params; int8-quantized "
                    "params are the SINGLE-chip memory config (7B int8 + "
                    "int8 KV fits one 16 GB chip) — use one or the other"
                )
            from ..parallel import mesh as pmesh

            params = jax.device_put(params, pmesh.model_param_shardings(params, mesh))
        self.params = params
        self.tokens = tokens
        # kv_int8=None resolves to the automatic long-context policy against
        # THIS engine's cache length (opts.max_length is per-request cap only)
        opts = inf.resolve_kv_int8(opts, max_len)
        self.opts = opts
        self.max_batch = max_batch
        self.max_len = max_len
        hop = cfg.acoustic_tokenizer_config.hop_length
        # round the bucket itself up to a hop multiple so frame counts bucket too
        self.speech_bucket = -(-speech_bucket // hop) * hop if speech_bucket else 0
        self.idle_sleep = idle_sleep
        # frames_per_dispatch > 1 scans K fused frame steps per dispatch
        # (host round-trips are ~10 ms on the remote-TPU transport — at 1
        # frame/dispatch they dominate the serving frame time). Trade-off:
        # audio is delivered and slots are admitted/freed at K-frame
        # granularity (K=8 is ~1.07 s of audio per chunk). Defaults to the
        # same knob on GenerateOptions (which inference.generate honors).
        if frames_per_dispatch is None:
            frames_per_dispatch = max(1, opts.frames_per_dispatch)
        self.frames_per_dispatch = frames_per_dispatch
        # pipeline=True keeps one dispatch in flight (device computes while
        # the host fetches/delivers the previous window) at the cost of one
        # dispatch of extra delivery latency; turn off for minimum-latency
        # single-stream serving.
        self.pipeline = pipeline
        if frames_per_dispatch > 1:
            self.step_fn = inf.make_multi_step_fn(cfg, tokens, opts, frames_per_dispatch)
        else:
            self.step_fn = inf.make_step_fn(cfg, tokens, opts)

        dtype = params["lm"]["embed"].dtype
        b = max_batch
        cache = qwen2.make_cache(
            cfg.decoder_config, 2 * b, max_len, dtype, quantized=opts.kv_int8
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            kv_sh = NamedSharding(mesh, P(None, "tp", None, None))
            rep = NamedSharding(mesh, P())
            cache = qwen2.KVCache(
                k=tuple(jax.device_put(x, kv_sh) for x in cache.k),
                v=tuple(jax.device_put(x, kv_sh) for x in cache.v),
                length=jax.device_put(cache.length, rep),
                k_scale=(
                    tuple(jax.device_put(x, kv_sh) for x in cache.k_scale)
                    if cache.k_scale is not None
                    else None
                ),
                v_scale=(
                    tuple(jax.device_put(x, kv_sh) for x in cache.v_scale)
                    if cache.v_scale is not None
                    else None
                ),
            )
        self.carry = inf.DecodeCarry(
            cache=cache,
            dec_state=tok.init_decoder_state(cfg.acoustic_tokenizer_config, b, dtype),
            sem_state=tok.init_encoder_state(cfg.semantic_tokenizer_config, b, dtype),
            h_pos=jnp.zeros((b, cfg.decoder_config.hidden_size), dtype),
            h_neg=jnp.zeros((b, cfg.decoder_config.hidden_size), dtype),
            finished=jnp.ones((b,), bool),  # all slots idle
            n_diff=jnp.zeros((b,), jnp.int32),
        )
        self.slots: List[Optional[RequestHandle]] = [None] * b
        self.slot_steps = np.zeros(b, np.int64)
        self.slot_max_steps = np.zeros(b, np.int64)
        # Handles freed from their slot at DISPATCH time (predicted step-cap/
        # cancel finish) whose final window is still in flight: _drain must
        # fail these too on a device fault, or their consumers hang.
        self._retiring: List = []
        if not (0 <= reserved_slots < max_batch):
            raise ValueError(
                f"reserved_slots must be in [0, max_batch); got {reserved_slots}"
            )
        self.reserved_slots = reserved_slots
        # priority requests drain before bulk ones (FIFO within each class);
        # entries are (0|1, seq, handle) — handles are not orderable
        import itertools

        self._submit_seq = itertools.count()
        self.pending: "queue.PriorityQueue" = queue.PriorityQueue()
        # prefilled-but-not-yet-spliced requests; bounded so the prefill
        # worker can't pile up full-size batch-1 KV caches in HBM
        self.ready: "queue.Queue" = queue.Queue(maxsize=2)
        # decode-thread-local staging for prefilled entries: _admit drains
        # the bounded queue here every call so a cancelled-but-queued request
        # is finished promptly even when no decode slot is free (and its
        # ready-queue slot is released for the prefill worker)
        self._ready_local: List = []
        self.key = jax.random.PRNGKey(0)
        # observability (stats()): bounded registry of per-request SCALAR
        # records (never the handles — those pin the request audio in host
        # RAM). Guarded by a lock: submit() appends from handler threads
        # while stats() snapshots.
        import collections

        self._recs: "collections.deque" = collections.deque(maxlen=4096)
        self._recs_lock = threading.Lock()
        self._frames_emitted = 0
        self._start_time = time.monotonic()
        self._hop = cfg.acoustic_tokenizer_config.hop_length
        self._stop = threading.Event()
        self._draining = threading.Event()
        # Event-driven state observation: notified after every externally
        # visible state transition (submit, prefill staged, slot assigned or
        # freed, audio pushed, drain). Tests and monitors use wait_for_state
        # instead of sleep/poll loops — deterministic on a loaded machine.
        self.state_cv = threading.Condition()
        # Graceful-drain idle detection rides Queue.unfinished_tasks: put()
        # increments, and the workers call task_done() only once an item is
        # fully settled (finished, staged in _ready_local, or in a slot) — so
        # a request popped from a queue but still in a worker's hands keeps
        # the drain poll busy. A bare "busy" flag had a TOCTOU here: it was
        # set only after get() returned.
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._prefill_thread = threading.Thread(target=self._prefill_loop, daemon=True)
        self._thread.start()
        self._prefill_thread.start()

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _notify_state(self) -> None:
        with self.state_cv:
            self.state_cv.notify_all()

    def wait_for_state(self, predicate, timeout: float = 60.0) -> bool:
        """Block until `predicate()` (evaluated under the state lock) is true,
        re-checking on every engine state transition. Returns False on
        timeout. The event-driven replacement for polling engine internals."""
        with self.state_cv:
            return self.state_cv.wait_for(predicate, timeout)

    def submit(self, request: Request) -> RequestHandle:
        handle = RequestHandle(request)
        with self._recs_lock:
            self._recs.append(handle.rec)
        if self._stop.is_set() or self._draining.is_set():
            # a stopped/draining engine (shutdown or dead decode loop) must
            # never accept work that nothing will consume — fail fast, not a
            # forever-blocked handle.stream()
            handle._finish(
                RuntimeError(
                    "engine is draining" if self._draining.is_set() else "engine is stopped"
                )
            )
            return handle
        self.pending.put((0 if request.priority else 1, next(self._submit_seq), handle))
        self._notify_state()
        if self._stop.is_set():
            # raced with shutdown or a worker-crash drain (ADVICE r4): the
            # one-shot drains (_drain / the prefill-crash sweep) may already
            # have swept `pending` before our put landed. Fail everything
            # still queued AND this handle directly — a duplicate _finish
            # only adds a redundant end-sentinel, which consumers never reach.
            while True:
                try:
                    h = self.pending.get_nowait()[2]
                    if not h._done.is_set():
                        h._finish(RuntimeError("engine is stopped"))
                    self.pending.task_done()
                except queue.Empty:
                    break
            if not handle._done.is_set():  # never overwrite a settled outcome
                handle._finish(RuntimeError("engine is stopped"))
        return handle

    def warmup(
        self,
        prompt_tokens: int = 64,
        voice_samples: int = 0,
        timeout: float = 600.0,
    ) -> float:
        """Pre-compile the serving hot path so the FIRST real request never
        pays the first-shape compile (1-3 min per program on this TPU, even
        with the persistent compile cache the very first deployment run).

        Submits a synthetic request through the normal prefill -> splice ->
        decode path and discards its audio. `prompt_tokens` picks the prompt
        bucket to prime (lengths are padded to PROMPT_BUCKET, so one warmup
        covers every prompt that rounds to the same bucket); `voice_samples`
        > 0 additionally primes the voice-clone prefill variant (pair it with
        `speech_bucket` so real voice lengths hit the warmed shape). The
        decode step itself is shape-independent, so any warmup primes it.

        Returns wall seconds spent. The synthetic request is removed from the
        stats() registry; only its few frames count toward frames_emitted.
        """
        t0 = time.monotonic()
        n = max(2, min(prompt_tokens, self.max_len // 2))
        ids = np.zeros((1, n), np.int64)
        ids[0, -1] = self.tokens.speech_start
        kw = {}
        if voice_samples > 0:
            hop = self._hop
            frames = -(-voice_samples // hop)
            kw = dict(
                speech_tensors=np.zeros((1, voice_samples), np.float32),
                speech_frame_valid=np.zeros((1, frames), bool),
                speech_input_mask=np.zeros((1, n), bool),
            )
        # bound the generation to ~one dispatch window of frames
        times = max(self.frames_per_dispatch, 1) / n
        h = self.submit(
            Request(
                input_ids=ids,
                valid_mask=np.ones((1, n), bool),
                max_length_times=times,
                **kw,
            )
        )
        try:
            h.result(timeout=timeout)
        except BaseException:
            # compile hang / timeout: cancel so the synthetic request frees
            # its decode slot instead of occupying capacity forever
            h.cancel()
            raise
        finally:
            with self._recs_lock:
                try:
                    self._recs.remove(h.rec)
                except ValueError:
                    pass
        return time.monotonic() - t0

    def stats(self) -> EngineStats:
        """Observability snapshot. Cheap (walks the bounded scalar-record
        registry); safe to call from any thread."""
        with self._recs_lock:
            recs = list(self._recs)
        submitted = len(recs)
        completed = sum(r["outcome"] == "completed" for r in recs)
        failed = sum(r["outcome"] == "failed" for r in recs)
        cancelled = sum(r["outcome"] == "cancelled" for r in recs)
        expired = sum(r["outcome"] == "deadline_expired" for r in recs)
        ttfa = [r["ttfa_ms"] for r in recs if r["ttfa_ms"] is not None]
        # retiring handles (slot freed at dispatch time, final in-flight
        # window still delivering) are active, not queued — snapshot once,
        # the list is only mutated on the decode thread (ADVICE r3)
        active = sum(h is not None for h in self.slots) + len(list(self._retiring))
        queued = submitted - completed - failed - cancelled - expired - active
        ttfa = sorted(ttfa[-256:])
        pct = lambda q: ttfa[min(len(ttfa) - 1, int(q * len(ttfa)))] if ttfa else None
        pri = sorted(
            r["ttfa_ms"] for r in recs
            if r.get("priority") and r["ttfa_ms"] is not None
        )[-256:]
        return EngineStats(
            submitted=submitted,
            completed=completed,
            failed=failed,
            cancelled=cancelled,
            deadline_expired=expired,
            active=active,
            queued=max(queued, 0),
            frames_emitted=self._frames_emitted,
            audio_seconds_emitted=self._frames_emitted * self._hop / 24_000.0,
            ttfa_p50_ms=pct(0.50),
            ttfa_p95_ms=pct(0.95),
            uptime_s=time.monotonic() - self._start_time,
            priority_ttfa_p50_ms=(pri[len(pri) // 2] if pri else None),
            priority_submitted=sum(bool(r.get("priority")) for r in recs),
        )

    def shutdown(self, timeout: float = 30.0, drain: bool = False):
        """Stop the engine. With ``drain=True`` (graceful rollout shutdown),
        first stop accepting submissions (they fail fast with "engine is
        draining") and let already-accepted requests run to completion —
        up to `timeout` seconds — before stopping the worker threads;
        anything still unfinished at the deadline is failed by the normal
        drain path."""
        if drain and not self._stop.is_set():
            self._draining.set()
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                # unfinished_tasks covers items popped from a queue but not
                # yet settled by the worker holding them (see __init__ note)
                idle = (
                    self.pending.unfinished_tasks == 0
                    and self.ready.unfinished_tasks == 0
                    and not self._ready_local
                    and all(h is None for h in self.slots)
                )
                if idle:
                    break
                time.sleep(0.05)
        self._stop.set()
        self._thread.join(timeout)
        self._prefill_thread.join(timeout)

    # ------------------------------------------------------------------
    # prefill worker (never blocks the decode loop)
    # ------------------------------------------------------------------

    def _prefill_loop(self):
        try:
            self._prefill_loop_inner()
        except BaseException as e:  # a dead prefill thread must not strand
            # callers: per-request failures are handled inside _prefill_one
            # (handle._finish(e)), so anything reaching here is a worker-level
            # fault. Stop the engine — the decode thread drains slots/ready on
            # its way out (slot state is decode-thread-owned; calling _drain
            # here would race it) — and fail the queue only THIS thread
            # consumes, so nothing waits forever on a prefill that will never
            # happen.
            self._stop.set()
            while True:
                try:
                    self.pending.get_nowait()[2]._finish(e)
                    self.pending.task_done()
                except queue.Empty:
                    break
            raise

    def _prefill_loop_inner(self):
        while not self._stop.is_set():
            try:
                handle = self.pending.get(timeout=0.02)[2]
            except queue.Empty:
                continue
            # task_done only after the request is settled (finished, or put on
            # `ready` — which incremented ready.unfinished_tasks first), so a
            # graceful drain's idle check never sees a gap while the request
            # is in this worker's hands
            try:
                try:
                    self._prefill_one(handle)
                except BaseException as e:
                    # worker-level fault with a request in hand: it is in no
                    # queue anymore, so nothing else can ever finish it
                    handle._finish(e)
                    raise
            finally:
                self.pending.task_done()

    def _prefill_one(self, handle):
        """One request's prefill."""
        if handle.cancelled.is_set():  # cancelled before prefill
            handle._finish()
            return
        if handle._deadline_exceeded():  # expired while queued
            handle.deadline_expired = True
            handle._finish()
            return
        try:
            # Request.seed drives the voice-clone VAE noise draw through the
            # SAME derivation as inference.generate(seed=...) (PRNGKey(seed)
            # + the 3-way split, inference.py generate()), so the prefilled
            # carry is deterministic per request and arrival-order
            # independent. Frame-level diffusion noise still comes from the
            # engine's shared decode RNG: continuous batching fuses unrelated
            # requests into one device step, so per-frame draws necessarily
            # depend on what else is scheduled.
            rk = jax.random.PRNGKey(handle.request.seed)
            _rk, _pk, vk = jax.random.split(rk, 3)
            single, max_steps = self._prefill(handle.request, vk)
        except BaseException as e:  # surface bad requests to the caller
            handle._finish(e)
            return
        if handle.cancelled.is_set():  # cancelled during prefill
            handle._finish()
            return
        placed = False
        while not self._stop.is_set():
            try:
                self.ready.put((handle, single, max_steps), timeout=0.1)
                placed = True
                self._notify_state()
                break
            except queue.Full:
                continue
        if not placed:
            # engine stopping while this prefill was in flight: nothing
            # will ever consume the entry — a handle stranded here hangs
            # its caller's result()/stream() forever
            handle._finish(RuntimeError("engine is stopped"))
        elif self._stop.is_set():
            # placed, but the decode thread may already have run its
            # final drain: sweep whatever is still queued (a duplicate
            # _finish only adds a redundant end-sentinel)
            while True:
                try:
                    self.ready.get_nowait()[0]._finish(
                        RuntimeError("engine is stopped")
                    )
                    self.ready.task_done()
                except queue.Empty:
                    break

    # ------------------------------------------------------------------
    # decode worker
    # ------------------------------------------------------------------

    def _admit(self):
        """Splice completed prefills into free slots (cheap jitted updates,
        called between decode dispatches)."""
        # Drain the ready queue, but BOUND the staging list: each staged entry
        # holds a full batch-2 x max_len KV cache in HBM, so an unbounded
        # drain under a submit burst with every slot busy would OOM the chip.
        # Cancelled/expired entries are always swept (they hold no slot and
        # must finish promptly); live entries stage only up to max_batch —
        # total prefilled carries are then <= max_batch + ready.maxsize + 1.
        while True:
            if len(self._ready_local) >= self.max_batch:
                requeue = []
                try:
                    while True:
                        item = self.ready.get_nowait()
                        h = item[0]
                        if h._deadline_exceeded() and not h.cancelled.is_set():
                            h.deadline_expired = True
                            h.cancel()
                        if h.cancelled.is_set():
                            h._finish()
                            self.ready.task_done()
                        elif h.request.priority and (
                            sum(
                                1 for it in self._ready_local
                                if it[0].request.priority
                            ) < max(1, self.reserved_slots)
                        ):
                            # a priority entry must reach the express slot even
                            # when the staging list is full of bulk carries —
                            # it is placed (and its HBM released) this _admit.
                            # Bounded by the express-slot count: a priority
                            # BURST must not pile unbounded prefill carries
                            # (each is a full batch-2 x max_len cache) in HBM.
                            self._ready_local.append(item)
                            self.ready.task_done()
                        else:
                            requeue.append(item)
                except queue.Empty:
                    pass
                for item in requeue:
                    try:
                        self.ready.put_nowait(item)  # re-put before task_done:
                        # unfinished_tasks never dips while the item is live
                    except queue.Full:  # prefill thread refilled meanwhile
                        self._ready_local.append(item)
                    self.ready.task_done()
                break
            try:
                self._ready_local.append(self.ready.get_nowait())
                self.ready.task_done()
            except queue.Empty:
                break
        keep: List = []
        free = [i for i, h in enumerate(self.slots) if h is None]
        # priority entries place first (stable within each class); bulk
        # requests never occupy the first `reserved_slots` express slots
        staged = sorted(
            self._ready_local, key=lambda it: not it[0].request.priority
        )
        for handle, single, max_steps in staged:
            if handle._deadline_exceeded() and not handle.cancelled.is_set():
                handle.deadline_expired = True
                handle.cancel()
            if handle.cancelled.is_set():  # cancelled while queued
                handle._finish()
                continue
            if handle.request.priority:
                # prefer an express slot; fall back to any free one
                slot = next((i for i in free if i < self.reserved_slots),
                            free[0] if free else None)
            else:
                slot = next((i for i in free if i >= self.reserved_slots), None)
            if slot is None:
                keep.append((handle, single, max_steps))
                continue
            free.remove(slot)
            self.carry = _join_slot(self.carry, single, slot, self.max_batch)
            self.slot_steps[slot] = 0
            self.slot_max_steps[slot] = max_steps
            self.slots[slot] = handle
        self._ready_local = keep
        self._notify_state()

    PROMPT_BUCKET = 64  # right-pad prompts to a bucket so prefill_fn compiles
    # once per bucket instead of once per length

    def _prefill(self, r: Request, vk):
        t = r.input_ids.shape[1]
        pad = -(-t // self.PROMPT_BUCKET) * self.PROMPT_BUCKET - t
        if pad:
            import dataclasses

            r = dataclasses.replace(
                r,
                input_ids=np.pad(r.input_ids, ((0, 0), (0, pad))),
                valid_mask=np.pad(r.valid_mask, ((0, 0), (0, pad))),
                speech_input_mask=(
                    np.pad(r.speech_input_mask, ((0, 0), (0, pad)))
                    if r.speech_input_mask is not None
                    else None
                ),
            )
        use_speech = r.speech_tensors is not None
        if use_speech and self.speech_bucket:
            import dataclasses

            hop = self._hop
            s = r.speech_tensors.shape[1]
            s_pad = -(-s // self.speech_bucket) * self.speech_bucket - s
            if s_pad:
                frames = -(-(s + s_pad) // hop) - r.speech_frame_valid.shape[1]
                r = dataclasses.replace(
                    r,
                    speech_tensors=np.pad(r.speech_tensors, ((0, 0), (0, s_pad))),
                    speech_frame_valid=np.pad(
                        r.speech_frame_valid, ((0, 0), (0, frames))
                    ),
                )
        speech_args = None
        if use_speech:
            speech_args = (
                jnp.asarray(r.speech_tensors),
                jnp.asarray(r.speech_frame_valid),
                jnp.asarray(r.speech_input_mask),
                vk,
                None,
            )
        single = inf.prefill_fn(
            self.cfg,
            self.params,
            jnp.asarray(r.input_ids, jnp.int32),
            self.max_len,
            jnp.asarray(r.valid_mask),
            speech_args,
            use_speech,
            self.tokens,
            "audio",
            self.opts.kv_int8,
        )
        # block here (on the prefill thread) until the device work is done, so
        # the decode loop's splice never inherits a pending prefill dispatch
        jax.block_until_ready(single.h_pos)
        n = int(r.valid_mask.sum())
        max_steps = min(self.max_len - n, int(r.max_length_times * n))
        return single, max_steps

    def _loop(self):
        try:
            self._loop_inner()
        except BaseException as e:  # a dead decode loop must not strand callers
            self._stop.set()
            self._drain(e)
            raise

    def _drain(self, error=None):
        """Fail/finish every slot and queued request. Active slots are
        truncated mid-generation, so they get an error too (a caller must be
        able to tell a partial waveform from a completed one; the audio
        already delivered through stream() remains consumed)."""
        leftover = error or RuntimeError("engine shut down")
        for i, h in enumerate(self.slots):
            if h is not None:
                h._finish(leftover)
                self.slots[i] = None
        for h in self._retiring:
            if not h._done.is_set():
                h._finish(leftover)
        self._retiring = []
        for item in self._ready_local:
            item[0]._finish(leftover)
        self._ready_local = []
        while True:
            try:
                self.ready.get_nowait()[0]._finish(leftover)
                self.ready.task_done()
            except queue.Empty:
                break
        while True:
            try:
                self.pending.get_nowait()[2]._finish(leftover)
                self.pending.task_done()
            except queue.Empty:
                break
        self._notify_state()

    def _loop_inner(self):
        # One dispatch kept in flight: dispatch N+1 is issued BEFORE N's
        # outputs are fetched, so the device computes while the host pays the
        # (remote-transport) fetch + streamer delivery of the previous window.
        # Step counts advance at DISPATCH time (each dispatched frame advances
        # every active slot unless it finished in-device, where the step is
        # masked anyway). Finish bookkeeping is two-tier: step-cap and cancel
        # finishes are HOST-PREDICTABLE (the ext row forces them), so those
        # slots are freed at dispatch time and can host a new request on the
        # very next window; data-dependent EOS finishes are discovered at
        # fetch, one pipelined dispatch late (one extra masked window).
        inflight = None  # (out, snapshot of self.slots at dispatch)

        def process(out, snap):
            k = self.frames_per_dispatch
            # ONE device fetch for the whole window: separate np.asarray
            # calls each pay a full transport round-trip (~25 ms on the
            # remote tunnel — 3 fetches made K=1 serving ~90 ms/frame)
            amask, fin, audio = jax.device_get((out.audio_mask, out.finished, out.audio))
            if k == 1:
                amask, fin, audio = amask[None], fin[None], audio[None]
            for f in range(amask.shape[0]):
                for i, h in enumerate(snap):
                    if h is None:
                        continue
                    # Deliver by the DISPATCH-TIME snapshot: the output row
                    # was computed from the carry as-of dispatch, so it
                    # belongs to snap[i] even if the slot has since been
                    # freed (predicted step-cap finish) and re-admitted.
                    # Post-finish frames are masked in-device (audio_mask
                    # &= ~finished), so a stale window never pushes audio.
                    if amask[f, i]:
                        h._push(audio[f, i, :, 0])
                        self._frames_emitted += 1
                    if fin[f, i] and not h._done.is_set():
                        h._finish()
                    if fin[f, i] and self.slots[i] is h:
                        self.slots[i] = None
            if self._retiring:
                self._retiring = [h for h in self._retiring if not h._done.is_set()]
            self._notify_state()

        while not self._stop.is_set():
            self._admit()
            active = [i for i, h in enumerate(self.slots) if h is not None]
            if not active:
                if inflight is not None:
                    process(*inflight)
                    inflight = None
                    continue
                time.sleep(self.idle_sleep)
                continue

            k = self.frames_per_dispatch
            self.key, sk = jax.random.split(self.key)
            # server-side deadlines finish through the cancel path (audio
            # already produced stays deliverable)
            for h in self.slots:
                if h is not None and not h.cancelled.is_set() and h._deadline_exceeded():
                    h.deadline_expired = True
                    h.cancel()
            # cancelled slots finish through the same in-device ext path as
            # the max-step cap (handle.cancel() — reference stop semantics)
            cancelled = np.array(
                [h is not None and h.cancelled.is_set() for h in self.slots]
            )
            if k > 1:
                ext = (
                    (self.slot_steps[None, :] + np.arange(k)[:, None])
                    >= self.slot_max_steps
                ) | cancelled[None, :]
            else:
                ext = (self.slot_steps >= self.slot_max_steps) | cancelled
            self.carry, out = self.step_fn(self.params, self.carry, sk, jnp.asarray(ext))
            # The output window belongs to the handles active AT DISPATCH —
            # snapshot before the predicted-finish loop below frees any slot,
            # or a retired handle's final window (and its _finish) is lost.
            snap = list(self.slots)
            for i in active:
                self.slot_steps[i] += k
                # Predicted finish: the ext row forced this slot's final frame
                # inside the window just dispatched (step cap or cancel), so
                # the device outcome is already known — free the slot NOW so
                # _admit can splice a waiting request before the next
                # dispatch. Without this a freed slot sat idle ~1.5 windows
                # (finish learned at fetch, one pipelined dispatch late).
                # Final-window audio still reaches the handle: process()
                # delivers by dispatch-time snapshot. EOS finishes are
                # data-dependent and still discovered at fetch.
                # (ext was True at frame f iff steps_before+f >= max; the
                # window contains a forced frame iff steps_after-1 >= max —
                # `>= max` alone would free one window early when the cap
                # lands exactly on a window boundary, orphaning the handle.)
                # `cancelled[i]` is the value ext was BUILT from — re-reading
                # the event here would race a cancel() landing after dispatch.
                h = self.slots[i]
                if h is not None and (
                    cancelled[i] or self.slot_steps[i] - 1 >= self.slot_max_steps[i]
                ):
                    self._retiring.append(h)
                    self.slots[i] = None
            if self.pipeline:
                prev, inflight = inflight, (out, snap)
                if prev is not None:
                    process(*prev)
            else:
                process(out, snap)

        if inflight is not None:  # deliver the last window before draining
            process(*inflight)
        self._drain()
