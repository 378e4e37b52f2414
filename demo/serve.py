"""HTTP TTS server on the continuous-batching engine.

A dependency-free (stdlib http.server) serving front-end: concurrent POSTs
are batched into one fused decode on the device by
vibevoice_tpu.serving.ServingEngine.

  POST /tts         body: {"text": "Speaker 1: ...", "speaker_names": ["Alice"],
                           "seed"?: int}
                    -> audio/wav (whole file once generation completes)
  POST /tts/stream  same body -> chunked-transfer audio/wav: the WAV header
                    goes out immediately and PCM chunks follow as the engine
                    produces frames (incremental delivery — the HTTP analog
                    of the reference's streamer->Gradio path)
  POST /tts/rt      {"text": "...", "seed"?} -> chunked-transfer WAV from the
                    0.5B STREAMING model (lowest TTFA; bs1, serialized;
                    enable with --streaming_model_path [+ --streaming_voice]).
                    With --rt_sessions > 1 add {"live": true} for a LIVE
                    session (LLM->TTS pipelines): the text stream stays open,
                    the response carries an X-Session-Id header, and further
                    text arrives on a second connection via
  POST /tts/rt/append  {"session": sid, "text": "..."} (tokens append to the
                    open stream; a session idling on EOS resumes) and
  POST /tts/rt/end  {"session": sid} (close the stream; the session ends at
                    its next EOS and the audio response terminates)
  POST /v1/audio/speech
                    OpenAI-compatible surface: {"model": ignored, "input":
                    "...", "voice"?: name, "response_format"?: "wav"|"pcm",
                    "seed"?} -> audio/wav or raw 24 kHz s16le PCM. Bare text
                    gets the "Speaker 1:" script prefix; `voice` maps through
                    the same --voices_dir VoiceMapper as speaker_names.
                    Errors come back OpenAI-shaped: {"error": {...}}.
  GET  /health      -> {"status": "ok", "active": N}
  GET  /stats       -> EngineStats JSON (outcomes, TTFA p50/p95, audio-sec)

Usage:
  python demo/serve.py --model_path <ckpt> --port 8400 --max_batch 8

Without --model_path a tiny random-weight model is served (smoke mode).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import struct
import sys
import threading
import uuid

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE_RATE = 24_000


def wav_header(sample_rate: int, num_samples: int) -> bytes:
    """Standard 16-bit mono PCM WAV header."""
    data_size = num_samples * 2
    return b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVEfmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    ) + b"data" + struct.pack("<I", data_size)


def _build_rt(args):
    """The 0.5B streaming model behind POST /tts/rt, via the StreamingTTS
    facade (batch-1, serialized inside StreamingTTS; the multi-speaker
    engine keeps batching /tts concurrently). A real checkpoint REQUIRES
    --streaming_voice (StreamingTTS raises otherwise) — serving a random
    synthetic voice must stay a smoke-mode-only behavior."""
    from vibevoice_tpu.tts import StreamingTTS

    if args.streaming_model_path == "smoke":
        rt = StreamingTTS.smoke(max_len=args.streaming_max_len)
        if getattr(args, "streaming_voice", None):
            raise SystemExit("--streaming_voice is ignored with the smoke model")
        return rt
    return StreamingTTS.from_pretrained(
        args.streaming_model_path,
        voice=getattr(args, "streaming_voice", None),
        max_len=args.streaming_max_len,
    )


def build_server(args):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import jax

    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import vibevoice as vv
    from vibevoice_tpu.serving import Request, ServingEngine
    from vibevoice_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    if args.model_path:
        from vibevoice_tpu.utils.hf_interop import load_pretrained

        cfg, params, processor = load_pretrained(args.model_path)
        tk = processor.tokenizer
        tokens = inf.SpecialTokens(
            speech_start=tk.speech_start_id,
            speech_end=tk.speech_end_id,
            speech_diffusion=tk.speech_diffusion_id,
            eos=tk.eos_token_id,
        )
        if args.int8:
            params = vv.quantize_for_inference(params)
    else:
        from vibevoice_tpu.configs import tiny_config
        from vibevoice_tpu.processor.processor import VibeVoiceProcessor
        from vibevoice_tpu.processor.text_tokenizer import FallbackTextTokenizer

        cfg = tiny_config()
        params = vv.init(jax.random.PRNGKey(0), cfg)
        processor = VibeVoiceProcessor(
            tokenizer=FallbackTextTokenizer(),
            speech_tok_compress_ratio=cfg.acoustic_tokenizer_config.hop_length,
        )
        tokens = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)

    mesh = None
    if getattr(args, "tp", 1) > 1:
        from vibevoice_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=1, tp=args.tp)

    vb = int(getattr(args, "speech_bucket_s", 0.0) * SAMPLE_RATE)
    engine = ServingEngine(
        cfg,
        params,
        tokens=tokens,
        opts=inf.GenerateOptions(
            cfg_scale=args.cfg_scale, ddpm_steps=args.ddpm_steps,
            max_length=args.max_len, kv_int8=getattr(args, "kv_int8", None),
        ),
        max_batch=args.max_batch,
        max_len=args.max_len,
        frames_per_dispatch=getattr(args, "frames_per_dispatch", 1),
        pipeline=not getattr(args, "no_pipeline", False),
        mesh=mesh,
        speech_bucket=vb,
        reserved_slots=getattr(args, "reserved_slots", 0),
    )
    if getattr(args, "warmup", False):
        # prime the prompt-bucket prefill, the voice-clone prefill variant at
        # one speech bucket, the slot splice, and the fused decode step, so
        # the first real request streams at steady-state latency
        spent = engine.warmup(prompt_tokens=getattr(args, "warmup_tokens", 256))
        if vb:
            spent += engine.warmup(
                prompt_tokens=getattr(args, "warmup_tokens", 256), voice_samples=vb
            )
        print(f"[serve] warmup compiled the serving path in {spent:.1f}s")
    voices_dir = args.voices_dir
    rt = _build_rt(args) if getattr(args, "streaming_model_path", None) else None
    rt_engine = None
    live_rt = {}  # sid -> live StreamSessionHandle (X-Session-Id)
    if rt is not None and getattr(args, "rt_sessions", 1) > 1:
        # multi-session mode: N concurrent /tts/rt requests share ONE batched
        # device program (the reference caps streaming at batch 1 — this is
        # the beyond-reference capability, serving/streaming_sessions.py)
        from vibevoice_tpu.serving.streaming_sessions import StreamingSessionEngine

        rt_engine = StreamingSessionEngine(
            rt.cfg,
            rt.params,
            n_slots=args.rt_sessions,
            max_len=args.streaming_max_len,
            opts=inf.GenerateOptions(
                cfg_scale=1.5, ddpm_steps=args.streaming_ddpm_steps, kv_int8=False
            ),
            default_preset=rt.preset,
            processor=rt.processor,
            quantum=getattr(args, "rt_quantum", 3),
            reserved_slots=getattr(args, "rt_reserved_slots", 0),
        )
    if rt is not None and getattr(args, "warmup", False):
        if rt_engine is not None:
            h = rt_engine.submit_text("Warming up the session path.", max_new_frames=12)
            h.result(timeout=600.0)
            print("[serve] /tts/rt multi-session warmup done")
        else:
            print(f"[serve] /tts/rt warmup took {rt.warmup():.1f}s")

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked transfer needs 1.1

        def log_message(self, fmt, *a):
            if args.verbose:
                super().log_message(fmt, *a)

        def do_GET(self):
            if self.path == "/health":
                body = json.dumps(
                    {"status": "ok", "active": sum(h is not None for h in engine.slots)}
                ).encode()
            elif self.path == "/stats":
                import dataclasses

                payload = dataclasses.asdict(engine.stats())
                if rt_engine is not None:
                    payload["rt_sessions"] = rt_engine.stats()
                body = json.dumps(payload).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json_error(self, status: int, message: str):
            """OpenAI-shaped error body ({"error": {...}}) for /v1 routes."""
            body = json.dumps(
                {"error": {"message": message, "type": "invalid_request_error"}}
            ).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path in ("/tts/rt/append", "/tts/rt/end"):
                self._rt_live_control()
                return
            if self.path not in ("/tts", "/tts/stream", "/tts/rt", "/v1/audio/speech"):
                self.send_error(404)
                return
            openai_compat = self.path == "/v1/audio/speech"
            response_format = "wav"
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                if openai_compat:
                    # OpenAI audio/speech surface: {model, input, voice,
                    # response_format}. `model` is accepted and ignored (this
                    # server hosts one model); bare text gets the script
                    # prefix the processor expects; `voice` maps through the
                    # same VoiceMapper as speaker_names.
                    text = str(req["input"])
                    if not re.search(r"(?m)^\s*(Speaker\s+\d+|\[\d+\])\s*:", text):
                        text = f"Speaker 1: {text}"
                    response_format = str(req.get("response_format", "wav")).lower()
                    if response_format not in ("wav", "pcm"):
                        self._json_error(
                            400,
                            f"response_format {response_format!r} not supported "
                            "(this server emits 'wav' or raw 24 kHz s16le 'pcm')",
                        )
                        return
                    voice = req.get("voice")
                    if voice:
                        req["speaker_names"] = [str(voice)]
                else:
                    text = req["text"]
                seed = int(req.get("seed", 0))
                # presence check, not truthiness: deadline_s=0 means
                # "expired at submit", a legitimate (if unusual) request
                deadline_s = float(req["deadline_s"]) if "deadline_s" in req else None
                # latency lane (needs --reserved_slots > 0 to guarantee a slot)
                priority = bool(req.get("priority", False))
                # live session: text stream stays open (append via
                # /tts/rt/append on a second connection); needs --rt_sessions
                live = bool(req.get("live", False))
            except Exception as e:
                if openai_compat:
                    self._json_error(400, f"bad request: {e}")
                else:
                    self.send_error(400, f"bad request: {e}")
                return

            if self.path == "/tts/rt":
                if rt is None:
                    self.send_error(404, "server started without --streaming_model_path")
                    return
                if live and rt_engine is None:
                    self.send_error(400, "live sessions need --rt_sessions > 1")
                    return
                self._rt_response(text, seed, priority=priority, live=live)
                return

            try:
                voice_samples = None
                names = req.get("speaker_names")
                if names:
                    from demo.inference_from_file import VoiceMapper

                    mapper = VoiceMapper(voices_dir)
                    voice_samples = [[mapper.get_voice_path(nm) for nm in names]]
                proc_out = processor(text=text, voice_samples=voice_samples)
            except Exception as e:
                if openai_compat:
                    self._json_error(400, f"processing failed: {e}")
                else:
                    self.send_error(400, f"processing failed: {e}")
                return

            handle = engine.submit(
                Request(
                    input_ids=proc_out.input_ids,
                    valid_mask=proc_out.attention_mask,
                    speech_tensors=proc_out.speech_tensors,
                    speech_frame_valid=proc_out.speech_masks,
                    speech_input_mask=proc_out.speech_input_mask,
                    seed=seed,
                    deadline_s=deadline_s,
                    priority=priority,
                )
            )
            if self.path == "/tts/stream":
                self._stream_response(handle)
                return

            try:
                audio = handle.result(timeout=args.request_timeout)
            except Exception as e:
                if openai_compat:
                    self._json_error(500, f"generation failed: {e}")
                else:
                    self.send_error(500, f"generation failed: {e}")
                return

            pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
            if openai_compat and response_format == "pcm":
                # OpenAI 'pcm': raw s16le samples, no container (24 kHz here)
                self.send_response(200)
                self.send_header("Content-Type", "audio/pcm")
                self.send_header("Content-Length", str(len(pcm)))
                self.end_headers()
                self.wfile.write(pcm)
                return
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(44 + len(pcm)))
            self.end_headers()
            self.wfile.write(wav_header(SAMPLE_RATE, len(pcm) // 2))
            self.wfile.write(pcm)

        def _rt_live_control(self):
            """POST /tts/rt/append {"session", "text"} and /tts/rt/end
            {"session"}: the side-channel of a live session (the audio rides
            the original /tts/rt chunked response; the X-Session-Id header
            there names the session). Text is tokenized verbatim — the
            client owns whitespace/segmentation of its LLM token stream."""
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                sid = str(req["session"])
            except Exception as e:
                self._json_error(400, f"bad request: {e}")
                return
            h = live_rt.get(sid)
            if h is None:
                self._json_error(404, f"unknown or ended live session {sid!r}")
                return
            try:
                if self.path == "/tts/rt/append":
                    ids = rt_engine.processor.tokenizer.encode(str(req["text"]))
                    h.append_text(np.asarray(ids, np.int64))
                    body = {"session": sid, "appended_tokens": len(ids)}
                else:
                    h.end_text()
                    body = {"session": sid, "ended": True}
            except Exception as e:  # append after end/done, tokenizer errors
                self._json_error(409, str(e))
                return
            payload = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _rt_response(self, text: str, seed: int, priority: bool = False,
                         live: bool = False):
            """Chunked-transfer WAV from the 0.5B streaming model, frames
            flushed as the window loop produces them — the lowest-TTFA
            serving surface. With --rt_sessions > 1, concurrent requests are
            batched into one device program (per-request seeds then feed the
            shared loop RNG, not a per-session stream); otherwise one request
            at a time (StreamingTTS serializes internally)."""
            sid = None
            if rt_engine is not None:
                handle = rt_engine.submit_text(text, priority=priority, live=live)
                it = handle.frames(timeout=args.request_timeout)
                close = handle.cancel
                if live:
                    sid = uuid.uuid4().hex
                    live_rt[sid] = handle
            else:
                it = rt.stream(text, seed=seed, ddpm_steps=args.streaming_ddpm_steps)
                close = it.close
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            if sid is not None:
                # the live session's address for /tts/rt/append + /tts/rt/end
                self.send_header("X-Session-Id", sid)
            self.end_headers()
            header = (
                b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, SAMPLE_RATE, SAMPLE_RATE * 2, 2, 16)
                + b"data" + struct.pack("<I", 0xFFFFFFFF)
            )
            try:
                self._write_chunk(header)
                self.wfile.flush()
                for frame in it:
                    pcm = (np.clip(frame, -1, 1) * 32767).astype("<i2").tobytes()
                    self._write_chunk(pcm)
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                return  # dead client: cancel/close stops the device work
            except Exception:
                import traceback

                traceback.print_exc()  # stream already committed; log + terminate
            finally:
                if sid is not None:
                    live_rt.pop(sid, None)  # appends after this 404
                close()  # cancel() for the session engine, it.close() for bs1
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()

        def _write_chunk(self, data: bytes):
            self.wfile.write(f"{len(data):X}\r\n".encode())
            self.wfile.write(data)
            self.wfile.write(b"\r\n")

        def _stream_response(self, handle):
            """Chunked-transfer WAV: header immediately, PCM per frame batch.
            The header's RIFF/data sizes are the 0xFFFFFFFF 'unknown length'
            convention players accept for live streams."""
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            header = (
                b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, SAMPLE_RATE, SAMPLE_RATE * 2, 2, 16)
                + b"data" + struct.pack("<I", 0xFFFFFFFF)
            )
            try:
                self._write_chunk(header)
                self.wfile.flush()
                for frame in handle.stream():
                    pcm = (np.clip(frame, -1, 1) * 32767).astype("<i2").tobytes()
                    self._write_chunk(pcm)
                    self.wfile.flush()
                if handle.error is not None:
                    raise handle.error
            except (BrokenPipeError, ConnectionResetError):
                handle.cancel()  # stop the device work for a dead client
                return
            except Exception:
                pass  # stream already started; terminate it cleanly below
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    server.engine = engine  # for tests / shutdown
    server.rt_engine = rt_engine
    return server


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8400)
    ap.add_argument("--max_batch", type=int, default=8)  # measured aggregate knee (README serving table)
    ap.add_argument("--reserved_slots", type=int, default=0,
                    help="express slots only priority=true requests may occupy")
    ap.add_argument("--max_len", type=int, default=4096)
    ap.add_argument("--cfg_scale", type=float, default=1.3)
    ap.add_argument("--ddpm_steps", type=int, default=10)
    ap.add_argument("--int8", action="store_true", help="weight-only int8 serving")
    ap.add_argument("--frames_per_dispatch", type=int, default=1,
                    help="decode frames per device dispatch (8 amortizes the "
                    "~10 ms host round-trip; audio arrives in K-frame chunks)")
    ap.add_argument("--no_pipeline", action="store_true",
                    help="deliver each dispatch's audio before issuing the "
                    "next (lowest latency; pipelining is +~50%% throughput)")
    ap.add_argument("--kv_int8", action=argparse.BooleanOptionalAction, default=None,
                    help="int8 KV cache (halves cache HBM). Default: automatic — "
                    "on at --max_len >= 16K, off below")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways (needs that many chips; the "
                    "7B bf16 @ 32K config needs tp>=2 on 16 GB parts)")
    ap.add_argument("--voices_dir", type=str, default=os.path.join(os.path.dirname(__file__), "voices"))
    ap.add_argument("--streaming_model_path", type=str, default=None,
                    help="also serve the 0.5B streaming model on POST /tts/rt "
                    "(chunked WAV, one request at a time; 'smoke' = tiny "
                    "random-weight model)")
    ap.add_argument("--streaming_voice", type=str, default=None,
                    help="voice preset for /tts/rt (.npz native or .pt reference)")
    ap.add_argument("--streaming_max_len", type=int, default=8192)
    ap.add_argument("--streaming_ddpm_steps", type=int, default=5)
    ap.add_argument("--rt_sessions", type=int, default=1,
                    help="concurrent /tts/rt sessions batched into ONE device "
                    "program (>1 enables the multi-session engine; the "
                    "reference streaming model is capped at batch 1)")
    ap.add_argument("--rt_quantum", type=int, default=3,
                    help="session admission quantum in frames (divisor of 6; "
                    "3 = low join-TTFA default, 6 = max-throughput windows)")
    ap.add_argument("--rt_reserved_slots", type=int, default=0,
                    help="express session slots only priority=true requests "
                    "may occupy (sessions are long-lived: without a reserve, "
                    "a full house makes new listeners wait for a hang-up)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile prefill/splice/decode at startup so the "
                         "first request never pays the first-shape compile")
    ap.add_argument("--warmup_tokens", type=int, default=256,
                    help="prompt bucket to prime with --warmup")
    ap.add_argument("--speech_bucket_s", type=float, default=5.0,
                    help="pad voice-clone audio to a multiple of this many "
                         "seconds so prefill compiles once per bucket, not "
                         "once per voice length (0 disables; exact — causal "
                         "encoder + masked splice)")
    ap.add_argument("--request_timeout", type=float, default=600.0)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    server = build_server(args)
    print(f"Serving on http://{args.host}:{args.port} (POST /tts, GET /health)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.engine.shutdown()


if __name__ == "__main__":
    main()
