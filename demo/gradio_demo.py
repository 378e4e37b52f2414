"""Gradio web UI for VibeVoice-TPU (parity with reference demo/gradio_demo.py):
multi-speaker script entry with a speaker-count selector, voice presets plus
custom voice-sample upload for cloning, live streaming playback via a
background generation thread + AudioStreamer, a complete-audio download widget
that appears when generation finishes (reference :846-868), a generation log
panel (reference :873-879), stop button, cfg/steps/seed controls.

Requires `gradio` (not bundled in this image); fails with a clear message
otherwise. The model path may be an HF-style or native checkpoint; without
--model_path a tiny random-weight smoke model is served.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE_RATE = 24_000


def _write_complete_wav(audio: np.ndarray) -> str:
    """Write the full take to a temp WAV for the download widget
    (reference _write_complete_wav, gradio_demo.py:500)."""
    from vibevoice_tpu.processor.audio import write_wav

    fd, path = tempfile.mkstemp(suffix=".wav", prefix="vibevoice_")
    os.close(fd)
    write_wav(path, audio, SAMPLE_RATE)
    return path


class VibeVoiceDemo:
    """Generation backend shared by UI callbacks (reference gradio_demo.py:
    model load :100-150, threaded generation :352-453, stop :610-618)."""

    def __init__(
        self,
        model_path=None,
        ddpm_steps: int = 5,
        sde: bool = True,
        min_buffer_sec: float = 30.0,
        min_interval_sec: float = 15.0,
    ):
        # streaming-consumer buffering (reference gradio_demo.py:386-387:
        # min_chunk_size = 30 s of audio, min_yield_interval = 15 s)
        self.min_buffer_sec = min_buffer_sec
        self.min_interval_sec = min_interval_sec
        import jax

        from vibevoice_tpu.models import inference as inf
        from vibevoice_tpu.models import vibevoice as vv

        self.inf = inf
        self.stop_flags = {}

        if model_path:
            from vibevoice_tpu.utils.hf_interop import load_pretrained

            self.cfg, self.params, self.processor = load_pretrained(model_path)
            tk = self.processor.tokenizer
            self.tokens = inf.SpecialTokens(
                speech_start=tk.speech_start_id,
                speech_end=tk.speech_end_id,
                speech_diffusion=tk.speech_diffusion_id,
                eos=tk.eos_token_id,
            )
        else:
            from vibevoice_tpu.configs import tiny_config
            from vibevoice_tpu.processor.processor import VibeVoiceProcessor
            from vibevoice_tpu.processor.text_tokenizer import FallbackTextTokenizer

            self.cfg = tiny_config()
            self.params = vv.init(jax.random.PRNGKey(0), self.cfg)
            self.processor = VibeVoiceProcessor(
                tokenizer=FallbackTextTokenizer(),
                speech_tok_compress_ratio=self.cfg.acoustic_tokenizer_config.hop_length,
            )
            self.tokens = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)
        # the reference Gradio app runs the SDE-DPM-solver++ sampler
        # (reference gradio_demo.py:142-147)
        self.ddpm_steps = ddpm_steps
        self.sde = sde

    def generate_streaming(
        self,
        script: str,
        voice_paths,
        cfg_scale: float,
        steps: int,
        seed: int,
        session_id: str,
        use_voice_cloning: bool = True,
    ):
        """Generator yielding (streaming_chunk | None, complete_wav_path | None,
        log_text) — streaming chunks while generating, then the complete take
        (reference generate_podcast_streaming :352-530)."""
        from vibevoice_tpu.streamer import AudioStreamer

        self.stop_flags[session_id] = False
        if int(seed) < 0:  # -1 = fresh random seed per run (reference label)
            seed = int.from_bytes(os.urandom(4), "little")
        if not use_voice_cloning:
            voice_paths = None  # reference disable_voice_cloning checkbox
        proc_out = self.processor(
            text=script, voice_samples=[voice_paths] if voice_paths else None
        )
        opts = self.inf.GenerateOptions(
            cfg_scale=cfg_scale,
            ddpm_steps=int(steps),
            sde=self.sde,
            max_length=min(4096, self.cfg.decoder_config.max_position_embeddings),
        )
        n_lines = len(proc_out.parsed_scripts[0]) if proc_out.parsed_scripts else 0
        log = (
            f"seed={seed}  cfg={cfg_scale}  steps={int(steps)}  "
            f"voice_cloning={'on' if voice_paths else 'off'}  "
            f"script_lines={n_lines}\n"
        )
        streamer = AudioStreamer(batch_size=proc_out.input_ids.shape[0])
        result = {}
        t_start = time.time()

        def run():
            result["out"] = self.inf.generate(
                self.cfg,
                self.params,
                input_ids=proc_out.input_ids,
                valid_mask=proc_out.attention_mask,
                speech_tensors=proc_out.speech_tensors,
                speech_frame_valid=proc_out.speech_masks,
                speech_input_mask=proc_out.speech_input_mask,
                tokens=self.tokens,
                opts=opts,
                seed=int(seed),
                audio_streamer=streamer,
                stop_check_fn=lambda: self.stop_flags.get(session_id, False),
                step_fn=self.inf.make_step_fn(self.cfg, self.tokens, opts),  # memoized
            )

        thread = threading.Thread(target=run, daemon=True)
        thread.start()

        # buffered streaming consumer (reference gradio_demo.py:380-453):
        # first yield waits for min_buffer_sec of pending audio; afterwards
        # yield when >=min_buffer_sec is pending OR min_interval_sec elapsed
        pending = []
        all_chunks = []
        pending_sec = 0.0
        total_sec = 0.0
        yielded = False
        last_yield = time.time()
        for _, chunk in streamer:
            if self.stop_flags.get(session_id, False):
                streamer.end()
                break
            pending.append(chunk)
            all_chunks.append(chunk)
            pending_sec += len(chunk) / SAMPLE_RATE
            total_sec += len(chunk) / SAMPLE_RATE
            elapsed = time.time() - last_yield
            should = (not yielded and pending_sec >= self.min_buffer_sec) or (
                yielded
                and (pending_sec >= self.min_buffer_sec or elapsed >= self.min_interval_sec)
            )
            if should:
                audio = np.concatenate(pending)
                yield (
                    (SAMPLE_RATE, (np.clip(audio, -1, 1) * 32767).astype(np.int16)),
                    None,
                    log + f"streaming… {total_sec:.1f} s generated",
                )
                pending, pending_sec, last_yield, yielded = [], 0.0, time.time(), True
        if pending:
            audio = np.concatenate(pending)
            yield (
                (SAMPLE_RATE, (np.clip(audio, -1, 1) * 32767).astype(np.int16)),
                None,
                log + f"streaming… {total_sec:.1f} s generated",
            )
        # generation-thread timeout + force-end (reference :613-620)
        thread.join(timeout=10.0)
        if thread.is_alive():
            self.stop_flags[session_id] = True
            streamer.end()
            thread.join(timeout=10.0)
        # complete take for the download widget (reference :490-526)
        wall = time.time() - t_start
        stopped = self.stop_flags.get(session_id, False)
        if all_chunks:
            complete = np.concatenate(all_chunks)
            path = _write_complete_wav(complete)
            rtf = (len(complete) / SAMPLE_RATE) / max(wall, 1e-9)
            log += (
                f"{'stopped by user' if stopped else 'done'}: "
                f"{len(complete) / SAMPLE_RATE:.1f} s audio in {wall:.1f} s "
                f"({rtf:.2f}x real-time)"
            )
            yield None, path, log
        else:
            yield None, None, log + ("stopped before any audio" if stopped else "no audio produced")

    def stop(self, session_id: str):
        self.stop_flags[session_id] = True


def load_example_scripts(examples_dir: str):
    """Example-script library; files whose names carry an 'NNmin' duration
    above 15 minutes are skipped (reference gradio_demo.py:620-648)."""
    import re

    scripts = []
    if os.path.isdir(examples_dir):
        for f in sorted(os.listdir(examples_dir)):
            if not f.lower().endswith(".txt"):
                continue
            m = re.search(r"(\d+)min", f.lower())
            if m and int(m.group(1)) > 15:
                continue
            with open(os.path.join(examples_dir, f), encoding="utf-8") as fh:
                text = "\n".join(l for l in fh.read().strip().splitlines() if l.strip())
            if text:
                scripts.append([text])
    return scripts


def build_ui(demo: VibeVoiceDemo, voices_dir: str):
    import gradio as gr

    voice_files = {}
    if os.path.isdir(voices_dir):
        for f in sorted(os.listdir(voices_dir)):
            if f.endswith(".wav"):
                voice_files[os.path.splitext(f)[0]] = os.path.join(voices_dir, f)

    with gr.Blocks(title="VibeVoice TPU") as ui:
        gr.Markdown("# VibeVoice TPU — multi-speaker long-form TTS")
        voices_state = gr.State(dict(voice_files))
        session = gr.State(lambda: os.urandom(8).hex())

        with gr.Row():
            with gr.Column(scale=1):
                gr.Markdown("### Podcast Settings")
                # speaker-count selector drives dropdown visibility
                # (reference gradio_demo.py:715-740, 881-892)
                num_speakers = gr.Slider(1, 4, value=2, step=1, label="Number of Speakers")
                names = list(voice_files)
                speakers = [
                    gr.Dropdown(
                        choices=names,
                        value=names[i] if i < len(names) else None,
                        label=f"Speaker {i + 1}",
                        visible=(i < 2),
                    )
                    for i in range(4)
                ]
                # custom voice-sample upload: cloned voices join the dropdowns
                uploads = gr.File(
                    label="Upload custom voices (.wav, 24 kHz preferred)",
                    file_count="multiple",
                    file_types=[".wav"],
                )
                with gr.Accordion("Generation Parameters", open=False):
                    cfg_scale = gr.Slider(1.0, 12.0, value=1.3, step=0.05, label="CFG scale")
                    steps = gr.Slider(1, 50, value=demo.ddpm_steps, step=1, label="Inference steps")
                    seed = gr.Number(value=42, precision=0, label="Seed (-1 = random)")
                    voice_cloning = gr.Checkbox(
                        value=True,
                        label="Voice cloning (condition on the speaker samples)",
                    )
            with gr.Column(scale=2):
                script = gr.Textbox(
                    label="Conversation Script",
                    lines=10,
                    placeholder="Speaker 1: Welcome to our podcast today!\nSpeaker 2: Thanks for having me…",
                )
                with gr.Row():
                    go = gr.Button("Generate", variant="primary")
                    stop = gr.Button("Stop")
                # streaming + complete outputs (reference :846-868)
                audio_out = gr.Audio(
                    label="Streaming Audio (real-time)", streaming=True, autoplay=True
                )
                complete_out = gr.Audio(
                    label="Complete Audio (download after generation)",
                    type="filepath",
                    streaming=False,
                    autoplay=False,
                    show_download_button=True,
                    visible=False,
                )
                log_box = gr.Textbox(label="Generation Log", lines=4, interactive=False)

        def on_num_speakers(n):
            return [gr.update(visible=(i < int(n))) for i in range(4)]

        num_speakers.change(on_num_speakers, [num_speakers], speakers)

        def on_upload(files, voices):
            voices = dict(voices or {})
            for f in files or []:
                path = getattr(f, "name", f)
                voices[os.path.splitext(os.path.basename(path))[0]] = path
            choices = list(voices)
            return [voices] + [gr.update(choices=choices) for _ in range(4)]

        uploads.change(on_upload, [uploads, voices_state], [voices_state, *speakers])

        def on_go(script_text, n, s1, s2, s3, s4, cfgv, stepsv, seedv, clone, voices, sess):
            chosen = [s1, s2, s3, s4][: int(n)]
            paths = [voices[v] for v in chosen if v and v in voices]
            for chunk, complete, log in demo.generate_streaming(
                script_text, paths or None, cfgv, stepsv, seedv, sess,
                use_voice_cloning=bool(clone),
            ):
                if complete is not None:
                    yield None, gr.update(value=complete, visible=True), log
                else:
                    yield chunk, gr.update(), log

        go.click(
            # new run hides the previous complete take (reference :951-958)
            lambda: (None, gr.update(value=None, visible=False), ""),
            None,
            [audio_out, complete_out, log_box],
        ).then(
            on_go,
            [script, num_speakers, *speakers, cfg_scale, steps, seed,
             voice_cloning, voices_state, session],
            [audio_out, complete_out, log_box],
        )
        stop.click(lambda sess: demo.stop(sess), [session], None)

        examples = load_example_scripts(os.path.join(os.path.dirname(__file__), "text_examples"))
        if examples:
            gr.Examples(examples=examples, inputs=[script])
    return ui


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--voices_dir", type=str, default=os.path.join(os.path.dirname(__file__), "voices"))
    ap.add_argument("--ddpm_steps", type=int, default=5)
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--share", action="store_true")
    ap.add_argument("--min_buffer_sec", type=float, default=30.0,
                    help="pending audio before a UI yield (reference: 30 s)")
    ap.add_argument("--min_interval_sec", type=float, default=15.0,
                    help="max seconds between UI yields (reference: 15 s)")
    args = ap.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        print(
            "gradio is not installed in this environment. Install it to run the "
            "web demo: pip install gradio\n"
            "The CLI demos (demo/inference_from_file.py, "
            "demo/streaming_inference_from_file.py) cover the same pipeline."
        )
        sys.exit(1)

    demo = VibeVoiceDemo(
        args.model_path,
        ddpm_steps=args.ddpm_steps,
        min_buffer_sec=args.min_buffer_sec,
        min_interval_sec=args.min_interval_sec,
    )
    ui = build_ui(demo, args.voices_dir)
    # queue size 20, one generation at a time (reference :1143-1146)
    ui.queue(max_size=20, default_concurrency_limit=1).launch(
        server_port=args.port, share=args.share
    )


if __name__ == "__main__":
    main()
