"""A non-default AudioConfig must flow through EVERY product surface.

The reference hardcodes 24 kHz / hop 256 across four files
(reference: generate.py:21-24, trainer.py:45-49); here the CLI, the server,
and the trainer's sample generation all derive seconds<->frames<->samples
arithmetic from the loaded model's AudioConfig, so a snapshot trained at a
different rate round-trips end to end.
"""

import json
import urllib.request
import wave as wave_mod

import jax
import numpy as np
import pytest

from f5_tts_tpu.audio.io import read_wav, write_wav
from f5_tts_tpu.config import AudioConfig, CFMConfig, DiTConfig, VocosConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos

SR = 16_000
HOP = 256
FPS = SR / HOP  # 62.5 — far from the default 93.75, so any fallback to the
# hardcoded constants produces visibly wrong frame counts

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=256, text_dim=32, conv_layers=1, use_flash_attention=False,
)


@pytest.fixture(scope="module")
def model():
    vocoder = Vocos.init(
        jax.random.key(1), VocosConfig(dim=64, intermediate_dim=128, num_layers=2)
    )
    return F5TTS.init(
        jax.random.key(0),
        TINY,
        cfm_cfg=CFMConfig(duration_bucket=64),
        audio_cfg=AudioConfig(sample_rate=SR, hop_length=HOP),
        vocoder=vocoder.decode,
    )


@pytest.fixture()
def ref_wav(tmp_path):
    wave = (0.2 * np.sin(2 * np.pi * 220 * np.arange(SR) / SR)).astype(np.float32)
    path = tmp_path / "ref16k.wav"
    write_wav(path, wave, SR)
    return str(path)


def test_cli_generate_uses_model_audio_config(model, ref_wav, tmp_path):
    from f5_tts_tpu.generate import generate

    out_path = tmp_path / "out.wav"
    wave = generate(
        "a short test sentence",
        duration=2.0,
        model=model,
        ref_audio_path=ref_wav,
        ref_audio_text="reference words",
        steps=2,
        method="euler",
        seed=0,
        output_path=str(out_path),
        play=False,
    )
    # duration math at the MODEL's frame rate: 2.0 s -> 125 frames, minus the
    # 1 s reference -> (125 - 1) * 256 - 16000 generated samples
    dur_frames = int(2.0 * FPS)
    assert wave.shape[0] == (dur_frames - 1) * HOP - SR
    audio, sr = read_wav(out_path)
    assert sr == SR
    assert audio.shape[0] == wave.shape[0]


def test_cli_rejects_mismatched_ref_rate(model, tmp_path):
    from f5_tts_tpu.generate import generate

    wav24 = tmp_path / "ref24k.wav"
    write_wav(wav24, np.zeros(24_000, dtype=np.float32), 24_000)
    with pytest.raises(ValueError, match="16000"):
        generate(
            "text", duration=2.0, model=model, ref_audio_path=str(wav24),
            ref_audio_text="x", steps=2, play=False,
        )


def test_serve_uses_model_audio_config(model, ref_wav):
    from f5_tts_tpu.serve import serve

    httpd = serve(model, host="127.0.0.1", port=0, max_batch=2, max_wait_ms=40.0)
    try:
        port = httpd.server_address[1]
        import base64

        ref_b64 = base64.b64encode(open(ref_wav, "rb").read()).decode()
        payload = {
            "text": "served sentence", "ref_text": "reference words",
            "ref_audio_b64": ref_b64, "duration": 2.0, "steps": 2,
            "method": "euler", "seed": 0,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            body = r.read()
        import io

        with wave_mod.open(io.BytesIO(body)) as w:
            assert w.getframerate() == SR
            n = w.getnframes()
        # generated region: duration at the model's fps minus the ref window
        dur_frames = int(2.0 * FPS)
        ref_frames = SR // HOP
        assert n == (dur_frames - 1) * HOP - ref_frames * HOP

        # the 24 kHz bundled default ref must be refused, not silently used
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({"text": "x", "duration": 2.0}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=60)
        assert e.value.code == 400
    finally:
        httpd.batcher.stop()
        httpd.shutdown()


import urllib.error  # noqa: E402  (used in the serve test above)


def test_trainer_sample_generation_uses_model_audio_config(model, ref_wav, tmp_path):
    from f5_tts_tpu.training.trainer import F5TTSTrainer

    trainer = F5TTSTrainer(model, results_dir=str(tmp_path / "results"))
    trainer.generate_sample(
        sample_audio=ref_wav,
        sample_ref_text="reference words",
        sample_generation_text="generated words",
        sample_generation_duration=1.0,
        step=1,
        samples_dir=str(tmp_path / "samples"),
    )
    audio, sr = read_wav(tmp_path / "samples" / "audio" / "step_1.wav")
    assert sr == SR
    # ref 1.0 s + gen 1.0 s at 62.5 fps -> 125 frames total; the written
    # sample excludes the reference's 16000 samples
    assert audio.shape[0] == (int(2.0 * FPS) - 1) * HOP - SR
