"""Trainer sample-generation + trajectory GIF visualization (reference:
trainer.py:81-161) and AudioPlayer buffer mechanics with a stubbed device."""

import sys
import types

import jax
import numpy as np

from f5_tts_tpu.audio.io import write_wav
from f5_tts_tpu.config import CFMConfig, DiTConfig, VocosConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos
from f5_tts_tpu.training import F5TTSTrainer


def test_generate_sample_writes_wav_and_gif(tmp_path, monkeypatch):
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=256, text_dim=32, conv_layers=1, use_flash_attention=False,
    )
    vocoder = Vocos.init(jax.random.key(1), VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    model = F5TTS.init(jax.random.key(0), cfg, cfm_cfg=CFMConfig(duration_bucket=64),
                       vocoder=vocoder.decode)
    trainer = F5TTSTrainer(model, results_dir=tmp_path)

    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(12_000) / 24_000)).astype(np.float32)
    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, 24_000)

    monkeypatch.chdir(tmp_path)
    trainer.generate_sample(
        str(ref_path), "a tone", "hello world", 1.0, step=42, samples_dir=str(tmp_path / "samples")
    )
    assert (tmp_path / "samples/audio/step_42.wav").exists()
    assert (tmp_path / "samples/viz/step_42.gif").exists()
    # the gif has one frame per ODE step (default 8)
    from PIL import Image

    with Image.open(tmp_path / "samples/viz/step_42.gif") as im:
        assert im.n_frames == 8


def test_audio_player_with_stub_sounddevice(monkeypatch):
    """Exercise the ring-buffer player against a fake sounddevice module."""
    events = []

    class FakeStream:
        def __init__(self, samplerate, channels, callback, blocksize):
            self.callback = callback
            self.blocksize = blocksize

        def start(self):
            events.append("start")

        def stop(self):
            events.append("stop")

        def close(self):
            events.append("close")

    fake_sd = types.SimpleNamespace(OutputStream=FakeStream, sleep=lambda ms: None)
    monkeypatch.setitem(sys.modules, "sounddevice", fake_sd)

    from f5_tts_tpu.generate import AudioPlayer

    player = AudioPlayer(sample_rate=24_000, buffer_size=4)
    player.queue_audio(np.arange(6, dtype=np.float32))
    assert events == ["start"]

    out = np.zeros((4, 1), dtype=np.float32)
    player._callback(out, 4, None, None)
    np.testing.assert_array_equal(out[:, 0], [0, 1, 2, 3])
    player._callback(out, 4, None, None)
    np.testing.assert_array_equal(out[:, 0], [4, 5, 0, 0])
    assert player.drain_event.is_set()  # buffer drained

    player.stop()
    assert events == ["start", "stop", "close"]
