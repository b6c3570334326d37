"""LibriSpeech-PC cross-sentence eval harness (tools/eval_librispeech.py) +
the host resampler it depends on.

The reference ships the eval list but no code consumes it (SURVEY.md §4);
the harness implements the F5-TTS paper protocol. Here it runs end to end on
a synthetic snapshot + fixture prompts: one 24 kHz prompt in a flat layout,
one 16 kHz prompt in the nested LibriSpeech speaker/chapter layout (so the
resample path and both directory conventions are exercised)."""

import importlib.util
import json
import os

import jax
import numpy as np
import pytest

from f5_tts_tpu.audio.io import read_wav, write_wav
from f5_tts_tpu.audio.resample import _resample_fft, resample
from f5_tts_tpu.config import DiTConfig, VocosConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------- resampler


def _sine(freq, sr, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_resample_identity_is_noop():
    x = _sine(220, 24_000)
    assert resample(x, 24_000, 24_000) is x


def test_resample_preserves_tone():
    """A 440 Hz tone at 16 kHz must stay a 440 Hz tone at 24 kHz: correct
    output length and dominant FFT bin at the same physical frequency."""
    x = _sine(440, 16_000, seconds=1.0)
    y = resample(x, 16_000, 24_000)
    assert y.dtype == np.float32
    assert abs(y.shape[0] - 24_000) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(y.shape[0])))
    peak_hz = np.argmax(spec) * 24_000 / y.shape[0]
    assert abs(peak_hz - 440) < 5
    # band-limited content passes at unit gain (interior, away from edges)
    assert abs(np.std(y[2000:-2000]) - np.std(x[2000:-2000])) < 0.01


def test_resample_fft_fallback_matches_polyphase():
    """The numpy FFT fallback and scipy's polyphase agree on band-limited
    audio away from clip edges (different filters -> different edge ringing)."""
    pytest.importorskip("scipy")
    rng = np.random.default_rng(0)
    # band-limit white noise well below the 16 kHz Nyquist
    x = rng.standard_normal(16_000).astype(np.float32)
    spec = np.fft.rfft(x)
    spec[4000:] = 0
    x = np.fft.irfft(spec, n=x.shape[0]).astype(np.float32)
    a = resample(x, 16_000, 24_000)
    b = _resample_fft(x, 16_000, 24_000)
    assert a.shape == b.shape
    core = slice(1000, -1000)
    err = np.abs(a[core] - b[core]).max()
    assert err < 5e-3, f"fallback diverges from polyphase: {err}"


def test_resample_rejects_bad_input():
    with pytest.raises(ValueError):
        resample(np.zeros((4, 2), np.float32), 16_000, 24_000)
    with pytest.raises(ValueError):
        resample(np.zeros(4, np.float32), 0, 24_000)


# ------------------------------------------------------------- harness


@pytest.fixture(scope="module")
def eval_mod():
    import sys

    spec = importlib.util.spec_from_file_location(
        "eval_librispeech", os.path.join(REPO, "tools", "eval_librispeech.py")
    )
    mod = importlib.util.module_from_spec(spec)
    # dataclass field-annotation resolution looks the module up by name
    sys.modules["eval_librispeech"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_parse_lst_rejects_malformed(eval_mod, tmp_path):
    bad = tmp_path / "bad.lst"
    bad.write_text("only\tthree\tfields\n")
    with pytest.raises(ValueError):
        eval_mod.parse_lst(bad)


def test_eval_harness_end_to_end(eval_mod, tmp_path):
    vocab = {chr(i + 97): i for i in range(26)}
    vocab[" "] = 26
    vocab[""] = 27
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=len(vocab) - 1, text_dim=32, conv_layers=1,
        use_flash_attention=False,
    )
    vocoder = Vocos.init(
        jax.random.key(2), VocosConfig(dim=64, intermediate_dim=128, num_layers=2)
    )
    model = F5TTS.init(
        jax.random.key(0), cfg, vocab_char_map=vocab, vocoder=vocoder.decode
    )
    snap = tmp_path / "snapshot"
    model.save_pretrained(snap)

    sr = model.audio_cfg.sample_rate
    audio_dir = tmp_path / "audio"
    # flat layout, already at the model rate
    (audio_dir).mkdir()
    ref_a = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    write_wav(audio_dir / "100-101-0001.wav", ref_a, sr)
    # nested LibriSpeech layout at 16 kHz -> exercises find_audio + resample
    nested = audio_dir / "200" / "201"
    nested.mkdir(parents=True)
    ref_b = (0.2 * np.sin(2 * np.pi * 330 * np.arange(16_000) / 16_000)).astype(
        np.float32
    )
    write_wav(nested / "200-201-0002.wav", ref_b, 16_000)

    lst = tmp_path / "eval.lst"
    lst.write_text(
        "100-101-0001\t1.0\tfirst prompt text\t100-101-0009\t1.5\tthe first target sentence\n"
        "200-201-0002\t1.0\tsecond prompt text\t200-201-0010\t1.2\tanother target to speak\n"
    )

    out = tmp_path / "eval_out"
    eval_mod.main([
        "--lst", str(lst), "--audio-dir", str(audio_dir), "--out", str(out),
        "--model", str(snap), "--batch", "2", "--steps", "2",
        "--method", "euler", "--seed", "0",
    ])

    summary = json.loads((out / "summary.json").read_text())
    assert summary["rows"] == 2 and summary["generated"] == 2
    manifest = (out / "manifest.tsv").read_text().splitlines()
    assert len(manifest) == 2
    for line, (tgt_id, tgt_dur) in zip(
        manifest, [("100-101-0009", 1.5), ("200-201-0010", 1.2)]
    ):
        cols = line.split("\t")
        assert cols[0] == tgt_id
        wave, got_sr = read_wav(cols[1])
        assert got_sr == sr
        # continuation length ~= target seconds (bucketing/trim slack: a few frames)
        want = tgt_dur * sr
        assert abs(wave.shape[0] - want) < sr * 0.2, (
            f"{tgt_id}: got {wave.shape[0] / sr:.2f}s, want ~{tgt_dur}s"
        )
        assert np.isfinite(wave).all()
