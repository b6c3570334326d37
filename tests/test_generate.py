"""Generation API tests: sentence splitting, duration heuristic, WAV I/O, and
the end-to-end generate() path with a tiny injected model (no network)."""

import numpy as np
import pytest

import jax

from f5_tts_tpu.audio.io import read_wav, write_wav
from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.generate import estimated_duration, generate, split_sentences
from f5_tts_tpu.models.cfm import F5TTS


def test_split_sentences():
    out = split_sentences("Hello there. How are you? Fine; thanks: bye!")
    assert out == ["Hello there.", "How are you?", "Fine;", "thanks:", "bye!"]
    # divergence from the reference splitter: an unpunctuated trailing
    # fragment is KEPT — dropping it silently truncated the last clause from
    # streamed/batched audio (the reference's single-sentence fallback only
    # masks the 0-delimiter case)
    assert split_sentences("no punctuation") == ["no punctuation"]
    assert split_sentences("First. Second. and then some") == [
        "First.", "Second.", "and then some"]
    assert split_sentences("") == []
    assert split_sentences("   ") == []


def test_estimated_duration():
    ref = np.zeros(24_000, dtype=np.float32)  # 1s -> 93 frames
    d = estimated_duration(ref, "hello there friend", "hello there friend")
    # same text -> roughly double the reference duration
    assert 1.5 < d < 2.5
    # longer gen text -> longer estimate
    d2 = estimated_duration(ref, "hi", "a much longer generation text here")
    assert d2 > d


def test_wav_roundtrip(tmp_path):
    sr = 24_000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_read_bundled_fixture():
    from importlib import resources

    with resources.as_file(
        resources.files("f5_tts_tpu").joinpath("assets/test_en_1_ref_short.wav")
    ) as p:
        audio, sr = read_wav(p)
    assert sr == 24_000
    assert audio.ndim == 1 and audio.shape[0] > 24_000


def _tiny_model():
    from f5_tts_tpu.config import VocosConfig
    from f5_tts_tpu.models.vocos import Vocos

    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=256, text_dim=32, conv_layers=1, use_flash_attention=False,
    )
    vocoder = Vocos.init(jax.random.key(1), VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    return F5TTS.init(
        jax.random.key(0), cfg, cfm_cfg=CFMConfig(duration_bucket=64),
        vocab_char_map=None, vocoder=vocoder.decode,
    )


def test_generate_single_sentence(tmp_path):
    model = _tiny_model()
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(12_000) / 24_000)).astype(np.float32)
    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, 24_000)

    out_path = tmp_path / "out.wav"
    wave = generate(
        "Hello world",
        duration=2.0,
        ref_audio_path=str(ref_path),
        ref_audio_text="a tone",
        steps=2,
        method="euler",
        seed=0,
        output_path=str(out_path),
        model=model,
        play=False,
    )
    assert out_path.exists()
    # 2.0s total minus the 0.5s reference
    assert wave.shape[0] == pytest.approx(1.5 * 24_000, rel=0.1)
    y, sr = read_wav(out_path)
    assert sr == 24_000 and y.shape[0] == wave.shape[0]


def test_generate_multi_sentence_batched(tmp_path):
    model = _tiny_model()
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(12_000) / 24_000)).astype(np.float32)
    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, 24_000)

    wave = generate(
        "First sentence. Second one! Third?",
        estimate_duration=True,
        ref_audio_path=str(ref_path),
        ref_audio_text="a tone",
        steps=2,
        method="euler",
        seed=0,
        output_path=str(tmp_path / "multi.wav"),
        model=model,
        play=False,
    )
    assert wave.ndim == 1 and wave.shape[0] > 24_000  # several seconds of audio


def test_generate_rejects_wrong_sample_rate(tmp_path):
    model = _tiny_model()
    ref_path = tmp_path / "ref16k.wav"
    write_wav(ref_path, np.zeros(16_000, dtype=np.float32), 16_000)
    with pytest.raises(ValueError, match="24000 Hz"):
        generate("hi", duration=1.0, ref_audio_path=str(ref_path), ref_audio_text="x",
                 model=model, play=False)


def test_generate_resample_ref_accepts_16k(tmp_path):
    """--resample-ref opts into host resampling of off-rate prompts instead
    of the parity-default rejection (audio/resample.py)."""
    model = _tiny_model()
    ref_path = tmp_path / "ref16k.wav"
    tone = (0.2 * np.sin(2 * np.pi * 220 * np.arange(16_000) / 16_000)).astype(np.float32)
    write_wav(ref_path, tone, 16_000)
    out = tmp_path / "out.wav"
    wave = generate("hi", duration=2.0, ref_audio_path=str(ref_path),
                    ref_audio_text="a tone", model=model, play=False,
                    steps=2, method="euler", seed=0, output_path=str(out),
                    resample_ref=True)
    # 2 s total minus the 1 s (resampled) reference ~= 1 s of continuation
    assert abs(wave.shape[0] - 24_000) < 24_000 * 0.15
    got, sr = read_wav(out)
    assert sr == 24_000 and got.shape == wave.shape


def test_cli_parser_flags():
    from f5_tts_tpu.generate import build_parser

    args = build_parser().parse_args(
        ["--text", "hi", "--steps", "4", "--method", "euler", "--cfg", "1.5",
         "--sway-coef", "-0.8", "--speed", "1.2", "--seed", "3", "--q", "8",
         "--resample-ref"]
    )
    assert args.text == "hi" and args.steps == 4 and args.q == 8
    assert args.method == "euler" and args.cfg == 1.5
    assert args.resample_ref is True


def test_generate_does_not_mutate_caller_model(tmp_path):
    """generate(model=m, int8_compute=True) must not flip the caller's model
    into int8 mode for later direct m.sample() calls (it works on a shallow
    copy instead)."""
    model = _tiny_model()
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(12_000) / 24_000)).astype(np.float32)
    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, 24_000)

    assert not model.dit_cfg.int8_compute
    wave = generate(
        "Hello world",
        duration=1.5,
        ref_audio_path=str(ref_path),
        ref_audio_text="a tone",
        steps=2,
        method="euler",
        seed=0,
        output_path=str(tmp_path / "o.wav"),
        model=model,
        play=False,
        int8_compute=True,
    )
    assert wave.ndim == 1
    assert not model.dit_cfg.int8_compute  # caller's object untouched


def test_generate_mesh_matches_unsharded(tmp_path):
    """generate(mesh=...) (the CLI's --mesh-data path) must produce the same
    waveform as the unsharded run, and must not leave the caller's model
    sharded (shallow-copy semantics, like int8_compute)."""
    from f5_tts_tpu.parallel.mesh import create_mesh

    model = _tiny_model()
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(12_000) / 24_000)).astype(np.float32)
    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, 24_000)

    kwargs = dict(
        duration=1.5, ref_audio_path=str(ref_path), ref_audio_text="a tone",
        steps=2, method="euler", seed=0, model=model, play=False,
    )
    base = generate("Hello world", **kwargs)
    sharded = generate("Hello world", mesh=create_mesh(data=2), **kwargs)
    np.testing.assert_allclose(sharded, base, atol=1e-5)
    # caller's params untouched (still unsharded single-device leaves)
    again = generate("Hello world", **kwargs)
    np.testing.assert_allclose(again, base, atol=0)


def test_generate_rejects_q_with_w8a8():
    with pytest.raises(ValueError, match="cannot be combined"):
        generate("hi", duration=1.0, quantization_bits=8, int8_compute=True)


def test_w8a8_blocks_refuses_weight_quantized_tree():
    """Silently skipping {q, scales, biases} leaves would run the dequant
    path while the config claims int8 compute."""
    from f5_tts_tpu.models.quant import quantize_tree, w8a8_blocks

    model = _tiny_model()
    quantized = quantize_tree(model.params, bits=8)
    with pytest.raises(ValueError, match="int8_compute"):
        w8a8_blocks(quantized)
