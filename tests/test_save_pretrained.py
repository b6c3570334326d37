"""save_pretrained -> from_pretrained round trip (train -> publish -> load)."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import DiTConfig, DurationConfig, F5TTS_V1_BASE
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.convert import convert_dit_state
from f5_tts_tpu.models.duration import DurationPredictor
from f5_tts_tpu.models.quant import convert_quantized_dit_state
from safetensors.numpy import load_file


def _base_like_tiny():
    # from_pretrained always builds the base architecture, so the round-trip
    # test uses base dims with a tiny depth to stay fast
    return F5TTS_V1_BASE.replace(depth=1)


def test_save_load_roundtrip(tmp_path):
    vocab = {chr(i + 97): i for i in range(26)}
    vocab[""] = 26  # trailing empty entry like vocab files have
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=len(vocab) - 1, text_dim=32, conv_layers=1,
        use_flash_attention=False,
    )
    dur = DurationPredictor.init(
        jax.random.key(1),
        DurationConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                       text_dim=16, conv_layers=1, text_num_embeds=len(vocab) - 1),
        vocab_char_map=vocab,
    )
    model = F5TTS.init(jax.random.key(0), cfg, vocab_char_map=vocab, duration_predictor=dur)
    model.save_pretrained(tmp_path)

    assert (tmp_path / "model_v1.safetensors").exists()
    assert (tmp_path / "vocab.txt").exists()
    assert (tmp_path / "duration_v2.safetensors").exists()

    # vocab round trip preserves indices
    from f5_tts_tpu.utils.tokenizer import load_vocab

    assert load_vocab(tmp_path / "vocab.txt") == vocab

    # weights round trip bit-exactly through the published naming
    state = load_file(tmp_path / "model_v1.safetensors")
    assert all(k.startswith("ema_model.transformer.") for k in state)
    back = convert_dit_state(state, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(model.params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_quantized_roundtrip(tmp_path):
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=64, text_dim=64, conv_layers=1, use_flash_attention=False,
    )
    model = F5TTS.init(jax.random.key(0), cfg)
    model.save_pretrained(tmp_path, quantization_bits=8)
    assert (tmp_path / "model_v1_8b.safetensors").exists()

    state = load_file(tmp_path / "model_v1_8b.safetensors")
    assert any(k.endswith(".scales") for k in state)
    qparams = convert_quantized_dit_state(state, cfg, bits=8)
    # quantized leaves present, codes/scales round-trip bit-exactly
    assert "q" in qparams["blocks"]["attn"]["to_q"]
    from f5_tts_tpu.models.quant import quantize_kernel

    ref_q = quantize_kernel(np.asarray(model.params["proj_out"]["kernel"]), 8)
    np.testing.assert_array_equal(np.asarray(qparams["proj_out"]["q"]), np.asarray(ref_q["q"]))
    np.testing.assert_allclose(np.asarray(qparams["proj_out"]["scales"]),
                               np.asarray(ref_q["scales"]), rtol=1e-6)
    from f5_tts_tpu.models.dit import dit_forward

    x = jax.random.normal(jax.random.key(2), (1, 16, 100))
    out = dit_forward(qparams, cfg, x, jnp.zeros_like(x), jnp.array([[1, 2]]), jnp.array([0.5]))
    assert np.isfinite(np.asarray(out)).all()


def test_cli_cfg_interval_flag():
    from f5_tts_tpu.generate import build_parser

    args = build_parser().parse_args(["--text", "x", "--cfg-interval", "0,0.7"])
    assert args.cfg_interval == "0,0.7"


def test_full_offline_roundtrip_and_cli(tmp_path):
    """save_pretrained writes config.json + vocos/; from_pretrained rebuilds
    the EXACT model (any size, fully offline) and the CLI synthesizes from
    the snapshot directory — the publish -> load -> generate loop the
    reference only covers for the hardcoded base config."""
    from f5_tts_tpu.audio.io import read_wav, write_wav
    from f5_tts_tpu.config import VocosConfig
    from f5_tts_tpu.models.vocos import Vocos

    vocab = {chr(i + 97): i for i in range(26)}
    vocab[" "] = 26
    vocab[""] = 27
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=len(vocab) - 1, text_dim=32, conv_layers=1,
        use_flash_attention=False,
    )
    vocoder = Vocos.init(jax.random.key(2), VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    model = F5TTS.init(jax.random.key(0), cfg, vocab_char_map=vocab,
                       vocoder=vocoder.decode)
    snap = tmp_path / "snapshot"
    model.save_pretrained(snap)
    assert (snap / "config.json").exists()
    assert (snap / "vocos" / "model.safetensors").exists()

    loaded = F5TTS.from_pretrained(str(snap))
    assert loaded.dit_cfg == cfg
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # vocoder weights round-trip too
    for a, b in zip(jax.tree_util.tree_leaves(vocoder.params),
                    jax.tree_util.tree_leaves(loaded._vocoder.__self__.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the CLI end to end: --model <snapshot dir> -> wav on disk
    from f5_tts_tpu.generate import main

    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(12_000) / 24_000)).astype(np.float32)
    write_wav(tmp_path / "ref.wav", ref, 24_000)
    out = tmp_path / "out.wav"
    main(["--model", str(snap), "--text", "hello world", "--duration", "2.0",
          "--ref-audio", str(tmp_path / "ref.wav"), "--ref-text", "a tone",
          "--steps", "2", "--method", "euler", "--seed", "0",
          "--output", str(out)])
    wave, sr = read_wav(out)
    assert sr == 24_000 and wave.shape[0] > 24_000


def test_byte_tokenizer_snapshot_roundtrip(tmp_path):
    """A model using the UTF-8 byte tokenizer (vocab_char_map=None) writes no
    vocab.txt; from_pretrained must load it back as a byte-tokenizer model
    instead of failing on the missing file, and sampling must be
    bit-identical through the round trip."""
    from f5_tts_tpu.config import VocosConfig
    from f5_tts_tpu.models.vocos import Vocos

    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=256, text_dim=32, conv_layers=1,
        use_flash_attention=False,
    )
    vocoder = Vocos.init(jax.random.key(2), VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    model = F5TTS.init(jax.random.key(0), cfg, vocoder=vocoder.decode)
    snap = tmp_path / "snapshot"
    model.save_pretrained(snap)
    assert not (snap / "vocab.txt").exists()

    loaded = F5TTS.from_pretrained(str(snap))
    assert loaded._vocab_char_map is None

    wave = (0.1 * np.sin(2 * np.pi * 220 * np.arange(24_000) / 24_000)).astype(np.float32)
    o0, _ = model.sample(jnp.asarray(wave)[None], ["hello"], duration=120,
                         steps=2, method="euler", seed=3)
    o1, _ = loaded.sample(jnp.asarray(wave)[None], ["hello"], duration=120,
                          steps=2, method="euler", seed=3)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_quantized_offline_roundtrip(tmp_path):
    """save_pretrained(q=8) + config.json -> from_pretrained(dir, 8) rebuilds
    a working quantized model at a non-base size, fully offline."""
    from f5_tts_tpu.config import VocosConfig
    from f5_tts_tpu.models.vocos import Vocos

    vocab = {chr(i + 97): i for i in range(26)}
    vocab[""] = 26
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=len(vocab) - 1, text_dim=64, conv_layers=1,
        use_flash_attention=False,
    )
    vocoder = Vocos.init(jax.random.key(2), VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    model = F5TTS.init(jax.random.key(0), cfg, vocab_char_map=vocab, vocoder=vocoder.decode)
    snap = tmp_path / "q8"
    model.save_pretrained(snap, quantization_bits=8)

    loaded = F5TTS.from_pretrained(str(snap), quantization_bits=8)
    assert loaded.dit_cfg == cfg
    assert "q" in loaded.params["proj_out"]  # quantized leaf survived
    wave = (0.1 * np.sin(2 * np.pi * 220 * np.arange(12_000) / 24_000)).astype(np.float32)
    out, _ = loaded.sample(jnp.asarray(wave)[None], ["hello"], duration=100,
                           steps=2, method="euler", seed=0)
    assert np.isfinite(np.asarray(out)).all()


def test_nondefault_audio_config_roundtrips(tmp_path):
    """config.json carries AudioConfig/CFMConfig; a non-default front-end
    (n_mels=80) must reload exactly, not fall back to defaults."""
    from f5_tts_tpu.config import AudioConfig, CFMConfig

    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=80,
        text_num_embeds=255, text_dim=32, conv_layers=1, use_flash_attention=False,
    )
    audio_cfg = AudioConfig(n_mels=80, hop_length=512)
    cfm_cfg = CFMConfig(duration_bucket=64, frac_lengths_mask=(0.6, 0.9))
    vocab = {chr(i + 32): i for i in range(255)}
    vocab[""] = 255
    from f5_tts_tpu.config import VocosConfig
    from f5_tts_tpu.models.vocos import Vocos

    vocoder = Vocos.init(
        jax.random.key(3),
        VocosConfig(input_channels=80, dim=64, intermediate_dim=128, num_layers=2,
                    hop_length=512),
    )
    model = F5TTS.init(jax.random.key(0), cfg, audio_cfg=audio_cfg, cfm_cfg=cfm_cfg,
                       vocab_char_map=vocab, vocoder=vocoder.decode)
    snap = tmp_path / "snap80"
    model.save_pretrained(snap)

    loaded = F5TTS.from_pretrained(str(snap))
    assert loaded.audio_cfg == audio_cfg
    assert loaded.cfm_cfg == cfm_cfg
    assert loaded.dit_cfg == cfg


def test_artifact_digest_pinning(tmp_path):
    """from_pretrained with expected_sha256 fails loudly on drift and passes
    on the correct digest (utils/hub.verify_artifacts)."""
    import pytest

    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.utils.hub import sha256_file

    from f5_tts_tpu.config import VocosConfig
    from f5_tts_tpu.models.vocos import Vocos

    cfg = DiTConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                    text_num_embeds=16, text_dim=16, conv_layers=1,
                    use_flash_attention=False)
    vocab = {"": 0, "a": 1, "b": 2, " ": 3}
    vocoder = Vocos.init(jax.random.key(1), VocosConfig(dim=32, intermediate_dim=64, num_layers=1))
    model = F5TTS.init(jax.random.key(0), cfg, vocab_char_map=vocab, vocoder=vocoder.decode)
    model.save_pretrained(tmp_path)

    good = sha256_file(tmp_path / "model_v1.safetensors")
    loaded = F5TTS.from_pretrained(
        str(tmp_path), expected_sha256={"model_v1.safetensors": good}
    )
    assert loaded.dit_cfg == cfg

    with pytest.raises(ValueError, match="digest mismatch"):
        F5TTS.from_pretrained(
            str(tmp_path), expected_sha256={"model_v1.safetensors": "0" * 64}
        )
    with pytest.raises(ValueError, match="missing"):
        F5TTS.from_pretrained(
            str(tmp_path), expected_sha256={"nope.safetensors": good}
        )
