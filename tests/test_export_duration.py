"""AOT duration-predictor artifacts (f5_tts_tpu/export.py:export_duration):
the serialized program must reproduce the live padded-window prediction
exactly, both weight flavors, with loud kind/vocab/window validation — plus
the artifact server resolving missing durations through it.

reference: no counterpart — the reference's duration predictor runs only
inside the live MLX stack (duration.py:161-260); this extends the repo's own
AOT deployment surface (export.py) to duration resolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu import export as E
from f5_tts_tpu.config import DurationConfig
from f5_tts_tpu.models.duration import DurationPredictor

WINDOW = 64
TINY = DurationConfig(
    dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
    text_dim=16, conv_layers=1, use_flash_attention=False,
)


@pytest.fixture(scope="module")
def dp():
    return DurationPredictor.init(jax.random.key(0), TINY)


def _inputs(frames=50, text_len=10):
    rng = np.random.RandomState(3)
    mel = (rng.randn(1, frames, 100) * 0.1).astype(np.float32)
    text = np.full((1, text_len), -1, np.int32)
    text[0, :6] = [5, 6, 7, 8, 9, 10]
    return mel, text


def _live_prediction(dp, mel, text, frames):
    """The padded-window ground truth: the live predictor over the SAME
    window the artifact bakes, lens marking the real frames."""
    cond = np.zeros((1, WINDOW, 100), np.float32)
    cond[:, : mel.shape[1]] = mel
    return float(dp(jnp.asarray(cond), jnp.asarray(text), lens=jnp.array([frames]))[0])


def test_duration_roundtrip_matches_live(dp, tmp_path):
    exp = E.export_duration(dp, batch=1, padded_len=WINDOW)
    path = tmp_path / "dur.bin"
    E.save_duration(exp, path, predictor=dp)
    loaded, spec = E.load_duration(path)
    assert (spec.batch, spec.padded_len, spec.mel_dim) == (1, WINDOW, 100)
    assert spec.text_num_embeds == TINY.text_num_embeds
    assert (spec.hop_length, spec.sample_rate) == (256, 24_000)

    mel, text = _inputs()
    args = E.prep_duration_inputs(spec, mel, text, lens=np.array([50], np.int32))
    got = float(np.asarray(loaded.call(*args))[0])
    assert got == pytest.approx(_live_prediction(dp, mel, text, 50), rel=1e-5)
    assert got > 0  # softplus output


def test_external_weights_flavor_matches_embedded(dp, tmp_path):
    mel, text = _inputs()
    outs = []
    for embed in (True, False):
        exp = E.export_duration(dp, batch=1, padded_len=WINDOW, embed_weights=embed)
        p = tmp_path / f"dur_{embed}.bin"
        E.save_duration(exp, p, predictor=dp)
        loaded, spec = E.load_duration(p)
        args = E.prep_duration_inputs(spec, mel, text)
        outs.append(float(np.asarray(loaded.call(*args))[0]))
    assert outs[0] == pytest.approx(outs[1], rel=1e-6)


def test_kind_discrimination_both_ways(dp, tmp_path):
    """A duration artifact must not load as a sampler and vice versa — the
    header's kind field keeps the two deployment flavors apart."""
    exp = E.export_duration(dp, batch=1, padded_len=WINDOW)
    p = tmp_path / "dur.bin"
    E.save_duration(exp, p, predictor=dp)
    with pytest.raises(ValueError, match="duration"):
        E.load_sampler(p)

    # a sampler artifact refused by load_duration: reuse a raw serialized
    # export (headerless) — no kind header at all
    raw = tmp_path / "raw.bin"
    raw.write_bytes(exp.serialize())
    with pytest.raises(ValueError, match="not a duration artifact"):
        E.load_duration(raw)


def test_prep_validation(dp, tmp_path):
    exp = E.export_duration(dp, batch=1, padded_len=WINDOW)
    p = tmp_path / "dur.bin"
    E.save_duration(exp, p, predictor=dp)
    _, spec = E.load_duration(p)

    mel, text = _inputs()
    # out-of-vocab id fails loudly (the baked gather would clip silently)
    bad = text.copy()
    bad[0, 0] = TINY.text_num_embeds
    with pytest.raises(ValueError, match="out of range"):
        E.prep_duration_inputs(spec, mel, bad)
    # text longer than the window cannot be truncated meaningfully
    long_text = np.full((1, WINDOW + 8), 3, np.int32)
    with pytest.raises(ValueError, match="exceeds the duration"):
        E.prep_duration_inputs(spec, mel, long_text)
    # mel past the window is the CALLER's truncation job
    with pytest.raises(ValueError, match="does not fit"):
        E.prep_duration_inputs(spec, np.zeros((1, WINDOW + 1, 100), np.float32), text)


def test_lens_changes_prediction(dp, tmp_path):
    """The artifact honors lens masking the same way the live path does."""
    exp = E.export_duration(dp, batch=1, padded_len=WINDOW)
    p = tmp_path / "dur.bin"
    E.save_duration(exp, p, predictor=dp)
    loaded, spec = E.load_duration(p)
    mel, text = _inputs()
    a1 = E.prep_duration_inputs(spec, mel, text, lens=np.array([50], np.int32))
    a2 = E.prep_duration_inputs(spec, mel, text, lens=np.array([10], np.int32))
    p1 = float(np.asarray(loaded.call(*a1))[0])
    p2 = float(np.asarray(loaded.call(*a2))[0])
    assert p1 != p2
    assert p2 == pytest.approx(_live_prediction(dp, mel, text, 10), rel=1e-5)


def test_cli_duration_export(tmp_path):
    """`python -m f5_tts_tpu.export --duration` end to end from a snapshot."""
    from f5_tts_tpu.config import DiTConfig, VocosConfig
    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.models.vocos import Vocos

    vocab = {chr(i + 97): i for i in range(26)}
    cfg = DiTConfig(dim=64, depth=1, heads=2, dim_head=32, ff_mult=2,
                    mel_dim=100, text_num_embeds=25, text_dim=32,
                    conv_layers=1, use_flash_attention=False)
    dur = DurationPredictor.init(
        jax.random.key(1), TINY.replace(text_num_embeds=25), vocab_char_map=vocab)
    voc = Vocos.init(jax.random.key(3),
                     VocosConfig(dim=64, intermediate_dim=128, num_layers=1))
    model = F5TTS.init(jax.random.key(0), cfg, vocab_char_map=vocab,
                       duration_predictor=dur, vocoder=voc.decode)
    snap = tmp_path / "snap"
    model.save_pretrained(snap)

    out = tmp_path / "dur.bin"
    E.main(["--model", str(snap), "--out", str(out), "--duration",
            "--padded-len", str(WINDOW), "--no-flash", "--external-weights"])
    loaded, spec = E.load_duration(out)
    assert spec.padded_len == WINDOW
    assert spec.text_num_embeds == 25
    mel, text = _inputs(text_len=8)
    text = np.clip(text, -1, 24)
    args = E.prep_duration_inputs(spec, mel, text)
    assert float(np.asarray(loaded.call(*args))[0]) > 0

    # a snapshot without a predictor errors loudly
    model_no_dur = F5TTS.init(jax.random.key(2), cfg, vocab_char_map=vocab,
                              vocoder=voc.decode)
    snap2 = tmp_path / "snap2"
    model_no_dur.save_pretrained(snap2)
    with pytest.raises(SystemExit):
        E.main(["--model", str(snap2), "--out", str(out), "--duration"])
