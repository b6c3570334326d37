"""Pinned numeric golden for the WHOLE stack.

The torch-parity goldens compare against an independent reimplementation, so
a change that shifts both stacks identically (a quantization tweak, a kernel
rewrite, an ODE reordering) passes them. This test pins the tiny-config
32-step tokenize -> mel -> ODE -> vocoder pipeline against arrays COMMITTED
to the repo (reference semantics: cfm.py:264-402), catching any numeric
drift of this implementation against its own history.

Regenerate (only when a change intentionally shifts numerics):
    python tests/test_golden_pinned.py
"""

from pathlib import Path

import jax
import numpy as np

from f5_tts_tpu.config import CFMConfig, DiTConfig, VocosConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos

GOLDEN = Path(__file__).parent / "golden" / "pinned_e2e_32step.npz"

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=256, text_dim=32, conv_layers=1, use_flash_attention=False,
)


def _compute():
    vocoder = Vocos.init(
        jax.random.key(1), VocosConfig(dim=64, intermediate_dim=128, num_layers=2)
    )
    model = F5TTS.init(
        jax.random.key(0), TINY, cfm_cfg=CFMConfig(duration_bucket=32),
        vocab_char_map={c: i for i, c in enumerate([""] + [chr(c) for c in range(32, 127)])},
    )
    sr = model.audio_cfg.sample_rate
    ref = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)

    import jax.numpy as jnp

    mel, _ = model.sample(
        jnp.asarray(ref)[None, :], ["a pinned golden utterance."], duration=96,
        steps=32, method="euler", seed=12, cfg_strength=2.0,
        sway_sampling_coef=-1.0, return_trajectory=False,
    )
    model._vocoder = vocoder.decode
    wave, _ = model.sample(
        jnp.asarray(ref)[None, :], ["a pinned golden utterance."], duration=96,
        steps=32, method="euler", seed=12, cfg_strength=2.0,
        sway_sampling_coef=-1.0, return_trajectory=False,
    )
    # decimate the wave for a small committed artifact; any pipeline drift
    # shows up in every 8th sample just as surely
    return np.asarray(mel, np.float32), np.asarray(wave, np.float32)[::8]


def test_pipeline_matches_committed_golden():
    assert GOLDEN.exists(), "golden file missing; run: python tests/test_golden_pinned.py"
    mel, wave = _compute()
    stored = np.load(GOLDEN)
    np.testing.assert_allclose(mel, stored["mel"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(wave, stored["wave_dec8"], atol=1e-5, rtol=1e-5)


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    mel, wave = _compute()
    GOLDEN.parent.mkdir(exist_ok=True)
    np.savez_compressed(GOLDEN, mel=mel, wave_dec8=wave)
    print(f"wrote {GOLDEN}: mel {mel.shape}, wave_dec8 {wave.shape}")
