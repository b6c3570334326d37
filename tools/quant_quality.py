"""Output-distortion record for weight-only quantization (--q 4 / --q 8).

The quantization path has bit-exact PACKING tests (tests/test_convert.py:
MLX layout round-trips) and an RTF record, but packing exactness says
nothing about how much int4/int8 weights distort the synthesized output.
This measures it end to end on the pinned tiny config
(tests/test_golden_pinned.py's TINY): the full tokenize -> mel -> 32-step
ODE pipeline through the REAL checkpoint machinery — save_pretrained with
quantization_bits, from_pretrained, sample — against the float snapshot of
the same weights. Prints one JSON line per mode:

    {"q": 4, "mel_rel_mae": ..., "mel_rel_rmse": ...}

rel-MAE = mean |mel_q - mel_f| / mean |mel_f|. Runs on CPU in minutes
(tiny model); record the numbers in docs/PERFORMANCE.md.

reference: cfm.py:450-453,510-515 ships int4/int8 artifacts with no quality
record at all; this tool is that record's generator.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from f5_tts_tpu.config import CFMConfig, DiTConfig, VocosConfig
    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.models.vocos import Vocos

    # tests/test_golden_pinned.py's TINY config (dim % 64 == 0, so the
    # attention/FF matrices are all quantization-eligible)
    tiny = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=256, text_dim=32, conv_layers=1,
        use_flash_attention=False,
    )
    vocab = {c: i for i, c in enumerate([""] + [chr(c) for c in range(32, 127)])}
    # bundle a tiny vocoder so save_pretrained writes a vocos/ subdir and the
    # snapshot round-trips fully offline (from_pretrained otherwise fetches
    # the published vocoder repo, unreachable on this box)
    vocos = Vocos.init(
        jax.random.key(1), VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    src = F5TTS.init(jax.random.key(0), tiny,
                     cfm_cfg=CFMConfig(duration_bucket=32),
                     vocab_char_map=vocab, vocoder=vocos.decode)

    sr = src.audio_cfg.sample_rate
    ref = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)

    def sample_mel(model) -> np.ndarray:
        model._vocoder = None  # return the mel, not the vocoded wave
        mel, _ = model.sample(
            jnp.asarray(ref)[None, :], ["a pinned golden utterance."],
            duration=96, steps=32, method="euler", seed=12, cfg_strength=2.0,
            sway_sampling_coef=-1.0, return_trajectory=False,
        )
        return np.asarray(mel, np.float32)

    with tempfile.TemporaryDirectory() as snap:
        src.save_pretrained(snap)
        mel_f = sample_mel(F5TTS.from_pretrained(snap))

    for q in (8, 4):
        with tempfile.TemporaryDirectory() as snap:
            src.save_pretrained(snap, quantization_bits=q)
            mel_q = sample_mel(F5TTS.from_pretrained(snap, quantization_bits=q))
        denom = float(np.mean(np.abs(mel_f)))
        print(json.dumps({
            "q": q,
            "mel_rel_mae": round(float(np.mean(np.abs(mel_q - mel_f))) / denom, 6),
            "mel_rel_rmse": round(
                float(np.sqrt(np.mean((mel_q - mel_f) ** 2)))
                / float(np.sqrt(np.mean(mel_f ** 2))), 6),
        }), flush=True)


if __name__ == "__main__":
    main()
