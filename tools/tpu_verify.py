"""TPU acceptance drive: numerics of the custom compute paths ON THE REAL
CHIP, against their XLA fallbacks.

The test suite runs on CPU (Pallas in interpret mode), so a TPU-specific
kernel bug — a tiling assumption, a layout mismatch, an MXU accumulation
issue — would pass every test and only surface as bad audio. This drive
compares, on the actual device, in the actual serving dtype (bf16):

  1. full DiT forward: Pallas flash attention (fused RoPE) vs jnp fallback
  2. grouped-conv tap-sum lowering vs XLA feature_group_count
  3. int8/int4 weight-only sampling vs the float path (coarse: quantization
     itself changes values; this checks "same audio, small distortion",
     catching kernel/packing bugs rather than quantization noise)

Run alone on the chip:  python tools/tpu_verify.py
Exit code 0 iff every check passes its tolerance.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES: list[str] = []


def check(name: str, value: float, tol: float) -> None:
    ok = bool(value < tol)
    print(f"{'PASS' if ok else 'FAIL'}  {name}: {value:.3e} (tol {tol:.0e})")
    if not ok:
        FAILURES.append(name)


def main() -> None:
    from f5_tts_tpu.config import CFMConfig, DiTConfig, F5TTS_V1_BASE
    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.models.dit import dit_forward, init_dit
    import f5_tts_tpu.utils.modules as modules

    rng = np.random.default_rng(0)

    # -- 1. flash attention vs fallback, full base-config forward ---------
    cfg = F5TTS_V1_BASE.replace(compute_dtype="bfloat16")
    params = init_dit(jax.random.key(0), cfg)
    b, n = 2, 1024
    x = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, cfg.text_num_embeds, (b, 64)), jnp.int32)
    t = jnp.asarray([0.4, 0.7], jnp.float32)
    mask = jnp.arange(n)[None, :] < jnp.asarray([[n], [n - 200]])

    def fwd(flash: bool):
        c = cfg.replace(use_flash_attention=flash)
        return jax.jit(lambda p, x: dit_forward(p, c, x, cond, text, t, mask=mask))(params, x)

    y_flash = np.asarray(fwd(True), np.float32)
    y_ref = np.asarray(fwd(False), np.float32)
    scale = float(np.abs(y_ref).mean())
    check("dit_forward flash-vs-fallback rel-MAE (bf16)",
          float(np.abs(y_flash - y_ref).mean()) / scale, 2e-2)

    # -- 1b. flash BACKWARD kernel vs XLA grads (training path) -----------
    from f5_tts_tpu.models.rope import rotary_freqs
    from f5_tts_tpu.ops.flash_attention import (
        _apply_rope_xla, _xla_attention, flash_attention,
    )

    ks = jax.random.split(jax.random.key(5), 3)
    qg = jax.random.normal(ks[0], (2, 16, 1024, 64), jnp.bfloat16)
    kg = jax.random.normal(ks[1], (2, 16, 1024, 64), jnp.bfloat16)
    vg = jax.random.normal(ks[2], (2, 16, 1024, 64), jnp.bfloat16)
    amask = jnp.arange(1024)[None, :] < jnp.asarray([[1024], [900]])
    raw = rotary_freqs(1024, 64)
    rope = (jnp.cos(raw), jnp.sin(raw))
    sc = 1.0 / np.sqrt(64)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, sc, amask, rope).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(_apply_rope_xla(q, rope), _apply_rope_xla(k, rope),
                               v, sc, amask).astype(jnp.float32) ** 2).sum()

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(qg, kg, vg)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(qg, kg, vg)
    for nm, a, bb in zip(("dq", "dk", "dv"), gf, gr):
        a32, b32 = np.asarray(a, np.float32), np.asarray(bb, np.float32)
        check(f"flash backward {nm} vs XLA rel-MAE (bf16)",
              float(np.abs(a32 - b32).mean()) / (float(np.abs(b32).mean()) + 1e-9),
              2e-2)

    # -- 2. grouped conv lowerings on device ------------------------------
    xc = jnp.asarray(rng.standard_normal((2, 1024, 1024)), jnp.bfloat16)
    pc = {"kernel": jnp.asarray(rng.standard_normal((31, 64, 1024)) * 0.05, jnp.float32),
          "bias": jnp.asarray(rng.standard_normal((1024,)) * 0.05, jnp.float32)}
    y_tap = np.asarray(jax.jit(lambda p, x: modules.conv1d(p, x, groups=16))(pc, xc), np.float32)
    modules.TAPSUM_GROUPED_CONV = False
    try:
        y_xla = np.asarray(jax.jit(lambda p, x: modules.conv1d(p, x, groups=16))(pc, xc),
                           np.float32)
    finally:
        modules.TAPSUM_GROUPED_CONV = True
    scale = float(np.abs(y_xla).mean())
    check("grouped conv tap-sum vs XLA rel-MAE (bf16)",
          float(np.abs(y_tap - y_xla).mean()) / scale, 2e-2)

    # -- 3. quantized sampling vs float ------------------------------------
    from f5_tts_tpu.models.quant import quantize_tree

    small = DiTConfig(dim=256, depth=4, heads=4, dim_head=64, ff_mult=2,
                      text_dim=128, conv_layers=1, compute_dtype="bfloat16")
    base_params = init_dit(jax.random.key(1), small)
    ref_wave = jnp.asarray(0.1 * np.sin(2 * np.pi * 220 * np.arange(24_000) / 24_000),
                           jnp.float32)

    def sample_with(p):
        m = F5TTS(p, small, cfm_cfg=CFMConfig())
        out, _ = m.sample(ref_wave[None, :], ["tpu acceptance drive"], duration=256,
                          steps=4, method="euler", seed=0, return_trajectory=False)
        return np.asarray(out, np.float32)

    mel_f = sample_with(base_params)
    for bits in (8, 4):
        mel_q = sample_with(quantize_tree(base_params, bits=bits))
        scale = float(np.abs(mel_f).mean())
        # quantization distortion dominates; the bound only catches
        # packing/kernel breakage (which produces O(1) relative error)
        check(f"int{bits} sampling vs float rel-MAE",
              float(np.abs(mel_q - mel_f).mean()) / scale, 0.5 if bits == 4 else 0.25)

    # int8-COMPUTE (W8A8) on the real MXU int8 pipe vs the float path
    m_w8 = F5TTS(base_params, small.replace(int8_compute=True), cfm_cfg=CFMConfig())
    out_w8, _ = m_w8.sample(ref_wave[None, :], ["tpu acceptance drive"], duration=256,
                            steps=4, method="euler", seed=0, return_trajectory=False)
    check("w8a8 int8-compute sampling vs float rel-MAE",
          float(np.abs(np.asarray(out_w8, np.float32) - mel_f).mean())
          / float(np.abs(mel_f).mean()), 0.1)

    # -- 4. checkpoint-derived weights on-chip ----------------------------
    # the conversion chain (save_pretrained -> published naming -> config.json
    # -> from_pretrained, reference: cfm.py:404-520) executing on hardware:
    # float must round-trip exactly; int8 checks the quantized-artifact path
    import tempfile

    from f5_tts_tpu.config import VocosConfig
    from f5_tts_tpu.models.vocos import Vocos

    vocab = {c: i for i, c in enumerate([""] + [chr(c) for c in range(32, 127)])}
    voc = Vocos.init(
        jax.random.key(3),
        VocosConfig(dim=128, intermediate_dim=256, num_layers=2, compute_dtype="bfloat16"),
    )
    src = F5TTS(base_params, small, cfm_cfg=CFMConfig(),
                vocab_char_map=vocab, vocoder=voc.decode)

    def sample_wave(m):
        w, _ = m.sample(ref_wave[None, :], ["tpu acceptance drive"], duration=256,
                        steps=4, method="euler", seed=0, return_trajectory=False)
        return np.asarray(w, np.float32)

    w_src = sample_wave(src)
    with tempfile.TemporaryDirectory() as d:
        src.save_pretrained(d)
        w_loaded = sample_wave(F5TTS.from_pretrained(d))
        src.save_pretrained(d, quantization_bits=8)
        w_q = sample_wave(F5TTS.from_pretrained(d, quantization_bits=8))
    scale = float(np.abs(w_src).mean())
    check("save->from_pretrained float wave rel-MAE",
          float(np.abs(w_loaded - w_src).mean()) / scale, 1e-3)
    check("save->from_pretrained int8 wave rel-MAE",
          float(np.abs(w_q - w_src).mean()) / scale, 0.25)

    print("ALL PASS" if not FAILURES else f"FAILED: {FAILURES}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
