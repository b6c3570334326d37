"""Mesh-parallel inference as a PRODUCT surface: serve --mesh-data / the
generate() mesh hook produce the same audio as single-device serving
(parallel/mesh.py; SURVEY §2c — the reference is strictly single-device).

Runs on the suite's 8-virtual-CPU-device config (tests/conftest.py)."""

import io
import json
import urllib.request
import wave as wave_mod

import jax
import numpy as np
import pytest

from f5_tts_tpu.config import CFMConfig, DiTConfig, VocosConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos
from f5_tts_tpu.serve import serve

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=256, text_dim=32, conv_layers=1, use_flash_attention=False,
)


def _model():
    vocoder = Vocos.init(jax.random.key(1), VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    return F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFMConfig(duration_bucket=64),
                      vocoder=vocoder.decode)


def _synthesize(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesize",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        body = r.read()
    with wave_mod.open(io.BytesIO(body)) as w:
        assert w.getframerate() == 24_000
        return np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")


PAYLOAD = {"text": "mesh serving equality check", "duration": 7.0,
           "steps": 2, "method": "euler", "seed": 3}


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 (virtual) devices")
def test_sharded_server_matches_unsharded():
    httpd = serve(_model(), host="127.0.0.1", port=0, max_batch=4, max_wait_ms=40.0)
    try:
        ref_pcm = _synthesize(httpd.server_address[1], PAYLOAD)
    finally:
        httpd.batcher.stop()
        httpd.shutdown()

    from f5_tts_tpu.parallel.mesh import create_mesh

    sharded_model = _model().use_mesh(create_mesh(data=4))
    httpd = serve(sharded_model, host="127.0.0.1", port=0, max_batch=4, max_wait_ms=40.0)
    try:
        dp_pcm = _synthesize(httpd.server_address[1], PAYLOAD)
    finally:
        httpd.batcher.stop()
        httpd.shutdown()

    assert dp_pcm.shape == ref_pcm.shape
    # identical up to 16-bit quantization of sharded-reduction float noise
    np.testing.assert_allclose(dp_pcm, ref_pcm, atol=2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dp_tp_mesh_sample_matches_single_device():
    """DP x TP (4x2) through the public use_mesh surface, odd batch (DP
    padding path), per-item durations."""
    from f5_tts_tpu.parallel.mesh import create_mesh

    model = _model()
    cond = jax.random.normal(jax.random.key(5), (3, 32, 100))
    texts = ["first sentence", "the second one", "third"]
    durs = np.array([120, 90, 150], np.int32)
    out_ref, _ = model.sample(cond, texts, duration=durs, steps=2, method="euler", seed=7)

    sharded = _model().use_mesh(create_mesh(data=4, model=2))
    out_dp, _ = sharded.sample(cond, texts, duration=durs, steps=2, method="euler", seed=7)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_dp), atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 (virtual) devices")
def test_w8a8_composes_with_mesh():
    """int8-COMPUTE leaves (w8/w8_scale) shard under the TP specs and the
    DP padding path; output matches unsharded w8a8 inference."""
    from f5_tts_tpu.parallel.mesh import create_mesh

    base = _model()
    m_w8 = F5TTS(base.params, TINY.replace(int8_compute=True),
                 cfm_cfg=CFMConfig(duration_bucket=64), vocoder=base._vocoder)
    cond = jax.random.normal(jax.random.key(6), (3, 32, 100))
    texts = ["alpha beta", "gamma", "delta epsilon zeta"]
    durs = np.array([100, 80, 120], np.int32)
    out_ref, _ = m_w8.sample(cond, texts, duration=durs, steps=2, method="euler", seed=4)

    sharded = F5TTS(base.params, TINY.replace(int8_compute=True),
                    cfm_cfg=CFMConfig(duration_bucket=64), vocoder=base._vocoder)
    sharded.use_mesh(create_mesh(data=2, model=2))
    out_sh, _ = sharded.sample(cond, texts, duration=durs, steps=2, method="euler", seed=4)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sh), atol=2e-4, rtol=2e-4)
