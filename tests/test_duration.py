"""Duration predictor tests (reference: duration.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import DurationConfig
from f5_tts_tpu.models.duration import DurationPredictor

TINY = DurationConfig(
    dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
    text_dim=16, conv_layers=1, use_flash_attention=False,
)


@pytest.fixture(scope="module")
def dp():
    return DurationPredictor.init(jax.random.key(0), TINY, vocab_char_map={"a": 1, "b": 2})


def test_predict_positive_seconds(dp):
    mel = jax.random.normal(jax.random.key(1), (2, 40, 100))
    pred = dp(mel, ["ab", "ba"])
    assert pred.shape == (2,)
    assert (np.asarray(pred) > 0).all()  # softplus output


def test_loss_mode(dp):
    mel = jax.random.normal(jax.random.key(2), (2, 40, 100))
    loss = dp(mel, ["ab", "ba"], return_loss=True, key=jax.random.key(3))
    assert np.isfinite(float(loss))
    # deterministic given key
    loss2 = dp(mel, ["ab", "ba"], return_loss=True, key=jax.random.key(3))
    assert float(loss) == float(loss2)


def test_text_longer_than_mel_pads(dp):
    mel = jax.random.normal(jax.random.key(4), (1, 4, 100))
    pred = dp(mel, [jnp.array([[1, 2, 1, 2, 1, 2, 1, 2]])][0])
    assert pred.shape == (1,)


def test_lens_masking_matters(dp):
    """Different lens must change the prediction (mask zeroes the tail)."""
    mel = jax.random.normal(jax.random.key(5), (1, 40, 100))
    p1 = float(dp(mel, ["ab"], lens=jnp.array([40]))[0])
    p2 = float(dp(mel, ["ab"], lens=jnp.array([10]))[0])
    assert p1 != p2
