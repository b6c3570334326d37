"""Mask utilities and tokenizer semantics (reference: utils.py:39-173)."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.utils.masks import (
    lens_to_mask,
    mask_from_frac_lengths,
    mask_from_start_end_indices,
    maybe_masked_mean,
    pad_sequence,
    pad_to_length,
)
from f5_tts_tpu.utils.tokenizer import list_str_to_idx, list_str_to_tensor


def test_lens_to_mask():
    m = lens_to_mask(jnp.array([2, 4]), length=5)
    expect = np.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]], dtype=bool)
    np.testing.assert_array_equal(np.asarray(m), expect)
    # default length = max(lens)
    m2 = lens_to_mask(jnp.array([2, 4]))
    assert m2.shape == (2, 4)


def test_mask_from_start_end():
    m = mask_from_start_end_indices(jnp.array([1]), jnp.array([3]), max_length=5)
    np.testing.assert_array_equal(np.asarray(m), [[0, 1, 1, 0, 0]])


def test_mask_from_frac_lengths_span_properties():
    key = jax.random.key(0)
    lens = jnp.array([100, 50, 10])
    frac = jnp.array([0.7, 1.0, 0.9])
    m = mask_from_frac_lengths(key, lens, frac, max_length=128)
    counts = np.asarray(m.sum(axis=-1))
    # float32 product, matching the implementation (and MLX) arithmetic
    np.testing.assert_array_equal(counts, np.asarray((frac * lens).astype(jnp.int32)))
    # spans are contiguous and inside [0, len)
    for i, row in enumerate(np.asarray(m)):
        idx = np.nonzero(row)[0]
        if len(idx):
            assert idx[-1] - idx[0] + 1 == len(idx)
            assert idx[-1] < int(lens[i])


def test_maybe_masked_mean():
    t = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    mask = jnp.array([[True, True, False, False]])
    out = maybe_masked_mean(t, mask)
    np.testing.assert_allclose(np.asarray(out), [[1.5, 2.5, 3.5]])
    # no mask = plain mean
    np.testing.assert_allclose(np.asarray(maybe_masked_mean(t)), np.asarray(t.mean(axis=1)))


def test_pad_helpers():
    t = jnp.ones((2, 3))
    p = pad_to_length(t, 5, value=7)
    assert p.shape == (2, 5)
    assert float(p[0, 4]) == 7
    assert pad_to_length(t, 2).shape == (2, 2)

    s = pad_sequence([jnp.array([1, 2]), jnp.array([3])], padding_value=-1)
    np.testing.assert_array_equal(np.asarray(s), [[1, 2], [3, -1]])


def test_byte_tokenizer():
    out = list_str_to_tensor(["ab", "a"])
    np.testing.assert_array_equal(out, [[97, 98], [97, -1]])


def test_vocab_tokenizer_oov_and_padding():
    vocab = {"a": 5, "b": 7}
    out = list_str_to_idx(["ab", "ax"], vocab)
    np.testing.assert_array_equal(out, [[5, 7], [5, 0]])  # OOV -> 0
    # bare string accepted (data pipeline convention, reference: data.py:65)
    out2 = list_str_to_idx("ba", vocab)
    np.testing.assert_array_equal(out2, [[7, 5]])


def test_pinyin_ascii_path():
    from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin

    out = convert_char_to_pinyin(["Hello world; “q”"])
    s = "".join(out[0])
    assert "Hello world" in s
    assert ";" not in s  # custom translation ; -> ,
    assert "“" not in s  # curly quotes normalized


def test_tokenizer_fuzz_arbitrary_unicode():
    """Any unicode input must tokenize without crashing, with ids in range
    for the active vocab (byte fallback: [0, 255]; vocab map: [-1, V-1] with
    OOV -> 0) and consistent padding."""
    import random

    from f5_tts_tpu.utils.tokenizer import (
        convert_char_to_pinyin,
        list_str_to_idx,
        list_str_to_tensor,
    )

    rng = random.Random(0)

    def non_cjk():
        # arbitrary code points outside the CJK ranges convert_char_to_pinyin
        # routes through pypinyin (which is an optional dependency)
        while True:
            c = chr(rng.randint(1, 0xD7FF))
            if not ("\u3100" <= c <= "\u9fff" or "\uf900" <= c <= "\ufaff"):
                return c

    pools = [
        non_cjk,
        lambda: chr(rng.randint(32, 126)),              # ASCII
        lambda: rng.choice("\u200b\u2029\ufeff\t\n \u201c\u201d\u2018\u2019"),
    ]
    texts = []
    for _ in range(16):
        n = rng.randint(0, 40)
        texts.append("".join(rng.choice(pools)() for _ in range(n)))

    conv = convert_char_to_pinyin(texts)  # must not raise (non-CJK path)
    assert len(conv) == len(texts)

    # the CJK branch needs pypinyin: without it the error must be the
    # actionable install hint, never a silent wrong tokenization
    try:
        import pypinyin  # noqa: F401
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="pypinyin"):
            convert_char_to_pinyin(["\u4f60\u597d"])

    ids = np.asarray(list_str_to_tensor(conv))
    assert ids.ndim == 2 and ids.shape[0] == len(texts)
    assert ids.min() >= -1 and ids.max() <= 255

    vocab = {chr(i + 97): i for i in range(26)}
    ids_v = np.asarray(list_str_to_idx(conv, vocab))
    assert ids_v.min() >= -1 and ids_v.max() < 26


def test_punctuation_only_3byte_chars_need_no_pypinyin():
    """Em-dash / ellipsis are 3-byte UTF-8 and hit the reference's 'CJK'
    byte-length branch (utils.py:150-164) — they must tokenize without the
    optional pypinyin dependency, passing through unchanged."""
    from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin

    out = convert_char_to_pinyin(["wait — what… ok"])
    joined = "".join(out[0])
    assert "—" in joined and "…" in joined
