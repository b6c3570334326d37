"""Chinese text path: jieba segmentation works; pypinyin absence produces an
actionable error (this image ships jieba but not pypinyin)."""

import pytest

from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin


def test_mixed_ascii_spacing():
    out = convert_char_to_pinyin(["hello world"])[0]
    assert "".join(out) == "hello world"
    # whitespace passes through verbatim (reference-consistent: space segments
    # are single-byte and appended as-is, utils.py:151-154)
    out2 = convert_char_to_pinyin(["one two  three"])[0]
    assert "".join(out2) == "one two  three"


def test_cjk_requires_pypinyin_or_converts():
    try:
        import pypinyin  # noqa: F401

        has_pypinyin = True
    except ImportError:
        has_pypinyin = False

    if has_pypinyin:
        out = convert_char_to_pinyin(["你好"])[0]
        joined = "".join(out)
        assert "ni" in joined and "hao" in joined  # TONE3 pinyin
    else:
        with pytest.raises(ImportError, match="pypinyin"):
            convert_char_to_pinyin(["你好"])


def test_zh_punctuation_passthrough():
    # ZH punctuation is kept verbatim without a leading space (mixed branch)
    try:
        convert_char_to_pinyin(["a。b"])
    except ImportError:
        pytest.skip("pypinyin unavailable and segment contains CJK")
