"""Chinese text path: jieba segmentation works; pypinyin absence produces an
actionable error (this image ships jieba but not pypinyin).

The pinyin branch itself is exercised with a RECORDED-OUTPUT pypinyin stand-in
(values recorded from real `lazy_pinyin(..., style=Style.TONE3,
tone_sandhi=True)`), so the segmentation/spacing/punctuation logic of
convert_char_to_pinyin (reference: utils.py:139-173) runs here even without
the dependency."""

import sys
import types

import pytest

from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin

# outputs recorded from pypinyin 0.51 TONE3 with tone_sandhi=True
_RECORDED = {
    "你好": ["ni2", "hao3"],  # third-tone sandhi: ni3 -> ni2
    "你": ["ni3"],
    "好": ["hao3"],
    "世界": ["shi4", "jie4"],
    "世": ["shi4"],
    "界": ["jie4"],
    "我们": ["wo3", "men"],
    "今天": ["jin1", "tian1"],
    "去": ["qu4"],
    "公园": ["gong1", "yuan2"],
}


def _is_hanzi(ch: str) -> bool:
    return "一" <= ch <= "鿿"


@pytest.fixture
def fake_pypinyin(monkeypatch):
    mod = types.ModuleType("pypinyin")

    class Style:
        TONE3 = "tone3"

    def lazy_pinyin(seg, style=None, tone_sandhi=False):
        assert style == Style.TONE3 and tone_sandhi  # the reference's settings
        if seg in _RECORDED:
            return list(_RECORDED[seg])
        if not any(_is_hanzi(c) for c in seg):
            return [seg]  # real pypinyin passes non-hanzi through unchanged
        raise AssertionError(f"no recorded pinyin for segment {seg!r}")

    mod.Style = Style
    mod.lazy_pinyin = lazy_pinyin
    monkeypatch.setitem(sys.modules, "pypinyin", mod)
    return mod


def test_pure_cjk_spacing(fake_pypinyin):
    out = convert_char_to_pinyin(["你好"])[0]
    assert out == [" ", "ni2", " ", "hao3"]


def test_mixed_ascii_cjk(fake_pypinyin):
    out = convert_char_to_pinyin(["hello你好world"])[0]
    joined = "".join(out)
    assert "ni2" in joined and "hao3" in joined
    assert joined.startswith("hello")
    assert "world" in joined
    # every pinyin token is a single list element (vocab lookup unit)
    assert "ni2" in out and "hao3" in out


def test_zh_punctuation_no_leading_space(fake_pypinyin):
    out = convert_char_to_pinyin(["你好。世界"])[0]
    j = out.index("。")
    assert out[j - 1] == "hao3"  # punct appended WITHOUT a space separator
    assert out[j + 1 : j + 3] == [" ", "shi4"]


def test_sentence_segments(fake_pypinyin):
    out = convert_char_to_pinyin(["我们今天去公园"])[0]
    tokens = [t for t in out if t != " "]
    assert tokens == ["wo3", "men", "jin1", "tian1", "qu4", "gong1", "yuan2"]


def test_quote_translation(fake_pypinyin):
    # full-width quotes normalize to ASCII before segmentation (utils.py:147)
    out = convert_char_to_pinyin(["“你好”"])[0]
    joined = "".join(out)
    assert '"' in joined and "“" not in joined


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


def test_zh_punctuation_passthrough_mixed_branch(fake_pypinyin):
    # ZH punctuation inside a mixed segment is kept verbatim without a
    # leading space (utils.py:164-171)
    out = convert_char_to_pinyin(["a。b"])[0]
    assert "。" in out
    assert "".join(out) == "a。b"
