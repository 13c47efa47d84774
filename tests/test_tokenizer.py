from entity_extractor_by_pointer_spark.functions.tokenizer import (
    CLS_ID,
    SEP_ID,
    CjkCharTokenizer,
    basic_tokenize,
    pad_or_truncate,
    token_id,
)


def test_cjk_chars_are_single_tokens():
    toks = basic_tokenize("广州举行")
    assert [t[0] for t in toks] == ["广", "州", "举", "行"]
    assert [(t[1], t[2]) for t in toks] == [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_ascii_runs_and_punct():
    toks = basic_tokenize("In 1992, GDP grew.")
    assert [t[0] for t in toks] == ["in", "1992", ",", "gdp", "grew", "."]
    # offsets are (start, end_exclusive) on the ORIGINAL text
    assert toks[1][1:] == (3, 7)
    assert toks[2][1:] == (7, 8)


def test_whitespace_emits_no_token():
    assert basic_tokenize("  \t\n ") == []


def test_special_token_offsets_are_zero_zero():
    enc = CjkCharTokenizer()("广州")
    assert enc.input_ids[0] == CLS_ID and enc.input_ids[-1] == SEP_ID
    assert enc.offset_mapping[0] == (0, 0) and enc.offset_mapping[-1] == (0, 0)
    assert enc.offset_mapping[1] == (0, 1)


def test_truncation_keeps_cls_and_sep():
    # HF behavior reproduced: [CLS] + (L-2) tokens + [SEP]
    text = "字" * 300
    enc = CjkCharTokenizer()(text, max_length=200, truncation=True)
    assert len(enc.input_ids) == 200
    assert enc.input_ids[0] == CLS_ID and enc.input_ids[-1] == SEP_ID
    assert enc.offset_mapping[198] == (197, 198)


def test_pad_or_truncate_reference_semantics():
    # reference data.py:24-29 pads with 0 / hard-truncates WITHOUT re-adding SEP
    assert pad_or_truncate([1, 2, 3], 5) == [1, 2, 3, 0, 0]
    long = list(range(300))
    assert pad_or_truncate(long, 200) == long[:200]  # no SEP at 199


def test_fast_tokenizer_equals_reference_loop():
    import hypothesis.strategies as st
    from hypothesis import given, settings

    from entity_extractor_by_pointer_spark.functions.tokenizer import basic_tokenize_slow

    alphabet = st.sampled_from(
        list("中国广州 abzAZ019,.!?、。\t\n\r\xa0　\x1c​é½１﹏")
    )

    @given(st.text(alphabet=alphabet, max_size=200))
    @settings(max_examples=500, deadline=None)
    def check(text):
        assert basic_tokenize(text) == basic_tokenize_slow(text)

    check()


def test_token_ids_deterministic_and_in_vocab_range():
    a, b = token_id("广"), token_id("广")
    assert a == b and 104 <= a < 21128
    assert token_id("gdp") != token_id("gpd")
