"""X1 (ONNX export arithmetic) + X2 (model summary) parity tests."""

import numpy as np
import pytest

from entity_extractor_by_pointer_spark.functions import onnx_export as ox
from entity_extractor_by_pointer_spark.functions import summary as ms
from entity_extractor_by_pointer_spark.functions.model import NerConfig, PointerNerModel


def test_tril_onnx_matches_np_tril_2d_3d_4d():
    rng = np.random.default_rng(0)
    for shape in [(6, 6), (3, 5, 5), (1, 4, 7, 7)]:
        x = rng.normal(size=shape).astype(np.float32)
        for diag in (0, -1, 1):
            expect = x * np.tril(np.ones(shape[-2:], dtype=np.float32), k=diag)
            np.testing.assert_array_equal(ox.tril_onnx(x, diag), expect)


def test_onnx_mask_path_bit_identical_to_reference_spec():
    """The exported graph's tril-free mask (reference onnx_fun.py:5-42) must
    reproduce heads.add_mask_tril (reference GlobalPointer.py:49-61) exactly,
    including padded rows/columns."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    mask = np.ones((2, 8), dtype=np.int64)
    mask[0, 5:] = 0  # padded doc
    mask[1, 7:] = 0
    assert ox.masked_scores_equal_reference(logits, mask)


def test_convert_onnx_gated_without_onnx_package():
    model = PointerNerModel(NerConfig(classes=["a", "b"]))
    with pytest.raises(NotImplementedError, match="onnx"):
        ox.convert_onnx(model, "/tmp/model.onnx")


def test_summary_census_totals(tmp_path):
    model = PointerNerModel(NerConfig(classes=["person", "location", "organization"]))
    rows = ms.summarize_model(model)
    total_row = rows[-1]
    assert total_row["name"] == "TOTAL"
    assert total_row["n_params"] == sum(r["n_params"] for r in rows[:-1])
    names = {r["name"] for r in rows}
    assert "encoder.word_embeddings.weight" in names
    # GP head: w1 (H×2*inner), b1, w2 (H×2C), b2
    assert {"head.w1", "head.b1", "head.w2", "head.b2"} <= names
    emb = next(r for r in rows if r["name"] == "encoder.word_embeddings.weight")
    assert emb["n_params"] == 4096 * 64
    text = ms.format_summary(model)
    assert "TOTAL" in text and "encoder.word_embeddings.weight" in text


def test_summary_covers_bp_head_params():
    model = PointerNerModel(NerConfig(classes=["a"], model_type="bp"))
    names = {r["name"] for r in ms.summarize_model(model)}
    assert {"head.gamma", "head.beta", "head.w", "head.b"} <= names
