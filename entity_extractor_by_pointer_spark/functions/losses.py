"""Training losses + gold-label vectorization + train/dev split, numpy.

Training itself is out of scope (the north rule is inference/KG
construction), but these ports pin the decode semantics from the training
direction too (SURVEY.md §3.3) and give the pytest suite a second oracle:

- ``multilabel_categorical_crossentropy`` — Su Jianlin's loss
  (https://kexue.fm/archives/7359), reference
  ``engines/utils/losses.py:17-28``: flip sign of positive-class scores,
  −1e12-mask the opposite group, append a zero logit, log-sum-exp both
  groups, mean over rows.
- ``calculate_loss`` — the reference's reshape conventions
  (``engines/train.py:36-55``): bp flattens to (B·2C, L) rows, gp to
  (B·C, L·L); the BCE bp variant masks by attention and normalizes.
- ``build_label_tensors`` — gold char spans → BP ``(L, C, 2)`` /
  GP ``(C, L, L)`` one-hot tensors with the token-alignment drop rule
  (``engines/data.py:46-69``).
- ``train_dev_split`` — deterministic positional split at
  ``1 − validation_rate`` (``engines/train.py:102-106``).
"""

from __future__ import annotations

import numpy as np

from .tokenizer import CjkCharTokenizer


def _logsumexp(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))).squeeze(axis)


def multilabel_categorical_crossentropy(y_pred: np.ndarray, y_true: np.ndarray) -> float:
    """(rows, n) scores + {0,1} labels → scalar loss (mean over rows)."""
    y_pred = (1 - 2 * y_true) * y_pred
    y_pred_neg = y_pred - y_true * 1e12
    y_pred_pos = y_pred - (1 - y_true) * 1e12
    zeros = np.zeros_like(y_pred[..., :1])
    y_pred_neg = np.concatenate([y_pred_neg, zeros], axis=-1)
    y_pred_pos = np.concatenate([y_pred_pos, zeros], axis=-1)
    return float((_logsumexp(y_pred_neg) + _logsumexp(y_pred_pos)).mean())


def bce_with_logits(logits: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Elementwise BCEWithLogits (reduction='none'), numerically stable."""
    return np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits)))


def calculate_loss(
    logits: np.ndarray,
    labels: np.ndarray,
    attention_mask: np.ndarray,
    model_type: str = "gp",
    use_multilabel_cce: bool = True,
    num_labels: int | None = None,
) -> float:
    """Reference ``Train.calculate_loss`` (engines/train.py:36-55)."""
    batch_size = logits.shape[0]
    if num_labels is None:
        num_labels = logits.shape[2] if model_type == "bp" else logits.shape[1]
    if use_multilabel_cce:
        rows = num_labels * 2 if model_type == "bp" else num_labels
        return multilabel_categorical_crossentropy(
            logits.reshape(batch_size * rows, -1), labels.reshape(batch_size * rows, -1)
        )
    if model_type == "bp":
        loss = bce_with_logits(logits, labels)  # (B, L, C, 2)
        loss = loss.mean(axis=3).sum(axis=2)  # (B, L)
        return float((loss * attention_mask).sum() / attention_mask.sum())
    rows = batch_size * num_labels
    return float(bce_with_logits(logits.reshape(rows, -1), labels.reshape(rows, -1)).mean())


def build_label_tensors(
    text: str,
    entities: list[dict],
    categories: dict[str, int],
    model_type: str = "gp",
    max_sequence_length: int = 200,
    tokenizer: CjkCharTokenizer | None = None,
) -> np.ndarray:
    """Gold spans → one-hot label tensor, with the reference's alignment
    drop rule: a span survives only if its char start is a token start AND
    its (inclusive) char end is a token end within the truncated encoding
    (``engines/data.py:55-69``). Token ids are padded/truncated to L, so the
    tensor is (L, C, 2) for bp and (C, L, L) for gp."""
    tokenizer = tokenizer or CjkCharTokenizer(max_sequence_length)
    L, C = max_sequence_length, len(categories)
    mapping = tokenizer(text, max_length=L, truncation=True).offset_mapping
    start_mapping = {j[0]: i for i, j in enumerate(mapping) if tuple(j) != (0, 0)}
    end_mapping = {j[-1] - 1: i for i, j in enumerate(mapping) if tuple(j) != (0, 0)}
    label = (
        np.zeros((L, C, 2), dtype=np.float32)
        if model_type == "bp"
        else np.zeros((C, L, L), dtype=np.float32)
    )
    for ent in entities:
        s, e, cls = ent["start_idx"], ent["end_idx"], ent["type"]
        if s in start_mapping and e in end_mapping:
            ts, te = start_mapping[s], end_mapping[e]
            cid = categories[cls]
            if model_type == "bp":
                label[ts, cid, 0] = 1
                label[te, cid, 1] = 1
            else:
                label[cid, ts, te] = 1
    return label


def train_dev_split(records: list, validation_rate: float) -> tuple[list, list]:
    """Deterministic positional split (``engines/train.py:102-106``)."""
    ratio = 1 - validation_rate
    cut = int(ratio * len(records))
    return records[:cut], records[cut:]
