"""Single-process oracle that executes the reference's evaluation algorithm
verbatim (reference ``engines/train.py:237-284``) in pure python, for
cross-checking the distributed ``operators.evaluate.span_f1``."""

from __future__ import annotations


def validate_counts(
    docs: list[tuple[dict[int, set[str]], dict[int, set[str]]]],
    num_classes: int,
) -> dict[str, dict[str, float]]:
    """docs = [(pred_sets, gold_sets)] with dict class_id → set(surface).

    Returns per-class-id {precision, recall, f1} plus macro under key '_macro'
    — the exact accumulation of reference ``train.py:240-283`` including the
    1e-10 smoothing and the gold-classes-only restriction on B.
    """
    counts = {cid: {"A": 0.0, "B": 1e-10, "C": 1e-10} for cid in range(num_classes)}
    for pred_sets, gold_sets in docs:
        for class_id, entity_set in gold_sets.items():
            p_entity_set = pred_sets.get(class_id)
            if p_entity_set is None:
                p_entity_set = set()
            counts[class_id]["A"] += len(p_entity_set & entity_set)
            counts[class_id]["B"] += len(p_entity_set)
            counts[class_id]["C"] += len(entity_set)
    results: dict[str, dict[str, float]] = {}
    f1_sum = 0.0
    for cid, c in counts.items():
        f1 = 2 * c["A"] / (c["B"] + c["C"])
        precision = c["A"] / c["B"]
        recall = c["A"] / c["C"]
        results[str(cid)] = {"precision": precision, "recall": recall, "f1": f1}
        f1_sum += f1
    results["_macro"] = {"f1": f1_sum / num_classes}
    return results


def gold_sets_reference(
    text: str,
    entities: list[dict],
    categories: dict[str, int],
    tokenizer,
    max_sequence_length: int = 200,
) -> dict[int, set[str]]:
    """Gold-set construction exactly as reference ``engines/data.py:51-62``:
    alignment filter via truncated offset mapping, then set semantics."""
    enc = tokenizer(text, max_length=max_sequence_length, truncation=True)
    mapping = enc.offset_mapping
    start_mapping = {j[0]: i for i, j in enumerate(mapping) if tuple(j) != (0, 0)}
    end_mapping = {j[-1] - 1: i for i, j in enumerate(mapping) if tuple(j) != (0, 0)}
    out: dict[int, set[str]] = {}
    for e in entities:
        if e["start_idx"] in start_mapping and e["end_idx"] in end_mapping:
            out.setdefault(categories[e["type"]], set()).add(e["entity"])
    return out
