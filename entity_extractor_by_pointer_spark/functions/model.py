"""End-to-end pointer-NER model: tokenize → encode → head → decode.

One implementation shared by (a) the Spark mapInPandas mention-detection
operator and (b) the single-process parity oracle in tests — so the pytest
suite verifies that the *Spark plumbing* (Arrow batching, partitioning,
shuffle) preserves the reference semantics end-to-end.

Pipeline order mirrors reference ``engines/predict.py:31-48`` (predict path)
and ``engines/data.py:31-81`` (batch collate path): ids come from an
UNtruncated encode then ``pad_or_truncate`` to ``max_sequence_length``
(``data.py:41-44,24-29``) while the decode-side offset mapping comes from a
``truncation=True`` encode (``data.py:88-90``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .decode import Span, build_offset_maps, decode_bp
from .encoder import SeededTinyEncoder
from .heads import BinaryPointerHead, GlobalPointerHead
from .tokenizer import CjkCharTokenizer, encode_for_inference


@dataclass
class NerConfig:
    classes: list[str]
    model_type: str = "gp"  # 'gp' | 'bp'  (reference config.py:28-30)
    max_sequence_length: int = 200  # reference config.py:57
    decision_threshold: float = 0.5  # reference config.py:39 (bp only)
    hidden_size: int = 64
    encoder_seed: int = 3
    head_seed: int = 7
    # head logit bias: shifts scores so a small, nonzero fraction of valid
    # cells clear the decode threshold (random weights alone are ~50/50)
    logit_bias: float = -4.0
    # production plug point: 'seeded' = deterministic numpy stand-in (this
    # sandbox); 'bert' = BertTokenizerFast + TorchBertEncoder, the reference's
    # real tokenizer/encoder pair (engines/data.py:17, predict.py:36-44) —
    # exercised by the skip-gated test in tests/test_production_encoder.py
    # wherever torch/transformers are installed. hidden_size must then match
    # the checkpoint (768 for bert-base-chinese).
    encoder: str = "seeded"  # 'seeded' | 'bert'
    hf_model_name: str = "bert-base-chinese"

    @property
    def num_labels(self) -> int:
        return len(self.classes)


class PointerNerModel:
    """Deterministic NER model with the reference's exact decode semantics."""

    def __init__(self, config: NerConfig):
        self.config = config
        if config.encoder == "bert":
            # production pair: HF fast tokenizer + batched BERT forward
            # (reference engines/data.py:17, predict.py:36-44); import-gated —
            # load_torch_bert_encoder raises NotImplementedError without torch
            from transformers import BertTokenizerFast

            from .encoder import load_torch_bert_encoder

            self.tokenizer = BertTokenizerFast.from_pretrained(config.hf_model_name)
            self.encoder = load_torch_bert_encoder(config.hf_model_name)
        else:
            self.tokenizer = CjkCharTokenizer(config.max_sequence_length)
            self.encoder = SeededTinyEncoder(config.hidden_size, config.encoder_seed)
        hidden = self.encoder.hidden_size  # head width follows the encoder
        if config.model_type == "gp":
            self.head = GlobalPointerHead(hidden, config.num_labels, config.head_seed)
        else:
            self.head = BinaryPointerHead(hidden, config.num_labels, config.head_seed)

    def _encode_batch(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray, list]:
        L = self.config.max_sequence_length
        ids, masks, offsets = [], [], []
        if self.config.encoder == "bert":
            # the reference's two tokenizer calls verbatim: UNtruncated ids
            # right-padded/hard-truncated to L (data.py:41-44,24-29) + the
            # truncation=True offset mapping decode reads (data.py:88-90)
            from .tokenizer import pad_or_truncate

            for text in texts:
                enc = self.tokenizer(text)
                ids.append(pad_or_truncate(enc["input_ids"], L))
                masks.append(pad_or_truncate(enc["attention_mask"], L))
                off = self.tokenizer(
                    text,
                    return_offsets_mapping=True,
                    max_length=L,
                    truncation=True,
                )["offset_mapping"]
                offsets.append([tuple(o) for o in off])
            return np.asarray(ids, dtype=np.int32), np.asarray(masks, dtype=np.int32), offsets
        for text in texts:
            i, m, off = encode_for_inference(text, L)  # single tokenize pass
            ids.append(i)
            masks.append(m)
            offsets.append(off)
        return np.asarray(ids, dtype=np.int32), np.asarray(masks, dtype=np.int32), offsets

    def predict_batch(self, texts: list[str]) -> list[list[Span]]:
        if not texts:
            return []
        input_ids, attention_mask, offsets = self._encode_batch(texts)
        hidden = self.encoder(input_ids, attention_mask)
        bias = np.float32(self.config.logit_bias)
        out: list[list[Span]] = []
        if self.config.model_type == "gp":
            # Per-doc length cropping: every cell with start/end beyond the
            # doc's true token count is −1e12-masked in the full (C, L, L)
            # computation and can never decode, and all head ops are
            # per-position, so computing only the (C, l, l) submatrix yields
            # bit-identical surviving cells at ~ (l/L)² of the cost. The
            # crop is per-document, hence independent of batch composition —
            # the single-process oracle and the Spark UDF stay in exact
            # agreement. (BP is NOT cropped: its decode quirk lets padded
            # positions above the sigmoid threshold consume starts via the
            # break rule — reference engines/data.py:98-106.)
            lengths = attention_mask.sum(axis=1)
            num_labels = self.config.num_labels
            buf: np.ndarray | None = None
            for i, text in enumerate(texts):
                li = int(lengths[i])
                # Fused score+decode per class plane: after cropping,
                # decode's start≤end + offset-mapping checks enforce exactly
                # the validity set the reference's −1e12 penalty would, and
                # valid-cell scores (qk + end_bias + start_bias + logit_bias,
                # float32, same op order as GlobalPointerHead.raw_scores) are
                # bit-identical. The (L, L) plane is decoded while
                # cache-resident — the (C, L, L) tensor never exists.
                qk, dense = self.head.qk_and_bias(hidden[i : i + 1, :li])
                if buf is None or buf.shape[0] < li:
                    side = max(self.config.max_sequence_length, li)
                    buf = np.empty((side, side), dtype=np.float32)
                plane = buf[:li, :li]
                start_mapping, end_mapping = build_offset_maps(offsets[i])
                spans: list[Span] = []
                for ci in range(num_labels):
                    np.add(qk[0], dense[0, 2 * ci][None, :], out=plane)
                    plane += dense[0, 2 * ci + 1][:, None]
                    plane += bias
                    for s, e in zip(*np.where(plane > 0)):
                        if s <= e and s in start_mapping and e in end_mapping:
                            cs, ce = start_mapping[int(s)], end_mapping[int(e)]
                            spans.append(
                                Span(ci, text[cs : ce + 1], cs, ce, float(plane[s, e]))
                            )
                out.append(spans)
        else:
            logits = self.head(hidden, attention_mask) + bias
            for i, text in enumerate(texts):
                out.append(
                    decode_bp(text, logits[i], offsets[i], self.config.decision_threshold)
                )
        return out


    def predict_one(self, sentence: str) -> dict[str, list[str]]:
        """Interactive single-sentence API (reference ``predict.py:31-48``,
        ``main.py:57-63``): spans → per-class surface-form sets → class
        names at the edge (``predict.py:45-48``). Debug/REPL helper; the
        distributed path is ``operators.mentions.detect_mentions``."""
        spans = self.predict_batch([sentence])[0]
        sets: dict[int, set[str]] = {}
        for sp in spans:
            sets.setdefault(sp.class_id, set()).add(sp.entity)
        return {self.config.classes[cid]: sorted(s) for cid, s in sets.items()}


@dataclass
class _ModelCache:
    """Per-executor-process model singleton (one init per Python worker)."""

    cache: dict = field(default_factory=dict)

    def get(self, config: NerConfig) -> PointerNerModel:
        key = (
            tuple(config.classes),
            config.model_type,
            config.max_sequence_length,
            config.hidden_size,
            config.encoder_seed,
            config.head_seed,
            config.logit_bias,
            config.encoder,
            config.hf_model_name,
        )
        if key not in self.cache:
            self.cache[key] = PointerNerModel(config)
        return self.cache[key]


MODEL_CACHE = _ModelCache()
