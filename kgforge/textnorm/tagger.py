"""Tagger backends for the punctuation-restoration stage.

The reference's tagger is ``DistilBertForTokenClassification`` behind an HF
tokenizer (inference_pipeline.py:100-115,176-202: tokenize → forward →
argmax → subword-position mask). This sandbox has no torch/onnxruntime, so
the model sits behind a minimal backend protocol: a backend maps word-token
chunks to per-word tag names (subword alignment — inference_pipeline.py:
266-277 — is a backend-internal concern). The deterministic ``MockTagger``
is the sandbox backend; ``OnnxTagger`` is the production stub. Byte-identity
tests exercise the exact pre/post-process path production uses
(SURVEY.md §7 risk 3).
"""

from __future__ import annotations

import hashlib
from typing import Protocol


class TaggerBackend(Protocol):
    def tag(self, chunks: list[list[str]]) -> list[list[str]]:
        """One tag name per word token, per chunk."""
        ...


def _stable_hash(s: str) -> int:
    """Process-stable 64-bit hash (unlike builtin ``hash`` under
    PYTHONHASHSEED randomization) — safe for executor-side determinism."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


_EN_ENDERS = ("PERIOD", "PERIOD", "PERIOD", "PERIOD", "QUESTIONMARK", "EXLAMATIONMARK")
_ZH_ENDERS = ("C_PERIOD", "C_PERIOD", "C_PERIOD", "C_PERIOD", "C_QUESTIONMARK", "C_EXLAMATIONMARK")


class MockTagger:
    """Deterministic rule tagger: sentence length is a hash of the sentence's
    first token (6..13 words); sentence-final token gets a hash-chosen ender
    tag; mid-sentence tokens occasionally get COMMA. Pure function of the
    chunk's tokens → identical output on driver (oracle) and executors."""

    def __init__(self, lang: str = "en"):
        self.lang = lang
        if lang == "zh":
            # zh tokens are single chars after chinese_split: longer
            # sentence targets + rare commas approximate real zh prose
            self.enders = _ZH_ENDERS
            self.comma = "C_COMMA"
            self.min_len, self.len_span, self.comma_mod = 10, 14, 37
        else:
            self.enders = _EN_ENDERS
            self.comma = "COMMA"
            self.min_len, self.len_span, self.comma_mod = 6, 8, 9

    def tag(self, chunks: list[list[str]]) -> list[list[str]]:
        return [self._tag_chunk(tokens) for tokens in chunks]

    def _tag_chunk(self, tokens: list[str]) -> list[str]:
        tags: list[str] = []
        sent_pos = 0
        target = 0
        for i, tok in enumerate(tokens):
            if sent_pos == 0:
                target = self.min_len + _stable_hash("len:" + tok) % self.len_span
            sent_pos += 1
            if sent_pos >= target and i < len(tokens) - 1:
                h = _stable_hash("end:" + tok)
                tags.append(self.enders[h % len(self.enders)])
                sent_pos = 0
            elif sent_pos > 2 and _stable_hash("comma:" + tok) % self.comma_mod == 0:
                tags.append(self.comma)
            else:
                tags.append("O")
        if tags:
            # close the final sentence of the chunk
            tags[-1] = self.enders[_stable_hash("end:" + tokens[-1]) % len(self.enders)]
        return tags


class OnnxTagger:
    """Production backend: HF fast tokenizer + ONNX Runtime session, loaded
    lazily once per python worker (mirrors inference_pipeline.py:176-202 and
    its subword-mask alignment at :266-277). Not runnable in this sandbox
    (no onnxruntime/transformers); kept as the deployment seam."""

    def __init__(self, model_path: str, tokenizer_name: str, id2tag: dict[int, str]):
        self.model_path = model_path
        self.tokenizer_name = tokenizer_name
        self.id2tag = id2tag
        self._session = None

    def _load(self):  # pragma: no cover - requires onnxruntime
        import numpy  # noqa: F401
        import onnxruntime  # type: ignore
        from transformers import DistilBertTokenizerFast  # type: ignore

        self._tokenizer = DistilBertTokenizerFast.from_pretrained(self.tokenizer_name)
        self._session = onnxruntime.InferenceSession(self.model_path)

    def tag(self, chunks: list[list[str]]) -> list[list[str]]:  # pragma: no cover
        if self._session is None:
            self._load()
        import numpy as np

        enc = self._tokenizer(
            chunks,
            is_split_into_words=True,
            padding=True,
            return_offsets_mapping=True,
            return_tensors="np",
        )
        offsets = np.asarray(enc["offset_mapping"])
        # first-subword positions: offset (0, !=0) — inference_pipeline.py:266-277
        marks = (offsets[:, :, 0] == 0) & (offsets[:, :, 1] != 0)
        logits = self._session.run(
            None,
            {
                "input_ids": np.asarray(enc["input_ids"]),
                "attention_mask": np.asarray(enc["attention_mask"]),
            },
        )[0]
        preds = logits.argmax(axis=2)
        return [
            [self.id2tag[int(p)] for p in pred[mark]]
            for pred, mark in zip(preds, marks)
        ]


def get_tagger(backend: str, lang: str = "en", **kwargs) -> TaggerBackend:
    if backend == "mock":
        return MockTagger(lang=lang)
    if backend == "onnx":  # pragma: no cover
        return OnnxTagger(**kwargs)
    raise ValueError(f"unknown tagger backend: {backend}")
