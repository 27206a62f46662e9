"""Multimodal column support: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as binary columns; decode /
feature-extraction happens in Arrow-batched ``mapInPandas`` stages. The
decode libraries (PIL / torchaudio / av) are NOT installed in this sandbox,
so the real decoders are stubbed behind ``backend="real"`` (raises
NotImplementedError with a clear message); ``backend="fake"`` produces a
deterministic md5-derived feature set so the Spark-side plumbing — schema,
batch shape, partitioning — is fully real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "key long, n_bytes long, format string, width int, height int"
)


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decoder: md5-derived (format, width, height)."""
    h = hashlib.md5(payload).digest()
    fmt = ["png", "jpeg", "webp"][h[0] % 3]
    width = 64 + (int.from_bytes(h[1:3], "big") % 1024)
    height = 64 + (int.from_bytes(h[3:5], "big") % 1024)
    return fmt, width, height


def _real_decode(payload: bytes):  # pragma: no cover - needs PIL
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed in "
            "this environment; use backend='fake' for plumbing tests"
        ) from exc
    img = Image.open(BytesIO(payload))
    return (img.format or "").lower(), img.width, img.height


def extract_media_meta(
    df: DataFrame, key_col: str, payload_col: str, backend: str = "fake"
) -> DataFrame:
    """(key, payload: binary) → (key, n_bytes, format, width, height).

    One Arrow-batched Python stage; the decoder is a worker-local function,
    no per-row Python UDF registration."""
    decode = _fake_decode if backend == "fake" else _real_decode
    src = df.select(df[key_col].alias("key"), df[payload_col].alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, widths, heights = [], [], []
            for payload in pdf["payload"]:
                fmt, w, h = decode(bytes(payload))
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "format": fmts,
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                }
            )

    return src.mapInPandas(run, MEDIA_META_SCHEMA)
