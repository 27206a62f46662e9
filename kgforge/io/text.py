"""S2 — charset-aware text/CSV ingestion (SURVEY §2.1).

The reference sniffs the file encoding with chardet and passes it to the
reader (/root/reference/examples/english_data_sample.py:39-44:
``chardet.detect(f.read())`` → ``pd.read_csv(..., encoding=...)``).
Spark's readers accept the same decision via ``option("encoding", ...)``;
this module supplies the detection half without chardet (not installed):
BOM signatures first, then a strict-UTF-8 trial decode of a bounded
sample, else the ISO-8859-1 fallback (which decodes any byte sequence —
the same terminal fallback chardet-based pipelines use in practice).

Detection reads ONE bounded sample on the driver; the distributed read
itself is untouched Spark source machinery (encoding is applied per
executor by the text/csv datasource), so this adds zero scale cost.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

_BOMS = [
    (b"\xef\xbb\xbf", "UTF-8"),  # Spark strips the BOM itself for UTF-8
    (b"\xff\xfe", "UTF-16LE"),
    (b"\xfe\xff", "UTF-16BE"),
]


def sniff_encoding(path: str, sample_bytes: int = 1 << 20) -> str:
    """Detect the encoding of ``path`` (a file, directory, or glob — the
    first regular file found is sampled; homogeneous encoding per dataset
    is assumed, as in the reference)."""
    target = path
    if os.path.isdir(path):
        files = sorted(
            f for f in glob.glob(os.path.join(path, "*")) if os.path.isfile(f)
        )
        if not files:
            raise FileNotFoundError(f"no files under {path!r}")
        target = files[0]
    elif not os.path.isfile(path):
        matches = sorted(f for f in glob.glob(path) if os.path.isfile(f))
        if not matches:
            raise FileNotFoundError(path)
        target = matches[0]
    with open(target, "rb") as fh:
        head = fh.read(sample_bytes)
    for bom, enc in _BOMS:
        if head.startswith(bom):
            return enc
    # The sample boundary can split a multibyte UTF-8 sequence when the
    # file is larger than the sample: a decode error whose offset is within
    # 3 bytes of the sample end is an incomplete tail, not bad UTF-8
    # (UTF-8 sequences are ≤ 4 bytes), so trim to the last complete
    # sequence instead of misdetecting the whole file as ISO-8859-1.
    truncated = len(head) == sample_bytes
    try:
        head.decode("utf-8", errors="strict")
        return "UTF-8"
    except UnicodeDecodeError as err:
        if truncated and err.start >= len(head) - 3:
            try:
                head[: err.start].decode("utf-8", errors="strict")
                return "UTF-8"
            except UnicodeDecodeError:
                pass
        return "ISO-8859-1"


def read_csv_auto(
    spark: SparkSession, path: str, header: bool = True, **options
) -> DataFrame:
    """Charset-sniffing CSV scan: the Spark-first S2 equivalent of the
    reference's chardet→read_csv pair."""
    enc = sniff_encoding(path)
    reader = spark.read.option("encoding", enc).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_text_auto(spark: SparkSession, path: str, **options) -> DataFrame:
    """Charset-sniffing line scan (S3 with S2 detection). Spark's ``text``
    source always decodes UTF-8 (no encoding option), so non-UTF-8 inputs
    route through the CSV source with a non-occurring separator and
    quoting disabled — same distributed scan, decoded per executor."""
    enc = sniff_encoding(path)
    if enc == "UTF-8":
        reader = spark.read
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.text(path)
    reader = (
        spark.read.option("encoding", enc)
        .option("sep", "\x01")
        .option("quote", "")
        .option("header", "false")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path).withColumnRenamed("_c0", "value")
