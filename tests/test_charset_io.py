"""S2 charset sniffing gate: non-UTF-8 and BOM'd inputs round-trip through
the Spark readers with the detected encoding (reference behavior:
chardet.detect → read with that encoding)."""

import pytest

from kgforge.io.text import read_csv_auto, read_text_auto, sniff_encoding

ROWS = [("café", "münchen"), ("niño", "façade")]


@pytest.fixture()
def latin1_csv(tmp_path):
    p = tmp_path / "latin1.csv"
    body = "name,city\n" + "\n".join(f"{a},{b}" for a, b in ROWS)
    p.write_bytes(body.encode("iso-8859-1"))
    return str(p)


def test_sniff_latin1(latin1_csv):
    assert sniff_encoding(latin1_csv) == "ISO-8859-1"


def test_sniff_utf8(tmp_path):
    p = tmp_path / "u.txt"
    p.write_bytes("café münchen\n".encode("utf-8"))
    assert sniff_encoding(str(p)) == "UTF-8"


def test_sniff_utf8_sample_boundary_splits_multibyte(tmp_path):
    """A valid UTF-8 file larger than the sample whose sample boundary
    lands mid-multibyte-sequence must still detect as UTF-8 (round-2
    advisor: the truncated tail raised UnicodeDecodeError and the file was
    misdetected as ISO-8859-1, mojibake-ing the distributed read)."""
    p = tmp_path / "big.txt"
    sample = 64
    body = b"a" * (sample - 1) + "é".encode("utf-8")  # 2-byte seq split at 64
    p.write_bytes(body + "reste du texte café\n".encode("utf-8") * 10)
    assert sniff_encoding(str(p), sample_bytes=sample) == "UTF-8"
    # a genuinely non-UTF-8 file is still latin-1 even when truncated
    q = tmp_path / "bad.txt"
    q.write_bytes(("x" * 30 + "café niño ").encode("iso-8859-1") * 10)
    assert sniff_encoding(str(q), sample_bytes=sample) == "ISO-8859-1"


def test_sniff_boms(tmp_path):
    cases = [
        ("utf-8-sig", "UTF-8"),
        ("utf-16-le", "UTF-16LE"),
        ("utf-16-be", "UTF-16BE"),
    ]
    for codec, want in cases:
        p = tmp_path / f"{codec}.txt"
        bom = {"utf-8-sig": b"\xef\xbb\xbf", "utf-16-le": b"\xff\xfe",
               "utf-16-be": b"\xfe\xff"}[codec]
        p.write_bytes(bom + "hola".encode(codec.replace("-sig", "")))
        assert sniff_encoding(str(p)) == want


def test_read_csv_auto_decodes_latin1(spark, latin1_csv):
    got = {tuple(r) for r in read_csv_auto(spark, latin1_csv).collect()}
    assert got == set(ROWS)


def test_read_text_auto_decodes_latin1(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_bytes("première ligne\nseconde — ligne\n".encode("iso-8859-1", "replace"))
    vals = [r["value"] for r in read_text_auto(spark, str(p)).collect()]
    assert vals[0] == "première ligne"


def test_sniff_directory_picks_first_file(tmp_path, latin1_csv):
    import shutil

    d = tmp_path / "dir"
    d.mkdir()
    shutil.copy(latin1_csv, d / "part-0.csv")
    assert sniff_encoding(str(d)) == "ISO-8859-1"
