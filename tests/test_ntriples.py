"""N-Triples export/import (kgforge/io/ntriples.py): round-trip
bit-identity on adversarial ids, spec-shaped output, foreign-file
tolerance, and the UDF-free / shuffle-free plan gate. The shared
session-scoped ``spark`` fixture comes from tests/conftest.py."""

import os
import re
import tempfile

from kgforge.io.ntriples import (
    DEFAULT_BASE,
    ntriples_lines,
    read_ntriples,
    write_ntriples,
)


NASTY = [
    ("E000001", "works at", "E000002"),
    ("acme corp", "acquired", "iron foods"),
    ("天河科技", "negotiated with", "李娜"),
    ('we"ird<id>', "a+b/c%d", "tab\tid"),
    ("dot.and_under~", "is a", "percent%20already"),
]


def test_round_trip_bit_identity(spark):
    df = spark.createDataFrame(
        NASTY + [(None, "x", "y"), ("x", None, "y"), ("x", "y", None)],
        "subj_id string, pred string, obj_id string",
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "edges.nt")
        write_ntriples(df, path)
        back = read_ntriples(spark, path)
        got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(NASTY)  # null-term rows dropped, rest exact


def test_line_shape_is_spec_valid(spark):
    df = spark.createDataFrame(NASTY, "subj_id string, pred string, obj_id string")
    lines = [r.line for r in ntriples_lines(df).collect()]
    # W3C N-Triples: IRIREF ws IRIREF ws IRIREF ws '.'; IRIREF excludes
    # control chars, space, <>"{}|^` and backslash
    bad_in_iri = re.compile(r'[\x00-\x20<>"{}|^`\\]')
    for ln in lines:
        m = re.fullmatch(r"<([^>]*)> <([^>]*)> <([^>]*)> \.", ln)
        assert m, ln
        for term in m.groups():
            assert not bad_in_iri.search(term), ln
            assert term.startswith(DEFAULT_BASE)


def test_foreign_iris_and_junk_lines(spark, tmp_path):
    p = str(tmp_path / "foreign.nt")
    with open(p, "w") as f:
        f.write("# a comment line\n")
        f.write("<http://example.org/a> <http://example.org/p> "
                "<http://example.org/b> .\n")
        f.write('<http://example.org/a> <http://example.org/p> "literal" .\n')
        f.write("not a triple at all\n")
    got = [tuple(r) for r in read_ntriples(spark, p).collect()]
    # foreign IRIs load verbatim; the literal-object and junk lines drop
    assert got == [("http://example.org/a", "http://example.org/p",
                    "http://example.org/b")]


def test_spec_whitespace_comment_and_malformed_percent(spark, tmp_path):
    """Review-pass pins: the space before '.' is optional in the W3C
    grammar, a trailing comment after the dot is legal, and a
    base-namespace IRI with a MALFORMED percent sequence loads verbatim
    instead of aborting the read (try_url_decode fallback)."""
    p = str(tmp_path / "edge_cases.nt")
    with open(p, "w") as f:
        f.write("<http://example.org/a> <http://example.org/p> "
                "<http://example.org/b>.\n")  # no space before the dot
        f.write("<http://example.org/c> <http://example.org/p> "
                "<http://example.org/d> . # trailing comment\n")
        f.write(f"<{DEFAULT_BASE}entity/50%off> <{DEFAULT_BASE}pred/sells> "
                f"<{DEFAULT_BASE}entity/widgets> .\n")
    got = sorted(tuple(r) for r in read_ntriples(spark, p).collect())
    assert got == sorted([
        ("http://example.org/a", "http://example.org/p", "http://example.org/b"),
        ("http://example.org/c", "http://example.org/p", "http://example.org/d"),
        # malformed %of → verbatim IRI, well-formed neighbors decode
        (f"{DEFAULT_BASE}entity/50%off", "sells", "widgets"),
    ])


def test_plan_is_udf_free_and_narrow(spark):
    df = spark.createDataFrame(NASTY, "subj_id string, pred string, obj_id string")
    plan = ntriples_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # JVM-side only
    assert "Exchange" not in plan  # narrow: no shuffle to format lines


def test_pipeline_edges_round_trip(spark):
    """End-to-end: real extractor edges (incl. zh entities and multiword
    predicates) survive the export/import seam unchanged."""
    from kgforge.fixtures.gen import gen_webdocs_rows
    from kgforge.stages.normalize import _tag_map
    from kgforge.textnorm.pipeline import DEFAULT_MAX_SEQUENCE_LENGTH, punctuate_one
    from kgforge.textnorm.tagger import MockTagger
    from kgforge.extract.triples import doc_triples

    rows = []
    tagger = {}
    for row in list(gen_webdocs_rows(40)):
        lang = row["lang"] or "en"
        tg = tagger.setdefault(lang, MockTagger(lang=lang))
        text_norm, _ = punctuate_one(
            row["text"] or "", tg, _tag_map(lang), DEFAULT_MAX_SEQUENCE_LENGTH
        )
        for _sid, s, p, o, _c in doc_triples(text_norm, lang):
            rows.append((s, p, o))
    assert rows, "fixture produced no triples"
    df = spark.createDataFrame(rows, "subj_id string, pred string, obj_id string")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "edges.nt")
        write_ntriples(df, path)
        got = sorted(tuple(r) for r in read_ntriples(spark, path).collect())
    assert got == sorted(rows)


def test_attr_literals_round_trip(spark, tmp_path):
    """Typed-literal attribute statements round-trip: values with quotes,
    backslashes, tabs and newlines come back unescaped, datatypes derive
    from Spark column types, nulls drop, and the lines are spec-shaped."""
    from kgforge.io.ntriples import (
        XSD,
        ntriples_attr_lines,
        read_ntriples_attrs,
    )

    rows = [
        ("E1", 42, 'say "hi"\tback\\slash\nline', 3.5),
        # literal backslash immediately before 't': the naive sequential
        # unescape misread this as a tab (sentinel pass pins the fix)
        ("E2", 1, "a\\tb", 0.0),
        ("acme corp", 0, "plain", None),
        (None, 7, "dropped subject", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "entity_id string, out_degree int, note string, score double"
    )
    lines_df = ntriples_attr_lines(
        df, "entity_id", ["out_degree", "note", "score"]
    )
    lines = [r.line for r in lines_df.collect()]
    # spec shape: every line is IRI IRI "literal"^^<dt> .
    for ln in lines:
        assert re.fullmatch(
            r'<[^>]*> <[^>]*> "(?:[^"\\]|\\.)*"\^\^<[^>]*> \.', ln
        ), ln
        assert "\n" not in ln and "\t" not in ln
    # null subject and null score dropped: 3 entities × attrs − 1 null
    assert len(lines) == 8
    p = str(tmp_path / "attrs.nt")
    lines_df.write.mode("overwrite").text(p)
    back = read_ntriples_attrs(spark, p)
    got = {(r.subj_id, r.attr): (r.value, r.datatype) for r in back.collect()}
    assert got[("E1", "out_degree")] == ("42", f"{XSD}integer")
    assert got[("E1", "note")] == ('say "hi"\tback\\slash\nline', f"{XSD}string")
    assert got[("E1", "score")] == ("3.5", f"{XSD}double")
    assert got[("acme corp", "out_degree")] == ("0", f"{XSD}integer")
    assert got[("E2", "note")] == ("a\\tb", f"{XSD}string")  # NOT a tab
    assert ("acme corp", "score") not in got  # null attr dropped
    plan = lines_df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_rdf_star_edge_metadata_round_trip(spark, tmp_path):
    """Per-edge metadata (conf, day) round-trips through RDF-star
    quoted-triple statements: the quoted edge decodes exactly like the
    plain edge lines, datatypes derive from Spark types, nulls drop,
    and plain/junk lines are ignored by the star reader."""
    from kgforge.io.ntriples import (
        XSD,
        ntriples_star_lines,
        read_ntriples_star,
    )

    rows = [
        ("acme corp", "works at", "iron foods", 0.9, "2024-01-03"),
        ("天河科技", "negotiated with", "李娜", 0.75, None),
        (None, "x", "y", 1.0, "2024-01-01"),
    ]
    df = spark.createDataFrame(
        rows,
        "subj_id string, pred string, obj_id string, conf double, day string",
    )
    lines_df = ntriples_star_lines(df, ["conf", "day"])
    lines = [r.line for r in lines_df.collect()]
    assert len(lines) == 3  # 2 confs + 1 day (null day + null subj drop)
    for ln in lines:
        assert re.fullmatch(
            r'<<<[^>]*> <[^>]*> <[^>]*>>> <[^>]*> "(?:[^"\\]|\\.)*"'
            r"\^\^<[^>]*> \.",
            ln,
        ), ln
    p = str(tmp_path / "star.nt")
    lines_df.write.mode("overwrite").text(p)
    # a NEW file in the dataset dir (appending to a Spark part file
    # invalidates its .crc): plain triples and comments must be ignored
    with open(os.path.join(p, "part-junk.txt"), "w") as fh:
        fh.write("# comment\n<http://x> <http://y> <http://z> .\n")
    back = read_ntriples_star(spark, p)
    got = {
        (r.subj_id, r.pred, r.obj_id, r.meta): (r.value, r.datatype)
        for r in back.collect()
    }
    assert len(got) == 3  # the plain-triple and comment lines drop
    assert got[("acme corp", "works at", "iron foods", "conf")] == (
        "0.9", f"{XSD}double",
    )
    assert got[("acme corp", "works at", "iron foods", "day")] == (
        "2024-01-03", f"{XSD}string",
    )
    assert got[("天河科技", "negotiated with", "李娜", "conf")] == (
        "0.75", f"{XSD}double",
    )


def test_control_chars_datetime_and_odd_column_names(spark, tmp_path):
    """Review-pass pins: \x00/\x01/\x02 in literal values round-trip via
    UCHAR escapes (raw, they would collide with the reader's separator/
    sentinel), timestamps export the xsd:dateTime 'T' lexical form, odd
    column names percent-encode into valid predicate IRIs and decode
    back, plain (untyped) foreign literals read datatype as NULL, and
    empty column lists raise instead of IndexError."""
    import datetime

    import pytest as _pytest

    from kgforge.io.ntriples import (
        XSD,
        ntriples_attr_lines,
        ntriples_star_lines,
        read_ntriples_attrs,
    )

    rows = [("E1", "a\x01b\x02c\x00d", "x y",
             datetime.datetime(2024, 1, 3, 10, 30, 0))]
    df = spark.createDataFrame(
        rows, "entity_id string, note string, `out degree` string, ts timestamp"
    )
    lines_df = ntriples_attr_lines(
        df, "entity_id", ["note", "out degree", "ts"]
    )
    lines = sorted(r.line for r in lines_df.collect())
    # UTC epoch-derived lexical form: 'T' separator, microseconds, 'Z'
    assert any('"2024-01-03T10:30:00.000000Z"^^<' + XSD + "dateTime" in ln
               for ln in lines)
    assert any("attr/out%20degree>" in ln for ln in lines)
    for ln in lines:  # no raw control chars or spaces inside IRIs
        assert "\x00" not in ln and "\x01" not in ln and "\x02" not in ln
    p = str(tmp_path / "odd.nt")
    lines_df.write.mode("overwrite").text(p)
    with open(os.path.join(p, "part-plain.txt"), "w") as fh:
        fh.write('<http://x> <http://y> "plain literal" .\n')
    back = read_ntriples_attrs(spark, p)
    got = {(r.subj_id, r.attr): (r.value, r.datatype) for r in back.collect()}
    assert got[("E1", "note")] == ("a\x01b\x02c\x00d", f"{XSD}string")
    assert got[("E1", "out degree")] == ("x y", f"{XSD}string")
    assert got[("E1", "ts")] == (
        "2024-01-03T10:30:00.000000Z", f"{XSD}dateTime",
    )
    assert got[("http://x", "http://y")] == ("plain literal", None)
    with _pytest.raises(ValueError, match="empty"):
        ntriples_attr_lines(df, "entity_id", [])
    with _pytest.raises(ValueError, match="empty"):
        ntriples_star_lines(df.withColumnRenamed("entity_id", "subj_id")
                            .withColumn("pred", df.note)
                            .withColumn("obj_id", df.note), [])


def test_incremental_daily_export(spark, tmp_path):
    """export_ntriples_by_day exports only uncommitted day partitions
    (resume discipline of the pipeline, applied to the interchange
    seam), the day predicate prunes the scan, and the full read-back
    equals the edge set."""
    from kgforge.io.ntriples import export_ntriples_by_day

    edges_path = str(tmp_path / "edges_by_day")
    out_path = str(tmp_path / "nt_by_day")
    rows1 = [("a", "p", "b", "2024-01-01"), ("c", "p", "d", "2024-01-02")]
    df1 = spark.createDataFrame(
        rows1, "subj_id string, pred string, obj_id string, day string"
    )
    df1.write.partitionBy("day").mode("overwrite").parquet(edges_path)
    assert export_ntriples_by_day(spark, edges_path, out_path) == [
        "2024-01-01", "2024-01-02",
    ]
    # re-run: nothing new
    assert export_ntriples_by_day(spark, edges_path, out_path) == []
    # a third day lands; only it exports (existing day files untouched)
    df2 = spark.createDataFrame(
        [("e", "q", "f", "2024-01-03")],
        "subj_id string, pred string, obj_id string, day string",
    )
    df2.write.partitionBy("day").mode("append").parquet(edges_path)
    before = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(out_path) for f in fs
        if "day=2024-01-01" in r or "day=2024-01-02" in r
    }
    assert export_ntriples_by_day(spark, edges_path, out_path) == ["2024-01-03"]
    after = {
        p: os.path.getmtime(p) for p in before
    }
    assert before == after  # prior days not rewritten
    got = sorted(
        tuple(r) for r in read_ntriples(spark, out_path + "/day=*").collect()
    )
    assert got == sorted(
        [(s, p, o) for (s, p, o, _d) in rows1] + [("e", "q", "f")]
    )
    # a torn manifest (crash mid-commit) re-exports that day
    mp = os.path.join(out_path, "day=2024-01-03", "_kgforge_manifest.json")
    with open(mp, "w") as fh:
        fh.write("{not json")
    assert export_ntriples_by_day(spark, edges_path, out_path) == ["2024-01-03"]


def test_datetime_fractional_infinity_and_null_day_skip(spark, tmp_path):
    """Review-pass-5 pins: fractional seconds survive the dateTime
    lexical form, xsd:double infinities spell INF/-INF, and the daily
    exporter skips the __HIVE_DEFAULT_PARTITION__ directory instead of
    committing an empty dump for NULL-day edges."""
    import datetime

    from kgforge.io.ntriples import (
        XSD,
        export_ntriples_by_day,
        ntriples_attr_lines,
    )

    df = spark.createDataFrame(
        [("E1", datetime.datetime(2024, 1, 3, 10, 30, 0, 250000),
          float("inf"), float("-inf"))],
        "entity_id string, ts timestamp, hi double, lo double",
    )
    lines = sorted(
        r.line for r in ntriples_attr_lines(
            df, "entity_id", ["ts", "hi", "lo"]
        ).collect()
    )
    assert any('"2024-01-03T10:30:00.250000Z"' in ln for ln in lines)
    assert any(f'"INF"^^<{XSD}double' in ln for ln in lines)
    assert any(f'"-INF"^^<{XSD}double' in ln for ln in lines)

    edges_path = str(tmp_path / "edges_by_day")
    rows = [("a", "p", "b", "2024-01-01"), ("x", "p", "y", None)]
    sdf = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string, day string"
    )
    sdf.write.partitionBy("day").mode("overwrite").parquet(edges_path)
    assert os.path.isdir(
        os.path.join(edges_path, "day=__HIVE_DEFAULT_PARTITION__")
    )
    out_path = str(tmp_path / "nt_by_day")
    assert export_ntriples_by_day(spark, edges_path, out_path) == ["2024-01-01"]
    # the null-day directory was skipped, not committed empty
    assert not os.path.exists(
        os.path.join(out_path, "day=__HIVE_DEFAULT_PARTITION__")
    )
