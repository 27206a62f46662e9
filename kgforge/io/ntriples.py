"""W3C N-Triples export/import for the canonical edge table.

Interchange seam of the KG engine: the reference pipeline ends at a model
artifact (reference: dbpunctuator/training/train.py — its terminal sink),
while a KG-construction engine's terminal sink is the graph itself, so the
engine exports the edge table in the standard line-based RDF syntax
(https://www.w3.org/TR/n-triples/ — public spec) that every triple store
ingests, and reads it back.

Spark-first design (SURVEY §2.11 discipline):

- Every transformation is a JVM column expression — ``url_encode`` /
  ``url_decode`` (Spark ≥3.5 built-ins), ``concat``, ``regexp_extract``.
  No Python UDF touches the edge stream; the export of N edges is one
  narrow map stage (plan-gated in tests/test_ntriples.py).
- Entity ids and predicate surfaces become IRIs by percent-encoding into
  a ``{base}entity/…`` / ``{base}pred/…`` namespace. Java form-encoding
  writes space as ``+``; the single post-replace to ``%20`` makes the
  result valid in an IRI. Decoding is the exact inverse (``url_decode``
  handles ``%20`` and ``%2B`` correctly), so export → import round-trips
  bit-identically for arbitrary ids (spaces, quotes, CJK, tabs — gated).
- The writer is a plain partitioned text write: at crawl scale the edge
  table is day-partitioned upstream (graph/temporal.py), so one text file
  per input partition is the right shape — no coalesce(1) bottleneck.

Edge line shape (subject, predicate and object are IRIs; per-ENTITY
attributes travel as typed literals via ``ntriples_attr_lines`` and
per-EDGE metadata like ``conf`` as RDF-star quoted-triple statements via
``ntriples_star_lines`` — both below):

    <{base}entity/E000001> <{base}pred/works%20at> <{base}entity/E000002> .
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BASE = "https://kgforge.invalid/"  # RFC 2606 reserved TLD


def _iri(kind: str, col: str, base: str):
    """IRI column for an id/predicate surface: percent-encode (form
    encoding, then ``+`` → ``%20`` so spaces are IRI-legal) into the
    ``{base}{kind}/`` namespace."""
    return F.concat(
        F.lit(f"<{base}{kind}/"),
        F.replace(F.url_encode(F.col(col)), F.lit("+"), F.lit("%20")),
        F.lit(">"),
    )


def ntriples_lines(
    edges: DataFrame,
    base: str = DEFAULT_BASE,
    subj_col: str = "subj_id",
    pred_col: str = "pred",
    obj_col: str = "obj_id",
) -> DataFrame:
    """edges(subj_id, pred, obj_id, …) → one-column DataFrame ``line``
    of N-Triples statements. Narrow (no shuffle); null-safe (rows with a
    null term are dropped — N-Triples has no null)."""
    return (
        edges.where(
            F.col(subj_col).isNotNull()
            & F.col(pred_col).isNotNull()
            & F.col(obj_col).isNotNull()
        )
        .select(
            F.concat_ws(
                " ",
                _iri("entity", subj_col, base),
                _iri("pred", pred_col, base),
                _iri("entity", obj_col, base),
                F.lit("."),
            ).alias("line")
        )
    )


def write_ntriples(
    edges: DataFrame, path: str, base: str = DEFAULT_BASE, **cols
) -> None:
    """Export ``edges`` as a partitioned ``.nt`` text dataset at ``path``.
    One output file per input partition — the upstream day-partitioning
    (or repartition) governs file counts; no driver-side funnel."""
    ntriples_lines(edges, base=base, **cols).write.mode("overwrite").text(path)


# one N-Triples statement whose three terms are IRIs; permissive on
# whitespace (the space before the terminal '.' is OPTIONAL per the W3C
# grammar — '>' already closes the IRIREF token) and on a trailing
# comment after the dot; anchored so junk lines (or literals, which this
# engine never writes) are rejected rather than half-parsed
_NT_LINE = r"^\s*<([^>]*)>\s+<([^>]*)>\s+<([^>]*)>\s*\.\s*(?:#.*)?$"
# \x01 is a control char and therefore excluded from IRIREF by the spec,
# so it is a safe group separator for the single-pass extraction below
_SEP = "\x01"


def read_ntriples(
    spark: SparkSession, path: str, base: str = DEFAULT_BASE
) -> DataFrame:
    """Inverse of write_ntriples: parse the ``.nt`` dataset back to
    edges(subj_id, pred, obj_id). Lines that do not match the IRI-only
    statement shape (e.g. comments) are dropped; IRIs outside the
    ``{base}`` namespace — and base-namespace IRIs whose percent
    encoding is malformed (``…/50%off``) — are kept verbatim so foreign
    N-Triples files still load. The regex runs twice per line (one
    rlike gate + one replace extracting all three groups), not once per
    term."""
    raw = spark.read.text(path)
    groups = F.split(
        F.regexp_replace("value", _NT_LINE, f"$1{_SEP}$2{_SEP}$3"), _SEP
    )
    parts = (
        raw.where(F.col("value").rlike(_NT_LINE))
        .select(groups.alias("g"))
        .where(F.size("g") == 3)
        .select(
            F.col("g")[0].alias("s"),
            F.col("g")[1].alias("p"),
            F.col("g")[2].alias("o"),
        )
    )

    return parts.select(
        _decode_iri(F.col("s"), "entity", base).alias("subj_id"),
        _decode_iri(F.col("p"), "pred", base).alias("pred"),
        _decode_iri(F.col("o"), "entity", base).alias("obj_id"),
    )


# ---------------------------------------------------------------------------
# Typed-literal attribute export/import (BACKLOG #16): entity attributes
# (degrees, first/last crawl day, counts) travel beside the IRI-only edge
# export as W3C literal statements:
#     <{base}entity/E1> <{base}attr/out_degree> "42"^^<{XSD}integer> .
# Literal escaping per the N-Triples STRING_LITERAL_QUOTE production,
# plus UCHAR escapes for the two control chars this module uses
# internally — all JVM `replace` chains.
# ---------------------------------------------------------------------------

XSD = "http://www.w3.org/2001/XMLSchema#"

_XSD_FOR_SPARK = {
    "string": "string",
    "int": "integer",
    "bigint": "integer",
    "smallint": "integer",
    "tinyint": "integer",
    "double": "double",
    "float": "double",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "dateTime",
}

# the readers split extracted groups on \x01, so a raw \x01 can never
# reach _unescape_literal (a foreign line carrying one fails the group-
# count gate and drops — documented out-of-scope, legal-but-rare since
# the grammar excludes only quote/backslash/LF/CR). That makes \x01 the
# one safe HEAD for multi-char placeholders during unescape; OUR writer
# UCHAR-encodes \x00/\x01/\x02 so they never appear raw in output.
_P_BS, _P0, _P1, _P2 = "\x01B", "\x01Z0", "\x01Z1", "\x01Z2"


def _literal_value(col: str, dtype: str):
    """Lexical form for one attribute column.

    xsd:dateTime is built from the exact UTC epoch micros
    (``unix_micros``), NOT ``date_format`` — that renders in the session
    timezone with no zone designator, so the same instant would export a
    shifted wall-clock on a non-UTC cluster (the edges_with_day
    discipline, stages/canonicalize.py) — and carries full microseconds
    plus the 'Z' designator. xsd:double's lexical space spells infinities
    INF/-INF (Spark's cast says "Infinity", which conforming stores
    reject); NaN matches already. Everything else casts."""
    if dtype == "timestamp":
        us = F.unix_micros(F.col(col))
        day = F.floor(us / F.lit(86_400_000_000))
        in_day = us - day * F.lit(86_400_000_000)
        return F.concat(
            F.date_add(F.to_date(F.lit("1970-01-01")), day.cast("int"))
            .cast("string"),
            F.lit("T"),
            F.format_string(
                "%02d:%02d:%02d.%06dZ",
                F.floor(in_day / F.lit(3_600_000_000)),
                F.floor(in_day / F.lit(60_000_000)) % F.lit(60),
                F.floor(in_day / F.lit(1_000_000)) % F.lit(60),
                in_day % F.lit(1_000_000),
            ),
        )
    if dtype in ("double", "float"):
        s = F.col(col).cast("string")
        return (
            F.when(s == "Infinity", F.lit("INF"))
            .when(s == "-Infinity", F.lit("-INF"))
            .otherwise(s)
        )
    return F.col(col).cast("string")


def _escape_literal(col: str, dtype: str = "string"):
    out = _literal_value(col, dtype)
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t"),
                     # UCHAR for the module's internal control chars (the
                     # backslashes these introduce are fresh, hence AFTER
                     # the backslash-doubling replace)
                     ("\x00", "\\u0000"), ("\x01", "\\u0001"),
                     ("\x02", "\\u0002")):
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def _unescape_literal(col):
    """Inverse of _escape_literal. Escaped backslashes hide behind a
    placeholder FIRST (else a literal backslash-then-t on the wire would
    be misread as a tab); UCHAR sequences decode via placeholders too,
    because their outputs (\\x00/\\x01/\\x02, a backslash) could
    otherwise collide with later replace patterns. Placeholders all head
    with \\x01, which cannot occur raw in the input (see above), and
    the \\x01-PRODUCING placeholder decodes LAST so a decoded \\x01
    can never splice with following text into another placeholder."""
    out = F.replace(col, F.lit("\\\\"), F.lit(_P_BS))
    for esc, raw_ch in (("\\t", "\t"), ("\\r", "\r"), ("\\n", "\n"),
                        ('\\"', '"')):
        out = F.replace(out, F.lit(esc), F.lit(raw_ch))
    for esc, ph in (("\\u0000", _P0), ("\\u0001", _P1), ("\\u0002", _P2)):
        out = F.replace(out, F.lit(esc), F.lit(ph))
    out = F.replace(out, F.lit(_P0), F.lit("\x00"))
    out = F.replace(out, F.lit(_P2), F.lit("\x02"))
    out = F.replace(out, F.lit(_P_BS), F.lit("\\"))
    return F.replace(out, F.lit(_P1), F.lit("\x01"))


def _decode_iri(col, kind: str, base: str):
    """Shared IRI decode: strip the ``{base}{kind}/`` namespace and
    percent-decode (try_url_decode → NULL on malformed sequences, fall
    back to the verbatim IRI); foreign IRIs pass through unchanged."""
    prefix = f"{base}{kind}/"
    local = F.substring(col, len(prefix) + 1, 1 << 24)
    return F.when(
        col.startswith(prefix),
        F.coalesce(
            F.try_url_decode(F.replace(local, F.lit("+"), F.lit("%2B"))),
            col,
        ),
    ).otherwise(col)


def _encoded_name(name: str) -> str:
    """Percent-encode a column name for use in a predicate IRI (driver-
    side — names are plan-time constants). A name like "out degree" or
    "conf>raw" would otherwise emit an invalid IRIREF."""
    from urllib.parse import quote

    return quote(name, safe="")


def ntriples_attr_lines(
    df: DataFrame,
    subj_col: str,
    attr_cols: list[str],
    base: str = DEFAULT_BASE,
) -> DataFrame:
    """One N-Triples literal statement per (entity, attribute): subject
    IRI as in ntriples_lines, predicate in the ``{base}attr/`` namespace,
    object a typed literal whose XSD datatype derives from the Spark
    column type. Null attributes are dropped (RDF has no null). Narrow —
    one JVM map over the table, stacked per attribute then unioned by
    Catalyst into a single scan."""
    if not attr_cols:
        raise ValueError("attr_cols is empty — nothing to export")
    dtypes = dict(df.dtypes)
    parts = []
    for c in attr_cols:
        dtype = dtypes.get(c, "string")
        xsd = _XSD_FOR_SPARK.get(dtype, "string")
        parts.append(
            df.where(F.col(subj_col).isNotNull() & F.col(c).isNotNull())
            .select(
                F.concat(
                    _iri("entity", subj_col, base),
                    F.lit(f' <{base}attr/{_encoded_name(c)}> "'),
                    _escape_literal(c, dtype),
                    F.lit(f'"^^<{XSD}{xsd}> .'),
                ).alias("line")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# literal statement: IRI subject, IRI predicate, quoted literal with the
# escape sequences still encoded, optional ^^<datatype>
_NT_LIT_LINE = (
    r"^\s*<([^>]*)>\s+<([^>]*)>\s+"
    r'"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>)?\s*\.\s*(?:#.*)?$'
)


def _null_if_empty(col):
    # Java regexp_replace substitutes "" for a non-participating optional
    # group — map it back to NULL so plain (untyped) literals read as
    # datatype-IS-NULL, the natural caller check
    return F.when(col == "", F.lit(None)).otherwise(col)


def read_ntriples_attrs(
    spark: SparkSession, path: str, base: str = DEFAULT_BASE
) -> DataFrame:
    """Inverse of ntriples_attr_lines → (subj_id, attr, value, datatype).
    Values come back unescaped as strings (the datatype column carries
    the XSD IRI for the caller to cast, NULL for plain literals);
    IRI-object and junk lines drop. Same two-regex-per-line budget as
    read_ntriples."""
    raw = spark.read.text(path)
    groups = F.split(
        F.regexp_replace(
            "value", _NT_LIT_LINE, f"$1{_SEP}$2{_SEP}$3{_SEP}$4"
        ),
        _SEP,
    )
    parts = (
        raw.where(F.col("value").rlike(_NT_LIT_LINE))
        .select(groups.alias("g"))
        .where(F.size("g") == 4)
    )
    return parts.select(
        _decode_iri(F.col("g")[0], "entity", base).alias("subj_id"),
        _decode_iri(F.col("g")[1], "attr", base).alias("attr"),
        _unescape_literal(F.col("g")[2]).alias("value"),
        _null_if_empty(F.col("g")[3]).alias("datatype"),
    )


# ---------------------------------------------------------------------------
# RDF-star edge-metadata export/import: per-EDGE attributes (confidence,
# crawl day) cannot ride plain N-Triples without 4-triples-per-statement
# reification, so they travel in the RDF-star quoted-triple form
# (https://www.w3.org/2021/12/rdf-star.html — public draft adopted by the
# major triple stores):
#     <<<{base}entity/E1> <{base}pred/p> <{base}entity/E2>>>
#         <{base}meta/conf> "0.9"^^<{XSD}double> .
# ---------------------------------------------------------------------------


def ntriples_star_lines(
    edges: DataFrame,
    meta_cols: list[str],
    base: str = DEFAULT_BASE,
    subj_col: str = "subj_id",
    pred_col: str = "pred",
    obj_col: str = "obj_id",
) -> DataFrame:
    """One RDF-star statement per (edge, metadata column): the quoted
    triple is the subject, the metadata value a typed literal. Null
    metadata drops; the edge itself still travels via ntriples_lines
    (stores that ignore RDF-star lose only the annotations)."""
    if not meta_cols:
        raise ValueError("meta_cols is empty — nothing to export")
    dtypes = dict(edges.dtypes)
    quoted = F.concat(
        F.lit("<<"),
        F.concat_ws(
            " ",
            _iri("entity", subj_col, base),
            _iri("pred", pred_col, base),
            _iri("entity", obj_col, base),
        ),
        F.lit(">>"),
    )
    parts = []
    for c in meta_cols:
        dtype = dtypes.get(c, "string")
        xsd = _XSD_FOR_SPARK.get(dtype, "string")
        parts.append(
            edges.where(
                F.col(subj_col).isNotNull()
                & F.col(pred_col).isNotNull()
                & F.col(obj_col).isNotNull()
                & F.col(c).isNotNull()
            ).select(
                F.concat(
                    quoted,
                    F.lit(f' <{base}meta/{_encoded_name(c)}> "'),
                    _escape_literal(c, dtype),
                    F.lit(f'"^^<{XSD}{xsd}> .'),
                ).alias("line")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_NT_STAR_LINE = (
    r"^\s*<<\s*<([^>]*)>\s+<([^>]*)>\s+<([^>]*)>\s*>>\s+<([^>]*)>\s+"
    r'"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>)?\s*\.\s*(?:#.*)?$'
)


def read_ntriples_star(
    spark: SparkSession, path: str, base: str = DEFAULT_BASE
) -> DataFrame:
    """Inverse of ntriples_star_lines → (subj_id, pred, obj_id, meta,
    value, datatype): the quoted edge decoded like read_ntriples, the
    metadata key decoded from its ``{base}meta/`` namespace, the literal
    unescaped (shared _unescape_literal discipline)."""
    raw = spark.read.text(path)
    groups = F.split(
        F.regexp_replace(
            "value",
            _NT_STAR_LINE,
            _SEP.join(f"${i}" for i in range(1, 7)),
        ),
        _SEP,
    )
    parts = (
        raw.where(F.col("value").rlike(_NT_STAR_LINE))
        .select(groups.alias("g"))
        .where(F.size("g") == 6)
    )
    return parts.select(
        _decode_iri(F.col("g")[0], "entity", base).alias("subj_id"),
        _decode_iri(F.col("g")[1], "pred", base).alias("pred"),
        _decode_iri(F.col("g")[2], "entity", base).alias("obj_id"),
        _decode_iri(F.col("g")[3], "meta", base).alias("meta"),
        _unescape_literal(F.col("g")[4]).alias("value"),
        _null_if_empty(F.col("g")[5]).alias("datatype"),
    )


def export_ntriples_by_day(
    spark: SparkSession,
    edges_path: str,
    out_path: str,
    base: str = DEFAULT_BASE,
) -> list[str]:
    """Incremental daily interchange dump: export each ``day=…``
    partition of the materialized edge table (graph/temporal.py) to
    ``{out_path}/day=…`` as N-Triples, skipping days already exported —
    the interchange twin of the pipeline's resume discipline. Each day's
    read carries the day predicate (a PartitionFilter: scan ∝ new days,
    never the table) and commits via the shared manifest helper, so a
    crash mid-day re-exports only that day. Returns the days exported
    this call."""
    import os as _os

    from kgforge.io.tables import commit_manifest, is_committed

    days = sorted(
        d[len("day="):]
        for d in _os.listdir(edges_path)
        # a day=__HIVE_DEFAULT_PARTITION__ directory holds NULL-day edges
        # (warc_ts failed the long cast upstream) — a string equality on
        # "day" can never select them, so exporting "that day" would
        # commit an EMPTY dump and silently lose the rows forever; skip
        # the directory instead (null-day edges are a pipeline anomaly,
        # not a day)
        if d.startswith("day=") and "__HIVE_DEFAULT_PARTITION__" not in d
    )
    edges = spark.read.parquet(edges_path)
    exported: list[str] = []
    for day in days:
        day_out = _os.path.join(out_path, f"day={day}")
        if is_committed(day_out, stage="ntriples_export"):
            continue
        day_edges = edges.where(F.col("day") == day)
        write_ntriples(day_edges, day_out, base=base)
        # row_count from the PRUNED parquet partition, not a re-read of
        # the just-written text (which would double the export I/O — the
        # run_pipeline --export-ntriples discipline)
        n = ntriples_lines(day_edges, base=base).count()
        commit_manifest(
            day_out,
            {"stage": "ntriples_export", "status": "committed",
             "row_count": n},
        )
        exported.append(day)
    return exported
