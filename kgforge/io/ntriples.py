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

Line shape (subject, predicate and object are IRIs; the optional
``conf`` export would need RDF reification or RDF-star — deliberately out
of scope, the confidence stays in the parquet edge table):

    <{base}entity/E000001> <{base}pred/works+at...> <{base}entity/E000002> .
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

    def _term(col: str, kind: str):
        prefix = f"{base}{kind}/"
        enc = F.col(col)
        local = F.substring(enc, len(prefix) + 1, 1 << 24)
        return F.when(
            enc.startswith(prefix),
            # try_url_decode → NULL on malformed percent sequences; fall
            # back to the verbatim IRI instead of aborting the read
            F.coalesce(
                F.try_url_decode(
                    F.replace(local, F.lit("+"), F.lit("%2B"))
                ),
                enc,
            ),
        ).otherwise(enc)

    return parts.select(
        _term("s", "entity").alias("subj_id"),
        _term("p", "pred").alias("pred"),
        _term("o", "entity").alias("obj_id"),
    )
