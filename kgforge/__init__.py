"""kgforge — a PySpark-native knowledge-graph construction engine.

Front stage reproduces the text-normalization semantics of the reference
``distilbert-punctuator`` (FerdinandZhong/punctuator, surveyed in SURVEY.md);
downstream stages (sentence split, OpenIE-style triple extraction, entity
linking, connected-components canonicalization, partitioned graph
materialize with per-partition lineage) are Spark-first designs per
SURVEY.md §2.11 / §7.
"""

__version__ = "0.1.0"
