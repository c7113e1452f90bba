"""tagtree_spark — a PySpark-native analytics engine with the query surface
of Jimx-/tagtree (a tagging/inverted-label index for time-series), rebuilt
Spark-first, plus LLM-data-pipeline extension operators.

Layout:
  session     — SparkSession tuning helpers (UTC, AQE, shuffle partitions)
  io          — parquet table loaders for the driver testdata layout
  tsdb        — the tagtree data model: series/postings/samples + matcher algebra
  operators   — relational, dedup, similarity, text, multimodal operators
  functions   — deterministic cross-engine hash/scalar helpers
  streaming   — structured-streaming ingest path (WAL/compaction analogue)
  engine      — TagTreeEngine facade: the reference's IndexServer API 1:1
  plans       — physical-plan inspection helpers (pushdown/exchange checks)
  queries     — the oracle-checked query inventory (q01-q23 core, queries_ext q24+)

Reference parity: see SURVEY.md §2 for the operator inventory; every public
function cites the reference file:line it re-expresses.
"""

__version__ = "0.1.0"
