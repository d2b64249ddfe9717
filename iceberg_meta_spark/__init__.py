"""iceberg-meta-spark: a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``MandlaSibanda196/iceberg-meta`` (an
Iceberg *metadata* analytics CLI/TUI), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Architecture (see SURVEY.md §7):

- ``operators/``  — pure ``DataFrame -> DataFrame`` kernels (no I/O, no collect)
- ``sources/``    — adapters producing metadata-shaped DataFrames (parquet
                    fixtures; Iceberg metadata tables when a runtime jar exists)
- ``functions/``  — scalar Column-expression helpers (display formatting etc.)
- ``plans/``      — composite command DAGs (health / summary / diff reports)
- ``streaming/``  — Structured Streaming surface (snapshot watch, event windows)
- ``pipeline/``   — LLM-data-pipeline extensions (dedup, ANN, text, multimodal)

Every kernel is designed for a 1000-executor / 100 TB deployment: declarative
plans (Catalyst optimizes), broadcast for small dimensions, no global
single-partition windows on unbounded inputs, no driver-side collects.
"""

__version__ = "0.1.0"
