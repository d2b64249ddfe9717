"""Registry bindings: (spark_fn, oracle_sql) pairs per SURVEY.md §2 operator.

- ``metadata.py``   — the reference's metadata-analytics surface (A/J/O/P/S/W/U/F rows)
- ``analytics.py``  — general relational capability + streaming-equivalent kernels
- ``pipeline.py``   — LLM-data-pipeline extensions (dedup / ANN / text / multimodal)
- ``extensions.py`` — loader for the extension families (split from one 7k-line
  module in round 7; pins the family's canonical registration order):
  ``meta_ext`` (maintenance/layout planning), ``relational`` (TPC-H-ish),
  ``events`` / ``users`` (behavioral analytics), ``ann`` (embedding/ANN),
  ``text`` (corpus/text), ``dedup_ext`` (dedup beyond pipeline.py),
  ``privacy`` (k-anonymity/l-diversity/PII), ``scale`` (preflight diagnostics),
  ``_ext_shared`` (multi-family helpers)
"""
