"""Registry bindings: (spark_fn, oracle_sql) pairs per SURVEY.md §2 operator.

- ``metadata.py``  — the reference's metadata-analytics surface (A/J/O/P/S/W/U/F rows)
- ``analytics.py`` — general relational capability + streaming-equivalent kernels
- ``pipeline.py``  — LLM-data-pipeline extensions (dedup / ANN / text / multimodal)
"""
