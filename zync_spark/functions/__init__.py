"""Large-scale training-data-pipeline operators (beyond the reference's own
surface, per BASELINE.json north star): text analysis, deduplication,
similarity search, multimodal column plumbing.

All hot-path expressions use built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen eligible); Python appears only in Arrow-batched
`mapInPandas` where semantics genuinely require it (multimodal decode).
"""
