"""Large-scale training-data pipeline operators (SURVEY.md §2.5):
text analysis, deduplication, similarity search, multimodal plumbing.

All hot paths use built-in pyspark.sql.functions (JVM, whole-stage
codegen); Pandas UDFs appear only where genuinely needed (multimodal
decode) and are Arrow-batched.
"""
