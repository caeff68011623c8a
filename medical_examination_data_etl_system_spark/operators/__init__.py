"""LLM-data-pipeline operators (driver mandate, SURVEY.md §2b):
deduplication, similarity search, text analysis, multimodal columns.

All hot paths are built-in column expressions or Arrow-batched Pandas
UDFs — no row-at-a-time Python. Each operator documents its 100 TB
posture (what shuffles, what broadcasts, where skew can bite).
"""
