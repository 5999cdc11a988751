"""Structured Streaming ingest (SURVEY.md §2.10).

The reference has no data-plane streaming (its WebSocket streams LLM tokens,
app/main.py:3319-3322); this is the Spark-native extension: continuous
ingest of an upload directory through the same parse->chunk->embed->upsert
stages as the batch job.
"""
