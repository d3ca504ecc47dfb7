"""Structured Streaming layer: the reference's Lambda+SQS pipeline
collapsed into Spark streaming jobs (SURVEY.md §3.1-§3.2 — one
streaming DAG replaces data_batcher → transformer → lake_writer →
metadata writer; the Avro wire hop and SNS fanout disappear)."""
