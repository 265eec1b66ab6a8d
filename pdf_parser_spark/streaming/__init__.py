"""Structured Streaming surface of the extraction engine.

The reference is batch-only (SURVEY.md section 2.8); this module is the
north-rule generalization: the same turn-local extraction operator runs
unchanged under ``readStream``/``writeStream`` (checkpointed exactly-once
file sink — the streaming twin of the batch manifest/resume protocol),
plus watermarked windowed aggregation for late events.
"""
