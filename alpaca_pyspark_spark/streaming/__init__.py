"""Structured Streaming layer.

The reference is batch-only, but its trades table is stream-shaped
(SURVEY.md §1.1) and its docs delegate stream processing to Spark; we
provide the two streaming capabilities the analytic surface implies:

- :mod:`.sessions` — watermarked session-window aggregation (the
  streaming twin of the batch gaps-and-islands q14);
- :mod:`.source`   — a ``SimpleDataSourceStreamReader`` variant of the
  trades connector: a time-cursor poller over the same paginated REST
  endpoint + wire tables.
"""
