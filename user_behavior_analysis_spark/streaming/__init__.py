"""Structured Streaming layer: event-time window jobs, watermarks, and
stateful (CEP/timer) operators — the reference's DataStream semantics on
Spark's micro-batch engine."""
