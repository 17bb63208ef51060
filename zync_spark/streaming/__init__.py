"""Structured Streaming surface: the Kafka ingest/egress pipelines of the
reference (SURVEY §3.2/§3.3) plus batch↔stream bridges used for testing
without a live broker."""
