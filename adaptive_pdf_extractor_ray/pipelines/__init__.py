"""End-to-end pipelines wiring sources, stages and state together."""
