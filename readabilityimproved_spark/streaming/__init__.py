"""Structured Streaming variants of the extraction + event pipelines."""
