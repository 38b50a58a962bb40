"""Structured Streaming harness + replay source (SURVEY.md Phase 6)."""
