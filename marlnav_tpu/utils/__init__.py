"""Transforms, seeding, persistence and checkpointing utilities."""
