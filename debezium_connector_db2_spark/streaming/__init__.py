"""Micro-batch orchestration: engine loop, checkpoints, lineage."""
