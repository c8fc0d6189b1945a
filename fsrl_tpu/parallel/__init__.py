"""Distributed layer (new design, SURVEY.md §2.9): device mesh helpers,
sharding placement, and collective-friendly replication utilities."""
