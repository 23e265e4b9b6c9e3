"""Structured Streaming mode (optional — the north rule's contract is batch
over snapshot ranges; SURVEY §7 keeps the plan layer source-agnostic so
``readStream`` slots in)."""
