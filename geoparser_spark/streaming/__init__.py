"""Incremental processing seam (the reference has no streaming layer —
SURVEY.md §2.5; this module provides the Trigger.AvailableNow path)."""
