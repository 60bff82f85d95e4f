"""Checkpoint / resume / lineage for long-running distributed builds."""

from .checkpoint import CheckpointedBuild

__all__ = ["CheckpointedBuild"]
