"""Single-process reference-semantics oracle used only by tests."""

from .simple import OracleIndex

__all__ = ["OracleIndex"]
