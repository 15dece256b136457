from .numeric import dsum, davg  # noqa: F401
"""Function library: deterministic numeric aggregation (numeric.py)
and reference-semantics helpers (ranges.py)."""
