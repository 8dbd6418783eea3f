"""Composed batch pipelines (the reference's CLI-level jobs)."""

from . import export_job  # noqa: F401
