"""End-to-end pipelines (reference's batch entry points re-expressed)."""

from .index_build import build_index  # noqa: F401
