"""Minimal mmdet shim for the reference's BaseRoIExtractor import."""

from tests.reference_shims.mmdet import models  # noqa: F401
