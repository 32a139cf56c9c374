"""Data pipelines: pathology report mining + synthetic feature generation."""

from .pathology import (
    NEGATION_PATTERNS,
    check_pathology_presence,
    find_single_pathology_cases,
    load_xray_parquet,
)
from .synthetic import XRAY_PATHOLOGY_NAMES, make_synthetic_clip_features

__all__ = [
    "NEGATION_PATTERNS",
    "check_pathology_presence",
    "find_single_pathology_cases",
    "load_xray_parquet",
    "XRAY_PATHOLOGY_NAMES",
    "make_synthetic_clip_features",
]
