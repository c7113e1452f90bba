from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp, resolve_label_matchers
from tagtree_spark.tsdb.model import (
    LABEL_NAMES,
    build_postings,
    build_samples,
    build_series,
    with_labels,
)

__all__ = [
    "LabelMatcher",
    "MatchOp",
    "resolve_label_matchers",
    "LABEL_NAMES",
    "build_postings",
    "build_samples",
    "build_series",
    "with_labels",
]
