"""Operator library: Tier S relational completion + Tier X pipeline
extensions (SURVEY.md §2.2/§2.3)."""

from . import (bpe, curation, dedup, graph, multimodal, pipeline,
               relational, sampling, similarity, sketch, stats, textstats)
from .relational import (asof_join, distinct, except_, group_agg, intersect,
                         join, limit, order_by, pivot, range_join, top_k,
                         union, window_over)

__all__ = [
    "relational", "dedup", "similarity", "textstats", "multimodal",
    "bpe", "curation", "graph", "pipeline", "sampling", "sketch",
    "stats",
    "join", "group_agg", "distinct", "order_by", "limit", "top_k",
    "union", "intersect", "except_", "window_over", "pivot",
    "asof_join", "range_join",
]
