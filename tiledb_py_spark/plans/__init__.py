from .range_ir import DimRanges, QueryPlan, ranges_to_predicate

__all__ = ["DimRanges", "QueryPlan", "ranges_to_predicate"]
