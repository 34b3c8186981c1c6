from .query_condition import QueryCondition, compile_condition

__all__ = ["QueryCondition", "compile_condition"]
