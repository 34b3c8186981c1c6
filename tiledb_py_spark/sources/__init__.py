from .fragment_writer import write_fragment_pandas, write_fragment_spark

__all__ = ["write_fragment_pandas", "write_fragment_spark"]
