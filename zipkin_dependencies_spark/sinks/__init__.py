from .parquet import write_links

__all__ = ["write_links"]
