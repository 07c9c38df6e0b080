from .pages import generate_pages, write_pages_parquet, PageGenInfo

__all__ = ["generate_pages", "write_pages_parquet", "PageGenInfo"]
