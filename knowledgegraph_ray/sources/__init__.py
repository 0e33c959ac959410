from .pages import generate_pages, write_pages, PAGES_SCHEMA

__all__ = ["generate_pages", "write_pages", "PAGES_SCHEMA"]
