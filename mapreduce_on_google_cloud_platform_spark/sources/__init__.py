from .tables import TABLES, load_table, register_views
from .text_io import read_text_documents, write_reference_text

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_text_documents",
    "write_reference_text",
]
