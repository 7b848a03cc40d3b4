"""Document sources (SURVEY.md §2 A1–A3)."""

from pdf2dataset_spark.sources.binary_dir import scan_documents
from pdf2dataset_spark.sources.memory import from_dict

__all__ = ["scan_documents", "from_dict"]
