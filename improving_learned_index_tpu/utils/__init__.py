from .text_utils import get_unique_query_terms, merge_document_and_queries

__all__ = ["get_unique_query_terms", "merge_document_and_queries"]
