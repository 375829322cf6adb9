from .extract import extract_segment_spans, extract_spans

__all__ = ["extract_segment_spans", "extract_spans"]
