from . import dedup, multimodal, retrieval, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal", "retrieval"]
