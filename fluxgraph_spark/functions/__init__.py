from . import dedup, multimodal, retrieval, similarity, sketches, text

__all__ = ["text", "dedup", "similarity", "multimodal", "retrieval", "sketches"]
