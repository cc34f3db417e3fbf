from . import dedup, joins, multimodal, similarity, textstats

__all__ = ["dedup", "joins", "multimodal", "similarity", "textstats"]
