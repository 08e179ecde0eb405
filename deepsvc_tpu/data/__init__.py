from .synthetic import make_clip_batch, make_semantic_features

__all__ = ["make_clip_batch", "make_semantic_features"]
