from . import acf, dedup, lag_embed, similarity, text, timeseries, topn

__all__ = [
    "acf",
    "dedup",
    "lag_embed",
    "similarity",
    "text",
    "timeseries",
    "topn",
]
