from . import acf, lag_embed, timeseries, topn

__all__ = ["acf", "lag_embed", "timeseries", "topn"]
