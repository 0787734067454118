from . import dist, stats

__all__ = ["dist", "stats"]
