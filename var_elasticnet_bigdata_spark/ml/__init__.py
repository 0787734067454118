from . import elastic_net, gram

__all__ = ["elastic_net", "gram"]
