from .sharded import sharded_logpdf

__all__ = ["sharded_logpdf"]
