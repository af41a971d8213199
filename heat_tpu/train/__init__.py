from heat_tpu.train.engine import Engine

__all__ = ["Engine"]
