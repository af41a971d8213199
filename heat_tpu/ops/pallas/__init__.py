from heat_tpu.ops.pallas.gather import gather_rows, history_mean_gather

__all__ = ["gather_rows", "history_mean_gather"]
