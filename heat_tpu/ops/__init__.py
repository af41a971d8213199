from heat_tpu.ops.similarity import pair_scores
from heat_tpu.ops.losses import sample_losses

__all__ = ["pair_scores", "sample_losses"]
