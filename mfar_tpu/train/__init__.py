from mfar_tpu.train.model import MFARModel
from mfar_tpu.train.losses import (
    contrastive_loss,
    decomposed_contrastive_loss,
    hybrid_contrastive_loss,
)

__all__ = [
    "MFARModel",
    "contrastive_loss",
    "decomposed_contrastive_loss",
    "hybrid_contrastive_loss",
]
