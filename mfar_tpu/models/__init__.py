from mfar_tpu.models.encoder import Encoder, EncoderConfig, mean_pool
from mfar_tpu.models.tokenizer import SimpleVocabTokenizer, pad_to_bucket

__all__ = [
    "Encoder",
    "EncoderConfig",
    "mean_pool",
    "SimpleVocabTokenizer",
    "pad_to_bucket",
]
