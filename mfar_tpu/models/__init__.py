from mfar_tpu.models.encoder import Encoder, EncoderConfig, mean_pool
from mfar_tpu.models.t5_encoder import T5Config, T5Encoder
from mfar_tpu.models.tokenizer import SimpleVocabTokenizer, pad_to_bucket


def build_encoder(config, name: str = "encoder"):
    """Dispatch an encoder module on its config type (BERT vs T5 family)."""
    if isinstance(config, T5Config):
        return T5Encoder(config, name=name)
    return Encoder(config, name=name)


def encoder_dim(config) -> int:
    """Sentence-embedding dimensionality of an encoder config."""
    if isinstance(config, T5Config):
        return config.projection_dim or config.d_model
    return config.hidden_size


__all__ = [
    "Encoder",
    "EncoderConfig",
    "T5Config",
    "T5Encoder",
    "build_encoder",
    "encoder_dim",
    "mean_pool",
    "SimpleVocabTokenizer",
    "pad_to_bucket",
]
