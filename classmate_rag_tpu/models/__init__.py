"""Model zoo: the E5 encoder family and the causal decoder family."""

from classmate_rag_tpu.models.decoder import (
    DecoderConfig,
    empty_cache,
    forward as decoder_forward,
    init_params as init_decoder_params,
    load_params_from_hf as load_decoder_params,
    make_generate_fn,
)
from classmate_rag_tpu.embeddings.model import (
    EncoderConfig,
    encode as encoder_forward,
    init_params as init_encoder_params,
    load_params_from_hf as load_encoder_params,
)

__all__ = [
    "DecoderConfig",
    "EncoderConfig",
    "decoder_forward",
    "empty_cache",
    "encoder_forward",
    "init_decoder_params",
    "init_encoder_params",
    "load_decoder_params",
    "load_encoder_params",
    "make_generate_fn",
]
