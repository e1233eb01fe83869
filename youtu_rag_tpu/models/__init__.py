from .tokenizer import HashTokenizer
from .encoder import EncoderConfig, init_encoder_params, encode_tokens, count_params
from .embedder import EmbedderFactory, HashEmbedder, TpuEmbedder, RemoteEmbedder
from .reranker import RerankerFactory, LexicalReranker, TpuReranker
from .wordpiece import WordPieceTokenizer

__all__ = [
    "EmbedderFactory",
    "EncoderConfig",
    "HashEmbedder",
    "HashTokenizer",
    "LexicalReranker",
    "RemoteEmbedder",
    "RerankerFactory",
    "TpuEmbedder",
    "TpuReranker",
    "WordPieceTokenizer",
    "count_params",
    "encode_tokens",
    "init_encoder_params",
]
