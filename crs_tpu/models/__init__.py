from .minilm import MiniLMConfig, MiniLMEncoder
from .tokenizer import WordPieceTokenizer, HashTokenizer
from .bytes_tokenizer import ByteTokenizer
from .transformer import TransformerConfig, CONFIGS
from .model_interface import ModelInterface, JaxModel, create_model_interface

__all__ = [
    "MiniLMConfig",
    "MiniLMEncoder",
    "WordPieceTokenizer",
    "HashTokenizer",
    "ByteTokenizer",
    "TransformerConfig",
    "CONFIGS",
    "ModelInterface",
    "JaxModel",
    "create_model_interface",
]
