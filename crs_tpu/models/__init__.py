from .minilm import MiniLMConfig, MiniLMEncoder
from .tokenizer import WordPieceTokenizer, HashTokenizer

__all__ = [
    "MiniLMConfig",
    "MiniLMEncoder",
    "WordPieceTokenizer",
    "HashTokenizer",
]
