from .document_processing import DocumentProcessor
from .chunking import Chunk, TextChunker

__all__ = ["DocumentProcessor", "Chunk", "TextChunker"]
