from .document_processing import DocumentProcessor
from .chunking import Chunk, TextChunker
from .embedding import EmbeddingModel
from .index import VectorStore
from .retrieval import ContextRetriever
from .generation import RAGGenerator
from .pipeline import RAGPipeline

__all__ = [
    "DocumentProcessor",
    "Chunk",
    "TextChunker",
    "EmbeddingModel",
    "VectorStore",
    "ContextRetriever",
    "RAGGenerator",
    "RAGPipeline",
]
