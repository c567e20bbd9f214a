from .mesh import corpus_mesh, shard_rows, replicate
from .sharded_index import sharded_topk, shard_corpus

__all__ = ["corpus_mesh", "shard_rows", "replicate", "sharded_topk", "shard_corpus"]
