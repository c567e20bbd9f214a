from .base import BenchmarkResult, ModelBenchmark

__all__ = ["BenchmarkResult", "ModelBenchmark"]
