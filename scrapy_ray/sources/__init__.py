"""Sources & sinks (SURVEY.md §2.1): synthetic corpus generator + readers."""

from scrapy_ray.sources.corpus import CorpusSpec, generate_corpus, corpus_paths
from scrapy_ray.sources.readers import read_pages, read_seeds, read_robots

__all__ = [
    "CorpusSpec",
    "generate_corpus",
    "corpus_paths",
    "read_pages",
    "read_seeds",
    "read_robots",
]
