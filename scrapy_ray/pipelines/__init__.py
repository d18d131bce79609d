"""End-to-end pipelines: the wave-loop crawl engine, the reference-semantics
simulator (golden truth), and the training-data operator suite."""
