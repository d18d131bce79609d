"""Shared fixtures: ONE Ray session per pytest session; deterministic
corpora cached under /tmp (content-addressed by spec, regenerated only when
the generator version changes)."""

from __future__ import annotations

import pytest

from scrapy_ray.sources.corpus import CorpusSpec, generate_corpus

# e2e spec: 18 hosts -> includes a robots-Disallow host (h009) and a
# robots-Crawl-delay host (h017); Zipf skew; cross/offsite/dangling/overlong
# links (FIXTURES.md §1).
E2E_SPEC = CorpusSpec(n_hosts=18, total_pages=700, seed=42)
E2E_ROOT = "/tmp/scrapy_ray_test/corpus_e2e"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from scrapy_ray.util import quiet_ray_data

    quiet_ray_data()
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def e2e_corpus(ray_session) -> str:
    generate_corpus(E2E_ROOT, E2E_SPEC)
    return E2E_ROOT
