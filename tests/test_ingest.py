"""Ingest path: any PAGES-shaped parquet -> bucketed corpus layout -> same
crawl results as the native layout."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from scrapy_ray.config import CrawlConfig
from scrapy_ray.pipelines.crawl import run_crawl
from scrapy_ray.sources.corpus import CorpusSpec, corpus_paths, generate_corpus
from scrapy_ray.sources.ingest import import_pages


def test_import_pages_roundtrip(ray_session, tmp_path):
    # native corpus -> flatten to one plain parquet (a user's export)
    native = str(tmp_path / "native")
    generate_corpus(native, CorpusSpec(n_hosts=5, total_pages=150, seed=3), use_ray=False)
    flat = pa.concat_tables(
        [pq.read_table(p) for p in corpus_paths(native)["pages"].values()]
    ).drop_columns(["url_hash", "bucket"])
    src = str(tmp_path / "export.parquet")
    pq.write_table(flat, src)

    imported = str(tmp_path / "imported")
    import_pages(src, imported, n_buckets=4)

    # same seeds, robots off (imported corpus has no robots fixtures)
    seeds = pq.read_table(corpus_paths(native)["seeds"]).to_pylist()
    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, obey_robots=False)
    a = run_crawl(native, cfg, seeds=seeds)
    b = run_crawl(imported, cfg, seeds=seeds)
    assert a.items.sort_by("url").equals(b.items.sort_by("url"))
    assert set(a.url_seen["url"].to_pylist()) == set(b.url_seen["url"].to_pylist())
    assert a.crawl_order.to_pydict() == b.crawl_order.to_pydict()


def test_import_pages_text_only(ray_session, tmp_path):
    """Minimal source: url + text only — html synthesized, lang defaulted."""
    src = str(tmp_path / "texts.parquet")
    pq.write_table(pa.table({
        "url": [f"https://h{i}.example.org/doc/{i}" for i in range(20)],
        "text": [f"document number {i} body text" for i in range(20)],
    }), src)
    out = str(tmp_path / "corpus")
    import_pages(src, out, n_buckets=2)
    files = corpus_paths(out)["pages"]
    t = pa.concat_tables([pq.read_table(p) for p in files.values()])
    assert t.num_rows == 20
    assert set(t.schema.names) >= {"url", "warc_ts", "html", "text", "lang",
                                   "host", "status", "url_hash"}
    assert t["html"][0].as_py().startswith(b"document")


def test_crawl_perturbed_corpus_extracts_items(ray_session, tmp_path):
    """M1 realism e2e: rewrite every page with attribute-reordered /
    extra-attribute / whitespace-perturbed markup (no longer the exact
    template bytes), ingest, crawl — the DOM fallback must extract the same
    item set as the template corpus."""
    import re as _re

    native = str(tmp_path / "native")
    generate_corpus(native, CorpusSpec(n_hosts=5, total_pages=150, seed=3), use_ray=False)

    def perturb(h: bytes) -> bytes:
        h = _re.sub(rb'<a class="([^"]+)" href="([^"]+)">',
                    rb'<a href="\2" class="\1">', h)
        h = h.replace(b'<div class="card">', b'<div data-x="1" class="card">')
        h = h.replace(b'<h1 class="name">', b'<h1 id="t" class="name">')
        return h.replace(b"><", b">\n <")

    flat = pa.concat_tables(
        [pq.read_table(p) for p in corpus_paths(native)["pages"].values()])
    pert = flat.set_column(flat.schema.get_field_index("html"), "html",
                           pa.array([perturb(h) for h in flat["html"].to_pylist()],
                                    type=pa.binary()))
    src = str(tmp_path / "pert.parquet")
    pq.write_table(pert.drop_columns(["url_hash", "bucket", "text"]), src)
    imported = str(tmp_path / "imported")
    import_pages(src, imported, n_buckets=4)

    seeds = pq.read_table(corpus_paths(native)["seeds"]).to_pylist()
    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, obey_robots=False)
    a = run_crawl(native, cfg, seeds=seeds)        # template fast path
    b = run_crawl(imported, cfg, seeds=seeds)      # DOM fallback path
    assert len(b.items) == len(a.items) > 0
    assert sorted(b.items["name"].to_pylist()) == sorted(a.items["name"].to_pylist())
    assert sorted(b.items["rating"].to_pylist()) == sorted(a.items["rating"].to_pylist())
    assert set(b.url_seen["url"].to_pylist()) == set(a.url_seen["url"].to_pylist())


def test_validate_corpus(ray_session, e2e_corpus, tmp_path):
    """Corpus validator: the generated corpus is clean; a corpus with a
    row moved to the wrong bucket, a stale url_hash, or an unsorted file
    is flagged with a precise error."""
    import json
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapy_ray.sources.validate import validate_corpus

    res = validate_corpus(e2e_corpus)
    assert res["ok"], res["errors"][:3]
    assert res["n_rows"] > 0 and res["buckets"] > 0

    # corrupt a copy: flip one url_hash in bucket 0 (stale hash AND
    # wrong-bucket with probability (n-1)/n; always stale)
    bad = str(tmp_path / "bad")
    shutil.copytree(e2e_corpus, bad)
    bdir = os.path.join(bad, "pages", "bucket=0")
    f = os.path.join(bdir, sorted(os.listdir(bdir))[0])
    t = pq.read_table(f)
    h = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64).copy()
    h[0] ^= np.uint64(0xDEADBEEF)
    t = t.set_column(t.schema.get_field_index("url_hash"), "url_hash",
                     pa.array(h, type=pa.uint64()))
    pq.write_table(t, f)
    res_bad = validate_corpus(bad)
    assert not res_bad["ok"]
    assert any("stale url_hash" in e for e in res_bad["errors"])

    # unsorted file detection
    bad2 = str(tmp_path / "bad2")
    shutil.copytree(e2e_corpus, bad2)
    bdir2 = os.path.join(bad2, "pages", "bucket=1")
    f2 = os.path.join(bdir2, sorted(os.listdir(bdir2))[0])
    t2 = pq.read_table(f2)
    pq.write_table(t2.take(pa.array(list(range(len(t2) - 1, -1, -1)))), f2)
    res_bad2 = validate_corpus(bad2)
    assert not res_bad2["ok"]
    assert any("not url-sorted" in e for e in res_bad2["errors"])
