"""Extension surface (§2.10), feed exports (S5), salted aggregate (A2),
metrics actor (F7), CLI entrypoint (§3.1)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from scrapy_ray.config import CrawlConfig
from scrapy_ray.pipelines.crawl import run_crawl


def test_item_pipeline_and_link_middleware(ray_session, e2e_corpus):
    """An item pipeline that drops low-rated items (DropItem semantics) and a
    link middleware that drops offsite-looking links, both as batch fns."""

    def min_rating(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["rating"], 3.0))

    def drop_offsite(t: pa.Table) -> pa.Table:
        return t.filter(pc.match_substring(t["host"], "example.com"))

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_waves=6)
    res = run_crawl(e2e_corpus, cfg, item_pipelines=(min_rating,),
                    link_middlewares=(drop_offsite,))
    assert len(res.items) > 0
    assert pc.min(res.items["rating"]).as_py() >= 3.0
    hosts = set(res.url_seen["url"].to_pylist())
    assert all("example.com" in u or u == "" for u in hosts)


def test_metrics_actor(ray_session, e2e_corpus):
    import ray

    from scrapy_ray.state.metrics import create_metrics

    m = create_metrics()
    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_waves=4)
    res = run_crawl(e2e_corpus, cfg, metrics=m)
    snap = ray.get(m.snapshot.remote())
    assert snap["pages_fetched"] == res.metrics["pages_fetched"]
    assert snap["items"] == res.metrics["items"]
    hot = ray.get(m.hot_hosts.remote(3))
    assert len(hot) == 3 and hot[0][1] >= hot[-1][1]


def test_exports(ray_session, e2e_corpus, tmp_path):
    from scrapy_ray.sources.sinks import export_items

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_waves=3)
    res = run_crawl(e2e_corpus, cfg)
    for fmt in ("parquet", "json", "csv"):
        out = str(tmp_path / fmt)
        export_items(res.items, out, fmt=fmt)
        files = os.listdir(out)
        assert files, fmt
    import pyarrow.parquet as pq

    back = pa.concat_tables([pq.read_table(str(tmp_path / "parquet" / f))
                             for f in os.listdir(tmp_path / "parquet")])
    assert back.sort_by("url").equals(res.items.sort_by("url"))


def test_salted_count_matches_plain(ray_session):
    import duckdb

    from scrapy_ray.pipelines.oracle import compare, duckdb_run
    from scrapy_ray.pipelines.skew import SQL_SALTED, q_salted_count_event_type

    sf = "/root/testdata/sf0.001"
    ok, msg = compare(q_salted_count_event_type(sf), duckdb_run(sf, SQL_SALTED))
    assert ok, msg


def test_parse_stage_registry():
    from scrapy_ray.registry import PARSE_STAGES, parse_stage

    assert "parse_detail" in PARSE_STAGES and "parse_listing" in PARSE_STAGES

    @parse_stage("parse_custom")
    def my_stage(t: pa.Table) -> pa.Table:
        return t

    assert PARSE_STAGES["parse_custom"] is my_stage


def test_cli_gen_and_crawl(tmp_path):
    """End-to-end CLI in a subprocess (owns its own Ray session)."""
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "items")
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-m", "scrapy_ray", "gen", "--out", corpus,
                        "--hosts", "4", "--pages", "120", "--num-cpus", "2"],
                       capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run([sys.executable, "-m", "scrapy_ray", "crawl",
                         "--corpus", corpus, "--out", out, "--num-cpus", "2",
                         "--per-domain-cap", "64", "--frontier-shards", "2",
                         "--filter-shards", "2"],
                        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    metrics = json.loads(r2.stdout.strip().splitlines()[-1])
    assert metrics["items"] > 0
    assert os.listdir(out)
