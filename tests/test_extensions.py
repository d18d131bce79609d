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
    # observability sketches: per-wave fetch-latency/size quantiles ride a
    # KLL per metric; quantiles are real observed values with sane order
    q = snap["quantiles"]
    for metric in ("wave_fetch_ms", "wave_pages"):
        d = q[metric]
        assert d["n"] == res.metrics["waves"]
        assert 0 <= d["p50"] <= d["p90"] <= d["p99"]


def test_exports(ray_session, e2e_corpus, tmp_path):
    from scrapy_ray.sources.sinks import export_items

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_waves=3)
    res = run_crawl(e2e_corpus, cfg)
    for fmt in ("parquet", "json", "csv", "xml", "marshal", "pickle"):
        out = str(tmp_path / fmt)
        export_items(res.items, out, fmt=fmt)
        files = os.listdir(out)
        assert files, fmt
    import pyarrow.parquet as pq

    # xml round-trip sanity: well-formed, one <item> per row
    import xml.etree.ElementTree as ET
    tree = ET.parse(str(tmp_path / "xml" / "items.xml"))
    assert len(tree.getroot().findall("item")) == len(res.items)
    # pickle stream decodes to the same number of row dicts
    import pickle
    n = 0
    with open(tmp_path / "pickle" / "items.pickle", "rb") as fh:
        while True:
            try:
                row = pickle.load(fh)
                assert isinstance(row, dict) and "url" in row
                n += 1
            except EOFError:
                break
    assert n == len(res.items)

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


def test_custom_page_handler_crawls_through_engine(ray_session, tmp_path):
    """VERDICT item 2: a user registers a THIRD page type (@page_handler +
    url_route) and the engine crawls it — custom extraction and custom link
    following run inside the fused wave parser ON WORKERS (registry snapshot
    shipped via ray.put), and the simulator dispatches through the same
    registry, so engine≡simulator equality extends to custom stages."""
    import re

    import pyarrow.parquet as pq

    from scrapy_ray import registry
    from scrapy_ray.config import CrawlConfig
    from scrapy_ray.pipelines.crawl import run_crawl
    from scrapy_ray.pipelines.simulator import simulate_crawl
    from scrapy_ray.sources.ingest import import_pages

    urls, htmls = [], []
    for h in range(2):
        for i in range(5):
            urls.append(f"https://cafe{h}.example.org/cafe/{i}")
            nxt = f'<a href="/cafe/{i + 1}">next</a>' if i < 4 else ""
            htmls.append(
                f'<html><body><h2 class="cafe-name">Cafe {h}-{i}</h2>'
                f'<span class="stars">{(i % 5) + 1} stars</span>{nxt}</body></html>')
    src = str(tmp_path / "cafes.parquet")
    pq.write_table(pa.table({"url": urls, "html": [s.encode() for s in htmls]}), src)
    out = str(tmp_path / "corpus")
    import_pages(src, out, n_buckets=4)

    name_re = re.compile(r'<h2 class="cafe-name">([^<]+)</h2>')
    stars_re = re.compile(r'<span class="stars">(\d+) stars</span>')
    href_re = re.compile(r'href="([^"]+)"')

    @registry.page_handler("parse_cafe", url_pattern=r"https?://[^/]+/cafe/")
    def parse_cafe(url: str, html: bytes) -> dict:
        h = html.decode()
        m = name_re.search(h)
        item = None
        if m:
            s = stars_re.search(h)
            item = {"name": m.group(1), "item_type": "cafe",
                    "rating": float(s.group(1)) if s else None,
                    "extracted_text": m.group(1)}
        return {"item": item, "links": href_re.findall(h)}

    try:
        cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, obey_robots=False)
        seeds = [{"url": "https://cafe0.example.org/cafe/0"},
                 {"url": "https://cafe1.example.org/cafe/0"}]
        eng = run_crawl(out, cfg, seeds=seeds)
        sim = simulate_crawl(out, cfg, seeds=seeds)
        assert eng.crawl_order.to_pydict() == sim.crawl_order.to_pydict()
        assert eng.items.sort_by("url").equals(sim.items.sort_by("url"))
        assert len(eng.items) == 10
        assert set(eng.items["item_type"].to_pylist()) == {"cafe"}
        assert set(eng.items["name"].to_pylist()) == {
            f"Cafe {h}-{i}" for h in range(2) for i in range(5)}
        assert sorted(set(eng.items["rating"].to_pylist())) == [1.0, 2.0, 3.0, 4.0, 5.0]
    finally:
        registry.PAGE_HANDLERS.pop("parse_cafe", None)
        registry.URL_ROUTES[:] = [(p, t) for p, t in registry.URL_ROUTES
                                  if t != "parse_cafe"]


def test_parse_one_debug_helper():
    """SURVEY §3.3: the scrapy-shell analogue runs one page through a
    registered stage without Ray."""
    from scrapy_ray.registry import parse_one
    from scrapy_ray.sources.corpus import detail_fields, render_detail

    f = detail_fields(0, "h0.example.com", 7)
    html = render_detail("h0.example.com", f, [])
    row = parse_one(html, "parse_detail")
    assert row["name"] == f["name"]
    assert row["extracted_text"]
    import pytest as _pt
    with _pt.raises(KeyError):
        parse_one(b"<html></html>", "nope")


def test_library_api_crawl(ray_session, e2e_corpus):
    """SURVEY §3.3 library surface: api.crawl returns a Ray Dataset of
    items equal to the engine result."""
    import ray.data

    from scrapy_ray import api

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_pages=80)
    ds = api.crawl(e2e_corpus, cfg)
    assert isinstance(ds, ray.data.Dataset)
    res = api.crawl_result(e2e_corpus, cfg)
    import pyarrow as _pa
    got = _pa.concat_tables(list(ds.iter_batches(batch_size=None,
                                                 batch_format="pyarrow")))
    assert got.sort_by("url").equals(res.items.sort_by("url"))
    assert api.parse_one(b"<html><body></body></html>", "parse_listing") is not None


def test_export_fields_selection(ray_session, e2e_corpus, tmp_path):
    """FEED_EXPORT_FIELDS parity: exported columns are exactly the
    requested names IN ORDER, across formats; unknown names raise."""
    import pyarrow.parquet as pq

    import pytest

    from scrapy_ray.sources.sinks import export_items

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_waves=3)
    res = run_crawl(e2e_corpus, cfg)

    out = str(tmp_path / "sel")
    export_items(res.items, out, fmt="parquet",
                 fields=("rating", "url", "name"))
    t = pq.read_table([os.path.join(out, f) for f in sorted(os.listdir(out))
                       if f.endswith(".parquet")])
    assert t.column_names == ["rating", "url", "name"]
    assert len(t) == len(res.items)

    out_csv = str(tmp_path / "sel_csv")
    export_items(res.items, out_csv, fmt="csv", fields=("url", "name"))
    f = [x for x in os.listdir(out_csv) if x.endswith(".csv")][0]
    with open(os.path.join(out_csv, f)) as fh:
        assert fh.readline().strip().replace('"', "") == "url,name"

    with pytest.raises(ValueError, match="unknown export fields"):
        export_items(res.items, str(tmp_path / "bad"), fields=("nope",))


def test_export_batch_item_count(ray_session, e2e_corpus, tmp_path):
    """FEED_EXPORT_BATCH_ITEM_COUNT parity ([S:feedexport.py batch
    delivery]): every format delivers numbered items-%05d files of exactly
    N rows (last short), ids from 1, and the concatenation round-trips to
    the same rows as the unbatched feed."""
    import pickle

    import pyarrow.parquet as pq

    from scrapy_ray.sources.sinks import export_items

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_waves=3)
    res = run_crawl(e2e_corpus, cfg)
    n_items, n = len(res.items), 7
    want_files = (n_items + n - 1) // n

    for fmt, ext in (("parquet", "parquet"), ("json", "jsonl"),
                     ("csv", "csv"), ("xml", "xml"), ("pickle", "pickle")):
        out = tmp_path / f"b_{fmt}"
        export_items(res.items, str(out), fmt=fmt, batch_item_count=n)
        files = sorted(os.listdir(out))
        assert len(files) == want_files, fmt
        assert files[0] == f"items-00001.{ext}", files[0]

    # parquet: exact N rows per file, concat equals the input byte-wise
    parts = [pq.read_table(str(tmp_path / "b_parquet" / f))
             for f in sorted(os.listdir(tmp_path / "b_parquet"))]
    assert all(len(p) == n for p in parts[:-1])
    assert 1 <= len(parts[-1]) <= n
    assert pa.concat_tables(parts).equals(res.items)

    # csv: header per batch file
    for f in sorted(os.listdir(tmp_path / "b_csv")):
        first = open(tmp_path / "b_csv" / f).readline()
        assert first.startswith("url,")

    # pickle: rows across files concatenate to the full item set
    rows = []
    for f in sorted(os.listdir(tmp_path / "b_pickle")):
        with open(tmp_path / "b_pickle" / f, "rb") as fh:
            while True:
                try:
                    rows.append(pickle.load(fh))
                except EOFError:
                    break
    assert len(rows) == n_items
    assert {r["url"] for r in rows} == set(res.items["url"].to_pylist())

    # fields + batching compose
    out = tmp_path / "b_fields"
    export_items(res.items, str(out), fmt="csv", fields=("name", "url"),
                 batch_item_count=n)
    first = open(out / sorted(os.listdir(out))[0]).readline().strip()
    assert first == "name,url"


def test_spider_contracts_check(ray_session, e2e_corpus):
    """`scrapy check` analogue ([S:scrapy/contracts @url/@returns/@scrapes]):
    contracts verify item/link counts and non-empty scraped fields through
    the REAL fused parse over bucket-pruned corpus lookups."""
    from scrapy_ray.contracts import Contract, check_contracts

    good = [
        Contract("https://h000.example.com/hotel/00000",
                 items=(1, 1), scrapes=("name", "address", "rating")),
        Contract("https://h000.example.com/listing/00000",
                 items=(0, 0), links=(1, None)),
    ]
    res = check_contracts(e2e_corpus, good)
    assert all(r["ok"] for r in res), res
    assert res[0]["n_items"] == 1 and res[1]["n_links"] >= 1

    bad = [
        Contract("https://h000.example.com/listing/00000",
                 items=(1, None)),                      # listings yield 0
        Contract("https://h000.example.com/hotel/00000",
                 scrapes=("name", "nonexistent_field")),
        Contract("https://nosuch.example.com/hotel/00000"),
    ]
    res = check_contracts(e2e_corpus, bad)
    assert [r["ok"] for r in res] == [False, False, False]
    assert res[1]["missing_fields"] == ["nonexistent_field"]
    assert res[2]["error"] == "page not in corpus"


def test_spider_contracts_cli(e2e_corpus):
    """CLI surface: `scrapy_ray check --corpus ... --module ...` exits 0 on
    green contracts (subprocess owns its Ray session)."""
    r = subprocess.run(
        [sys.executable, "-m", "scrapy_ray", "check", "--corpus", e2e_corpus,
         "--module", "tests.contract_fixtures", "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()
             if x.startswith("{")]
    assert len(lines) == 2 and all(x["ok"] for x in lines)


def test_export_compress_postprocessing(ray_session, e2e_corpus, tmp_path):
    """Feed post-processing ([S:scrapy/extensions/postprocessing.py]):
    gzip/bz2/lzma each delivered feed file; gzip is byte-deterministic
    (mtime=0); round-trips to the uncompressed content; composes with
    batch delivery."""
    import bz2
    import gzip
    import lzma

    from scrapy_ray.sources.sinks import export_items

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_waves=3)
    res = run_crawl(e2e_corpus, cfg)

    out = tmp_path / "gz"
    export_items(res.items, str(out), fmt="json", compress="gzip")
    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".gz") for f in files)
    rows = []
    for f in files:
        with gzip.open(out / f, "rt", encoding="utf-8") as fh:
            rows += [json.loads(x) for x in fh if x.strip()]
    assert len(rows) == len(res.items)

    # byte-determinism (mtime=0): two batched exports — deterministic file
    # names, unlike Ray's UUID-named distributed writes — are identical
    out2a, out2b = tmp_path / "gz2a", tmp_path / "gz2b"
    for d in (out2a, out2b):
        export_items(res.items, str(d), fmt="json", batch_item_count=9,
                     compress="gzip")
    for f in sorted(os.listdir(out2a)):
        assert (out2a / f).read_bytes() == (out2b / f).read_bytes(), \
            "gzip feed must be byte-deterministic"

    outb = tmp_path / "batched"
    export_items(res.items, str(outb), fmt="csv", batch_item_count=7,
                 compress="bz2")
    bfiles = sorted(os.listdir(outb))
    assert bfiles[0] == "items-00001.csv.bz2"
    first = bz2.decompress((outb / bfiles[0]).read_bytes()).decode()
    assert first.startswith("url,") and first.count("\n") == 8  # header + 7

    outx = tmp_path / "xz"
    export_items(res.items, str(outx), fmt="pickle", compress="lzma")
    import pickle
    import io
    raw = lzma.decompress((outx / "items.pickle.xz").read_bytes())
    n = 0
    buf = io.BytesIO(raw)
    while True:
        try:
            pickle.load(buf)
            n += 1
        except EOFError:
            break
    assert n == len(res.items)


def test_build_training_corpus(ray_session, tmp_path):
    """Crawl-to-corpus composition: the gate drops short/null texts, exact
    dedup keeps the smallest url per digest, shards are hive-partitioned
    and read back complete, and the manifest counts match."""
    import pyarrow.parquet as pq

    from scrapy_ray.pipelines.corpusbuild import build_training_corpus

    rows = []
    for i in range(40):
        rows.append({"url": f"https://a.example.com/p/{i:03d}",
                     "extracted_text": f"alpha beta gamma delta {i % 10}"})
    rows.append({"url": "https://a.example.com/short",
                 "extracted_text": "too short"})          # < 3 tokens? no: 2
    rows.append({"url": "https://a.example.com/null",
                 "extracted_text": None})
    items = pa.table({
        "url": [r["url"] for r in rows],
        "extracted_text": [r["extracted_text"] for r in rows],
    })
    out = str(tmp_path / "shards")
    m = build_training_corpus(items, out, n_shards=4, min_tokens=3)
    # 40 gated rows collapse to 10 distinct texts (i % 10), min-url kept
    assert m["rows_in"] == 42 and m["rows_kept"] == 10
    assert m["rows_dropped"] == 32
    assert m["tokens"] == 10 * 5
    back = pq.read_table(out).to_pandas()
    assert len(back) == 10
    assert set(back.columns) >= {"url", "text", "n_tokens"}
    # keep-min-url rule: every kept url is the i<10 instance of its text
    assert sorted(back["url"]) == [f"https://a.example.com/p/{i:03d}"
                                   for i in range(10)]
    assert sum(m["shards"].values()) == 10


def test_build_training_corpus_neardup(ray_session, tmp_path):
    """Optional near-dup stage: byte-DISTINCT texts that are shingle-level
    near-duplicates collapse to one survivor per cluster (keep-min url-hash
    id); unrelated texts survive; the _stage_dedup spill is cleaned up."""
    import pyarrow.parquet as pq

    from scrapy_ray.functions.hashing import hash64
    from scrapy_ray.pipelines.corpusbuild import build_training_corpus

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on ancient cobblestone streets of the town")
    rows = []
    for i in range(4):  # 4 near-dup variants: one trailing token differs
        rows.append({"url": f"https://a.example.com/dup/{i}",
                     "extracted_text": base + f" variant{i}"})
    for i in range(6):  # unrelated distinct docs
        rows.append({"url": f"https://a.example.com/solo/{i}",
                     "extracted_text": " ".join(
                         f"tok{i}w{j}" for j in range(20))})
    items = pa.table({
        "url": [r["url"] for r in rows],
        "extracted_text": [r["extracted_text"] for r in rows],
    })
    out = str(tmp_path / "shards_nd")
    m = build_training_corpus(items, out, n_shards=4, min_tokens=3,
                              neardup=True, neardup_tau=0.5)
    assert m["rows_in"] == 10
    assert m["rows_neardup_dropped"] == 3           # 4 variants -> 1 kept
    assert m["rows_kept"] == 7
    back = pq.read_table(out).to_pandas()
    assert len(back) == 7
    # keep rule: the surviving variant is the min url-hash id of the four
    dup_urls = [f"https://a.example.com/dup/{i}" for i in range(4)]
    ids = hash64(dup_urls).view("int64")
    survivor = dup_urls[int(ids.argmin())]
    kept_dups = [u for u in back["url"] if "/dup/" in u]
    assert kept_dups == [survivor]
    assert "nid" not in back.columns
    assert not os.path.exists(os.path.join(out, "_stage_dedup"))


def test_build_training_corpus_semdedup(ray_session, tmp_path):
    """Optional SEMANTIC dedup stage (SemDeDup over hashed-trigram
    embeddings, SRP cells, exact-integer cosine): byte-distinct word-level
    paraphrases (trigram cosine >= 0.93, validated offline) collapse to the
    min-url-hash survivor; unrelated docs survive (max solo cosine 0.14 vs
    the variants, 0.67 solo-solo — both below tau=0.8)."""
    import pyarrow.parquet as pq

    from scrapy_ray.functions.hashing import hash64
    from scrapy_ray.pipelines.corpusbuild import build_training_corpus

    base = ("the grand hotel on the corner of elm street offers spacious "
            "rooms with views over the old harbour and a breakfast served "
            "daily in the sunlit atrium beside the fountain")
    variants = [base,
                base.replace("spacious", "generous"),
                base.replace("breakfast", "brunch"),
                base.replace("daily", "each morning")]
    rows = [{"url": f"https://a.example.com/sem/{i}", "extracted_text": v}
            for i, v in enumerate(variants)]
    rows += [{"url": f"https://a.example.com/solo/{i}",
              "extracted_text": " ".join(f"tok{i}w{j}" for j in range(20))}
             for i in range(6)]
    items = pa.table({
        "url": [r["url"] for r in rows],
        "extracted_text": [r["extracted_text"] for r in rows],
    })
    out = str(tmp_path / "shards_sd")
    m = build_training_corpus(items, out, n_shards=4, min_tokens=3,
                              semdedup=True, semdedup_tau=0.8)
    assert m["rows_in"] == 10
    assert m["rows_semdedup_dropped"] == 3      # 4 paraphrases -> 1 kept
    assert m["rows_neardup_dropped"] == 0       # minhash stage was off
    assert m["rows_kept"] == 7
    back = pq.read_table(out).to_pandas()
    assert len(back) == 7
    sem_urls = [f"https://a.example.com/sem/{i}" for i in range(4)]
    ids = hash64(sem_urls).view("int64")
    survivor = sem_urls[int(ids.argmin())]
    assert [u for u in back["url"] if "/sem/" in u] == [survivor]
    assert "nid" not in back.columns
    assert not os.path.exists(os.path.join(out, "_stage_dedup"))

    # sequential-stage semantics: with BOTH stages on, the shingle pass
    # claims the paraphrase cluster first and the semantic pass must NOT
    # re-count it (minhash-dropped docs are excluded as representatives,
    # and already-dropped ids never re-enter the semantic drop set)
    out2 = str(tmp_path / "shards_both")
    m2 = build_training_corpus(items, out2, n_shards=4, min_tokens=3,
                               neardup=True, neardup_tau=0.5,
                               semdedup=True, semdedup_tau=0.8)
    assert m2["rows_neardup_dropped"] == 3
    assert m2["rows_semdedup_dropped"] == 0
    assert m2["rows_kept"] == 7


def test_pipeline_cli(e2e_corpus, tmp_path):
    """One-command crawl -> training shards (subprocess owns its session)."""
    out = str(tmp_path / "train")
    r = subprocess.run(
        [sys.executable, "-m", "scrapy_ray", "pipeline", "--corpus",
         e2e_corpus, "--out", out, "--shards", "4", "--num-cpus", "2",
         "--semdedup"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["rows_kept"] > 0 and m["tokens"] > 0
    assert "rows_semdedup_dropped" in m          # semantic stage ran
    assert sorted(os.listdir(out)) == [f"shard={i}" for i in
                                       sorted(int(k) for k in m["shards"])]


def test_jobdir_cli_pause_resume(tmp_path):
    """JOBDIR parity ([S:scrapy docs: pausing and resuming crawls]): the
    same `crawl --jobdir` command runs once with a wave limit (pause) and
    once without (auto-resume from the committed manifest); the combined
    output equals a fresh uninterrupted run."""
    corpus = str(tmp_path / "corpus")
    r = subprocess.run([sys.executable, "-m", "scrapy_ray", "gen", "--out",
                        corpus, "--hosts", "4", "--pages", "150",
                        "--num-cpus", "2"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]

    def crawl(out, extra):
        rr = subprocess.run(
            [sys.executable, "-m", "scrapy_ray", "crawl", "--corpus", corpus,
             "--out", str(out), "--num-cpus", "2", "--frontier-shards", "2",
             "--filter-shards", "2"] + extra,
            capture_output=True, text=True, cwd="/root/repo")
        assert rr.returncode == 0, rr.stderr[-1500:]
        return json.loads(rr.stdout.strip().splitlines()[-1])

    full = crawl(tmp_path / "full", [])
    jd = str(tmp_path / "job")
    part = crawl(tmp_path / "p1", ["--jobdir", jd, "--max-waves", "3"])
    assert part["waves"] <= 3 < full["waves"]
    done = crawl(tmp_path / "p2", ["--jobdir", jd])      # auto-resume
    assert done["pages_fetched"] == full["pages_fetched"]
    assert done["items"] == full["items"]
    assert done["url_seen"] == full["url_seen"]


def test_query_cli(tmp_path):
    """CLI surface: `scrapy_ray query` lists the registry and runs a named
    query over a testdata dir (subprocess owns its Ray session); --out
    writes the full result parquet."""
    r = subprocess.run(
        [sys.executable, "-m", "scrapy_ray", "query", "--list",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr[-2000:]
    names = [ln[2:] for ln in r.stdout.strip().splitlines()]
    assert "groupby_count_source" in names and len(names) >= 150
    assert "o groupby_count_source" in r.stdout   # oracled marker

    out = str(tmp_path / "res.parquet")
    r2 = subprocess.run(
        [sys.executable, "-m", "scrapy_ray", "query", "groupby_count_source",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out,
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stdout + r2.stderr[-2000:]
    meta = json.loads([x for x in r2.stdout.splitlines()
                       if x.startswith("{")][0])
    assert meta["rows"] > 0 and meta["out"] == out
    import pyarrow.parquet as pq

    assert pq.read_table(out).num_rows == meta["rows"]

    r3 = subprocess.run(
        [sys.executable, "-m", "scrapy_ray", "query", "no_such_query",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r3.returncode == 1 and "unknown query" in r3.stdout
