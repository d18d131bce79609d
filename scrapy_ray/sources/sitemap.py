"""Sitemap seed source ([S:scrapy/spiders/sitemap.py SitemapSpider],
[S:scrapy/utils/sitemap.py Sitemap]): parse sitemap.xml / sitemap-index
documents into a crawl seed list. Stdlib-only (xml.etree); gzip-compressed
sitemaps are magic-sniffed like response bodies (functions/compress.py).

The reference's SitemapSpider fetches sitemaps over HTTP, follows
``sitemapindex`` recursion, filters ``loc`` entries through
``sitemap_rules`` and feeds the survivors as requests. Here sitemaps are
files under ``<corpus_root>/sitemaps/`` (or any paths the caller hands us)
and the output is the same seed-list shape ``read_seeds`` produces — the
frontier/dedup machinery downstream is identical.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

from scrapy_ray.functions.compress import maybe_decompress

# sitemap namespaces vary (0.9 canonical, none at all in the wild) — strip
# them rather than enumerate them, the SitemapSpider approach
_NS = re.compile(r"\{[^}]*\}")


def parse_sitemap(body: bytes) -> tuple[list[str], list[str]]:
    """(page_urls, child_sitemap_urls) from one sitemap document: a
    ``urlset`` yields page urls, a ``sitemapindex`` yields child sitemaps.
    Malformed documents yield nothing (the reference logs and skips)."""
    try:
        root = ET.fromstring(maybe_decompress(body))
    except ET.ParseError:
        return [], []
    kind = _NS.sub("", root.tag)
    locs = [
        el.text.strip()
        for el in root.iter()
        if _NS.sub("", el.tag) == "loc" and el.text and el.text.strip()
    ]
    if kind == "sitemapindex":
        return [], locs
    if kind == "urlset":
        return locs, []
    return [], []


def read_sitemap_seeds(paths: "str | list[str]", priority: int = 0,
                       allow: "str | None" = None,
                       max_depth: int = 4) -> list[dict]:
    """Expand sitemap file(s) (or a directory of them) into the engine's
    seed-list shape, following ``sitemapindex`` recursion over LOCAL files
    (a child loc that is a file path or file:// url is read; http child
    locs are returned as seeds — out-of-corpus fetching is the engine's
    job, not the reader's). ``allow``: optional regex keeping only matching
    page urls ([S:sitemap_rules])."""
    if isinstance(paths, str) and os.path.isdir(paths):
        files = [os.path.join(paths, f) for f in sorted(os.listdir(paths))
                 if f.endswith((".xml", ".xml.gz"))]
    elif isinstance(paths, str):
        files = [paths]
    else:
        files = list(paths)
    rx = re.compile(allow) if allow else None
    seen: set[str] = set()
    out: list[dict] = []

    def emit(url: str) -> None:
        if url in seen or (rx and not rx.search(url)):
            return
        seen.add(url)
        out.append({"url": url, "priority": priority})

    def walk(path: str, depth: int) -> None:
        if depth > max_depth or not os.path.exists(path):
            return
        with open(path, "rb") as fh:
            urls, children = parse_sitemap(fh.read())
        for u in urls:
            emit(u)
        base = os.path.dirname(path)
        for c in children:
            if c.startswith("file://"):
                walk(c[len("file://"):], depth + 1)
            elif "://" not in c:                       # relative file path
                walk(os.path.join(base, c), depth + 1)
            else:                                      # http(s) loc: seed it
                emit(c)

    for f in files:
        walk(f, 0)
    return out


def write_corpus_sitemaps(corpus_root: str) -> str:
    """Generate ``<root>/sitemaps/``: one urlset per host (that host's
    root listing page) + an index referencing them — the fixture the
    sitemap seed source reads. Derived from seeds.parquet so it stays
    consistent with any corpus."""
    import pyarrow.parquet as pq

    from scrapy_ray.functions.urlnorm import host_of
    from scrapy_ray.sources.corpus import corpus_paths

    seeds = pq.read_table(corpus_paths(corpus_root)["seeds"]).to_pylist()
    d = os.path.join(corpus_root, "sitemaps")
    os.makedirs(d, exist_ok=True)
    names = []
    for s in seeds:
        host = host_of(s["url"])
        name = f"{host}.xml"
        with open(os.path.join(d, name), "w", encoding="utf-8") as fh:
            fh.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                     '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                     f"  <url><loc>{s['url']}</loc></url>\n</urlset>\n")
        names.append(name)
    with open(os.path.join(d, "index.xml"), "w", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                 '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n')
        for n in names:
            fh.write(f"  <sitemap><loc>{n}</loc></sitemap>\n")
        fh.write("</sitemapindex>\n")
    return os.path.join(d, "index.xml")


def write_robots_sitemap_directives(corpus_root: str) -> int:
    """Append ``Sitemap: sitemaps/<host>.xml`` directives to the corpus
    robots fixtures (for hosts whose sitemap file exists) — the wild-web
    convention SitemapSpider discovers sitemaps through. Rewrites
    robots.parquet in place (fixture mutation: call on a private copy of a
    corpus, never on a shared golden one). Returns #hosts annotated."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapy_ray import schemas
    from scrapy_ray.sources.corpus import corpus_paths

    p = corpus_paths(corpus_root)["robots"]
    t = pq.read_table(p)
    hosts = t["host"].to_pylist()
    bodies = t["body"].to_pylist()
    n = 0
    out = []
    for h, b in zip(hosts, bodies):
        rel = os.path.join("sitemaps", f"{h}.xml")
        if os.path.exists(os.path.join(corpus_root, rel)):
            b = b.rstrip("\n") + f"\nSitemap: {rel}\n"
            n += 1
        out.append(b)
    pq.write_table(pa.table({"host": hosts, "body": out},
                            schema=schemas.ROBOTS), p)
    return n


def read_robots_sitemap_seeds(corpus_root: str, priority: int = 0,
                              allow: "str | None" = None) -> list[dict]:
    """Seed discovery via robots.txt ``Sitemap:`` directives
    ([S:scrapy/spiders/sitemap.py] — a robots.txt url in ``sitemap_urls``
    expands to the sitemaps it announces): parse every host's robots
    fixture, resolve announced sitemap locations (relative paths and
    file:// against the corpus root; http(s) locs pass through as seeds),
    and expand them with the standard sitemap reader."""
    import pyarrow.parquet as pq

    from scrapy_ray.sources.corpus import corpus_paths
    from scrapy_ray.state.robots import parse_robots

    t = pq.read_table(corpus_paths(corpus_root)["robots"])
    files: list[str] = []
    remote: list[str] = []
    for body in t["body"].to_pylist():
        for loc in parse_robots(body).sitemaps:
            if loc.startswith("file://"):
                files.append(loc[len("file://"):])
            elif "://" not in loc:
                files.append(os.path.join(corpus_root, loc))
            else:
                # http(s) sitemap on another host: seed it directly
                # (out-of-corpus fetch is the engine's job, not the reader's)
                remote.append(loc)
    out = read_sitemap_seeds(files, priority=priority, allow=allow)
    seen = {s["url"] for s in out}
    rx = re.compile(allow) if allow else None
    for u in remote:
        if u not in seen and not (rx and not rx.search(u)):
            seen.add(u)
            out.append({"url": u, "priority": priority})
    return out
