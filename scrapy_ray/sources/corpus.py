"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Replaces the reference's live HTTP download path ([S:scrapy/core/downloader/
handlers/http11.py]) per the north rule: pages live in a Parquet corpus of
shape (url, warc_ts, html, text, lang) [B:input_hint]; "fetch" is a join
against it. The generator is seeded and arithmetic-only (no wall clock, no
dict-order dependence), so every scale regenerates bit-identically.

Layout on disk (resumable, partition-prunable — SURVEY.md §2.4 J1):
    <root>/pages/bucket=<k>/part.parquet   (k = url_hash % n_buckets)
    <root>/robots.parquet
    <root>/seeds.parquet
    <root>/meta.json

Host skew is Zipf(s=1.2): a few hot hosts carry most pages, which exercises
the salted hot-host handling [B:north_star].
"""

from __future__ import annotations

import html as _html
import json
import os
import random
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from scrapy_ray import schemas
from scrapy_ray.functions.hashing import hash64
from scrapy_ray.functions.htmlx import visible_text

LANGS = ["en", "fr", "de", "es", "zh"]
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_NAME_WORDS = [
    "Aurora", "Café & Bistro", "Grand", "Sunset", "L'Été", "Golden Dragon",
    "Riverside", "Panorama", "Olive & Thyme", "Harbor",
]
_STREETS = ["Main Street", "Rue de l'Été", "Hauptstraße", "Calle Mayor", "Nanjing Road"]
_CITIES = ["Springfield", "Lyon", "Berlin", "Madrid", "Shanghai"]
_REVIEW_SNIPPETS = [
    "Great location & friendly staff.",
    "Rooms were clean; breakfast could be better.",
    "Loved the food — would come again!",
    "A bit noisy at night.",
    "Excellent value for money.",
    "The view from the terrace is stunning.",
]


@dataclass(frozen=True)
class CorpusSpec:
    n_hosts: int = 20
    total_pages: int = 2_000       # approximate total detail+listing pages
    page_size: int = 10            # detail cards per listing page
    seed: int = 42
    n_buckets: int = 8
    dangling_frac: float = 0.05    # fraction of cross-links that 404 on fetch-join
    error_frac: float = 0.02       # detail pages with status 404/500 (M10)
    redirect_frac: float = 0.0     # detail pages reachable only via a 301
                                   # "/moved/<id>" alias (redirect middleware);
                                   # 0 keeps pre-round-3 corpora byte-stable
    metarefresh_frac: float = 0.0  # detail pages reachable only via a 200
                                   # "/refresh/<id>" meta-refresh alias
                                   # (MetaRefreshMiddleware); ~1/5 of the
                                   # aliases carry delay 200 > maxdelay and
                                   # must NOT be followed
    max_details_per_host: int = 0  # 0 = uncapped Zipf; bench caps the hot host
                                   # so listing-chain depth (sequential waves)
                                   # stays bounded

    def host(self, i: int) -> str:
        return f"h{i:03d}.example.com"


# --- deterministic per-host plan ------------------------------------------

def zipf_alloc(spec: CorpusSpec) -> list[int]:
    """Detail pages per host ~ Zipf(s=1.2), normalized to ~total_pages."""
    ranks = np.arange(1, spec.n_hosts + 1, dtype=np.float64)
    w = ranks ** -1.2
    w /= w.sum()
    n_listing_est = spec.total_pages / (spec.page_size + 1)
    details_total = spec.total_pages - n_listing_est
    alloc = np.maximum(3, np.round(w * details_total).astype(int))
    if spec.max_details_per_host:
        alloc = np.minimum(alloc, spec.max_details_per_host)
    return alloc.tolist()


def detail_kind(host_idx: int, detail_id: int) -> str:
    return "hotel" if (host_idx + detail_id) % 2 == 0 else "restaurant"


def detail_url(host: str, kind: str, detail_id: int) -> str:
    return f"https://{host}/{kind}/{detail_id:05d}"


def moved_url(host: str, detail_id: int) -> str:
    return f"https://{host}/moved/{detail_id:05d}"


def is_moved(spec: "CorpusSpec", host_idx: int, detail_id: int) -> bool:
    """Deterministic per-detail redirect decision (independent of RNG call
    order so listing and detail loops agree)."""
    if spec.redirect_frac <= 0:
        return False
    h = hash64([f"{spec.seed}:{host_idx}:{detail_id}:moved"])[0]
    return int(h % np.uint64(1000)) < int(spec.redirect_frac * 1000)


def refresh_url(host: str, detail_id: int) -> str:
    return f"https://{host}/refresh/{detail_id:05d}"


def is_refreshed(spec: "CorpusSpec", host_idx: int, detail_id: int) -> bool:
    """Deterministic meta-refresh-alias decision; exclusive with is_moved
    (a detail is aliased at most once)."""
    if spec.metarefresh_frac <= 0 or is_moved(spec, host_idx, detail_id):
        return False
    h = hash64([f"{spec.seed}:{host_idx}:{detail_id}:refresh"])[0]
    return int(h % np.uint64(1000)) < int(spec.metarefresh_frac * 1000)


def refresh_delay(spec: "CorpusSpec", host_idx: int, detail_id: int) -> int:
    """Per-alias refresh delay: mostly 0-2 s (followed); every 5th alias
    gets 200 s > METAREFRESH_MAXDELAY and must be parsed, not followed."""
    h = hash64([f"{spec.seed}:{host_idx}:{detail_id}:refreshdelay"])[0]
    return 200 if int(h % np.uint64(5)) == 0 else int(h % np.uint64(3))


def render_refresh(detail_id: int, target: str, delay: int,
                   variant: int) -> bytes:
    """Meta-refresh alias page; two tag spellings (attribute order +
    quoting) keep the parser honest about real-world markup."""
    if variant:
        tag = f'<meta content="{delay}; url={target}" http-equiv=refresh>'
    else:
        tag = f'<meta http-equiv="refresh" content="{delay};url={target}">'
    return (f"<html><head><title>Interstitial {detail_id}</title>{tag}</head>"
            f"<body><p>Redirecting shortly.</p></body></html>").encode()


def listing_url(host: str, page: int) -> str:
    return f"https://{host}/listing/{page:05d}"


def detail_fields(host_idx: int, host: str, detail_id: int) -> dict:
    """Pure arithmetic field values — no RNG, so extraction goldens are stable."""
    kind = detail_kind(host_idx, detail_id)
    word = _NAME_WORDS[(host_idx * 7 + detail_id) % len(_NAME_WORDS)]
    label = "Hotel" if kind == "hotel" else "Restaurant"
    name = f"{word} {label} {detail_id:03d}"
    street = _STREETS[(host_idx + detail_id) % len(_STREETS)]
    city = _CITIES[host_idx % len(_CITIES)]
    rating = f"{(detail_id * 7 % 41) / 10 + 1.0:.1f}"          # 1.0 .. 5.0
    price = f"${(detail_id * 13 % 390) + 40}" if kind == "hotel" else f"${(detail_id * 11 % 90) + 10}"
    n_rev = detail_id % 5
    reviews = [_REVIEW_SNIPPETS[(detail_id + j) % len(_REVIEW_SNIPPETS)] for j in range(n_rev)]
    return {
        "kind": kind, "name": name, "address": f"{detail_id % 200 + 1} {street}, {city}",
        "rating": rating, "price": price, "review_count": n_rev, "reviews": reviews,
    }


def _e(s: str) -> str:
    return _html.escape(s, quote=False)


def render_listing(host: str, page: int, cards: list[dict], next_href: str | None) -> bytes:
    rows = "".join(
        f'<div class="card"><h2 class="name"><a class="detail" href="{c["detail_href"]}">{_e(c["name"])}</a></h2>'
        f'<span class="rating">{c["rating"]}</span><span class="price">{c["price"]}</span></div>\n'
        for c in cards
    )
    nxt = f'<a class="next" href="{next_href}">Next page</a>\n' if next_href else ""
    doc = (
        "<!DOCTYPE html>\n<html><head><title>Listings page "
        f"{page} — {host}</title></head>\n<body>\n"
        f'<h1 class="page-title">Hotels &amp; Restaurants — page {page}</h1>\n'
        f'<div class="results">\n{rows}</div>\n{nxt}</body></html>\n'
    )
    return doc.encode("utf-8")


def render_detail(host: str, fields: dict, related_hrefs: list[str]) -> bytes:
    revs = "".join(f"<li>{_e(r)}</li>\n" for r in fields["reviews"])
    rel = "".join(f'<a class="related-link" href="{h}">related</a>\n' for h in related_hrefs)
    doc = (
        "<!DOCTYPE html>\n<html><head><title>"
        f"{_e(fields['name'])} — {host}</title></head>\n<body>\n"
        f'<h1 class="name">{_e(fields["name"])}</h1>\n'
        f'<p class="address">{_e(fields["address"])}</p>\n'
        f'<span class="rating">{fields["rating"]}</span>\n'
        f'<span class="price">{fields["price"]}</span>\n'
        f'<span class="review-count">{fields["review_count"]} reviews</span>\n'
        f'<ul class="reviews">\n{revs}</ul>\n'
        f'<div class="related">\n{rel}</div>\n'
        "</body></html>\n"
    )
    return doc.encode("utf-8")


def gen_host_pages(spec: CorpusSpec, host_idx: int, n_details: list[int], ts_offset: int) -> pa.Table:
    """All pages (listings + details) for one host, as a PAGES_FULL-minus-hash table.

    ``n_details`` is the full per-host allocation (cross-links need to know
    other hosts' valid detail ids). Deterministic given (spec, host_idx).
    """
    host = spec.host(host_idx)
    rng = random.Random(f"{spec.seed}:{host}")
    nd = n_details[host_idx]
    n_listing = (nd + spec.page_size - 1) // spec.page_size
    lang = LANGS[(host_idx * 2654435761) % len(LANGS)]

    urls: list[str] = []
    htmls: list[bytes] = []
    statuses: list[int] = []
    locations: list[str] = []

    # listing chain: listing/p -> cards + next ([B:north_star] listing pages)
    for p in range(n_listing):
        ids = range(p * spec.page_size, min((p + 1) * spec.page_size, nd))
        cards = []
        for d in ids:
            f = detail_fields(host_idx, host, d)
            href = (f"/moved/{d:05d}" if is_moved(spec, host_idx, d)
                    else f"/refresh/{d:05d}" if is_refreshed(spec, host_idx, d)
                    else f"/{f['kind']}/{d:05d}")
            cards.append(
                {"detail_href": href, "name": f["name"],
                 "rating": f["rating"], "price": f["price"]}
            )
        nxt = f"/listing/{p + 1:05d}" if p + 1 < n_listing else None
        urls.append(listing_url(host, p))
        htmls.append(render_listing(host, p, cards, nxt))
        statuses.append(200)
        locations.append("")

    # detail pages with 0–2 cross-links (dup / offsite / dangling / overlong)
    for d in range(nd):
        f = detail_fields(host_idx, host, d)
        rel: list[str] = []
        for _ in range(rng.randrange(3)):
            r = rng.random()
            if r < 0.55:  # same-host duplicate-ish link (exercises F1 dedup)
                t = rng.randrange(nd)
                rel.append(f"/{detail_kind(host_idx, t)}/{t:05d}")
            elif r < 0.75:  # cross-host link (exercises host partitioning)
                ti = rng.randrange(spec.n_hosts)
                td = rng.randrange(n_details[ti])
                rel.append(detail_url(spec.host(ti), detail_kind(ti, td), td))
            elif r < 0.85:  # offsite (exercises M7)
                rel.append(f"https://ext{rng.randrange(5)}.offsite.org/page{rng.randrange(100)}")
            elif r < 0.85 + spec.dangling_frac * 3:  # dangling (fetch-join miss)
                rel.append(f"/hotel/{90000 + rng.randrange(1000):05d}")
            else:  # overlong URL (exercises M8)
                rel.append(f"/hotel/{'x' * 2100}")
        urls.append(detail_url(host, f["kind"], d))
        htmls.append(render_detail(host, f, rel))
        statuses.append(rng.choice([404, 500]) if rng.random() < spec.error_frac else 200)
        locations.append("")

    # 301 alias pages for moved details (redirect middleware, round 3):
    # empty body, Location = relative canonical path (engine must urljoin)
    for d in range(nd):
        if is_moved(spec, host_idx, d):
            urls.append(moved_url(host, d))
            htmls.append(b"")
            statuses.append(301)
            locations.append(f"/{detail_kind(host_idx, d)}/{d:05d}")

    # 200 meta-refresh interstitials (MetaRefreshMiddleware, round 3 cont.)
    for d in range(nd):
        if is_refreshed(spec, host_idx, d):
            delay = refresh_delay(spec, host_idx, d)
            urls.append(refresh_url(host, d))
            htmls.append(render_refresh(
                d, f"/{detail_kind(host_idx, d)}/{d:05d}", delay,
                variant=d % 2))
            statuses.append(200)
            locations.append("")

    n = len(urls)
    ts = pa.array((np.arange(n, dtype=np.int64) + ts_offset) * 7_000_000 + _EPOCH_US,
                  type=pa.timestamp("us"))
    texts = [visible_text(h) for h in htmls]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([lang] * n, type=pa.string()),
            "host": pa.array([host] * n, type=pa.string()),
            "status": pa.array(statuses, type=pa.int16()),
            "location": pa.array(locations, type=pa.string()),
        }
    )


def _finish(t: pa.Table, n_buckets: int) -> pa.Table:
    h = hash64(t["url"].to_pylist())
    t = t.append_column("url_hash", pa.array(h, type=pa.uint64()))
    return t.append_column("bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int32)))


def generate_corpus(root: str, spec: CorpusSpec, use_ray: bool = True) -> dict:
    """Write the corpus under ``root``; returns meta dict. Idempotent: if a
    matching meta.json exists the corpus is reused (content is deterministic).

    Generation parallelizes over hosts with plain Ray tasks when a session is
    live (hosts are independent); the writes are bucketed by url_hash for
    partition-pruned fetch-joins (SURVEY.md §2.4 J1).
    """
    meta_path = os.path.join(root, "meta.json")
    want = {"spec": asdict(spec), "version": 5,
            "has_redirects": spec.redirect_frac > 0,
            "has_metarefresh": spec.metarefresh_frac > 0}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            if json.load(fh) == want:
                return want
    n_details = zipf_alloc(spec)
    offsets = np.concatenate([[0], np.cumsum(
        [((nd + spec.page_size - 1) // spec.page_size) + nd for nd in n_details])]).tolist()

    import ray

    if use_ray and ray.is_initialized():
        # ray.put the shared per-host allocation ONCE (top-level ObjectRef
        # args auto-deref): at 100k hosts the list is ~1 MB, and passing it
        # by value re-serializes it per task — O(n_hosts^2) bytes, measured
        # as a generation stall at the 10M-page corpus. Batch hosts per
        # task for the same reason (dispatch overhead at 100k tasks).
        nd_ref = ray.put(n_details)

        @ray.remote
        def _gen_chunk(spec, lo: int, hi: int, nd, offs: list[int]) -> pa.Table:
            return pa.concat_tables([
                gen_host_pages(spec, i, nd, offs[i - lo])
                for i in range(lo, hi)])

        step = max(1, spec.n_hosts // 512)
        futs = [_gen_chunk.remote(spec, lo, min(lo + step, spec.n_hosts),
                                  nd_ref, offsets[lo:min(lo + step, spec.n_hosts)])
                for lo in range(0, spec.n_hosts, step)]
        parts = ray.get(futs)
    else:
        parts = [gen_host_pages(spec, i, n_details, offsets[i]) for i in range(spec.n_hosts)]
    full = _finish(pa.concat_tables(parts), spec.n_buckets)

    tmp = root + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    for b in range(spec.n_buckets):
        d = os.path.join(tmp, "pages", f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        sub = full.filter(pa.compute.equal(full["bucket"], b)).sort_by("url")
        pq.write_table(sub, os.path.join(d, "part.parquet"))

    # robots fixtures (FIXTURES.md §3): 80% allow-all / 10% disallow /hotel/ /
    # 10% crawl-delay 1
    hosts, bodies = [], []
    for i in range(spec.n_hosts):
        r = random.Random(f"{spec.seed}:robots:{i}").random()
        if r < 0.8:
            body = "User-agent: *\nAllow: /\n"
        elif r < 0.9:
            body = "User-agent: *\nDisallow: /hotel/\n"
        else:
            body = "User-agent: *\nCrawl-delay: 1\n"
        hosts.append(spec.host(i))
        bodies.append(body)
    pq.write_table(pa.table({"host": hosts, "body": bodies}, schema=schemas.ROBOTS),
                   os.path.join(tmp, "robots.parquet"))

    # seeds: the root listing page of every host, priority 0 (FIXTURES.md §2)
    pq.write_table(
        pa.table({"url": [listing_url(spec.host(i), 0) for i in range(spec.n_hosts)],
                  "priority": pa.array([0] * spec.n_hosts, type=pa.int32())},
                 schema=schemas.SEEDS),
        os.path.join(tmp, "seeds.parquet"),
    )
    with open(os.path.join(tmp, "meta.json"), "w") as fh:
        json.dump(want, fh)

    import shutil
    if os.path.exists(root):
        shutil.rmtree(root)
    os.rename(tmp, root)
    return want


def corpus_paths(root: str) -> dict:
    """``pages`` maps bucket id -> bucket DIRECTORY (``.../bucket=<k>``),
    each holding >=1 parquet file — both the generator's single-file layout
    and ``ingest.import_pages``'s multi-file layout. A dict, NOT a
    positional list: ``write_parquet(partition_cols=...)`` creates dirs only
    for non-empty buckets, so an ingested corpus can have holes — a missing
    bucket id must read as a fetch miss, not an off-by-k misalignment."""
    pages_dir = os.path.join(root, "pages")
    return {
        "pages": {
            int(d.split("bucket=")[1]): os.path.join(pages_dir, d)
            for d in os.listdir(pages_dir) if d.startswith("bucket=")
        },
        "robots": os.path.join(root, "robots.parquet"),
        "seeds": os.path.join(root, "seeds.parquet"),
    }
