"""Small-file compaction (sources/compact.py): bin-packing plan properties,
content-exact compaction of a real checkpointed crawl sink, and the
atomic-commit discipline (source untouched, tmp never visible)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from scrapy_ray.sources.compact import (compact_parquet_dir, list_parquet_files,
                                        plan_compaction, verify_compaction)


def test_plan_bin_packing_properties():
    files = [(f"f{i}", sz) for i, sz in
             enumerate([10, 20, 70, 5, 100, 1, 1, 1, 200, 50])]
    bins = plan_compaction(files, target_bytes=100)
    # every file exactly once, order preserved (contiguous runs)
    flat = [p for b in bins for p in b]
    assert flat == [p for p, _ in files]
    # no bin except oversized singletons exceeds the target
    size = dict(files)
    for b in bins:
        if len(b) > 1:
            assert sum(size[p] for p in b) <= 100
    # oversized file is alone in its bin
    assert ["f8"] in bins or any(b == ["f8"] for b in bins)
    assert plan_compaction([], 100) == []


def test_compaction_of_wave_sink_is_content_exact(ray_session, tmp_path):
    """Crawl with a checkpoint sink (one parquet per wave), compact the
    items directory: fewer files, identical sorted content, source
    untouched."""
    from scrapy_ray.config import CrawlConfig
    from scrapy_ray.pipelines.crawl import run_crawl
    from scrapy_ray.sources.corpus import CorpusSpec, generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, CorpusSpec(n_hosts=6, total_pages=200, seed=7))
    ckpt = str(tmp_path / "ckpt")
    run_crawl(corpus, CrawlConfig(n_filter_shards=2, n_frontier_shards=2,
                                  checkpoint_dir=ckpt))
    src = os.path.join(ckpt, "items")
    files_before = list_parquet_files(src)
    assert len(files_before) > 3          # one per wave

    res = compact_parquet_dir(src, target_mb=1)
    assert res["files_out"] < res["files_in"] == len(files_before)
    assert verify_compaction(src, res["out_dir"])

    before = pq.read_table([p for p, _ in files_before]).sort_by("url")
    after = pq.read_table([p for p, _ in list_parquet_files(res["out_dir"])]
                          ).sort_by("url")
    # hive `wave=N` partition keys are materialized as int64 columns in the
    # compacted files; the hive READER infers dictionary<int32> — normalize
    before = before.set_column(
        before.schema.get_field_index("wave"), "wave",
        before["wave"].cast(pa.int64()))
    after = after.select(before.column_names)   # same column order
    assert before.equals(after)
    # source untouched, no tmp residue
    assert list_parquet_files(src) == files_before
    assert not os.path.exists(res["out_dir"] + ".tmp")


def test_hive_key_type_pinned_across_files(ray_session, tmp_path):
    """Zero-padded partition values ('007') must stay strings, and a key
    with mixed int/string values across files must compact with ONE pinned
    type (string) instead of failing mid-bin on a schema mismatch."""
    from scrapy_ray.sources.compact import hive_columns, hive_key_types

    d = tmp_path / "hv"
    t = pa.table({"x": [1, 2, 3]})
    for part in ("007", "42", "abc"):
        sub = d / f"k={part}"
        sub.mkdir(parents=True)
        pq.write_table(t, str(sub / "f.parquet"))
    files = list_parquet_files(str(d))
    kt = hive_key_types(str(d), [p for p, _ in files])
    assert kt == {"k": str}
    # zero-padded value survives verbatim even standalone
    assert hive_columns(str(d), str(d / "k=007" / "f.parquet")) == [("k", "007")]
    res = compact_parquet_dir(str(d), str(tmp_path / "hv_out"), target_mb=64)
    assert res["rows"] == 9
    out = pq.read_table([p for p, _ in
                         list_parquet_files(str(tmp_path / "hv_out"))])
    assert sorted(set(out["k"].to_pylist())) == ["007", "42", "abc"]
    assert out.schema.field("k").type == pa.string()


def test_compaction_respects_target_size(ray_session, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    t = pa.table({"x": list(range(1000))})
    for i in range(12):
        pq.write_table(t, str(d / f"p{i:02d}.parquet"))
    one = os.path.getsize(str(d / "p00.parquet"))
    # target of ~3 files per bin
    res = compact_parquet_dir(str(d), str(tmp_path / "out"),
                              target_mb=max(1, (3 * one) >> 20) or 1)
    assert res["rows"] == 12_000
    out_files = list_parquet_files(str(tmp_path / "out"))
    assert 1 <= len(out_files) < 12
    total = pq.read_table([p for p, _ in out_files])
    assert len(total) == 12_000
