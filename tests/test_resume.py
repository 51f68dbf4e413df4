"""Checkpoint/resume (north_rule: resumable from snapshot with per-partition
lineage): kill after round k, resume in a NEW engine, final state identical."""

import shutil

from anycrawl_spark import synth
from anycrawl_spark.crawl.params import CrawlParams
from anycrawl_spark.crawl.superstep import CrawlEngine


def test_resume_identical_final_state(spark, tmp_path):
    jobs = [dict(j, limit=30) for j in synth.seed_jobs(2)]
    robots = synth.robots_rules()
    params = CrawlParams(max_rounds=40)

    # full uninterrupted run
    wd_full = str(tmp_path / "full")
    full = CrawlEngine(spark, wd_full, jobs, robots, params, num_buckets=8)
    full.init_state()
    full.run()

    # interrupted run: stop after 3 rounds, resume with a fresh engine object
    wd_part = str(tmp_path / "part")
    part = CrawlEngine(spark, wd_part, jobs, robots, params, num_buckets=8)
    part.init_state()
    part.run(max_rounds=3)
    assert part.store.last_round == 2
    del part

    resumed = CrawlEngine(spark, wd_part, jobs, robots, params, num_buckets=8)
    next_round = resumed.resume()
    assert next_round == 3
    resumed.run()

    assert resumed.seen_sets() == full.seen_sets()
    assert resumed.discovery() == full.discovery()
    assert resumed.terminal_status() == full.terminal_status()
    assert resumed.done == full.done
    assert resumed.enqueued == full.enqueued

    shutil.rmtree(wd_full, ignore_errors=True)
    shutil.rmtree(wd_part, ignore_errors=True)


def test_documents_spans_shape(spark, tmp_path):
    """Documents table carries the input_hint spans payload with dense offsets."""
    jobs = synth.seed_jobs(1)
    params = CrawlParams(max_rounds=3)
    wd = str(tmp_path / "docs")
    eng = CrawlEngine(spark, wd, jobs, [], params, num_buckets=8)
    eng.init_state()
    eng.run(max_rounds=3)
    docs = eng.store.read_appends("documents")
    rows = docs.collect()
    assert rows
    for r in rows:
        kinds = {s.kind for s in r.spans}
        assert kinds <= {"text", "media"}
        assert [s.offset for s in r.spans] == list(range(len(r.spans)))
        for s in r.spans:
            if s.kind == "media":
                assert s.media_ref and s.media_ref.startswith("http")
            else:
                assert s.text
    # at least one doc interleaves text and media
    assert any({s.kind for s in r.spans} == {"text", "media"} for r in rows)
