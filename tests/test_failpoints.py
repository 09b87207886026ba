"""Injected-failure (failpoint) tests.

Mirrors the reference's `tests/failpoints/mod.rs:7-124` + `fail_point!`
sites (`src/lib.rs:346-373`): named points armed via
`tantivy_tpu.utils.failpoints` simulate crashes/IO failures in the
commit / merge / GC control flow, and these tests prove the atomicity
invariants — a crash mid-commit leaves the previous meta.json live, a
crash mid-merge leaves both source segments searchable, a failed GC
delete is retried by a later pass.
"""

import pytest

import tantivy_tpu as tt
from tantivy_tpu.directory import META_FILEPATH, FsDirectory
from tantivy_tpu.indexer.merge_policy import NoMergePolicy
from tantivy_tpu.utils import failpoints as fp


@pytest.fixture(autouse=True)
def _clean_failpoints():
    yield
    fp.teardown()


def _mk_index(tmp_path=None):
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    if tmp_path is None:
        index = tt.Index.create_in_ram(b.build())
    else:
        index = tt.Index.create_in_dir(str(tmp_path), b.build())
    w = index.writer_for_tests()
    w.set_merge_policy(NoMergePolicy())
    return index, w


def _count(index, word: str) -> int:
    searcher = index.reader().searcher()
    q = index.parse_query(word, ["body"])
    from tantivy_tpu.collector import Count

    return searcher.search(q, Count())


def test_crash_before_meta_publish_keeps_old_commit():
    index, w = _mk_index()
    w.add_document(tt.Document(body="alpha"))
    w.commit()

    w.add_document(tt.Document(body="bravo"))
    with fp.scenario({"meta-file-write": "panic"}):
        with pytest.raises(fp.FailPointPanic):
            w.commit()

    # the crash happened before atomic_write: the previous manifest is
    # what a fresh reader sees — bravo never became searchable
    assert _count(index, "alpha") == 1
    assert _count(index, "bravo") == 0

    # recovery: a retried commit (points disarmed) publishes cleanly.
    # The crashed commit consumed its pending segment, so re-add.
    w.rollback()
    w.add_document(tt.Document(body="bravo"))
    w.commit()
    assert _count(index, "bravo") == 1


def test_crash_after_meta_publish_is_durable():
    index, w = _mk_index()
    w.add_document(tt.Document(body="alpha"))
    with fp.scenario({"meta-file-written": "panic"}):
        with pytest.raises(fp.FailPointPanic):
            w.commit()
    # atomic_write completed: the commit is durable despite the crash
    assert _count(index, "alpha") == 1


def test_crash_during_fs_rename_keeps_old_meta(tmp_path):
    index, w = _mk_index(tmp_path)
    w.add_document(tt.Document(body="alpha"))
    w.commit()

    # crash between writing meta.json.tmp and the rename: the tmp file is
    # on disk but the published meta.json is untouched
    with fp.scenario({"atomic-write-rename": "panic"}):
        with pytest.raises(fp.FailPointPanic):
            index.directory.atomic_write(META_FILEPATH, b"{garbage}")
    assert (tmp_path / (META_FILEPATH + ".tmp")).exists()
    reopened = tt.Index.open_in_dir(str(tmp_path))
    assert _count(reopened, "alpha") == 1

    # a whole-commit crash anywhere in the atomic-write fan-out (segment
    # registration included) must equally leave the old manifest live
    w.add_document(tt.Document(body="bravo"))
    with fp.scenario({"atomic-write-rename": "panic"}):
        with pytest.raises(fp.FailPointPanic):
            w.commit()
    reopened = tt.Index.open_in_dir(str(tmp_path))
    assert _count(reopened, "alpha") == 1
    assert _count(reopened, "bravo") == 0


def test_crash_during_segment_serialize_keeps_old_commit():
    index, w = _mk_index()
    w.add_document(tt.Document(body="alpha"))
    w.commit()
    w.add_document(tt.Document(body="bravo"))
    with fp.scenario({"segment-serialize": "panic"}):
        with pytest.raises(fp.FailPointPanic):
            w.commit()
    assert _count(index, "alpha") == 1
    assert _count(index, "bravo") == 0
    # nothing half-registered: rollback + retry works
    w.rollback()
    w.add_document(tt.Document(body="bravo"))
    w.commit()
    assert _count(index, "alpha") == 1
    assert _count(index, "bravo") == 1


def test_crash_during_merge_swap_keeps_sources_searchable():
    index, w = _mk_index()
    for c in range(2):
        for i in range(20):
            w.add_document(tt.Document(body=f"alpha tok{c}x{i}"))
        w.commit()
    segs = [s.segment_id for s in index.searchable_segment_metas()]
    assert len(segs) == 2

    with fp.scenario({"merge-swap": "panic"}):
        with pytest.raises(fp.FailPointPanic):
            w.merge(segs)

    # both source segments survived the aborted swap
    live = [s.segment_id for s in index.searchable_segment_metas()]
    assert sorted(live) == sorted(segs)
    assert _count(index, "alpha") == 40

    # the orphaned merge output is reclaimed by GC and a retried merge
    # succeeds
    w.garbage_collect_files()
    merged = w.merge(segs)
    assert merged is not None and merged.max_doc == 40
    assert _count(index, "alpha") == 40


def test_failed_gc_delete_is_retried():
    index, w = _mk_index()
    w.add_document(tt.Document(body="alpha"))
    w.commit()
    w.add_document(tt.Document(body="alpha again"))
    w.commit()
    segs = [s.segment_id for s in index.searchable_segment_metas()]

    # arm a recoverable delete failure for every hit BEFORE the merge (the
    # merge triggers a GC of the merged-away files): GC must swallow the
    # failures, keep the paths managed, and a later pass retries them
    fp.cfg("managed-dir-delete", "return(disk hiccup)")
    w.merge(segs)
    leftover = w.garbage_collect_files()
    assert leftover == []  # nothing was actually deleted
    fp.remove("managed-dir-delete")

    deleted = w.garbage_collect_files()
    assert deleted, "retry pass must reclaim the merged-away files"
    assert _count(index, "alpha") == 2


def test_counted_failpoint_fires_then_disarms():
    fp.cfg("managed-dir-delete", "2*return")
    with pytest.raises(fp.FailPointError):
        fp.fail_point("managed-dir-delete")
    with pytest.raises(fp.FailPointError):
        fp.fail_point("managed-dir-delete")
    fp.fail_point("managed-dir-delete")  # third hit: disarmed
    assert fp.active() == {}


def test_env_grammar_round_trip(monkeypatch):
    fp.cfg("a-point", "panic(boom)")
    assert fp.active() == {"a-point": "panic"}
    with pytest.raises(fp.FailPointPanic, match="boom"):
        fp.fail_point("a-point")
    fp.teardown()
    with pytest.raises(ValueError):
        fp.cfg("a-point", "explode")


def test_worker_thread_crash_poisons_writer_not_index():
    """A failpoint crash inside a threaded worker's flush must not corrupt
    the committed index (reference: worker panics are caught at join and
    poison the writer, index_writer.rs:42-47)."""
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer(num_threads=2)
    w.set_merge_policy(NoMergePolicy())
    w.add_document(tt.Document(body="alpha"))
    w.commit()

    fp.cfg("segment-serialize", "panic")
    for i in range(10):
        w.add_document(tt.Document(body=f"bravo {i}"))
    with pytest.raises(BaseException):
        w.commit()
    fp.teardown()

    assert _count(index, "alpha") == 1
    assert _count(index, "bravo") == 0
