"""Randomized functional test + fault injection.

Mirrors reference `src/functional_test.rs` (random add/delete/commit against
a model set, asserting doc-set equality and store integrity) and
`tests/failpoints/` (injected IO failures must leave the index at its last
committed state).
"""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.directory import Directory, FileDoesNotExist, RamDirectory


class TestFunctionalRandom:
    def test_random_ops_match_model(self):
        rng = np.random.default_rng(1234)
        b = tt.Schema.builder()
        b.add_u64_field("id", tt.INDEXED | tt.STORED | tt.FAST)
        schema = b.build()
        index = tt.Index.create_in_ram(schema)
        w = index.writer_for_tests()
        model: set[int] = set()
        committed_model: set[int] = set()
        uncommitted_adds: list[int] = []
        next_id = 0

        for _step in range(300):
            op = rng.random()
            if op < 0.65:
                w.add_document(tt.Document(id=next_id))
                uncommitted_adds.append(next_id)
                next_id += 1
            elif op < 0.85 and (committed_model or uncommitted_adds):
                pool = list(committed_model | set(uncommitted_adds))
                victim = int(pool[int(rng.integers(len(pool)))])
                w.delete_term(tt.Term.from_field_u64("id", victim))
                committed_model.discard(victim)
                uncommitted_adds = [x for x in uncommitted_adds if x != victim]
            else:
                w.commit()
                committed_model |= set(uncommitted_adds)
                uncommitted_adds = []
                searcher = index.reader().searcher()
                assert searcher.num_docs() == len(committed_model)
                # spot-check a few ids
                for v in list(committed_model)[:5]:
                    q = tt.TermQuery(tt.Term.from_field_u64("id", v))
                    assert searcher.search(q, tt.Count()) == 1, v

        w.commit()
        committed_model |= set(uncommitted_adds)
        searcher = index.reader().searcher()
        assert searcher.num_docs() == len(committed_model)
        # full doc-set equality via stored field
        found = set()
        for seg_ord, reader in enumerate(searcher.segment_readers()):
            for d in reader.doc_ids_alive():
                found.add(reader.doc(int(d)).get_first("id"))
        assert found == committed_model

    def test_random_merges_preserve_results(self):
        rng = np.random.default_rng(77)
        b = tt.Schema.builder()
        b.add_text_field("t", tt.TEXT)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        vocab = [f"v{i}" for i in range(10)]
        for c in range(5):
            for _ in range(20):
                n = int(rng.integers(1, 6))
                w.add_document(tt.Document(t=" ".join(rng.choice(vocab, n))))
            w.commit()
        s = index.reader().searcher()
        before = {
            word: s.search(
                tt.TermQuery(tt.Term.from_field_text("t", word)), tt.Count()
            )
            for word in vocab
        }
        metas = index.searchable_segment_metas()
        w.merge([m.segment_id for m in metas[:3]])
        w.merge([m.segment_id for m in index.searchable_segment_metas()])
        s2 = index.reader().searcher()
        assert len(s2.segment_readers()) == 1
        after = {
            word: s2.search(
                tt.TermQuery(tt.Term.from_field_text("t", word)), tt.Count()
            )
            for word in vocab
        }
        assert before == after


class FailingDirectory(Directory):
    """Wraps RamDirectory; fails the Nth write to paths matching `pattern`
    (the failpoint mechanism — reference `fail` crate usage)."""

    def __init__(self):
        self.inner = RamDirectory()
        self._watchers = self.inner._watchers
        self.fail_pattern: str | None = None
        self.fail_countdown = 0

    def _maybe_fail(self, path: str):
        if self.fail_pattern and self.fail_pattern in path:
            if self.fail_countdown == 0:
                raise IOError(f"injected failure writing {path}")
            self.fail_countdown -= 1

    def open_read(self, path):
        return self.inner.open_read(path)

    def write(self, path, data):
        self._maybe_fail(path)
        self.inner.write(path, data)

    def atomic_write(self, path, data):
        self._maybe_fail(path)
        self.inner.atomic_write(path, data)

    def atomic_read(self, path):
        return self.inner.atomic_read(path)

    def delete(self, path):
        self.inner.delete(path)

    def exists(self, path):
        return self.inner.exists(path)

    def list_files(self):
        return self.inner.list_files()

    def acquire_lock(self, name, blocking=False):
        return self.inner.acquire_lock(name, blocking)

    def watch(self, callback):
        return self.inner.watch(callback)


class TestFaultInjection:
    def _make(self):
        from tantivy_tpu.directory import ManagedDirectory
        from tantivy_tpu.index import Index
        from tantivy_tpu.index.segment import IndexMeta

        b = tt.Schema.builder()
        b.add_text_field("t", tt.TEXT | tt.STORED_TEXT)
        schema = b.build()
        failing = FailingDirectory()
        index = Index(ManagedDirectory(failing), schema)
        index.save_metas(IndexMeta(schema_json=schema.to_json()))
        return index, failing

    def test_failed_meta_write_keeps_previous_commit(self):
        index, failing = self._make()
        w = index.writer_for_tests()
        w.add_document(tt.Document(t="first"))
        w.commit()
        # inject failure on the next meta.json write
        failing.fail_pattern = "meta.json"
        w.add_document(tt.Document(t="second"))
        with pytest.raises(IOError):
            w.commit()
        failing.fail_pattern = None
        # index still opens at the previous commit
        s = index.reader().searcher()
        assert s.num_docs() == 1
        assert (
            s.search(tt.TermQuery(tt.Term.from_field_text("t", "first")), tt.Count())
            == 1
        )

    def test_failed_segment_write_fails_cleanly(self):
        index, failing = self._make()
        w = index.writer_for_tests()
        w.add_document(tt.Document(t="first"))
        w.commit()
        failing.fail_pattern = ".idx"
        w.add_document(tt.Document(t="second"))
        with pytest.raises(IOError):
            w.commit()
        failing.fail_pattern = None
        w.rollback()
        s = index.reader().searcher()
        assert s.num_docs() == 1
        # writer remains usable after rollback
        w.add_document(tt.Document(t="third"))
        w.commit()
        assert index.reader().searcher().num_docs() == 2
