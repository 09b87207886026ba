"""Multithreaded write path: N workers over the doc queue must produce an
index equivalent to the single-threaded one (doc ids may differ — equality
is on searchable content), and worker lifecycle (commit cycles, rollback)
must stay correct."""

import numpy as np

import tantivy_tpu as tt


def build(num_threads, num_docs=300, seed=3, deletes=False):
    rng = np.random.default_rng(seed)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT | tt.STORED_TEXT)
    b.add_u64_field("num", tt.FAST | tt.INDEXED)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer(num_threads=num_threads)
    words = [f"w{i}" for i in range(25)]
    for i in range(num_docs):
        n = int(rng.integers(1, 15))
        w.add_document(
            tt.Document(body=" ".join(rng.choice(words, n)), num=i % 7)
        )
    if deletes:
        w.delete_term(tt.Term.from_field_text("body", words[0]))
    w.commit()
    w.close()
    return index, words


def corpus_fingerprint(index, words):
    """Content-level fingerprint independent of doc ids / segment split."""
    searcher = index.reader().searcher()
    counts = {
        wd: searcher.search(
            tt.TermQuery(tt.Term.from_field_text("body", wd)), tt.Count()
        )
        for wd in words
    }
    total = searcher.search(tt.AllQuery(), tt.Count())
    scores = {}
    for wd in words[:8]:
        hits = searcher.search(
            tt.TermQuery(tt.Term.from_field_text("body", wd)), tt.TopDocs(3)
        )
        scores[wd] = [round(float(s), 4) for s, _ in hits]
    return counts, total, scores


def test_threaded_matches_single_threaded():
    i1, words = build(num_threads=1)
    i4, _ = build(num_threads=4)
    assert corpus_fingerprint(i1, words) == corpus_fingerprint(i4, words)


def test_threaded_with_deletes():
    i1, words = build(num_threads=1, deletes=True, seed=5)
    i4, _ = build(num_threads=4, deletes=True, seed=5)
    f1, f4 = corpus_fingerprint(i1, words), corpus_fingerprint(i4, words)
    assert f1 == f4
    assert f1[0][words[0]] == 0  # delete applied


def test_threaded_multiple_commits_and_rollback():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer(num_threads=3)
    for i in range(50):
        w.add_document(tt.Document(body=f"alpha doc{i}"))
    w.commit()
    for i in range(50):
        w.add_document(tt.Document(body=f"beta doc{i}"))
    w.rollback()
    for i in range(20):
        w.add_document(tt.Document(body=f"gamma doc{i}"))
    w.commit()
    w.close()
    searcher = index.reader().searcher()

    def count(word):
        return searcher.search(
            tt.TermQuery(tt.Term.from_field_text("body", word)), tt.Count()
        )

    assert count("alpha") == 50
    assert count("beta") == 0
    assert count("gamma") == 20
