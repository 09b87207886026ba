"""AsciiFoldingFilter (reference `ascii_folding_filter.rs`) and
PreTokenizedString (`tokenizer-api/src/tokenized_string.rs`)."""

import tantivy_tpu as tt
from tantivy_tpu.tokenizer import (
    AsciiFoldingFilter,
    LowerCaser,
    PreTokenizedString,
    SimpleTokenizer,
    TextAnalyzer,
    Token,
)


def test_ascii_folding_filter():
    an = TextAnalyzer(SimpleTokenizer(), [AsciiFoldingFilter(), LowerCaser()])
    toks = [t.text for t in an.token_stream("Rámon château Łódź Straße œuf")]
    assert toks == ["ramon", "chateau", "lodz", "strasse", "oeuf"]
    # pure-ASCII fast path leaves tokens untouched
    toks2 = [t.text for t in an.token_stream("plain ascii words")]
    assert toks2 == ["plain", "ascii", "words"]


def test_ascii_folding_registered_analyzer_end_to_end():
    b = tt.Schema.builder()
    from tantivy_tpu.schema import IndexRecordOption

    b.add_text_field(
        "t",
        (tt.TEXT | tt.STORED_TEXT).set_indexing_options(
            "folded", IndexRecordOption.WITH_FREQS_AND_POSITIONS
        ),
    )
    index = tt.Index.create_in_ram(b.build())
    index.tokenizers.register(
        "folded",
        TextAnalyzer(SimpleTokenizer(), [AsciiFoldingFilter(), LowerCaser()]),
    )
    w = index.writer()
    w.add_document(tt.Document(t="Crème Brûlée"))
    w.add_document(tt.Document(t="creme fraiche"))
    w.commit()
    s = index.reader().searcher()
    q = tt.TermQuery(tt.Term.from_field_text("t", "creme"))
    assert s.search(q, tt.Count()) == 2


def test_pretokenized_string_positions_and_store():
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT | tt.STORED_TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    pre = PreTokenizedString(
        text="The Diary of Muadib",
        tokens=[
            Token("diary", 4, 9, 1),
            Token("muadib", 13, 19, 3),
        ],
    )
    w.add_document(tt.Document(t=pre))
    w.add_document(tt.Document(t="the diary of anne frank"))
    w.commit()
    s = index.reader().searcher()
    # given tokens index verbatim (no lowercasing ran on "The"/"of")
    assert s.search(
        tt.TermQuery(tt.Term.from_field_text("t", "muadib")), tt.Count()
    ) == 1
    assert s.search(
        tt.TermQuery(tt.Term.from_field_text("t", "diary")), tt.Count()
    ) == 2
    # positions honored: gap of 2 between diary(1) and muadib(3)
    q = tt.PhraseQuery("t", ["diary", "muadib"], offsets=[1, 3])
    assert s.search(q, tt.Count()) == 1
    assert s.search(tt.PhraseQuery("t", ["diary", "muadib"]), tt.Count()) == 0
    # stored form is the raw text
    res = s.search(
        tt.TermQuery(tt.Term.from_field_text("t", "muadib")), tt.TopDocs(1)
    )
    doc = s.doc(res[0][1])
    assert doc.get_first("t") == "The Diary of Muadib"


def test_pretokenized_in_batched_ingest_path():
    """add_documents (native batched writer) must route PreTokenizedString
    around the C text core while keeping surrounding ASCII batching."""
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    docs = []
    for i in range(50):
        docs.append(tt.Document(t=f"plain doc {i}"))
        if i % 10 == 0:
            docs.append(tt.Document(t=PreTokenizedString(
                text=f"pre {i}", tokens=[Token(f"pre{i}", 0, 3, 0)]
            )))
    for d in docs:
        w.add_document(d)
    w.commit()
    s = index.reader().searcher()
    assert s.search(
        tt.TermQuery(tt.Term.from_field_text("t", "pre0")), tt.Count()
    ) == 1
    assert s.search(
        tt.TermQuery(tt.Term.from_field_text("t", "plain")), tt.Count()
    ) == 50


def test_fields_metadata():
    """SegmentReader.fields_metadata (reference `segment_reader.rs:300`)."""
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT | tt.STORED_TEXT)
    b.add_u64_field("u", tt.FAST)
    b.add_json_field("j", tt.TEXT | tt.FAST)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    w.add_document(tt.Document(t="hello", u=3, j={"a": 1, "s": "x"}))
    w.commit()
    r = index.reader().searcher().segment_readers()[0]
    md = {m["field_name"]: m for m in r.fields_metadata()}
    assert md["t"]["indexed"] and md["t"]["stored"] and not md["t"]["fast"]
    assert md["u"]["fast"] and not md["u"]["indexed"]
    assert md["j.a"]["fast"] and md["j.a"]["typ"] == "i64"
    assert md["j.s"]["typ"] == "str"
