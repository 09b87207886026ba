"""Snippets — counterpart of reference `examples/snippet.rs`."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tantivy_tpu as tt

b = tt.Schema.builder()
b.add_text_field("body", tt.TEXT | tt.STORED_TEXT)
schema = b.build()

index = tt.Index.create_in_ram(schema)
writer = index.writer()
writer.add_document(tt.Document(body=(
    "In the heart of the ancient forest, where sunlight barely touched the "
    "ground, a hidden stream carved its way through moss-covered stones."
)))
writer.commit()

searcher = index.reader().searcher()
query = index.parse_query("stream stones", ["body"])
generator = tt.SnippetGenerator.from_searcher(searcher, query, "body")
for score, addr in searcher.search(query, tt.TopDocs(5)):
    snippet = generator.snippet_from_doc(searcher.doc(addr))
    print(snippet.to_html())
