"""Basic search — counterpart of reference `examples/basic_search.rs`:
define a schema, index three docs, run a term query, fetch the doc."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tantivy_tpu as tt

schema_builder = tt.Schema.builder()
title = schema_builder.add_text_field("title", tt.TEXT | tt.STORED_TEXT)
body = schema_builder.add_text_field("body", tt.TEXT)
schema = schema_builder.build()

index = tt.Index.create_in_ram(schema)
writer = index.writer()
writer.add_document(tt.Document(
    title="The Old Man and the Sea",
    body="He was an old man who fished alone in a skiff in the Gulf Stream",
))
writer.add_document(tt.Document(
    title="Of Mice and Men",
    body="A few miles south of Soledad, the Salinas River drops in close to "
         "the hillside bank",
))
writer.add_document(tt.Document(
    title="Frankenstein; or, the Modern Prometheus",
    body="You will rejoice to hear that no disaster has accompanied the "
         "commencement of an enterprise",
))
writer.commit()

searcher = index.reader().searcher()
query = index.parse_query("sea whale", ["title", "body"])
top_docs = searcher.search(query, tt.TopDocs(10))
for score, doc_address in top_docs:
    doc = searcher.doc(doc_address)
    print(f"{score:.4f}  {doc.get_first('title')}")
