"""Delete/update flow — counterpart of reference
`examples/deleting_updating_documents.rs`."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tantivy_tpu as tt

b = tt.Schema.builder()
b.add_u64_field("id", tt.INDEXED | tt.STORED)
b.add_text_field("title", tt.TEXT | tt.STORED_TEXT)
schema = b.build()

index = tt.Index.create_in_ram(schema)
writer = index.writer()
writer.add_document(tt.Document(id=1, title="first version"))
writer.commit()

# update = delete by primary key + re-add
writer.delete_term(tt.Term.from_field_u64("id", 1))
writer.add_document(tt.Document(id=1, title="second version"))
writer.commit()

searcher = index.reader().searcher()
hits = searcher.search(tt.TermQuery(tt.Term.from_field_u64("id", 1)), tt.TopDocs(10))
for _, addr in hits:
    print(searcher.doc(addr).get_first("title"))
