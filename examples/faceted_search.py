"""Faceted search — counterpart of reference `examples/faceted_search.rs`."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tantivy_tpu as tt

b = tt.Schema.builder()
b.add_text_field("name", tt.TEXT)
b.add_facet_field("tags")
schema = b.build()

index = tt.Index.create_in_ram(schema)
writer = index.writer()
for name, tag in [("gray squirrel", "/animal/rodent"),
                  ("beaver", "/animal/rodent"),
                  ("gray wolf", "/animal/canine"),
                  ("fir", "/plant/tree")]:
    doc = tt.Document(name=name)
    doc.add_facet("tags", tag)
    writer.add_document(doc)
writer.commit()

searcher = index.reader().searcher()
facets = tt.FacetCollector("tags")
facets.add_facet("/animal")
counts = searcher.search(tt.AllQuery(), facets)
for facet, count in counts.get("/animal"):
    print(facet.to_path_string(), count)
