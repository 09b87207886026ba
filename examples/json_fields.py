"""JSON fields: schemaless attributes with per-path dynamic fast columns —
search dotted paths, aggregate over them, and explain a score.
(Reference: `src/schema/field_type.rs` JSON type + `fastfield/readers.rs`
dynamic columns.)"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tantivy_tpu as tt

b = tt.Schema.builder()
b.add_text_field("title", tt.TEXT | tt.STORED_TEXT)
b.add_json_field("attrs", tt.TEXT | tt.FAST)
schema = b.build()

index = tt.Index.create_in_ram(schema)
writer = index.writer()
products = [
    ("red running shoe", {"color": "red", "price": 59.0, "stock": 12}),
    ("blue trail shoe", {"color": "blue", "price": 89.5, "stock": 3}),
    ("red sandal", {"color": "red", "price": 25.0, "stock": 40}),
    ("black boot", {"color": "black", "price": 120.0, "stock": 7}),
]
for title, attrs in products:
    writer.add_document(tt.Document(title=title, attrs=attrs))
writer.commit()

searcher = index.reader().searcher()

# dotted-path term query against the JSON field
q = index.parse_query("attrs.color:red", ["title"])
hits = searcher.search(q, tt.TopDocs(10))
print("red products:", [searcher.doc(a).get_first("title") for _, a in hits])
assert len(hits) == 2

# aggregate over a dynamic JSON path column
from tantivy_tpu.aggregation import AggregationCollector

res = searcher.search(tt.AllQuery(), AggregationCollector({
    "by_color": {"terms": {"field": "attrs.color"},
                 "aggs": {"avg_price": {"avg": {"field": "attrs.price"}}}},
}))
for bucket in res["by_color"]["buckets"]:
    print(f"  {bucket['key']}: {bucket['doc_count']} items, "
          f"avg price {bucket['avg_price']['value']:.2f}")

# explain one score
q2 = index.parse_query("shoe", ["title"])
top = searcher.search(q2, tt.TopDocs(1))
print("explain:", q2.explain(searcher, top[0][1]).to_pretty_json()[:160], "...")
