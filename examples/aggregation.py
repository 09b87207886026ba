"""Aggregations — counterpart of reference `examples/aggregation.rs`:
ES-style histogram + stats over fast fields."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json

import tantivy_tpu as tt

b = tt.Schema.builder()
b.add_text_field("category", tt.TextOptions(indexed=True, tokenizer="raw", fast=True))
b.add_f64_field("price", tt.FAST)
schema = b.build()

index = tt.Index.create_in_ram(schema)
writer = index.writer()
for cat, price in [("shoes", 59.9), ("shoes", 79.9), ("bags", 120.0),
                   ("bags", 80.0), ("hats", 19.5)]:
    writer.add_document(tt.Document(category=cat, price=price))
writer.commit()

searcher = index.reader().searcher()
result = searcher.search(tt.AllQuery(), tt.AggregationCollector({
    "by_category": {
        "terms": {"field": "category"},
        "aggs": {"price_stats": {"stats": {"field": "price"}}},
    },
    "price_histogram": {"histogram": {"field": "price", "interval": 50.0}},
}))
print(json.dumps(result, indent=2))
