"""Batched TPU search — the flagship path: thousands of term/boolean queries
per device dispatch with Block-WAND pruning. (No reference counterpart — this
is the TPU-native design center.)"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tantivy_tpu as tt

rng = np.random.default_rng(0)
b = tt.Schema.builder()
b.add_text_field("body", tt.TEXT)
schema = b.build()

index = tt.Index.create_in_ram(schema)
writer = index.writer(memory_budget=1_000_000_000)
words = [f"w{i}" for i in range(500)]
for _ in range(2000):
    writer.add_document(tt.Document(body=" ".join(rng.choice(words, 30))))
writer.commit()

searcher = index.reader().searcher()
executor = tt.BatchExecutor(searcher)

queries = [
    tt.TermQuery(tt.Term.from_field_text("body", w)) for w in words[:64]
] + [
    tt.BooleanQuery.union([
        tt.TermQuery(tt.Term.from_field_text("body", words[i])),
        tt.TermQuery(tt.Term.from_field_text("body", words[i + 1])),
    ])
    for i in range(0, 64, 2)
]
results = executor.search_batch(queries, k=10)
print(f"{len(results)} queries; first query top hit:", results[0][0])
