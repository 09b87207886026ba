// Native indexing core: tokenizer + term-hash postings accumulator.
//
// Plays the role of the reference's `stacker/` arena hashmap +
// `SpecializedPostingsWriter` hot loop (`src/postings/postings_writer.rs`),
// as host-native C++ (the environment has no Rust). The Python SegmentWriter
// routes ASCII text through this core; tokenization here matches the Python
// "default" analyzer on ASCII input (split on non-alphanumeric, lowercase,
// drop tokens with byte length >= 40).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 indexer_core.cc -o libindexer_core.so
// Interface: plain extern "C" functions driven via ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct TermRec {
  std::vector<uint32_t> docs;
  std::vector<uint32_t> tfs;
  std::vector<uint32_t> positions;
};

struct FieldPostings {
  std::unordered_map<std::string, TermRec> terms;
  uint64_t total_tokens = 0;
};

struct IndexerCore {
  std::unordered_map<uint32_t, FieldPostings> fields;
  // export scratch (sorted views built by prepare_export)
  std::unordered_map<uint32_t, std::vector<const std::pair<const std::string, TermRec>*>>
      sorted;
};

inline bool ascii_alnum(unsigned char c) {
  return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
         (c >= 'A' && c <= 'Z');
}

inline void record(FieldPostings& fp, const char* tok, size_t len,
                   uint32_t doc_id, uint32_t position, bool with_positions) {
  std::string key(tok, len);
  TermRec& rec = fp.terms[key];
  if (!rec.docs.empty() && rec.docs.back() == doc_id) {
    rec.tfs.back() += 1;
  } else {
    rec.docs.push_back(doc_id);
    rec.tfs.push_back(1);
  }
  if (with_positions) rec.positions.push_back(position);
  fp.total_tokens += 1;
}

}  // namespace

extern "C" {

void* indexer_new() { return new IndexerCore(); }

void indexer_free(void* h) { delete static_cast<IndexerCore*>(h); }

// Tokenize ASCII `text` with the "default" pipeline and record postings.
// Returns the number of tokens KEPT (fieldnorm contribution). Positions are
// assigned pre-filter (like the Python SimpleTokenizer), so dropped-long
// tokens leave position gaps; `pos_offset` continues multi-valued fields.
uint32_t indexer_index_text(void* h, uint32_t field_id, uint32_t doc_id,
                            const char* text, int64_t len,
                            int with_positions, uint32_t pos_offset,
                            int64_t remove_long_limit) {
  IndexerCore* core = static_cast<IndexerCore*>(h);
  FieldPostings& fp = core->fields[field_id];
  uint32_t position = pos_offset;
  uint32_t kept = 0;
  char buf[256];
  int64_t i = 0;
  while (i < len) {
    while (i < len && !ascii_alnum(static_cast<unsigned char>(text[i]))) i++;
    int64_t start = i;
    while (i < len && ascii_alnum(static_cast<unsigned char>(text[i]))) i++;
    int64_t tok_len = i - start;
    if (tok_len == 0) continue;
    if (tok_len < remove_long_limit) {
      // lowercase into buf (token shorter than limit < 256)
      for (int64_t j = 0; j < tok_len; j++) {
        char c = text[start + j];
        buf[j] = (c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32) : c;
      }
      record(fp, buf, static_cast<size_t>(tok_len), doc_id, position,
             with_positions != 0);
      kept += 1;
    }
    position += 1;
  }
  return kept;
}

// Batched variant: one ctypes call (GIL released once) tokenizes many docs'
// texts for one field. `buf` is the concatenation of n entries' ASCII texts
// with `offsets[n+1]` boundaries; `doc_ids[i]` / `prevs[i]` give each
// entry's doc and its pre-batch kept-token offset. Entries are processed in
// order; consecutive entries of the SAME doc continue the position/kept
// accumulation within the call (multi-valued fields). `kept_out[i]` returns
// each entry's kept-token count (fieldnorm contribution).
void indexer_index_text_batch(void* h, uint32_t field_id,
                              const uint32_t* doc_ids, const uint32_t* prevs,
                              const char* buf, const int64_t* offsets,
                              int64_t n, int with_positions,
                              int64_t remove_long_limit,
                              uint32_t* kept_out) {
  uint32_t last_doc = 0xFFFFFFFFu;
  uint32_t running = 0;
  for (int64_t i = 0; i < n; i++) {
    uint32_t prev = prevs[i];
    if (doc_ids[i] == last_doc) prev += running;
    uint32_t kept = indexer_index_text(
        h, field_id, doc_ids[i], buf + offsets[i],
        offsets[i + 1] - offsets[i], with_positions, prev,
        remove_long_limit);
    kept_out[i] = kept;
    if (doc_ids[i] == last_doc) {
      running += kept;
    } else {
      last_doc = doc_ids[i];
      running = kept;
    }
  }
}

// Record a single pre-encoded term (numeric/facet/etc. path).
void indexer_subscribe(void* h, uint32_t field_id, uint32_t doc_id,
                       const char* term_bytes, int64_t len) {
  IndexerCore* core = static_cast<IndexerCore*>(h);
  FieldPostings& fp = core->fields[field_id];
  record(fp, term_bytes, static_cast<size_t>(len), doc_id, 0, false);
  // record() counted one token; that matches reference subscribe semantics.
}

// ---- export ---------------------------------------------------------------

// Sorts terms and reports sizes. Returns 1 if the field exists.
int indexer_prepare_export(void* h, uint32_t field_id, int64_t* n_terms,
                           int64_t* term_bytes_len, int64_t* n_postings,
                           int64_t* n_positions, int64_t* total_tokens) {
  IndexerCore* core = static_cast<IndexerCore*>(h);
  auto it = core->fields.find(field_id);
  if (it == core->fields.end()) return 0;
  auto& view = core->sorted[field_id];
  view.clear();
  view.reserve(it->second.terms.size());
  for (auto& kv : it->second.terms) view.push_back(&kv);
  std::sort(view.begin(), view.end(),
            [](const auto* a, const auto* b) { return a->first < b->first; });
  int64_t tb = 0, np = 0, npos = 0;
  for (const auto* kv : view) {
    tb += static_cast<int64_t>(kv->first.size());
    np += static_cast<int64_t>(kv->second.docs.size());
    npos += static_cast<int64_t>(kv->second.positions.size());
  }
  *n_terms = static_cast<int64_t>(view.size());
  *term_bytes_len = tb;
  *n_postings = np;
  *n_positions = npos;
  *total_tokens = static_cast<int64_t>(it->second.total_tokens);
  return 1;
}

// Fills caller-allocated arrays (sizes from indexer_prepare_export):
//  term_data[u8, term_bytes_len], term_offsets[i64, n_terms+1],
//  post_offsets[i64, n_terms+1], docs[u32, n_postings], tfs[u32, n_postings],
//  positions[u32, n_positions]
void indexer_export(void* h, uint32_t field_id, uint8_t* term_data,
                    int64_t* term_offsets, int64_t* post_offsets,
                    uint32_t* docs, uint32_t* tfs, uint32_t* positions) {
  IndexerCore* core = static_cast<IndexerCore*>(h);
  auto& view = core->sorted[field_id];
  int64_t tb = 0, np = 0, npos = 0;
  term_offsets[0] = 0;
  post_offsets[0] = 0;
  int64_t i = 0;
  for (const auto* kv : view) {
    const std::string& term = kv->first;
    const TermRec& rec = kv->second;
    std::memcpy(term_data + tb, term.data(), term.size());
    tb += static_cast<int64_t>(term.size());
    std::memcpy(docs + np, rec.docs.data(), rec.docs.size() * 4);
    std::memcpy(tfs + np, rec.tfs.data(), rec.tfs.size() * 4);
    np += static_cast<int64_t>(rec.docs.size());
    if (!rec.positions.empty()) {
      std::memcpy(positions + npos, rec.positions.data(),
                  rec.positions.size() * 4);
      npos += static_cast<int64_t>(rec.positions.size());
    }
    i += 1;
    term_offsets[i] = tb;
    post_offsets[i] = np;
  }
}

void indexer_clear(void* h) {
  IndexerCore* core = static_cast<IndexerCore*>(h);
  core->fields.clear();
  core->sorted.clear();
}

}  // extern "C"
