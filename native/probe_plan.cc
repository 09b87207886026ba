// Native helpers for the fused-probe launch assembly (hot host path).
//
// group_work_sorted: single-pass equivalent of the numpy `_group_work`
// (tantivy_tpu/ops/pallas_probe.py) for the common case where groupable
// items arrive with nondecreasing (prow, clause, block/8) keys — the
// planner emits items in that order, so the pass runs without any sort.
// Non-groupable items become singleton groups inline; groups whose unioned
// window exceeds kw_max are demoted to singletons (same as the numpy
// "wide" path). Returns the group count, or -1 when a key inversion is
// detected (caller falls back to the numpy argsort path).
//
// Counterpart in spirit to reference tantivy's branchless block-WAND inner
// loops (src/query/boolean_query/block_wand.rs): the probe plan itself is
// the hot loop here, the scoring runs on the TPU.

#include <cstdint>
#include <cstring>

namespace {

constexpr int64_t I32MAX = 2147483647;

struct Outs {
  int64_t* base;
  int64_t* mask;
  int32_t* prow;
  int32_t* cl;
  int32_t* qid;
  int32_t* seg;
  int32_t* jlo;  // [*, T]
  int32_t* pk;   // [*, T, 8]
  int32_t* eff;
};

// Emit one group from member slots. jm/wm/fm: [8][T] member windows
// (jm = -1 for empty slots). Returns the group's eff (max unioned width).
inline int32_t emit_group(int T, int64_t base, int64_t mask, int32_t prow,
                          int32_t cl, int32_t qid, int32_t seg,
                          const int32_t (*jm)[32], const int32_t (*wm)[32],
                          const int32_t (*fm)[32], int64_t g, Outs& o) {
  o.base[g] = base;
  o.mask[g] = mask;
  o.prow[g] = prow;
  o.cl[g] = cl;
  o.qid[g] = qid;
  o.seg[g] = seg;
  int32_t eff = 0;
  for (int t = 0; t < T; t++) {
    int64_t jmin = I32MAX, iend = -1;
    for (int r = 0; r < 8; r++) {
      int32_t j = jm[r][t];
      if (j >= 0) {
        if (j < jmin) jmin = j;
        int64_t e = (int64_t)j + wm[r][t];
        if (e > iend) iend = e;
      }
    }
    int32_t jg = (jmin == I32MAX) ? -1 : (int32_t)jmin;
    o.jlo[g * T + t] = jg;
    int32_t wg = (jg >= 0) ? (int32_t)(iend - jg) : 0;
    if (wg > eff) eff = wg;
    int32_t* pk = o.pk + (g * T + t) * 8;
    for (int r = 0; r < 8; r++) {
      int32_t j = jm[r][t];
      if (j >= 0) {
        int32_t off = j - jg + fm[r][t];
        int32_t len = wm[r][t] - fm[r][t];
        pk[r] = (len > 0) ? ((off << 8) | len) : 0;
      } else {
        pk[r] = 0;
      }
    }
  }
  o.eff[g] = eff;
  return eff;
}

}  // namespace

extern "C" int64_t group_work_sorted(
    int64_t n, int32_t T, int32_t kw_max, const int64_t* blocks,
    const int32_t* prow, const int32_t* clause, const int32_t* qid,
    const int32_t* seg, const int32_t* jlo, const int32_t* wid,
    const int32_t* frc, const uint8_t* groupable, int64_t* g_base,
    int64_t* g_mask, int32_t* g_prow, int32_t* g_cl, int32_t* g_qid,
    int32_t* g_seg, int32_t* g_jlo, int32_t* g_pk, int32_t* g_eff) {
  if (T > 32) return -1;  // member window slots are [8][32]
  Outs o{g_base, g_mask, g_prow, g_cl, g_qid, g_seg, g_jlo, g_pk, g_eff};
  int64_t g = 0;

  // open-group state (groupable run)
  bool open = false;
  int64_t cur_prow = 0, cur_cl = 0, cur_run = 0;
  int64_t cur_mask = 0;
  int32_t cur_qid = 0, cur_seg = 0;
  int32_t jm[8][32], wm[8][32], fm[8][32];
  // pending singleton members of a WIDE group (demoted): emit each as its
  // own singleton group
  int64_t memb_blocks[8];
  int32_t memb_jlo[8][32], memb_wid[8][32], memb_frc[8][32];
  int n_memb = 0;

  auto close = [&]() {
    if (!open) return;
    int64_t base = cur_run * 8;
    // tentative group emit at slot g; if too wide, rewrite as singletons
    int32_t eff =
        emit_group(T, base, cur_mask, (int32_t)cur_prow, (int32_t)cur_cl,
                   cur_qid, cur_seg, jm, wm, fm, g, o);
    if (eff <= kw_max || n_memb <= 1) {
      g++;
    } else {
      // demote: one singleton per member (matches numpy `singles`)
      for (int m = 0; m < n_memb; m++) {
        int64_t b = memb_blocks[m];
        int32_t sj[8][32], sw[8][32], sf[8][32];
        for (int r = 0; r < 8; r++)
          for (int t = 0; t < T; t++) {
            sj[r][t] = -1;
            sw[r][t] = 0;
            sf[r][t] = 0;
          }
        int r = (int)(b & 7);
        for (int t = 0; t < T; t++) {
          sj[r][t] = memb_jlo[m][t];
          sw[r][t] = (memb_jlo[m][t] >= 0) ? memb_wid[m][t] : 0;
          sf[r][t] = (memb_jlo[m][t] >= 0) ? memb_frc[m][t] : 0;
        }
        emit_group(T, (b / 8) * 8, (int64_t)1 << r, (int32_t)cur_prow,
                   (int32_t)cur_cl, cur_qid, cur_seg, sj, sw, sf, g, o);
        g++;
      }
    }
    open = false;
    n_memb = 0;
  };

  for (int64_t i = 0; i < n; i++) {
    const int32_t* ji = jlo + i * T;
    const int32_t* wi = wid + i * T;
    const int32_t* fi = frc + i * T;
    if (!groupable[i]) {
      // singleton emitted inline; the open groupable run (if any) stays
      // open — the numpy path groups by KEY over groupable items, so a
      // same-key run separated by interleaved singletons still merges
      int32_t sj[8][32], sw[8][32], sf[8][32];
      for (int r = 0; r < 8; r++)
        for (int t = 0; t < T; t++) {
          sj[r][t] = -1;
          sw[r][t] = 0;
          sf[r][t] = 0;
        }
      int64_t b = blocks[i];
      int r = (int)(b & 7);
      for (int t = 0; t < T; t++) {
        sj[r][t] = ji[t];
        sw[r][t] = (ji[t] >= 0) ? wi[t] : 0;
        sf[r][t] = (ji[t] >= 0) ? fi[t] : 0;
      }
      emit_group(T, (b / 8) * 8, (int64_t)1 << r, prow[i], clause[i], qid[i],
                 seg[i], sj, sw, sf, g, o);
      g++;
      continue;
    }
    int64_t run = blocks[i] >> 3;
    if (open && prow[i] == cur_prow && clause[i] == cur_cl &&
        run == cur_run) {
      // continue group
    } else {
      // sortedness check over groupable keys (prow, clause, run)
      if (open && (prow[i] < cur_prow ||
                   (prow[i] == cur_prow &&
                    (clause[i] < cur_cl ||
                     (clause[i] == cur_cl && run < cur_run)))))
        return -1;
      close();
      open = true;
      cur_prow = prow[i];
      cur_cl = clause[i];
      cur_run = run;
      cur_qid = qid[i];
      cur_seg = seg[i];
      cur_mask = 0;
      for (int r = 0; r < 8; r++)
        for (int t = 0; t < T; t++) {
          jm[r][t] = -1;
          wm[r][t] = 0;
          fm[r][t] = 0;
        }
    }
    int r = (int)(blocks[i] & 7);
    cur_mask |= (int64_t)1 << r;
    if (n_memb < 8) {
      memb_blocks[n_memb] = blocks[i];
      for (int t = 0; t < T; t++) {
        memb_jlo[n_memb][t] = ji[t];
        memb_wid[n_memb][t] = wi[t];
        memb_frc[n_memb][t] = fi[t];
      }
      n_memb++;
    }
    for (int t = 0; t < T; t++) {
      if (ji[t] >= 0) {
        jm[r][t] = ji[t];
        wm[r][t] = wi[t];
        fm[r][t] = fi[t];
      } else {
        jm[r][t] = -1;
        wm[r][t] = 0;
        fm[r][t] = 0;
      }
    }
  }
  close();
  return g;
}
