// edlib API shim implementation — see edlib.h for scope and rationale.
//
// NW edit-distance with full-matrix direction bytes; traceback walks
// back-to-front preferring diagonal (match/mismatch), then 'D' (consume
// target), then 'I' (consume query) — the same order as
// vechat_tpu/ops/pairwise.py::_full_dp_cigar and csrc/poagraph.cpp::pw_align.
#include "edlib.h"

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>
#include <string>
#include <vector>

extern "C" {

EdlibAlignConfig edlibNewAlignConfig(int k, EdlibAlignMode mode,
                                     EdlibAlignTask task,
                                     const EdlibEqualityPair* eq, int eqLen) {
  EdlibAlignConfig c;
  c.k = k;
  c.mode = mode;
  c.task = task;
  c.additionalEqualities = eq;
  c.additionalEqualitiesLength = eqLen;
  return c;
}

EdlibAlignConfig edlibDefaultAlignConfig(void) {
  return edlibNewAlignConfig(-1, EDLIB_MODE_NW, EDLIB_TASK_DISTANCE, nullptr, 0);
}

EdlibAlignResult edlibAlign(const char* query, int lq, const char* target,
                            int lt, EdlibAlignConfig config) {
  EdlibAlignResult res;
  std::memset(&res, 0, sizeof(res));
  res.status = EDLIB_STATUS_OK;
  res.editDistance = -1;
  res.alphabetLength = 0;

  if (config.mode != EDLIB_MODE_NW) {  // only the mode the reference uses
    res.status = EDLIB_STATUS_ERROR;
    return res;
  }
  if (lq < 0 || lt < 0) {
    res.status = EDLIB_STATUS_ERROR;
    return res;
  }

  const std::size_t W = static_cast<std::size_t>(lt) + 1;
  std::vector<int32_t> prev(W), curr(W);
  // dir: 0 = diag, 1 = 'D' (left), 2 = 'I' (up)
  std::vector<uint8_t> dir;
  try {
    dir.resize((static_cast<std::size_t>(lq) + 1) * W);
  } catch (const std::bad_alloc&) {
    res.status = EDLIB_STATUS_ERROR;
    return res;
  }

  for (int j = 0; j <= lt; ++j) {
    prev[j] = j;
    dir[j] = 1;
  }
  for (int i = 1; i <= lq; ++i) {
    uint8_t* drow = dir.data() + static_cast<std::size_t>(i) * W;
    curr[0] = i;
    drow[0] = 2;
    const char qc = query[i - 1];
    for (int j = 1; j <= lt; ++j) {
      int32_t d = prev[j - 1] + (qc == target[j - 1] ? 0 : 1);
      int32_t left = curr[j - 1] + 1;
      int32_t up = prev[j] + 1;
      int32_t best = d;
      uint8_t dd = 0;
      if (left < best) best = left;
      if (up < best) best = up;
      if (best == d) {
        dd = 0;
      } else if (best == left) {
        dd = 1;
      } else {
        dd = 2;
      }
      curr[j] = best;
      drow[j] = dd;
    }
    std::swap(prev, curr);
  }
  res.editDistance = lq == 0 ? lt : prev[lt];
  res.numLocations = 1;
  res.endLocations = static_cast<int*>(std::malloc(sizeof(int)));
  res.startLocations = static_cast<int*>(std::malloc(sizeof(int)));
  if (res.endLocations) res.endLocations[0] = lt - 1;
  if (res.startLocations) res.startLocations[0] = 0;

  if (config.task != EDLIB_TASK_PATH) return res;

  std::vector<unsigned char> ops;
  ops.reserve(static_cast<std::size_t>(lq) + lt);
  int i = lq, j = lt;
  while (i > 0 || j > 0) {
    uint8_t dd = dir[static_cast<std::size_t>(i) * W + j];
    if (i > 0 && j > 0 && dd == 0) {
      ops.push_back(query[i - 1] == target[j - 1] ? EDLIB_EDOP_MATCH
                                                  : EDLIB_EDOP_MISMATCH);
      --i;
      --j;
    } else if (j > 0 && (dd == 1 || i == 0)) {
      ops.push_back(EDLIB_EDOP_DELETE);
      --j;
    } else {
      ops.push_back(EDLIB_EDOP_INSERT);
      --i;
    }
  }
  res.alignmentLength = static_cast<int>(ops.size());
  res.alignment =
      static_cast<unsigned char*>(std::malloc(ops.size() ? ops.size() : 1));
  if (res.alignment) {
    for (std::size_t k = 0; k < ops.size(); ++k) {
      res.alignment[k] = ops[ops.size() - 1 - k];
    }
  } else {
    res.status = EDLIB_STATUS_ERROR;
  }
  return res;
}

void edlibFreeAlignResult(EdlibAlignResult result) {
  std::free(result.endLocations);
  std::free(result.startLocations);
  std::free(result.alignment);
}

char* edlibAlignmentToCigar(const unsigned char* alignment, int alignmentLength,
                            EdlibCigarFormat format) {
  // standard: match+mismatch -> 'M'; extended: '='/'X'
  const char* moveStd = "MIDM";
  const char* moveExt = "=IDX";
  const char* mv = format == EDLIB_CIGAR_STANDARD ? moveStd : moveExt;
  std::string out;
  int i = 0;
  while (i < alignmentLength) {
    int j = i;
    while (j < alignmentLength &&
           mv[alignment[j]] == mv[alignment[i]]) {
      ++j;
    }
    out += std::to_string(j - i);
    out += mv[alignment[i]];
    i = j;
  }
  char* buf = static_cast<char*>(std::malloc(out.size() + 1));
  if (buf) std::memcpy(buf, out.c_str(), out.size() + 1);
  return buf;
}

}  // extern "C"
