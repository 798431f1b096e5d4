// Minimal edlib 1.2.7 API shim (header) for building the reference
// vechat_racon binary offline for differential testing. Only the subset the
// reference uses (src/overlap.cpp:205-224): NW mode, TASK_PATH, standard
// CIGAR. The alignment itself is a fresh full-DP NW edit-distance
// implementation whose tie-break order (diagonal, then 'D', then 'I',
// walking back-to-front) matches vechat_tpu/ops/pairwise.py so CIGAR-level
// divergence between the two pipelines is zero by construction and the
// differential test isolates downstream (polisher/window/graph) semantics.
#pragma once

#ifdef __cplusplus
extern "C" {
#endif

typedef enum { EDLIB_STATUS_OK = 0, EDLIB_STATUS_ERROR = 1 } EdlibStatus;

typedef enum { EDLIB_MODE_NW, EDLIB_MODE_SHW, EDLIB_MODE_HW } EdlibAlignMode;

typedef enum {
  EDLIB_TASK_DISTANCE,
  EDLIB_TASK_LOC,
  EDLIB_TASK_PATH
} EdlibAlignTask;

typedef enum {
  EDLIB_CIGAR_STANDARD,
  EDLIB_CIGAR_EXTENDED
} EdlibCigarFormat;

// Edit operations (edlib encoding).
#define EDLIB_EDOP_MATCH 0     // consumes query + target
#define EDLIB_EDOP_INSERT 1    // insertion to target: consumes query ('I')
#define EDLIB_EDOP_DELETE 2    // deletion from target: consumes target ('D')
#define EDLIB_EDOP_MISMATCH 3  // consumes query + target

typedef struct {
  char first;
  char second;
} EdlibEqualityPair;

typedef struct {
  int k;
  EdlibAlignMode mode;
  EdlibAlignTask task;
  const EdlibEqualityPair* additionalEqualities;
  int additionalEqualitiesLength;
} EdlibAlignConfig;

typedef struct {
  int status;
  int editDistance;
  int* endLocations;
  int* startLocations;
  int numLocations;
  unsigned char* alignment;
  int alignmentLength;
  int alphabetLength;
} EdlibAlignResult;

EdlibAlignConfig edlibNewAlignConfig(int k, EdlibAlignMode mode,
                                     EdlibAlignTask task,
                                     const EdlibEqualityPair* additionalEqualities,
                                     int additionalEqualitiesLength);

EdlibAlignConfig edlibDefaultAlignConfig(void);

EdlibAlignResult edlibAlign(const char* query, int queryLength,
                            const char* target, int targetLength,
                            EdlibAlignConfig config);

void edlibFreeAlignResult(EdlibAlignResult result);

char* edlibAlignmentToCigar(const unsigned char* alignment,
                            int alignmentLength, EdlibCigarFormat cigarFormat);

#ifdef __cplusplus
}
#endif
