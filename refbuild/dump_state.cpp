// Differential-test introspection harness for the REFERENCE vechat_racon.
// Compiled against the reference sources with -Dprivate=public
// -Dprotected=public (build_dump.sh) so Polisher/Window internals can be
// dumped stage-by-stage and diffed against vechat_tpu's pipeline state:
//   WINDOW lines   — window construction (polisher.cpp:389-462 semantics)
//   CONSENSUS lines — per-window consensus (window.cpp:74-428)
// Usage: dump_state <seqs> <paf> <target> [--haplotype] [-d F] [-s F]
//        [-k N] [-w N] [-q F] [-e F] [--no-trim] [--windows-only]
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "polisher.hpp"
#include "sequence.hpp"
#include "window.hpp"

int main(int argc, char** argv) {
  std::string seqs, paf, target;
  bool haplotype = false, trim = true, windows_only = false;
  double d = 0.22, s = 0.19, q = 10.0, e = 0.3;
  uint32_t k = 3, w = 500;
  std::vector<const char*> pos;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--haplotype") haplotype = true;
    else if (a == "--no-trim") trim = false;
    else if (a == "--windows-only") windows_only = true;
    else if (a == "-d") d = atof(argv[++i]);
    else if (a == "-s") s = atof(argv[++i]);
    else if (a == "-q") q = atof(argv[++i]);
    else if (a == "-e") e = atof(argv[++i]);
    else if (a == "-k") k = atoi(argv[++i]);
    else if (a == "-w") w = atoi(argv[++i]);
    else pos.push_back(argv[i]);
  }
  if (pos.size() != 3) {
    fprintf(stderr, "usage: dump_state <seqs> <paf> <target> [flags]\n");
    return 2;
  }
  auto polisher = racon::createPolisher(
      pos[0], pos[1], pos[2], racon::PolisherType::kF, haplotype, d, s, k, w,
      q, e, trim, 3, -5, -4, 1);
  polisher->initialize();

  printf("NWIN %zu\n", polisher->windows_.size());
  for (auto& win : polisher->windows_) {
    printf("WINDOW %llu %u %s\n", (unsigned long long)win->id_, win->rank_,
           win->type_ == racon::WindowType::kNGS ? "NGS" : "TGS");
    for (size_t i = 0; i < win->sequences_.size(); ++i) {
      const auto& sq = win->sequences_[i];
      const auto& ql = win->qualities_[i];
      const auto& po = win->positions_[i];
      printf("%s %u %u %.*s %.*s\n", i == 0 ? "B" : "L", po.first, po.second,
             (int)sq.second, sq.first, ql.second ? (int)ql.second : 1,
             ql.second ? ql.first : "-");
    }
  }
  if (windows_only) return 0;
  for (auto& win : polisher->windows_) {
    bool ok;
    if (haplotype) {
      ok = win->generate_consensus(polisher->alignment_engines_[0], trim,
                                   true, d, s, k);
    } else {
      ok = win->generate_consensus(polisher->alignment_engines_[0], trim);
    }
    printf("CONSENSUS %llu %u %d %s\n", (unsigned long long)win->id_,
           win->rank_, ok ? 1 : 0, win->consensus_.c_str());
  }
  return 0;
}
