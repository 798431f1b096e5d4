// Per-window trace harness over the REFERENCE spoa: replays the linear
// consensus procedure (src/window.cpp:74-174) for ONE window fed on stdin
// in dump_state format, printing each layer's alignment path and the graph
// node/edge counts after each AddAlignment. Diffed against
// scripts/trace_window.py to localize consensus divergences.
//
// stdin:  B 0 0 <seq> <qual>      (backbone; qual '-' = none)
//         L <begin> <end> <seq> <qual>  (layers, any order)
// args:   [--no-trim] [--ngs] [--sort-keys-only]
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <iostream>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include "spoa/alignment_engine.hpp"
#include "spoa/graph.hpp"

int main(int argc, char** argv) {
  bool trim = true;
  for (int i = 1; i < argc; ++i) {
    if (std::string(argv[i]) == "--no-trim") trim = false;
  }

  std::string line;
  std::string backbone, bqual;
  std::vector<std::string> seqs, quals;
  std::vector<std::pair<uint32_t, uint32_t>> positions;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string tag, sq, ql;
    uint32_t a, b;
    ss >> tag >> a >> b >> sq >> ql;
    if (tag == "B") {
      backbone = sq;
      bqual = ql == "-" ? std::string() : ql;
      seqs.push_back(sq);
      quals.push_back(bqual);
      positions.emplace_back(0, 0);
    } else if (tag == "L") {
      seqs.push_back(sq);
      quals.push_back(ql == "-" ? std::string() : ql);
      positions.emplace_back(a, b);
    }
  }
  if (seqs.empty()) return 2;

  auto engine = spoa::AlignmentEngine::Create(
      spoa::AlignmentType::kNW, 3, -5, -4);
  engine->Prealloc(1000, 5);

  spoa::Graph graph{};
  if (quals[0].empty()) {
    graph.AddAlignment(spoa::Alignment(), backbone.c_str(), backbone.size());
  } else {
    graph.AddAlignment(spoa::Alignment(), backbone.c_str(), backbone.size(),
                       quals[0].c_str(), quals[0].size());
  }
  printf("GRAPH 0 nodes=%u edges=%u\n", graph.num_codes() ? (uint32_t)graph.nodes().size() : (uint32_t)graph.nodes().size(), (uint32_t)graph.edges().size());

  std::vector<uint32_t> rank;
  for (uint32_t i = 0; i < seqs.size(); ++i) rank.emplace_back(i);
  std::sort(rank.begin() + 1, rank.end(), [&](uint32_t l, uint32_t r) {
    return positions[l].first < positions[r].first;
  });
  printf("ORDER");
  for (uint32_t j = 1; j < rank.size(); ++j) printf(" %u", rank[j]);
  printf("\n");

  uint32_t offset = 0.01 * backbone.size();
  for (uint32_t j = 1; j < seqs.size(); ++j) {
    uint32_t i = rank[j];
    spoa::Alignment alignment;
    bool full = positions[i].first < offset &&
                positions[i].second > backbone.size() - offset;
    if (full) {
      alignment = engine->Align(seqs[i].c_str(), seqs[i].size(), graph);
    } else {
      std::vector<const spoa::Graph::Node*> mapping;
      auto subgraph =
          graph.Subgraph(positions[i].first, positions[i].second, &mapping);
      alignment = engine->Align(seqs[i].c_str(), seqs[i].size(), subgraph);
      subgraph.UpdateAlignment(mapping, &alignment);
    }
    printf("ALN %u%s", i, full ? " full" : " sub");
    for (auto& p : alignment) printf(" %d:%d", p.first, p.second);
    printf("\n");
    if (quals[i].empty()) {
      graph.AddAlignment(alignment, seqs[i].c_str(), seqs[i].size());
    } else {
      graph.AddAlignment(alignment, seqs[i].c_str(), seqs[i].size(),
                         quals[i].c_str(), quals[i].size());
    }
    printf("GRAPH %u nodes=%zu edges=%zu\n", j, graph.nodes().size(),
           graph.edges().size());
  }

  std::vector<uint32_t> coverages;
  std::string consensus = graph.GenerateConsensus(&coverages);
  printf("RAWCONS %s\n", consensus.c_str());
  printf("COV");
  for (auto c : coverages) printf(" %u", c);
  printf("\n");
  if (trim) {
    uint32_t average_coverage = (seqs.size() - 1) / 2;
    int32_t begin = 0, end = consensus.size() - 1;
    for (; begin < (int32_t)consensus.size(); ++begin) {
      if (coverages[begin] >= average_coverage) break;
    }
    for (; end >= 0; --end) {
      if (coverages[end] >= average_coverage) break;
    }
    if (begin < end) consensus = consensus.substr(begin, end - begin + 1);
  }
  printf("CONS %s\n", consensus.c_str());
  return 0;
}
